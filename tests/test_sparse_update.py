"""Row-RMW sparse-update kernel (ops/pallas_sparse_update.py) and its
optimizer wiring — interpret mode on CPU; the same kernel is validated on
TPU v5e hardware (exact vs XLA scatter, ~40 ns/row vs full-store rewrite)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
from dlrm_yx_tpu.ops.embedding import SENTINEL_ROWS, build_table_groups
from dlrm_yx_tpu.ops.pallas_sparse_update import (
    conflict_flags,
    sparse_rows_add,
    supports_dim,
)
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state, sparse_update


def _ref_apply(store, idx, upd, active):
    want = store.copy()
    for k in range(len(idx)):
        if active[k]:
            want[idx[k]] += upd[k]
    return want


@pytest.mark.parametrize("dupmax,d", [(16, 128), (500, 128), (500, 256), (4096, 128)])
def test_sparse_rows_add_matches_reference(dupmax, d):
    r = np.random.RandomState(0)
    R, K = 4096 + SENTINEL_ROWS, 512
    store = r.randn(R, d).astype(np.float32)
    idx = r.randint(0, dupmax, K).astype(np.int32)
    upd = r.randn(K, d).astype(np.float32)
    active = (r.rand(K) > 0.2).astype(np.int32)
    got = np.asarray(
        sparse_rows_add(
            jnp.asarray(store), jnp.asarray(idx), jnp.asarray(upd),
            jnp.asarray(active), interpret=True,
        )
    )
    want = _ref_apply(store, idx, upd, active)
    # sentinel rows are scratch; everything else must match exactly
    np.testing.assert_allclose(got[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS],
                               rtol=1e-5, atol=1e-5)


def test_sparse_rows_add_all_same_row_overflows_to_fallback():
    """Adversarial: every item hits one row -> all but the first are
    conflicts -> the serialized tail pass applies them exactly (no capacity
    limit; the old CMAX + XLA-scatter fallback is gone)."""
    r = np.random.RandomState(1)
    R, D, K = 64 + SENTINEL_ROWS, 128, 2048
    store = r.randn(R, D).astype(np.float32)
    idx = np.full(K, 7, np.int32)
    upd = r.randn(K, D).astype(np.float32)
    active = np.ones(K, np.int32)
    got = np.asarray(
        sparse_rows_add(
            jnp.asarray(store), jnp.asarray(idx), jnp.asarray(upd),
            jnp.asarray(active), interpret=True,
        )
    )
    want = _ref_apply(store, idx, upd, active)
    np.testing.assert_allclose(got[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS],
                               rtol=1e-3, atol=1e-3)


def test_conflict_flags():
    idx = jnp.asarray(np.array([5, 9, 5, 9, 100, 5], np.int32))
    act = jnp.asarray(np.array([1, 0, 1, 1, 1, 1], np.int32))
    c = np.asarray(conflict_flags(idx, act))
    assert c.tolist() == [0, 0, 1, 0, 0, 1]  # items 2,5 re-hit row 5; item 3's
    # only prior 9 was inactive
    assert supports_dim(128) and supports_dim(256)
    assert supports_dim(64) and supports_dim(32) and supports_dim(8)
    assert not supports_dim(48) and not supports_dim(96)


@pytest.mark.parametrize("d", [8, 32, 64])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_sparse_rows_add_packed_sub128_dims(d, dtype):
    """Sub-128 dims run on the packed [R/pack, 128] layout (the reference's
    flagship 64-dim configs, bench/dlrm_s_benchmark.sh:41-44): pack=128/d
    logical rows per physical row, conflicts at transfer-unit granularity
    (two logical rows sharing a physical row must serialize exactly)."""
    from dlrm_yx_tpu.ops.pallas_sparse_update import pack_factor

    r = np.random.RandomState(11)
    pack = pack_factor(d)
    jdt = jnp.dtype(dtype)
    R = 2048 * pack  # logical rows; R/pack physical rows (multiple of 8)
    K = 512
    store_log = r.randn(R, d).astype(np.float32)
    idx = r.randint(0, R - 8 * pack, K).astype(np.int32)  # incl. adjacent-
    # row collisions within physical rows
    idx[:32] = r.randint(0, 4 * pack, 32)  # force unit conflicts
    upd = r.randn(K, d).astype(np.float32)
    active = (r.rand(K) > 0.2).astype(np.int32)
    packed = jnp.asarray(store_log, jdt).reshape(R // pack, d * pack)
    got = np.asarray(
        sparse_rows_add(
            packed, jnp.asarray(idx), jnp.asarray(upd), jnp.asarray(active),
            interpret=True, dim=d,
        )
        .reshape(R, d)
        .astype(jnp.float32)
    )
    live = R - 8 * pack  # last physical unit is sentinel scratch
    if dtype == "float32":
        want = _ref_apply(store_log, idx, upd, active)
        np.testing.assert_allclose(got[:live], want[:live], rtol=1e-5,
                                   atol=1e-5)
    else:
        # bf16 store: f32 RMW math, rounded to bf16 per update
        want = np.array(jnp.asarray(store_log, jdt).astype(jnp.float32))
        for k in range(K):
            if active[k]:
                want[idx[k]] = np.asarray(
                    (jnp.asarray(want[idx[k]]) + upd[k])
                    .astype(jdt)
                    .astype(jnp.float32)
                )
        np.testing.assert_allclose(got[:live], want[:live], rtol=0.02,
                                   atol=0.05)


def test_sparse_update_pallas_impl_matches_xla_sgd():
    """Full optimizer wiring: impl='pallas' (big store -> kernel) vs 'xla'."""
    r = np.random.RandomState(2)
    d = 128
    R = (1 << 17) + SENTINEL_ROWS  # 128k rows x 128 = 64 MB -> kernel path
    K = 4096
    opt = OptConfig("sgd", 0.05)
    store = r.randn(R, d).astype(np.float32)
    idx = r.randint(0, R - SENTINEL_ROWS, K).astype(np.int32)
    g = r.randn(K, d).astype(np.float32)
    s1, _ = sparse_update(opt, jnp.asarray(store), None, jnp.asarray(idx),
                          jnp.asarray(g), 0.05, R, impl="xla")
    s2, _ = sparse_update(opt, jnp.asarray(store), None, jnp.asarray(idx),
                          jnp.asarray(g), 0.05, R, impl="pallas", interpret=True)
    np.testing.assert_allclose(
        np.asarray(s1)[:-SENTINEL_ROWS], np.asarray(s2)[:-SENTINEL_ROWS],
        rtol=1e-5, atol=1e-6,
    )


def test_sparse_update_pallas_impl_matches_xla_rwsadagrad_unique():
    """rwsadagrad pallas path is exact when rows are unique within the step."""
    r = np.random.RandomState(3)
    d = 128
    R = (1 << 17) + SENTINEL_ROWS
    K = 2048
    opt = OptConfig("rwsadagrad", 0.05)
    store = r.randn(R, d).astype(np.float32)
    acc = np.abs(r.randn(R)).astype(np.float32)
    idx = np.random.RandomState(4).choice(R - SENTINEL_ROWS, K, replace=False).astype(np.int32)
    g = r.randn(K, d).astype(np.float32)
    s1, a1 = sparse_update(opt, jnp.asarray(store), jnp.asarray(acc),
                           jnp.asarray(idx), jnp.asarray(g), 0.05, R, impl="xla")
    s2, a2 = sparse_update(opt, jnp.asarray(store), jnp.asarray(acc),
                           jnp.asarray(idx), jnp.asarray(g), 0.05, R,
                           impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1)[:-SENTINEL_ROWS], np.asarray(s2)[:-SENTINEL_ROWS],
        rtol=1e-5, atol=1e-5,
    )


def test_small_stores_stay_on_xla_path():
    """Stores under PALLAS_MIN_STORE_BYTES use XLA even with impl='pallas'
    (exact coalescing for dup-heavy tiny tables)."""
    r = np.random.RandomState(5)
    d = 128
    R = 512  # tiny
    K = 2048  # heavy dups
    opt = OptConfig("rwsadagrad", 0.05)
    store = r.randn(R, d).astype(np.float32)
    acc = np.zeros(R, np.float32)
    idx = r.randint(0, 16, K).astype(np.int32)
    g = r.randn(K, d).astype(np.float32)
    s1, a1 = sparse_update(opt, jnp.asarray(store), jnp.asarray(acc),
                           jnp.asarray(idx), jnp.asarray(g), 0.05, R, impl="xla")
    s2, a2 = sparse_update(opt, jnp.asarray(store), jnp.asarray(acc),
                           jnp.asarray(idx), jnp.asarray(g), 0.05, R,
                           impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6, atol=1e-6)


def test_group_split_threshold():
    groups = build_table_groups([100, 200000, 50, 900000], [8, 8, 8, 8],
                                small_threshold=65536)
    assert len(groups) == 2
    small = [g for g in groups if 0 in g.table_ids][0]
    big = [g for g in groups if 1 in g.table_ids][0]
    assert set(small.table_ids) == {0, 2}
    assert set(big.table_ids) == {1, 3}
    assert small.size_class == 0 and big.size_class == 1
    # without a threshold, no group is "small" (kernel-eligible by bytes)
    assert all(
        g.size_class == 1
        for g in build_table_groups([100, 900000], [8, 8])
    )
    # sentinel rows present
    assert small.total_rows >= sum(small.rows) + SENTINEL_ROWS


def test_size_class_gates_kernel_routing(monkeypatch):
    """A small-table group (size_class=0) must take the exact coalescing
    path even when its aggregate store bytes pass the kernel threshold —
    detectable because the kernel's adagrad momentum is per-occurrence on
    duplicate rows while the exact path coalesces first."""
    import dlrm_yx_tpu.optim.optimizer as om

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    r = np.random.RandomState(7)
    d = 128
    R = 256 + SENTINEL_ROWS
    K = 24  # small enough to stay under the dense-accum density crossover
    opt = OptConfig("adagrad", 0.05)
    store = r.randn(R, d).astype(np.float32)
    acc = np.abs(r.randn(R, d)).astype(np.float32)
    idx = r.randint(0, 8, K).astype(np.int32)  # heavy duplicates
    g = r.randn(K, d).astype(np.float32)
    exact, acc_exact = sparse_update(
        opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(g), 0.05, R, impl="xla",
    )
    got, acc_got = om.sparse_update(
        opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
        size_class=0,
    )
    np.testing.assert_allclose(np.asarray(exact), np.asarray(got),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_exact), np.asarray(acc_got),
                               rtol=1e-6, atol=1e-6)
    # sanity: with size_class=1 the kernel path WOULD be taken, and with a
    # measured dup-LIGHT density hint its per-occurrence momentum differs
    # on these duplicate-heavy updates (round 5: without a hint the
    # density routing coalesces exactly by default)
    alt, _ = om.sparse_update(
        opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
        size_class=1, density_hint=1.0,
    )
    assert np.abs(np.asarray(alt) - np.asarray(exact)).max() > 1e-6


def test_dense_update_density_crossover(monkeypatch):
    """High-L steps (occurrences >= rows/DENSE_ACCUM_FACTOR) take the
    dense-accumulate path even on kernel-eligible stores — it is
    bandwidth-bound instead of DMA-issue-bound AND exactly coalescing, so
    adagrad momentum on the duplicate-heavy updates matches the exact XLA
    path bit-for-bit (the reference's 100-indices-per-lookup benchmark,
    bench/dlrm_s_benchmark.sh:41)."""
    import dlrm_yx_tpu.optim.optimizer as om

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    r = np.random.RandomState(9)
    d = 128
    R = 512 + SENTINEL_ROWS
    K = 512  # K * 8 >= R -> dense path
    opt = OptConfig("adagrad", 0.05)
    store = r.randn(R, d).astype(np.float32)
    acc = np.abs(r.randn(R, d)).astype(np.float32)
    idx = r.randint(0, 64, K).astype(np.int32)  # heavy duplicates
    g = r.randn(K, d).astype(np.float32)
    exact, acc_exact = sparse_update(
        opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(g), 0.05, R, impl="xla",
    )
    got, acc_got = om.sparse_update(
        opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
        size_class=1,
    )
    np.testing.assert_allclose(np.asarray(exact), np.asarray(got),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_exact), np.asarray(acc_got),
                               rtol=1e-6, atol=1e-6)


def test_train_step_pallas_sparse_impl_matches_xla():
    """End-to-end single-device train step, sparse_update_impl pallas vs
    xla (tiny model stays on XLA by the size gate — so force a big-enough
    store via a 17-bit table)."""
    import dataclasses

    from dlrm_yx_tpu.train.train_step import make_train_step

    cfg = DLRMConfig(
        emb_rows=(1 << 17, 300, 40), ln_bot=(4, 8, 128),
        ln_top=(4 * 3 // 2 + 128, 8, 1), emb_split_threshold=65536,
    )
    cfg2 = dataclasses.replace(cfg, sparse_update_impl="pallas")
    r = np.random.RandomState(0)
    b = Batch(
        dense=jnp.asarray(r.rand(8, 4).astype(np.float32)),
        indices=jnp.asarray(
            np.stack([r.randint(0, n, (8, 2)) for n in cfg.emb_rows]).astype(np.int32)
        ),
        weights=jnp.ones((3, 8, 2), jnp.float32),
        labels=jnp.asarray((r.rand(8, 1) > 0.5).astype(np.float32)),
    )
    opt = OptConfig("sgd", 0.1)
    losses = []
    finals = []
    for c in (cfg, cfg2):
        p = init_dlrm(c, seed=7)
        st = init_opt_state(opt, p, model_groups(c))
        step = make_train_step(c, opt)
        ls = []
        for it in range(3):
            p, st, loss = step(p, st, b, it)
            ls.append(float(loss))
        losses.append(ls)
        finals.append([np.asarray(e) for e in p["emb"]])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5, atol=1e-6)
    for e1, e2 in zip(finals[0], finals[1]):
        np.testing.assert_allclose(
            e1[:-SENTINEL_ROWS], e2[:-SENTINEL_ROWS], rtol=1e-5, atol=1e-6
        )


def test_sparse_rows_add_bfloat16_store():
    """bf16 stores (emb_dtype) update at 8-row-unit granularity; exact up to
    bf16 write-back rounding. Validated bit-exact on TPU v5e hardware."""
    r = np.random.RandomState(0)
    R, D, K = 4096 + SENTINEL_ROWS, 128, 512
    store = r.randn(R, D).astype(np.float32)
    idx = r.randint(0, 4000, K).astype(np.int32)
    upd = r.randn(K, D).astype(np.float32)
    act = (r.rand(K) > 0.2).astype(np.int32)
    got = np.asarray(
        sparse_rows_add(
            jnp.asarray(store, jnp.bfloat16), jnp.asarray(idx),
            jnp.asarray(upd), jnp.asarray(act), interpret=True,
        ).astype(jnp.float32)
    )
    base = np.asarray(jnp.asarray(store, jnp.bfloat16).astype(jnp.float32))
    want = base.copy()
    for k in range(K):
        if act[k]:
            want[idx[k]] = np.asarray(
                (jnp.asarray(want[idx[k]]) + upd[k])
                .astype(jnp.bfloat16)
                .astype(jnp.float32)
            )
    np.testing.assert_allclose(
        got[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS], rtol=0.02, atol=0.05
    )


def test_train_step_bf16_emb_dtype():
    """emb_dtype='bfloat16' end to end: stores stay bf16, training follows
    the fp32 path closely for the first steps."""
    import dataclasses

    from dlrm_yx_tpu.train.train_step import make_train_step

    cfg32 = DLRMConfig(
        emb_rows=(1 << 17, 300, 40), ln_bot=(4, 8, 128),
        ln_top=(4 * 3 // 2 + 128, 8, 1),
    )
    cfg16 = dataclasses.replace(
        cfg32, emb_dtype="bfloat16", sparse_update_impl="pallas"
    )
    r = np.random.RandomState(0)
    b = Batch(
        dense=jnp.asarray(r.rand(8, 4).astype(np.float32)),
        indices=jnp.asarray(
            np.stack([r.randint(0, n, (8, 1)) for n in cfg32.emb_rows]).astype(np.int32)
        ),
        weights=jnp.ones((3, 8, 1), jnp.float32),
        labels=jnp.asarray((r.rand(8, 1) > 0.5).astype(np.float32)),
    )
    opt = OptConfig("rwsadagrad", 0.1)
    losses = {}
    for cfg in (cfg32, cfg16):
        p = init_dlrm(cfg, seed=7)
        st = init_opt_state(opt, p, model_groups(cfg))
        step = make_train_step(cfg, opt)
        ls = []
        for it in range(3):
            p, st, loss = step(p, st, b, it)
            ls.append(float(loss))
        losses[cfg.emb_dtype] = ls
        if cfg.emb_dtype == "bfloat16":
            assert p["emb"][0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        losses["float32"], losses["bfloat16"], rtol=0.02, atol=0.01
    )


def test_stochastic_rounding_flag_plumbed():
    """SR is a no-op off-TPU (interpret mode) and for fp32 stores; the
    statistical behavior was validated on v5e hardware: 16 sub-ulp updates
    (2^-12 onto bf16 1.0) leave deterministic stores unmoved (drift 0.0)
    and move SR stores by 0.90x the exact expectation."""
    r = np.random.RandomState(0)
    R, D, K = 512 + SENTINEL_ROWS, 128, 64
    store = r.randn(R, D).astype(np.float32)
    idx = r.randint(0, 500, K).astype(np.int32)
    upd = r.randn(K, D).astype(np.float32)
    act = np.ones(K, np.int32)
    a = sparse_rows_add(jnp.asarray(store), jnp.asarray(idx), jnp.asarray(upd),
                        jnp.asarray(act), interpret=True)
    b = sparse_rows_add(jnp.asarray(store), jnp.asarray(idx), jnp.asarray(upd),
                        jnp.asarray(act), interpret=True,
                        stochastic_round=True, seed=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparse_rows_add_fuzz():
    """Property fuzz: random shapes/dup-rates/activity masks/dtypes must
    match the sequential reference (bf16 within rounding)."""
    rng = np.random.RandomState(99)
    for trial in range(8):
        # real group stores are ROW_ALIGN(8)-aligned + sentinel block
        R = int(rng.randint(5, 375)) * 8 + SENTINEL_ROWS
        K = int(rng.randint(1, 700))
        kk = int(rng.choice([1, 2]))
        d = 128 * kk
        dupmax = int(rng.randint(1, R - SENTINEL_ROWS))
        dtype = jnp.float32 if trial % 2 == 0 else jnp.bfloat16
        store = rng.randn(R, d).astype(np.float32)
        idx = rng.randint(0, dupmax, K).astype(np.int32)
        upd = rng.randn(K, d).astype(np.float32)
        act = (rng.rand(K) > 0.3).astype(np.int32)
        got = np.asarray(
            sparse_rows_add(
                jnp.asarray(store, dtype), jnp.asarray(idx),
                jnp.asarray(upd), jnp.asarray(act), interpret=True,
            ).astype(jnp.float32)
        )
        if dtype == jnp.float32:
            want = store.copy()
            for k in range(K):
                if act[k]:
                    want[idx[k]] += upd[k]
            np.testing.assert_allclose(
                got[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS],
                rtol=1e-4, atol=1e-4,
                err_msg=f"trial {trial}: R={R} K={K} d={d} dupmax={dupmax}",
            )
        else:
            base = np.asarray(jnp.asarray(store, dtype).astype(jnp.float32))
            want = base.copy()
            for k in range(K):
                if act[k]:
                    want[idx[k]] = np.asarray(
                        (jnp.asarray(want[idx[k]]) + upd[k]).astype(dtype).astype(jnp.float32)
                    )
            np.testing.assert_allclose(
                got[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS],
                rtol=0.05, atol=0.08,
                err_msg=f"trial {trial}: R={R} K={K} d={d} dupmax={dupmax}",
            )


def test_exact_row_momentum_matches_xla_on_duplicates(monkeypatch):
    """--exact-row-momentum: pallas adagrad-family updates pre-coalesce, so
    duplicate-heavy steps match the exact XLA path bit-for-bit
    (grad.coalesce() semantics, /root/reference/optim/rwsadagrad.py:98)."""
    import dlrm_yx_tpu.optim.optimizer as om

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    r = np.random.RandomState(13)
    d = 128
    R = (1 << 12) + SENTINEL_ROWS
    K = 96  # << R/8: stays on the kernel path
    for optname in ("adagrad", "rwsadagrad"):
        opt = OptConfig(optname, 0.05)
        store = r.randn(R, d).astype(np.float32)
        acc = (
            np.abs(r.randn(R, d)).astype(np.float32)
            if optname == "adagrad"
            else np.abs(r.randn(R)).astype(np.float32)
        )
        idx = r.randint(0, 24, K).astype(np.int32)  # heavy duplicates
        g = r.randn(K, d).astype(np.float32)
        exact, acc_exact = om.sparse_update(
            opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
            jnp.asarray(g), 0.05, R, impl="xla",
        )
        got, acc_got = om.sparse_update(
            opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
            jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
            exact_momentum=True,
        )
        np.testing.assert_allclose(
            np.asarray(exact)[:-SENTINEL_ROWS],
            np.asarray(got)[:-SENTINEL_ROWS], rtol=1e-5, atol=1e-5,
            err_msg=optname,
        )
        np.testing.assert_allclose(
            np.asarray(acc_exact)[:-SENTINEL_ROWS],
            np.asarray(acc_got)[:-SENTINEL_ROWS], rtol=1e-5, atol=1e-5,
            err_msg=optname,
        )
        # sanity: the per-occurrence mode (dup-light measured density)
        # differs on these duplicate-heavy updates
        alt, _ = om.sparse_update(
            opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
            jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
            density_hint=1.0,
        )
        assert np.abs(np.asarray(alt) - np.asarray(exact)).max() > 1e-6

        # round 5: with NO measured density the kernel path coalesces
        # exactly by default (MOMENTUM_EXACT_DENSITY routing)
        auto, _ = om.sparse_update(
            opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
            jnp.asarray(g), 0.05, R, impl="pallas", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(auto), np.asarray(exact), rtol=1e-5, atol=1e-5
        )


def test_write_only_update_matches_xla_in_train_step(monkeypatch):
    """The write-only fast path (sparse_rows_overwrite via the lookup's
    gathered rows) must produce the same trained store as the exact XLA
    path — including duplicate rows, which reroute to the serialized RMW
    tail. SGD is linear so the comparison is exact on a dup-heavy batch."""
    import dataclasses

    import dlrm_yx_tpu.optim.optimizer as om
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    base = DLRMConfig(
        emb_rows=(1500, 1600), ln_bot=(4, 8, 128),
        ln_top=(2 * 3 // 2 + 128, 8, 1),
    )
    r = np.random.RandomState(9)
    t, b = 2, 16
    batches = []
    for _ in range(3):
        idx = r.randint(0, 1500, (t, b, 1)).astype(np.int32)
        idx[0, :6, 0] = idx[0, 0, 0]  # heavy dup row -> tail path
        batches.append(Batch(
            r.rand(b, 4).astype(np.float32), idx,
            np.ones((t, b, 1), np.float32),
            (r.rand(b, 1) > 0.5).astype(np.float32),
        ))
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = dataclasses.replace(base, sparse_update_impl=impl)
        params = init_dlrm(cfg, seed=3)
        opt = OptConfig("sgd", 0.1)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        for i, bt in enumerate(batches):
            params, st, loss = step(params, st, Batch(*map(jnp.asarray, bt)), i)
        outs[impl] = np.asarray(params["emb"][0])
    np.testing.assert_allclose(
        outs["pallas"][:-SENTINEL_ROWS], outs["xla"][:-SENTINEL_ROWS],
        rtol=1e-5, atol=1e-6,
    )


def test_sparse_rows_overwrite_dup_and_inactive():
    from dlrm_yx_tpu.ops.pallas_sparse_update import sparse_rows_overwrite

    r = np.random.RandomState(1)
    R, K = 2048 + SENTINEL_ROWS, 300
    store = r.randn(R, 128).astype(np.float32)
    idx = r.randint(0, 2048, K).astype(np.int32)
    idx[40:60] = idx[39]
    active = (r.rand(K) > 0.2).astype(np.int32)
    delta = r.randn(K, 128).astype(np.float32)
    new_vals = store[idx] + delta
    got = sparse_rows_overwrite(
        jnp.asarray(store), jnp.asarray(idx), jnp.asarray(new_vals),
        jnp.asarray(delta), jnp.asarray(active), interpret=True,
    )
    want = store.copy()
    for kx in range(K):
        if active[kx]:
            want[idx[kx]] = want[idx[kx]] + delta[kx]
    np.testing.assert_allclose(
        np.asarray(got)[:-SENTINEL_ROWS], want[:-SENTINEL_ROWS],
        rtol=1e-4, atol=1e-4,
    )


def test_write_only_update_packed_store(monkeypatch):
    """Write-only on PACKED sub-128-dim stores: the lookup's gathered
    physical rows carry every lane, and two logical rows sharing one
    physical row count as duplicates (serialized RMW tail). SGD exact vs
    the XLA path."""
    import dataclasses

    import dlrm_yx_tpu.optim.optimizer as om
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    base = DLRMConfig(
        emb_rows=(3000, 3200), ln_bot=(4, 8, 64),
        ln_top=(2 * 3 // 2 + 64, 8, 1),
    )
    r = np.random.RandomState(11)
    t, b = 2, 16
    batches = []
    for _ in range(3):
        idx = r.randint(0, 3000, (t, b, 1)).astype(np.int32)
        idx[0, 0, 0] = 100  # two logical rows in one physical (pack=2)
        idx[0, 1, 0] = 101
        idx[1, 2, 0] = idx[1, 3, 0]  # plain dup
        batches.append(Batch(
            r.rand(b, 4).astype(np.float32), idx,
            np.ones((t, b, 1), np.float32),
            (r.rand(b, 1) > 0.5).astype(np.float32),
        ))
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = dataclasses.replace(base, sparse_update_impl=impl)
        params = init_dlrm(cfg, seed=5)
        opt = OptConfig("sgd", 0.1)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        for i, bt in enumerate(batches):
            params, st, loss = step(params, st, Batch(*map(jnp.asarray, bt)), i)
        outs[impl] = np.asarray(params["emb"][0])
    np.testing.assert_allclose(
        outs["pallas"][:-SENTINEL_ROWS], outs["xla"][:-SENTINEL_ROWS],
        rtol=1e-5, atol=1e-6,
    )


def test_huge_accumulator_kernel_route_matches_scatter(monkeypatch):
    """_acc_update_1d routes big 1-D momenta through the RMW kernel
    (dim=1 packed view); forced small here via the byte gate — result must
    equal the XLA scatter exactly."""
    import dlrm_yx_tpu.optim.optimizer as oo

    rng = np.random.RandomState(3)
    total = 1000
    n = oo.acc_len(total)
    acc = np.abs(rng.randn(n)).astype(np.float32)
    k = 300
    idx = rng.randint(0, total, size=k).astype(np.int32)
    idx[-7:] = total  # sentinel/inactive
    active = (idx < total).astype(np.int32)
    inc = np.abs(rng.randn(k)).astype(np.float32)

    want = acc.copy()
    np.add.at(want, idx[active > 0], inc[active > 0])

    monkeypatch.setattr(oo, "ACC_KERNEL_MIN_BYTES", 0)
    got = oo._acc_update_1d(
        None, jnp.asarray(acc), jnp.asarray(idx), jnp.asarray(inc),
        jnp.asarray(active), total, "pallas", True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    # xla fallback (gate not met) must agree too
    monkeypatch.setattr(oo, "ACC_KERNEL_MIN_BYTES", 1 << 60)
    got2 = oo._acc_update_1d(
        None, jnp.asarray(acc), jnp.asarray(idx), jnp.asarray(inc),
        jnp.asarray(active), total, "pallas", True,
    )
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-6, atol=1e-6)


def test_density_hint_routes_dense_regime_to_coalesced_kernel():
    """A dup-heavy stream whose RAW occurrence count lands in the dense
    regime but whose measured unique density is low must flip to the
    kernel route with coalesce-first — and produce the identical result
    (grad.coalesce() exactness preserved by construction)."""
    from dlrm_yx_tpu.optim.optimizer import OptConfig, sparse_update
    import dlrm_yx_tpu.optim.optimizer as oo

    rng = np.random.RandomState(1)
    r, w = 1 << 17, 128  # 64 MB store: past the kernel byte gate
    k = r // 8  # raw K * 8 >= R -> dense regime without a hint
    opt = OptConfig("rwsadagrad", 0.1)
    store = rng.randn(r, w).astype(np.float32)
    acc = np.zeros(oo.acc_len(r), np.float32)
    idx = rng.randint(0, 60, size=k).astype(np.int32)  # ~0.4% unique
    g = rng.randn(k, w).astype(np.float32)

    outs = {}
    for tag, hint in (("dense", -1.0), ("hinted", 60 / k)):
        s2, a2 = sparse_update(
            opt, jnp.asarray(store), jnp.asarray(acc), jnp.asarray(idx),
            jnp.asarray(g), 0.1, r, impl="pallas", interpret=True,
            dim=w, density_hint=hint,
        )
        outs[tag] = (np.asarray(s2), np.asarray(a2))
    np.testing.assert_allclose(
        outs["dense"][0], outs["hinted"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        outs["dense"][1][:r], outs["hinted"][1][:r], rtol=1e-5, atol=1e-6
    )


def test_acc_update_1d_barriered_scatter_matches_numpy(monkeypatch):
    """The huge-momentum route (barriered in-place 1-D scatter) must equal
    a numpy scatter-add exactly, including duplicate logical rows and
    inactive items."""
    import dlrm_yx_tpu.optim.optimizer as om

    monkeypatch.setattr(om, "ACC_KERNEL_MIN_BYTES", 0)
    r = np.random.RandomState(3)
    length = om.acc_len(16000)
    acc = r.rand(length).astype(np.float32)
    k = 64
    idx = r.randint(0, 16000, k).astype(np.int32)
    idx[1] = idx[2]
    idx[3] = (idx[2] // 128) * 128 + (idx[2] + 1) % 128
    inc = r.rand(k).astype(np.float32)
    active = np.ones(k, np.int32)
    active[10] = 0
    opt = om.OptConfig("rwsadagrad", 0.1)
    got = om._acc_update_1d(
        opt, jnp.asarray(acc), jnp.asarray(idx), jnp.asarray(inc),
        jnp.asarray(active), 16128, "pallas", True,
    )
    want = acc.copy()
    np.add.at(want, idx[active > 0], inc[active > 0])
    np.testing.assert_allclose(
        np.asarray(got)[:16000], want[:16000], rtol=0, atol=1e-6
    )
