"""sorted_stream_add + the --sparse-update-impl=stream train path.

The sorted-run streaming kernel (ops/pallas_stream_update.py) is the
dense-regime analog of the CUDA backward's sorted-segment scatter
(SURVEY.md §2.3): full-store stream + in-VMEM row RMW. These tests pin:
  * kernel semantics (sorted dups, sentinel drops, block boundaries);
  * the factored optimizer path == the XLA dense path (sgd exact;
    rwsadagrad per-occurrence momentum == kernel-path semantics);
  * a full train step with impl='stream' matches impl='xla' losses for
    SGD (linear => exact).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
from dlrm_yx_tpu.ops.pallas_stream_update import BLOCK_ROWS, sorted_stream_add
from dlrm_yx_tpu.optim.optimizer import (
    OptConfig,
    init_opt_state,
    sparse_update_stream,
    stream_eligible,
)
from dlrm_yx_tpu.train.train_step import make_train_step


def test_sorted_stream_add_matches_scatter():
    r = np.random.RandomState(0)
    for R, K, dups in [(9000, 4000, False), (6000, 5000, True),
                       (BLOCK_ROWS, 100, False), (BLOCK_ROWS + 1, 7, False)]:
        base = r.randint(0, R, K)
        if dups:
            base = np.concatenate([base[: K // 2],
                                   np.repeat(base[:50], (K - K // 2) // 50)])
            base = base[:K]
        pos = np.sort(base).astype(np.int32)
        pos = np.concatenate([pos, np.full(37, R + 3, np.int32)])  # sentinels
        upd = r.randn(len(pos), 128).astype(np.float32)
        store = r.randn(R, 128).astype(np.float32)
        want = jnp.asarray(store).at[jnp.asarray(pos[:K])].add(
            jnp.asarray(upd[:K]), mode="drop"
        )
        got = sorted_stream_add(
            jnp.asarray(store), jnp.asarray(pos), jnp.asarray(upd),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"R={R} K={K} dups={dups}",
        )


@pytest.mark.parametrize("dim,pack", [(128, 1), (64, 2)])
def test_sorted_stream_apply_multiblock_multichunk(dim, pack):
    """Direct kernel test across store-block AND chunk boundaries: the
    resident grad table must persist across grid steps (loaded once at
    i==0) and the ping-pong chunk buffers must hand off correctly when a
    block's run spans multiple CHUNK-sized scalar DMAs."""
    from dlrm_yx_tpu.ops.pallas_stream_update import (
        BLOCK_ROWS_APPLY, CHP, CHUNK, sorted_stream_apply,
    )

    r = np.random.RandomState(7)
    rp = 2 * BLOCK_ROWS_APPLY + 333          # 3 blocks, last partial
    k = 2 * CHUNK + 777                       # multiple chunks per block
    s_rows = 64
    # cluster most updates into block 0 so one block spans >2 chunks
    pos_log = np.concatenate([
        r.randint(0, BLOCK_ROWS_APPLY * pack // 2, k - 1000),
        r.randint(0, rp * pack, 1000),
    ]).astype(np.int32)
    pos_log = np.sort(pos_log)
    seg = r.randint(0, s_rows, k).astype(np.int32)
    w = r.randn(k).astype(np.float32)
    gt_base = r.randn(s_rows, dim).astype(np.float32)
    gtab = np.tile(gt_base, (1, pack)).astype(np.float32)

    pos_p = np.concatenate([pos_log // pack, np.full(CHP, rp, np.int32)])
    h_p = np.concatenate([pos_log % pack, np.zeros(CHP, np.int32)])
    seg_p = np.concatenate([seg, np.zeros(CHP, np.int32)])
    w_p = np.concatenate([w, np.zeros(CHP, np.float32)])
    store = r.randn(rp, 128).astype(np.float32)

    want = store.astype(np.float64).copy()
    for i in range(k):
        val = np.zeros(128)
        lo = (pos_log[i] % pack) * dim
        val[lo:lo + dim] = w[i] * gt_base[seg[i]]
        want[pos_log[i] // pack] += val

    got = sorted_stream_apply(
        jnp.asarray(store), jnp.asarray(pos_p), jnp.asarray(seg_p),
        jnp.asarray(w_p), jnp.asarray(h_p), jnp.asarray(gtab),
        dim=dim, pack=pack, n_live=k, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_sparse_update_stream_fallback_when_gtab_too_big(monkeypatch):
    """When the pooled-grad table exceeds the VMEM residency budget the
    optimizer entry must take the expand-then-add path and still match."""
    import dlrm_yx_tpu.ops.pallas_stream_update as psu

    class G:
        pass

    g = G()
    g.dim, g.pack, g.size_class = 64, 2, 1
    t, b, l, rows_per_table = 2, 8, 5, 64
    g.total_rows = t * rows_per_table
    r = np.random.RandomState(9)
    gidx, w, gp, total = _factored_inputs(r, t, b, l, rows_per_table, 64, 2)
    rp = (total + 1) // 2 + 2
    store = r.randn(rp, 128).astype(np.float32)
    opt = OptConfig("sgd", 0.1)

    ref_store, _ = sparse_update_stream(
        opt, jnp.asarray(store), None, g, jnp.asarray(gidx),
        jnp.asarray(w), jnp.asarray(gp), 0.1, interpret=True,
    )
    monkeypatch.setattr(psu, "GTAB_MAX_BYTES", 1)
    import dlrm_yx_tpu.optim.optimizer as om
    fb_store, _ = om.sparse_update_stream(
        opt, jnp.asarray(store), None, g, jnp.asarray(gidx),
        jnp.asarray(w), jnp.asarray(gp), 0.1, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb_store), np.asarray(ref_store), rtol=1e-5, atol=1e-6
    )


def _factored_inputs(r, t, b, l, rows_per_table, dim, pack, dup=False):
    total = t * rows_per_table
    idx = r.randint(0, rows_per_table, (t, b, l)).astype(np.int32)
    if dup:
        idx = idx % 7
    gidx = idx + (np.arange(t, dtype=np.int32) * rows_per_table)[:, None, None]
    w = (r.rand(t, b, l) > 0.1).astype(np.float32)
    gp = r.randn(t, b, dim).astype(np.float32)
    return gidx, w, gp, total


@pytest.mark.parametrize("optname", ["sgd", "rwsadagrad"])
@pytest.mark.parametrize("dim,pack", [(128, 1), (64, 2), (32, 4)])
def test_sparse_update_stream_matches_reference(optname, dim, pack):
    """Factored stream update == hand-computed per-occurrence reference
    (the pallas kernel path's semantics; sgd == exact XLA scatter)."""

    class G:
        pass

    g = G()
    g.dim, g.pack, g.size_class = dim, pack, 1
    t, b, l, rows_per_table = 3, 8, 5, 64
    g.total_rows = t * rows_per_table
    r = np.random.RandomState(3)
    gidx, w, gp, total = _factored_inputs(r, t, b, l, rows_per_table, dim, pack,
                                          dup=True)
    rp = (total + pack - 1) // pack + 2
    store = r.randn(rp, 128).astype(np.float32)
    acc1d = np.abs(r.randn(total + 4)).astype(np.float32)
    opt = OptConfig(optname, 0.1)
    acc = None if optname == "sgd" else jnp.asarray(acc1d)
    assert stream_eligible(opt, jnp.asarray(store), g)

    got_store, got_acc = sparse_update_stream(
        opt, jnp.asarray(store), acc, g, jnp.asarray(gidx), jnp.asarray(w),
        jnp.asarray(gp), 0.1, interpret=True,
    )

    # reference: per-occurrence walk in sorted order
    want = store.copy().astype(np.float64)
    want_acc = acc1d.copy().astype(np.float64)
    flat = [
        (int(gidx[i, j, k]), float(w[i, j, k]), gp[i, j].astype(np.float64))
        for i in range(t) for j in range(b) for k in range(l)
    ]
    flat.sort(key=lambda x: x[0])
    # two-phase like the pallas kernel path: ALL momentum increments land
    # first, every occurrence then divides by the final accumulator
    if optname != "sgd":
        for row, ww, gprow in flat:
            val = np.zeros(128)
            blkpos = (row % pack) * dim
            val[blkpos : blkpos + dim] = ww * gprow
            want_acc[row] += float((val * val).sum() / dim)
    for row, ww, gprow in flat:
        val = np.zeros(128)
        blkpos = (row % pack) * dim
        val[blkpos : blkpos + dim] = ww * gprow
        if optname == "sgd":
            want[row // pack] += -0.1 * val
        else:
            want[row // pack] += -0.1 * val / (
                np.sqrt(want_acc[row]) + opt.eps
            )
    np.testing.assert_allclose(
        np.asarray(got_store), want, rtol=1e-4, atol=1e-4
    )
    if optname != "sgd":
        np.testing.assert_allclose(
            np.asarray(got_acc), want_acc, rtol=1e-4, atol=1e-4
        )


def test_train_step_stream_matches_xla_sgd():
    """Whole train step: impl='stream' == impl='xla' for SGD (linear =>
    bit-comparable losses and stores), on a dense-regime config."""
    base = DLRMConfig(
        emb_rows=(300, 400), ln_bot=(4, 8, 64), ln_top=(3 * 2 // 2 + 64, 8, 1),
    )
    r = np.random.RandomState(5)
    t, b, l = 2, 16, 12  # K = 384 * DENSE_ACCUM_FACTOR >= rows -> stream on
    batches = [
        Batch(
            r.rand(b, 4).astype(np.float32),
            r.randint(0, 300, (t, b, l)).astype(np.int32),
            np.ones((t, b, l), np.float32),
            (r.rand(b, 1) > 0.5).astype(np.float32),
        )
        for _ in range(3)
    ]
    outs = {}
    for impl in ("xla", "stream"):
        cfg = dataclasses.replace(base, sparse_update_impl=impl)
        params = init_dlrm(cfg, seed=11)
        opt = OptConfig("sgd", 0.1)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        losses = []
        for i, bt in enumerate(batches):
            params, st, loss = step(params, st, Batch(*map(jnp.asarray, bt)), i)
            losses.append(float(loss))
        outs[impl] = (losses, np.asarray(params["emb"][0]))
    np.testing.assert_allclose(outs["stream"][0], outs["xla"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["stream"][1], outs["xla"][1],
                               rtol=1e-4, atol=1e-5)


def test_hybrid_stream_matches_xla_sgd(monkeypatch):
    """--sparse-update-impl=stream on the hybrid mesh: the factored
    exchange (scalars + pooled cotangent over 'data' instead of
    per-occurrence [K,128] rows) must match the XLA path exactly for SGD
    on a dense-regime, dup-heavy config."""
    import dlrm_yx_tpu.optim.optimizer as om
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    base = DLRMConfig(
        emb_rows=(400, 500, 450, 520), ln_bot=(4, 8, 64),
        ln_top=(4 * 5 // 2 + 64, 8, 1), emb_split_threshold=0,
    )
    r = np.random.RandomState(17)
    t, b, l = 4, 16, 10  # K * 8 >> rows -> dense regime, heavy dups
    batches = [
        Batch(
            r.rand(b, 4).astype(np.float32),
            r.randint(0, 400, (t, b, l)).astype(np.int32),
            (r.rand(t, b, l) > 0.1).astype(np.float32),
            (r.rand(b, 1) > 0.5).astype(np.float32),
        )
        for _ in range(3)
    ]
    outs = {}
    # 'pallas' + SGD auto-routes the dense regime through the stream
    # kernel on hybrid too (same rule as the single-device router)
    for impl in ("xla", "stream", "pallas"):
        cfg = dataclasses.replace(base, sparse_update_impl=impl)
        runner = HybridRunner(cfg, OptConfig("sgd", 0.1), data=2, model=2,
                              seed=13)
        p, s = runner.params, runner.opt_state
        losses = []
        for i, bt in enumerate(batches):
            p, s, loss = runner.train_step(p, s, runner.prepare_batch(bt), i)
            losses.append(float(loss))
        outs[impl] = (losses, np.asarray(p["emb"]))
    for impl in ("stream", "pallas"):
        np.testing.assert_allclose(outs[impl][0], outs["xla"][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(outs[impl][1], outs["xla"][1],
                                   rtol=1e-4, atol=1e-5)
