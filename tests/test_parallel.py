"""Hybrid-parallel correctness: N-device shard_map training must reproduce
the single-device path bit-for-bit-ish (the reference's N=1 vs N=2 loss-curve
comparability contract, SURVEY.md §7 stage 5). Runs on 8 virtual CPU
devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
from dlrm_yx_tpu.models.dlrm import init_dlrm
from dlrm_yx_tpu.ops.embedding import build_table_groups, unpack_store
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.parallel.mesh import make_mesh
from dlrm_yx_tpu.parallel.plan import (
    arrange_sparse_inputs,
    build_sharded_emb,
    extract_tables,
    make_plan,
)
from dlrm_yx_tpu.parallel.sharders import get_splits, shard
from dlrm_yx_tpu.parallel.hybrid import (
    init_hybrid_opt_state,
    init_hybrid_params,
    make_hybrid_eval_step,
    make_hybrid_train_step,
    shard_batch,
    shard_params,
)
from dlrm_yx_tpu.train.train_step import make_train_step


# ------------------------------ sharders ------------------------------------

def test_sharder_naive():
    assert shard([10] * 5, 2, "naive") == [0, 1, 0, 1, 0]


def test_sharder_naive_chunk():
    assert shard([10] * 5, 2, "naive_chunk") == [0, 0, 0, 1, 1]
    assert get_splits(5, 2) == [3, 2]


def test_sharder_greedy_balances_rows():
    rows = [100, 1, 1, 1, 99, 1]
    placement = shard(rows, 2, "greedy")
    load = [0, 0]
    for r, d in zip(rows, placement):
        load[d] += r
    assert abs(load[0] - load[1]) <= 100  # greedy keeps buckets near-even
    assert placement[0] != placement[4]  # the two big tables split


def test_sharder_input():
    alloc = [1, 0, 1]
    assert shard([5, 5, 5], 2, "input", allocation=alloc) == alloc
    with pytest.raises(ValueError):
        shard([5, 5], 2, "input", allocation=[0, 7])


# ------------------------------ plan ----------------------------------------

def make_cfg(t=6, rows=50, dim=4):
    ln_bot = (4, 8, dim)
    f = t + 1
    ln_top = (f * (f - 1) // 2 + dim, 8, 1)
    return DLRMConfig(
        emb_rows=tuple(rows + i for i in range(t)), ln_bot=ln_bot, ln_top=ln_top
    )


def test_plan_roundtrip():
    cfg = make_cfg()
    plan = make_plan(cfg, n_model=4, alg="naive")
    rng = np.random.RandomState(0)
    tables = [rng.randn(n, cfg.base_dim).astype(np.float32) for n in cfg.emb_rows]
    emb_big, emb_small = build_sharded_emb(plan, cfg, tables)
    back = extract_tables(plan, cfg, emb_big, emb_small)
    for a, b in zip(tables, back):
        np.testing.assert_array_equal(a, b)


def test_arrange_sparse_inputs():
    cfg = make_cfg(t=3)
    plan = make_plan(cfg, n_model=2, alg="naive")  # dev0: t0,t2; dev1: t1
    idx = np.arange(3 * 2 * 1, dtype=np.int32).reshape(3, 2, 1)
    w = np.ones_like(idx, dtype=np.float32)
    ai, aw = arrange_sparse_inputs(plan, idx, w)
    assert ai.shape == (2 * plan.t_pad, 2, 1)
    order = plan.device_table_order
    for pos, t in enumerate(order):
        if t >= 0:
            np.testing.assert_array_equal(ai[pos], idx[t])
        else:
            assert np.all(aw[pos] == 0)


# ------------------------------ hybrid vs single-device ----------------------

def _make_batches(cfg, n_batches=3, b=8, l=2, seed=11):
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0], mini_batch_size=b,
        num_batches=n_batches, num_indices_per_lookup=l,
        num_indices_per_lookup_fixed=False, round_targets=True, seed=seed,
    )
    return make_random_batches(dc)


@pytest.mark.parametrize("mesh_shape,optname", [
    ((1, 4), "sgd"),
    ((2, 2), "sgd"),
    ((2, 4), "rwsadagrad"),
    ((4, 1), "adagrad"),
    ((1, 8), "rwsadagrad"),
])
def test_hybrid_matches_single_device(mesh_shape, optname):
    data, model = mesh_shape
    if data * model > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = make_cfg(t=5, rows=40, dim=4)
    opt = OptConfig(name=optname, lr=0.1)
    seed = 77
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=13)

    # single-device run
    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    s1 = init_opt_state(opt, params1, groups)
    losses1 = []
    p1 = params1
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    # hybrid run
    mesh = make_mesh(data, model)
    plan = make_plan(cfg, n_model=model, alg="greedy")
    params2 = init_hybrid_params(cfg, plan, seed=seed)
    s2 = init_hybrid_opt_state(opt, params2, plan)
    params2, s2 = shard_params(mesh, params2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    p2 = params2
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        sb = shard_batch(mesh, Batch(b.dense, ai, aw, b.labels))
        p2, s2, loss = step2(p2, s2, sb, it)
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    # final tables match canonical single-device tables
    got = extract_tables(
        plan, cfg, np.asarray(p2["emb"]), np.asarray(p2["emb_small"])
    )
    per_table = {}
    for g, store in zip(groups, p1["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(got[t], per_table[t], rtol=1e-5, atol=1e-6)


def test_hybrid_eval_matches_single():
    cfg = make_cfg(t=5, rows=40, dim=4)
    seed = 3
    batches = _make_batches(cfg, n_batches=1, b=8, l=2, seed=21)
    params1 = init_dlrm(cfg, seed=seed)
    from dlrm_yx_tpu.train.train_step import make_eval_step

    ev1 = make_eval_step(cfg)
    preds1, loss1 = ev1(params1, Batch(*map(jnp.asarray, batches[0])))

    mesh = make_mesh(2, 4)
    plan = make_plan(cfg, n_model=4, alg="naive")
    params2 = init_hybrid_params(cfg, plan, seed=seed)
    params2, _ = shard_params(mesh, params2, OptConfig("sgd", 0.1), {})
    ev2 = make_hybrid_eval_step(cfg, plan, mesh)
    b = batches[0]
    ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
    preds2, loss2 = ev2(params2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)))
    np.testing.assert_allclose(np.asarray(preds1), np.asarray(preds2), rtol=1e-5, atol=1e-6)
    assert abs(float(loss1) - float(loss2)) < 1e-6


def test_hybrid_wide_table_slots():
    """Tables with dim k*D (split trick) through the hybrid path."""
    d = 4
    t = 3
    # every table dim 2*D -> 2 slots each, S = 6, F = 7
    f = t * 2 + 1
    cfg = DLRMConfig(
        emb_rows=(30, 20, 10),
        emb_dims=(8, 8, 8),
        ln_bot=(4, 8, d),
        ln_top=(f * (f - 1) // 2 + d, 8, 1),
    )
    batches = _make_batches(cfg, n_batches=2, b=8, l=1, seed=5)
    opt = OptConfig("sgd", 0.1)
    params1 = init_dlrm(cfg, seed=9)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_opt_state(opt, params1, groups)
    l1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        l1.append(float(loss))

    mesh = make_mesh(1, 2)
    plan = make_plan(cfg, n_model=2, alg="naive")
    p2 = init_hybrid_params(cfg, plan, seed=9)
    p2, s2 = shard_params(mesh, p2, opt, {})
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    l2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it)
        l2.append(float(loss))
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)


def test_hybrid_with_pallas_sparse_update():
    """Hybrid step with sparse_update_impl='pallas': shard stores above the
    kernel size gate must train identically to the xla impl (kernel runs in
    interpret mode on the CPU mesh)."""
    import dataclasses

    # one big table per shard so each [r_pad, 128] store crosses 64 MB
    cfg = DLRMConfig(
        emb_rows=(1 << 17, (1 << 17) + 8, 300, 40),
        ln_bot=(4, 8, 128),
        ln_top=(5 * 4 // 2 + 128, 8, 1),
    )
    cfg_p = dataclasses.replace(cfg, sparse_update_impl="pallas")
    opt = OptConfig("sgd", 0.1)
    batches = _make_batches(cfg, n_batches=2, b=8, l=1, seed=3)
    mesh = make_mesh(1, 2)
    results = []
    for c in (cfg, cfg_p):
        plan = make_plan(c, n_model=2, alg="greedy")
        p = init_hybrid_params(c, plan, seed=11)
        p, s = shard_params(mesh, p, opt, {})
        step = make_hybrid_train_step(c, plan, opt, mesh)
        ls = []
        for it, b in enumerate(batches):
            ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
            p, s, loss = step(p, s, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it)
            ls.append(float(loss))
        results.append((ls, np.asarray(p["emb"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        results[0][1][:, :-8], results[1][1][:, :-8], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("op,optname", [("mult", "sgd"), ("add", "rwsadagrad"),
                                        ("mult", "adagrad")])
def test_hybrid_qr_matches_single_device(op, optname):
    """QR-compressed tables through the hybrid path: quotient stores sharded,
    remainder stores replicated, combine-before-pool — must match the
    single-device QR path (BASELINE config 5)."""
    cfg = DLRMConfig(
        emb_rows=(500, 300, 40, 700),  # 500/300/700 > qr_threshold -> QR
        ln_bot=(4, 8, 4),
        ln_top=(5 * 4 // 2 + 4, 8, 1),
        qr_flag=True, qr_threshold=200, qr_collisions=4, qr_operation=op,
    )
    opt = OptConfig(optname, 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=19)

    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s
    params1 = init_dlrm(cfg, seed=5)
    from dlrm_yx_tpu.models.dlrm import model_groups
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_s(opt, params1, model_groups(cfg))
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(2, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    assert plan.qr_r_rows > 0
    p2 = init_hybrid_params(cfg, plan, seed=5)
    s2 = init_hybrid_opt_state(opt, p2, plan)
    p2, s2 = shard_params(mesh, p2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    # eval parity too
    from dlrm_yx_tpu.train.train_step import make_eval_step
    ev1 = make_eval_step(cfg)
    preds1, _ = ev1(p1, Batch(*map(jnp.asarray, batches[0])))
    ev2 = make_hybrid_eval_step(cfg, plan, mesh)
    b = batches[0]
    ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
    preds2, _ = ev2(p2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)))
    np.testing.assert_allclose(np.asarray(preds1), np.asarray(preds2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("optname", ["sgd", "rwsadagrad"])
def test_hybrid_qr_concat_matches_single_device(optname):
    """QR 'concat' through the hybrid path: each QR table expands into
    (quotient, remainder) pseudo-tables — plain sharded lookups with a
    per-slot index transform, no combine and no replicated remainder store
    (QREmbeddingBag concat semantics) — and must match the single-device
    concat path."""
    # 3 QR tables -> slots = 1 plain + 3*2 = 7, F = 8
    f = 8
    cfg = DLRMConfig(
        emb_rows=(500, 300, 40, 700),
        ln_bot=(4, 8, 4),
        ln_top=(f * (f - 1) // 2 + 4, 8, 1),
        qr_flag=True, qr_threshold=200, qr_collisions=4,
        qr_operation="concat",
    )
    opt = OptConfig(optname, 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=19)

    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s

    params1 = init_dlrm(cfg, seed=5)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_s(opt, params1, model_groups(cfg))
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(2, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    assert plan.qr_r_rows == 0 and any(plan.pseudo_xform)
    assert len(plan.pseudo_table) == 7  # 1 plain + 3 x (q, r)
    p2 = init_hybrid_params(cfg, plan, seed=5)
    s2 = init_hybrid_opt_state(opt, p2, plan)
    p2, s2 = shard_params(mesh, p2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(
            p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it
        )
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    # eval parity too
    from dlrm_yx_tpu.parallel.hybrid import make_hybrid_eval_step as mkev
    from dlrm_yx_tpu.train.train_step import make_eval_step

    ev1 = make_eval_step(cfg)
    preds1, _ = ev1(p1, Batch(*map(jnp.asarray, batches[0])))
    ev2 = mkev(cfg, plan, mesh)
    b = batches[0]
    ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
    preds2, _ = ev2(p2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)))
    np.testing.assert_allclose(
        np.asarray(preds1), np.asarray(preds2), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("optname", ["sgd", "rwsadagrad"])
def test_hybrid_md_matches_single_device(optname):
    """Mixed-dimension tables through the hybrid path: zero-padded columns
    in the shard store, slice + PrEmbeddingBag up-projection after the
    exchange — must match the single-device MD path (BASELINE config 5)."""
    from dlrm_yx_tpu.ops.md_embedding import md_solver

    rows = (800, 50, 600, 40)
    dims = tuple(
        int(x) for x in md_solver(np.array(rows), 0.3, d0=8, round_dim=True)
    )
    assert len(set(dims)) > 1  # genuinely mixed
    cfg = DLRMConfig(
        emb_rows=rows, emb_dims=dims, ln_bot=(4, 8, 8),
        ln_top=(5 * 4 // 2 + 8, 8, 1), md_flag=True, md_threshold=200,
    )
    assert cfg.md_table_ids  # big tables got smaller dims
    opt = OptConfig(optname, 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=23)

    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s

    params1 = init_dlrm(cfg, seed=6)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_s(opt, params1, model_groups(cfg))
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(2, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    p2 = init_hybrid_params(cfg, plan, seed=6)
    s2 = init_hybrid_opt_state(opt, p2, plan)
    p2, s2 = shard_params(mesh, p2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pooling,optname", [
    ("fixed", "sgd"), ("learned", "sgd"), ("learned", "rwsadagrad"),
    ("fixed", "adagrad"),  # regression: fixed-mode vw state specs
])
def test_hybrid_weighted_pooling_matches_single_device(pooling, optname):
    """v_W per-row pooling weights (fixed and learned) through the hybrid
    path (dlrm_s_pytorch.py:308-316,545-548)."""
    cfg = DLRMConfig(
        emb_rows=(60, 40, 90), ln_bot=(4, 8, 4),
        ln_top=(4 * 3 // 2 + 4, 8, 1), weighted_pooling=pooling,
    )
    opt = OptConfig(optname, 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=31)

    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s

    p1 = init_dlrm(cfg, seed=4)
    step1 = make_train_step(cfg, opt)
    s1 = init_s(opt, p1, model_groups(cfg))
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(2, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    p2 = init_hybrid_params(cfg, plan, seed=4)
    s2 = init_hybrid_opt_state(opt, p2, plan)
    p2, s2 = shard_params(mesh, p2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mesh_shape,optname", [
    ((2, 2), "sgd"),
    ((1, 4), "rwsadagrad"),
])
def test_hybrid_grad_accum_matches_single_device(mesh_shape, optname):
    """--mlperf-grad-accum-iter on the hybrid mesh: the scan-accumulated
    step must match the single-device accumulation step (same summed dense
    grads, one coalesced sparse update; dlrm_s_pytorch.py:1925-1932)."""
    from dlrm_yx_tpu.parallel.hybrid import make_hybrid_accum_train_step
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    data, model = mesh_shape
    if data * model > len(jax.devices()):
        pytest.skip("not enough devices")
    n_accum = 2
    cfg = make_cfg(t=4, rows=40, dim=8)
    opt = OptConfig(name=optname, lr=0.1)
    seed = 5
    micros = _make_batches(cfg, n_batches=4, b=8, l=2, seed=21)

    # single-device accumulation reference
    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    from dlrm_yx_tpu.optim.optimizer import init_opt_state

    s1 = init_opt_state(opt, params1, groups)
    step1 = make_accum_train_step(cfg, opt, n_accum)
    losses1 = []
    p1 = params1
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p1, s1, loss = step1(p1, s1, stacked, it)
        losses1.append(float(loss))

    # hybrid accumulation
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    r = HybridRunner(cfg, opt, data=data, model=model, seed=seed,
                     n_accum=n_accum, sharder="naive")
    p2, s2 = r.params, r.opt_state
    losses2 = []
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            np.stack([np.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        sb = r.prepare_batch(stacked)
        p2, s2, loss = r.train_step(p2, s2, sb, it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    got = extract_tables(
        r.plan, cfg, np.asarray(p2["emb"]), np.asarray(p2["emb_small"])
    )
    per_table = {}
    for g, store in zip(groups, p1["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    for t in range(cfg.num_tables):
        # contributions concatenate in device-major (not canonical) order,
        # so scatter fp-rounding differs by ~ulp; adagrad-family
        # normalization (g / sqrt(sum g^2)) amplifies that on rows whose
        # accumulator is still tiny — hence the looser tolerance here
        np.testing.assert_allclose(got[t], per_table[t], rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("optname", ["sgd", "rwsadagrad"])
def test_hybrid_mixed_kd_dims_matches_single_device(optname):
    """Arbitrary k*D dim mixes through the hybrid path (the reference's
    split trick composes with every mode, dlrm_s_pytorch.py:579-585):
    narrow tables' rows are zero-padded to the max slot dim, pooled
    outputs sliced back per table after the exchange."""
    d = 4
    # dims 8, 4, 8, 4 -> k = (2, 1, 2, 1), slots S = 6, F = 7
    f = 7
    cfg = DLRMConfig(
        emb_rows=(30, 20, 10, 40),
        emb_dims=(8, 4, 8, 4),
        ln_bot=(4, 8, d),
        ln_top=(f * (f - 1) // 2 + d, 8, 1),
    )
    opt = OptConfig(optname, 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=23)

    from dlrm_yx_tpu.models.dlrm import model_groups

    params1 = init_dlrm(cfg, seed=9)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_opt_state(opt, params1, model_groups(cfg))
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(2, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    assert plan.dim == 8
    p2 = init_hybrid_params(cfg, plan, seed=9)
    s2 = init_hybrid_opt_state(opt, p2, plan)
    p2, s2 = shard_params(mesh, p2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        p2, s2, loss = step2(
            p2, s2, shard_batch(mesh, Batch(b.dense, ai, aw, b.labels)), it
        )
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


def test_hybrid_accum_exact_momentum_matches_xla(monkeypatch):
    """--exact-row-momentum must hold under --mlperf-grad-accum-iter on the
    hybrid path too: pallas+exact_momentum momenta == exact XLA momenta on
    duplicate-heavy accumulated batches (grad.coalesce() semantics,
    /root/reference/optim/rwsadagrad.py:98)."""
    import dataclasses

    import dlrm_yx_tpu.optim.optimizer as om
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    monkeypatch.setattr(om, "PALLAS_MIN_STORE_BYTES", 0)
    n_accum = 2
    # big tables (so density routing keeps the kernel path: K << R) with
    # indices clamped to a few rows (so duplicates are plentiful and
    # per-occurrence momentum would diverge)
    # dim=128 (pack=1) keeps PHYSICAL rows (the density denominator) high
    base = make_cfg(t=4, rows=1500, dim=128)
    micros = [
        b._replace(indices=np.asarray(b.indices) % 8)
        for b in _make_batches(base, n_batches=4, b=8, l=4, seed=31)
    ]
    results = {}
    for impl in ("xla", "pallas"):
        cfg = dataclasses.replace(
            base, sparse_update_impl=impl, exact_row_momentum=True,
            emb_split_threshold=0,  # all tables on the kernel-eligible store
        )
        opt = OptConfig("rwsadagrad", 0.1)
        r = HybridRunner(cfg, opt, data=2, model=2, seed=7, n_accum=n_accum,
                         sharder="naive")
        p, s = r.params, r.opt_state
        for it in range(2):
            group = micros[it * n_accum : (it + 1) * n_accum]
            stacked = Batch(*[
                np.stack([np.asarray(getattr(b, f)) for b in group])
                for f in Batch._fields
            ])
            p, s, _ = r.train_step(p, s, r.prepare_batch(stacked), it)
        results[impl] = (np.asarray(p["emb"]), np.asarray(s["emb"]))
    np.testing.assert_allclose(
        results["pallas"][1], results["xla"][1], rtol=1e-5, atol=1e-6,
        err_msg="momenta diverge: exact_momentum dropped on the accum path",
    )
    np.testing.assert_allclose(
        results["pallas"][0], results["xla"][0], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("pooling,optname", [
    ("fixed", "sgd"), ("learned", "sgd"), ("learned", "rwsadagrad"),
])
def test_hybrid_grad_accum_weighted_pooling(pooling, optname):
    """--mlperf-grad-accum-iter composes with v_W weighted pooling on the
    hybrid mesh: matches the single-device accumulation step, and learned
    v_W actually trains (it was silently frozen before round 3)."""
    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    n_accum = 2
    cfg = DLRMConfig(
        emb_rows=(60, 40, 90), ln_bot=(4, 8, 4),
        ln_top=(4 * 3 // 2 + 4, 8, 1), weighted_pooling=pooling,
    )
    opt = OptConfig(optname, 0.1)
    seed = 4
    micros = _make_batches(cfg, n_batches=4, b=8, l=2, seed=31)

    p1 = init_dlrm(cfg, seed=seed)
    vw_before = [np.asarray(v).copy() for v in p1["vw"]]
    s1 = init_s(opt, p1, model_groups(cfg))
    step1 = make_accum_train_step(cfg, opt, n_accum)
    losses1 = []
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p1, s1, loss = step1(p1, s1, stacked, it)
        losses1.append(float(loss))
    if pooling == "learned":
        # v_W moved away from its ones-init (it trains under accumulation)
        delta = max(
            float(np.abs(np.asarray(v) - v0).max())
            for v, v0 in zip(p1["vw"], vw_before)
        )
        assert delta > 1e-6, "learned v_W did not train under accumulation"

    r = HybridRunner(cfg, opt, data=2, model=2, seed=seed,
                     n_accum=n_accum, sharder="naive")
    p2, s2 = r.params, r.opt_state
    losses2 = []
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            np.stack([np.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        sb = r.prepare_batch(stacked)
        p2, s2, loss = r.train_step(p2, s2, sb, it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("op,optname", [
    ("mult", "sgd"), ("add", "rwsadagrad"),
    ("mult", "adagrad"), ("concat", "sgd"),
])
def test_hybrid_grad_accum_qr(op, optname):
    """--mlperf-grad-accum-iter composes with QR tables on the hybrid mesh
    (quotient sharded / remainder replicated for mult-add; pseudo-table
    slots for concat): matches the single-device accumulation step."""
    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    n_accum = 2
    # 500/300/700 QR (3 tables, 2 slots each under concat) + 1 regular + dense
    f = (3 * (2 if op == "concat" else 1)) + 1 + 1
    cfg = DLRMConfig(
        emb_rows=(500, 300, 40, 700),
        ln_bot=(4, 8, 4),
        ln_top=(f * (f - 1) // 2 + 4, 8, 1),
        qr_flag=True, qr_threshold=200, qr_collisions=4, qr_operation=op,
    )
    opt = OptConfig(optname, 0.1)
    seed = 5
    micros = _make_batches(cfg, n_batches=4, b=8, l=2, seed=19)

    params1 = init_dlrm(cfg, seed=seed)
    s1 = init_s(opt, params1, model_groups(cfg))
    step1 = make_accum_train_step(cfg, opt, n_accum)
    losses1, p1 = [], params1
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f_)) for b in group])
            for f_ in Batch._fields
        ])
        p1, s1, loss = step1(p1, s1, stacked, it)
        losses1.append(float(loss))

    r = HybridRunner(cfg, opt, data=2, model=2, seed=seed,
                     n_accum=n_accum, sharder="naive")
    p2, s2 = r.params, r.opt_state
    losses2 = []
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            np.stack([np.asarray(getattr(b, f_)) for b in group])
            for f_ in Batch._fields
        ])
        sb = r.prepare_batch(stacked)
        p2, s2, loss = r.train_step(p2, s2, sb, it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


def test_hybrid_qr_with_fixed_weighted_pooling():
    """fixed v_W (identity ones) composes with QR tables on the hybrid
    mesh — matches the single-device path (the reference passes
    per_sample_weights into QREmbeddingBag, dlrm_s_pytorch.py:545-548)."""
    import dataclasses

    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.optim.optimizer import init_opt_state as init_s
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    cfg = DLRMConfig(
        emb_rows=(500, 300, 40, 700),
        ln_bot=(4, 8, 4),
        ln_top=(5 * 4 // 2 + 4, 8, 1),
        qr_flag=True, qr_threshold=200, qr_collisions=4, qr_operation="mult",
        weighted_pooling="fixed",
    )
    opt = OptConfig("rwsadagrad", 0.1)
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=19)
    p1 = init_dlrm(cfg, seed=5)
    s1 = init_s(opt, p1, model_groups(cfg))
    step1 = make_train_step(cfg, opt)
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    r = HybridRunner(cfg, opt, data=2, model=2, seed=5, sharder="naive")
    p2, s2 = r.params, r.opt_state
    losses2 = []
    for it, b in enumerate(batches):
        p2, s2, loss = r.train_step(p2, s2, r.prepare_batch(b), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)
