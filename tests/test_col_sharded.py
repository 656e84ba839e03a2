"""Column-sharded embedding correctness (parallel/col_sharded.py): D/n_model
column slices per shard must train identically to the single-device path.
Runs on 8 virtual CPU devices."""

import dataclasses
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
from dlrm_yx_tpu.parallel.col_sharded import (
    build_col_sharded_emb,
    extract_col_sharded_tables,
    init_col_sharded_opt_state,
    init_col_sharded_params,
    make_col_plan,
    make_col_sharded_eval_step,
    make_col_sharded_train_step,
    shard_col_batch,
    shard_col_params,
)
from dlrm_yx_tpu.parallel.mesh import make_mesh
from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step


def make_cfg(t=4, rows=40, dim=8):
    ln_bot = (4, 8, dim)
    f = t + 1
    ln_top = (f * (f - 1) // 2 + dim, 8, 1)
    return DLRMConfig(
        emb_rows=tuple(rows + 8 * i for i in range(t)), ln_bot=ln_bot, ln_top=ln_top
    )


def _make_batches(cfg, n_batches=3, b=8, l=2, seed=11):
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0], mini_batch_size=b,
        num_batches=n_batches, num_indices_per_lookup=l,
        num_indices_per_lookup_fixed=False, round_targets=True, seed=seed,
    )
    return make_random_batches(dc)


def test_col_plan_rejects_indivisible_dim():
    cfg = make_cfg(dim=8)
    with pytest.raises(ValueError):
        make_col_plan(cfg, n_model=3)


def test_col_sharded_emb_roundtrip():
    cfg = make_cfg(t=3, rows=50, dim=8)
    plan = make_col_plan(cfg, n_model=4)
    rng = np.random.RandomState(0)
    tables = [rng.randn(n, 8).astype(np.float32) for n in cfg.emb_rows]
    emb = build_col_sharded_emb(plan, tables)
    # d_local=2 column slices live packed 64 logical rows / [*,128] row
    assert plan.pack == 64
    assert emb.shape == (4, plan.store_rows, 128)
    back = extract_col_sharded_tables(plan, emb)
    for a, b in zip(tables, back):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mesh_shape,optname", [
    ((1, 4), "sgd"),
    ((2, 2), "sgd"),
    ((2, 4), "rwsadagrad"),
    ((1, 8), "adagrad"),
])
def test_col_sharded_matches_single_device(mesh_shape, optname):
    data, model = mesh_shape
    if data * model > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = make_cfg(t=4, rows=40, dim=8)
    opt = OptConfig(name=optname, lr=0.1)
    seed = 77
    batches = _make_batches(cfg, n_batches=3, b=16, l=2, seed=13)

    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_opt_state(opt, params1, groups)
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(data, model)
    plan = make_col_plan(cfg, n_model=model)
    p2 = init_col_sharded_params(cfg, plan, seed=seed)
    s2 = init_col_sharded_opt_state(opt, p2, plan)
    p2, s2 = shard_col_params(mesh, p2, opt, s2)
    step2 = make_col_sharded_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        sb = shard_col_batch(mesh, Batch(*map(jnp.asarray, b)))
        p2, s2, loss = step2(p2, s2, sb, it)
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    got = extract_col_sharded_tables(plan, np.asarray(p2["emb"]))
    per_table = {}
    for g, store in zip(groups, p1["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(got[t], per_table[t], rtol=1e-5, atol=1e-6)


def test_col_sharded_eval_matches_single():
    cfg = make_cfg(t=4, rows=40, dim=8)
    seed = 3
    batches = _make_batches(cfg, n_batches=1, b=16, l=2, seed=21)
    params1 = init_dlrm(cfg, seed=seed)
    ev1 = make_eval_step(cfg)
    preds1, loss1 = ev1(params1, Batch(*map(jnp.asarray, batches[0])))

    mesh = make_mesh(2, 4)
    plan = make_col_plan(cfg, n_model=4)
    p2 = init_col_sharded_params(cfg, plan, seed=seed)
    p2, _ = shard_col_params(mesh, p2, OptConfig("sgd", 0.1), {})
    ev2 = make_col_sharded_eval_step(cfg, plan, mesh)
    preds2, loss2 = ev2(
        p2, shard_col_batch(mesh, Batch(*map(jnp.asarray, batches[0])))
    )
    np.testing.assert_allclose(
        np.asarray(preds1), np.asarray(preds2), rtol=1e-5, atol=1e-6
    )
    assert abs(float(loss1) - float(loss2)) < 1e-6


@pytest.mark.parametrize("mesh_shape,optname", [
    ((2, 2), "sgd"),
    ((1, 4), "rwsadagrad"),
    ((2, 4), "adagrad"),
])
def test_col_sharded_kernel_update_matches_single(
    mesh_shape, optname, monkeypatch
):
    """The pallas row-RMW routing on the column-store update (round 3:
    replaces XLA's ~3.8 ms full-store rewrite at bench shapes) is
    loss- and table-identical to the single-device step. The store-size
    gate is lowered so test-sized stores take the kernel path."""
    import dlrm_yx_tpu.optim.optimizer as opt_mod

    monkeypatch.setattr(opt_mod, "PALLAS_MIN_STORE_BYTES", 0)
    data, model = mesh_shape
    if data * model > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = dataclasses.replace(
        make_cfg(t=4, rows=40, dim=8), sparse_update_impl="pallas"
    )
    opt = OptConfig(name=optname, lr=0.1)
    seed = 5
    batches = _make_batches(cfg, n_batches=3, b=16, l=2, seed=29)

    # single-device oracle on the exact XLA path (no kernel heuristics)
    cfg1 = dataclasses.replace(cfg, sparse_update_impl="xla")
    params1 = init_dlrm(cfg1, seed=seed)
    groups = build_table_groups(cfg1.emb_rows, cfg1.emb_dims)
    step1 = make_train_step(cfg1, opt)
    p1, s1 = params1, init_opt_state(opt, params1, groups)
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(data, model)
    plan = make_col_plan(cfg, n_model=model)
    p2 = init_col_sharded_params(cfg, plan, seed=seed)
    s2 = init_col_sharded_opt_state(opt, p2, plan)
    p2, s2 = shard_col_params(mesh, p2, opt, s2)
    step2 = make_col_sharded_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        sb = shard_col_batch(mesh, Batch(*map(jnp.asarray, b)))
        p2, s2, loss = step2(p2, s2, sb, it)
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)
    got = extract_col_sharded_tables(plan, np.asarray(p2["emb"]))
    per_table = {}
    for g, store in zip(groups, p1["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            got[t], per_table[t], rtol=1e-5, atol=1e-6
        )
