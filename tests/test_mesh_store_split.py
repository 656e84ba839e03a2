"""Round-4 big/small store split on the row/col-sharded meshes: big tables
stay sharded (write-only-kernel eligible), small tables live in a replicated
TableGroup store updated identically on every shard. All paths must train
identically to the single-device step. Runs on 8 virtual CPU devices."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
from dlrm_yx_tpu.ops.embedding import unpack_store
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.parallel.col_sharded import (
    ColShardedRunner,
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
from dlrm_yx_tpu.parallel.row_sharded import (
    RowShardedRunner,
    extract_row_sharded_tables,
    init_row_sharded_opt_state,
    init_row_sharded_params,
    make_row_plan,
    make_row_sharded_eval_step,
    make_row_sharded_train_step,
    shard_row_batch,
    shard_row_params,
)
from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step


def mixed_cfg(dim=8, thr=100, impl="xla"):
    """3 big tables (>thr rows) interleaved with 3 small ones (<=thr)."""
    rows = (300, 24, 410, 16, 350, 40)
    t = len(rows)
    f = t + 1
    return DLRMConfig(
        emb_rows=rows,
        ln_bot=(4, 8, dim),
        ln_top=(f * (f - 1) // 2 + dim, 8, 1),
        emb_split_threshold=thr,
        sparse_update_impl=impl,
    )


def _batches(cfg, n=3, b=16, l=2, seed=5):
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0], mini_batch_size=b,
        num_batches=n, num_indices_per_lookup=l,
        num_indices_per_lookup_fixed=(l == 1), round_targets=True, seed=seed,
    )
    return make_random_batches(dc)


def _single_device_run(cfg, opt, batches, seed=33):
    p = init_dlrm(cfg, seed=seed)
    s = init_opt_state(opt, p, model_groups(cfg))
    step = make_train_step(cfg, opt)
    losses = []
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        losses.append(float(loss))
    per_table = {}
    for g, store in zip(model_groups(cfg), p["emb"]):
        arr = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = arr[off : off + n]
    return losses, per_table


def test_plan_split_classification():
    cfg = mixed_cfg(thr=100)
    rplan = make_row_plan(cfg, 2)
    assert rplan.big_ids == (0, 2, 4)
    assert rplan.small_group is not None
    assert rplan.small_group.table_ids == (1, 3, 5)
    assert not rplan.dups_in_big
    cplan = make_col_plan(cfg, 2)
    assert cplan.big_ids == (0, 2, 4)
    assert cplan.small_group.table_ids == (1, 3, 5)
    # disabled split keeps the unified space and the coalesce-first rule
    u = make_row_plan(dataclasses.replace(cfg, emb_split_threshold=0), 2)
    assert u.small_group is None and u.dups_in_big


@pytest.mark.parametrize("mode,optname,l", [
    ("row", "sgd", 2), ("row", "adagrad", 2), ("row", "rwsadagrad", 1),
    ("col", "sgd", 2), ("col", "adagrad", 1), ("col", "rwsadagrad", 2),
])
def test_split_matches_single_device(mode, optname, l):
    cfg = mixed_cfg(thr=100)
    opt = OptConfig(optname, 0.1)
    batches = _batches(cfg, n=3, b=16, l=l)
    losses1, tables1 = _single_device_run(cfg, opt, batches)

    mesh = make_mesh(2, 4 if mode == "row" else 2)
    model = mesh.shape["model"]
    if mode == "row":
        plan = make_row_plan(cfg, model)
        p = init_row_sharded_params(cfg, plan, seed=33)
        s = init_row_sharded_opt_state(opt, p, plan)
        p, s = shard_row_params(mesh, p, opt, s)
        step = make_row_sharded_train_step(cfg, plan, opt, mesh)
        shard_b = shard_row_batch
        extract = extract_row_sharded_tables
    else:
        plan = make_col_plan(cfg, model)
        p = init_col_sharded_params(cfg, plan, seed=33)
        s = init_col_sharded_opt_state(opt, p, plan)
        p, s = shard_col_params(mesh, p, opt, s)
        step = make_col_sharded_train_step(cfg, plan, opt, mesh)
        shard_b = shard_col_batch
        extract = extract_col_sharded_tables
    assert plan.small_group is not None
    losses2 = []
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, shard_b(mesh, Batch(*map(jnp.asarray, b))), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)
    got = extract(plan, np.asarray(p["emb"]), np.asarray(p["emb_small"]))
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(
            got[t], tables1[t], rtol=1e-5, atol=1e-6,
            err_msg=f"table {t} ({mode})",
        )


@pytest.mark.parametrize("mode", ["row", "col"])
def test_split_pallas_write_only_matches_xla(mode):
    """With sparse_update_impl='pallas', L=1 and big stores above the kernel
    gate, the big space takes the WRITE-ONLY kernel (interpret mode on CPU)
    and must match the xla impl exactly for SGD."""
    rows = (1 << 17, 30, (1 << 17) + 64, 12)
    t = len(rows)
    f = t + 1
    base = dict(
        emb_rows=rows, ln_bot=(4, 8, 128),
        ln_top=(f * (f - 1) // 2 + 128, 8, 1), emb_split_threshold=1000,
    )
    opt = OptConfig("sgd", 0.1)
    cfg_x = DLRMConfig(**base, sparse_update_impl="xla")
    cfg_p = DLRMConfig(**base, sparse_update_impl="pallas")
    batches = _batches(cfg_x, n=2, b=8, l=1, seed=7)
    mesh = make_mesh(1, 2)
    results = []
    for c in (cfg_x, cfg_p):
        if mode == "row":
            plan = make_row_plan(c, 2)
            p = init_row_sharded_params(c, plan, seed=11)
            s = init_row_sharded_opt_state(opt, p, plan)
            p, s = shard_row_params(mesh, p, opt, s)
            step = make_row_sharded_train_step(c, plan, opt, mesh)
            shard_b = shard_row_batch
            extract = extract_row_sharded_tables
        else:
            plan = make_col_plan(c, 2)
            p = init_col_sharded_params(c, plan, seed=11)
            s = init_col_sharded_opt_state(opt, p, plan)
            p, s = shard_col_params(mesh, p, opt, s)
            step = make_col_sharded_train_step(c, plan, opt, mesh)
            shard_b = shard_col_batch
            extract = extract_col_sharded_tables
        assert not plan.dups_in_big  # write-only path engages
        ls = []
        for it, b in enumerate(batches):
            p, s, loss = step(
                p, s, shard_b(mesh, Batch(*map(jnp.asarray, b))), it
            )
            ls.append(float(loss))
        results.append(
            (ls, extract(plan, np.asarray(p["emb"]), np.asarray(p["emb_small"])))
        )
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5, atol=1e-6)
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,wmode", [
    ("row", "fixed"), ("row", "learned"), ("col", "learned"),
])
def test_split_weighted_pooling_matches_single_device(mode, wmode):
    cfg = dataclasses.replace(mixed_cfg(thr=100), weighted_pooling=wmode)
    opt = OptConfig("rwsadagrad", 0.1)
    batches = _batches(cfg, n=2, b=16, l=2, seed=9)
    losses1, tables1 = _single_device_run(cfg, opt, batches)
    runner = (RowShardedRunner if mode == "row" else ColShardedRunner)(
        cfg, opt, data=2, model=2, seed=33
    )
    assert runner.plan.small_group is not None
    p, s = runner.params, runner.opt_state
    losses2 = []
    for it, b in enumerate(batches):
        p, s, loss = runner.train_step(p, s, runner.prepare_batch(b), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,optname", [
    ("row", "rwsadagrad"), ("col", "sgd"),
])
def test_split_grad_accum_matches_single_device(mode, optname):
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    cfg = mixed_cfg(thr=100)
    opt = OptConfig(optname, 0.1)
    n_accum = 2
    batches = _batches(cfg, n=4, b=16, l=2, seed=21)

    p1 = init_dlrm(cfg, seed=33)
    s1 = init_opt_state(opt, p1, model_groups(cfg))
    astep = make_accum_train_step(cfg, opt, n_accum)
    losses1 = []
    for it in range(2):
        group = batches[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p1, s1, loss = astep(p1, s1, stacked, it)
        losses1.append(float(loss))

    runner = (RowShardedRunner if mode == "row" else ColShardedRunner)(
        cfg, opt, data=2, model=2, seed=33, n_accum=n_accum
    )
    assert runner.plan.small_group is not None
    p2, s2 = runner.params, runner.opt_state
    losses2 = []
    for it in range(2):
        group = batches[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            np.stack([np.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p2, s2, loss = runner.train_step(
            p2, s2, runner.prepare_batch(stacked), it
        )
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["row", "col"])
def test_split_eval_matches_single(mode):
    cfg = mixed_cfg(thr=100)
    batches = _batches(cfg, n=2, b=16, l=2, seed=3)
    p1 = init_dlrm(cfg, seed=33)
    ev1 = make_eval_step(cfg)
    mesh = make_mesh(2, 2)
    if mode == "row":
        plan = make_row_plan(cfg, 2)
        p2 = init_row_sharded_params(cfg, plan, seed=33)
        s2 = init_row_sharded_opt_state(OptConfig("sgd"), p2, plan)
        p2, _ = shard_row_params(mesh, p2, OptConfig("sgd"), s2)
        ev2 = make_row_sharded_eval_step(cfg, plan, mesh)
        shard_b = shard_row_batch
    else:
        plan = make_col_plan(cfg, 2)
        p2 = init_col_sharded_params(cfg, plan, seed=33)
        s2 = init_col_sharded_opt_state(OptConfig("sgd"), p2, plan)
        p2, _ = shard_col_params(mesh, p2, OptConfig("sgd"), s2)
        ev2 = make_col_sharded_eval_step(cfg, plan, mesh)
        shard_b = shard_col_batch
    for b in batches:
        preds1, loss1 = ev1(p1, Batch(*map(jnp.asarray, b)))
        preds2, loss2 = ev2(p2, shard_b(mesh, Batch(*map(jnp.asarray, b))))
        np.testing.assert_allclose(
            np.asarray(preds1), np.asarray(preds2), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
