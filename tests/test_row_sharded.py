"""Row-sharded embedding correctness (parallel/row_sharded.py): tables whose
rows span multiple model shards must train identically to the single-device
path. This is the north-star extension over the reference's whole-table
placement (SURVEY.md §5 'no row-wise sharding of a single table exists in the
reference'; §7 stage 8). Runs on 8 virtual CPU devices."""

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
from dlrm_yx_tpu.parallel.row_sharded import (
    build_row_sharded_emb,
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


def make_cfg(t=4, rows=40, dim=4):
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


def test_row_plan_spans_shards():
    """With 4 shards and one huge table, the table must span shards."""
    cfg = make_cfg(t=2, rows=400, dim=4)
    plan = make_row_plan(cfg, n_model=4)
    # table 0 (400+ rows) is bigger than one shard's slice
    assert cfg.emb_rows[0] > plan.rows_local or cfg.emb_rows[1] > plan.rows_local


def test_row_sharded_emb_roundtrip():
    cfg = make_cfg(t=3, rows=50, dim=4)
    plan = make_row_plan(cfg, n_model=4)
    rng = np.random.RandomState(0)
    tables = [rng.randn(n, 4).astype(np.float32) for n in cfg.emb_rows]
    emb = build_row_sharded_emb(plan, tables)
    # dim 4 divides 128 -> stores pack 32 logical rows per physical row
    assert plan.pack == 32
    assert emb.shape == (4,) + plan.store_shape
    back = extract_row_sharded_tables(plan, emb)
    for a, b in zip(tables, back):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mesh_shape,optname", [
    ((1, 4), "sgd"),
    ((2, 2), "sgd"),
    ((2, 4), "rwsadagrad"),
    ((1, 8), "adagrad"),
])
def test_row_sharded_matches_single_device(mesh_shape, optname):
    data, model = mesh_shape
    if data * model > len(jax.devices()):
        pytest.skip("not enough devices")
    # rows chosen so every table straddles at least one shard boundary
    cfg = make_cfg(t=4, rows=40, dim=4)
    opt = OptConfig(name=optname, lr=0.1)
    seed = 77
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=13)

    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_opt_state(opt, params1, groups)
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    mesh = make_mesh(data, model)
    plan = make_row_plan(cfg, n_model=model)
    p2 = init_row_sharded_params(cfg, plan, seed=seed)
    s2 = init_row_sharded_opt_state(opt, p2, plan)
    p2, s2 = shard_row_params(mesh, p2, opt, s2)
    step2 = make_row_sharded_train_step(cfg, plan, opt, mesh)
    losses2 = []
    for it, b in enumerate(batches):
        sb = shard_row_batch(mesh, Batch(*map(jnp.asarray, b)))
        p2, s2, loss = step2(p2, s2, sb, it)
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    got = extract_row_sharded_tables(plan, np.asarray(p2["emb"]))
    per_table = {}
    for g, store in zip(groups, p1["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    for t in range(cfg.num_tables):
        np.testing.assert_allclose(got[t], per_table[t], rtol=1e-5, atol=1e-6)


def test_row_sharded_eval_matches_single():
    cfg = make_cfg(t=4, rows=40, dim=4)
    seed = 3
    batches = _make_batches(cfg, n_batches=1, b=8, l=2, seed=21)
    params1 = init_dlrm(cfg, seed=seed)
    ev1 = make_eval_step(cfg)
    preds1, loss1 = ev1(params1, Batch(*map(jnp.asarray, batches[0])))

    mesh = make_mesh(2, 4)
    plan = make_row_plan(cfg, n_model=4)
    p2 = init_row_sharded_params(cfg, plan, seed=seed)
    p2, _ = shard_row_params(mesh, p2, OptConfig("sgd", 0.1), {})
    ev2 = make_row_sharded_eval_step(cfg, plan, mesh)
    preds2, loss2 = ev2(p2, shard_row_batch(mesh, Batch(*map(jnp.asarray, batches[0]))))
    np.testing.assert_allclose(
        np.asarray(preds1), np.asarray(preds2), rtol=1e-5, atol=1e-6
    )
    assert abs(float(loss1) - float(loss2)) < 1e-6


def test_row_sharded_wide_table_slots():
    """dim = k*D tables (split trick) through the row-sharded path."""
    d = 4
    t = 3
    f = t * 2 + 1
    cfg = DLRMConfig(
        emb_rows=(60, 50, 40),
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

    mesh = make_mesh(1, 4)
    plan = make_row_plan(cfg, n_model=4)
    p2 = init_row_sharded_params(cfg, plan, seed=9)
    p2, s2 = shard_row_params(mesh, p2, opt, {})
    step2 = make_row_sharded_train_step(cfg, plan, opt, mesh)
    l2 = []
    for it, b in enumerate(batches):
        p2, s2, loss = step2(p2, s2, shard_row_batch(mesh, Batch(*map(jnp.asarray, b))), it)
        l2.append(float(loss))
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)


def test_row_sharded_pallas_impl_matches_xla():
    """Row-sharded step with sparse_update_impl='pallas': shard stores above
    the kernel gate must match the xla impl (kernel in interpret mode)."""
    import dataclasses

    cfg = DLRMConfig(
        emb_rows=(1 << 17, (1 << 17) + 64, 300),
        ln_bot=(4, 8, 128),
        ln_top=(4 * 3 // 2 + 128, 8, 1),
    )
    cfg_p = dataclasses.replace(cfg, sparse_update_impl="pallas")
    opt = OptConfig("sgd", 0.1)
    batches = _make_batches(cfg, n_batches=2, b=8, l=1, seed=3)
    mesh = make_mesh(1, 2)
    results = []
    for c in (cfg, cfg_p):
        plan = make_row_plan(c, n_model=2)
        p = init_row_sharded_params(c, plan, seed=11)
        s = init_row_sharded_opt_state(opt, p, plan)
        p, s = shard_row_params(mesh, p, opt, s)
        step = make_row_sharded_train_step(c, plan, opt, mesh)
        ls = []
        for it, b in enumerate(batches):
            p, s, loss = step(p, s, shard_row_batch(mesh, Batch(*map(jnp.asarray, b))), it)
            ls.append(float(loss))
        results.append((ls, extract_row_sharded_tables(
            plan, np.asarray(p["emb"]),
            np.asarray(p["emb_small"]) if p.get("emb_small") is not None else None,
        )))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5, atol=1e-6)
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,optname", [
    ("row", "sgd"), ("row", "rwsadagrad"),
    ("col", "sgd"), ("col", "adagrad"),
])
def test_mesh_grad_accum_matches_single_device(mode, optname):
    """--mlperf-grad-accum-iter on the row/col-sharded meshes matches the
    single-device accumulation step."""
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    if 4 > len(jax.devices()):
        pytest.skip("not enough devices")
    n_accum = 2
    cfg = make_cfg(t=4, rows=40, dim=8)
    opt = OptConfig(name=optname, lr=0.1)
    seed = 5
    micros = _make_batches(cfg, n_batches=4, b=8, l=2, seed=33)

    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    s1 = init_opt_state(opt, params1, groups)
    step1 = make_accum_train_step(cfg, opt, n_accum)
    losses1, p1 = [], params1
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p1, s1, loss = step1(p1, s1, stacked, it)
        losses1.append(float(loss))

    if mode == "row":
        from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner as R
    else:
        from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner as R
    r = R(cfg, opt, data=2, model=2, seed=seed, n_accum=n_accum)
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


@pytest.mark.parametrize("mode,wmode,optname", [
    ("row", "fixed", "sgd"),
    ("row", "learned", "rwsadagrad"),
    ("col", "fixed", "sgd"),
    ("col", "learned", "adagrad"),
    # regression: fixed-mode vw accumulators must have shard_map specs
    ("row", "fixed", "adagrad"),
    ("col", "fixed", "rwsadagrad"),
])
def test_mesh_weighted_pooling_matches_single_device(mode, wmode, optname):
    """v_W weighted pooling (fixed + learned) on the row/col-sharded paths
    must match the single-device path (dlrm_s_pytorch.py:308-316,545-548)."""
    import dataclasses

    if 4 > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = dataclasses.replace(
        make_cfg(t=4, rows=40, dim=8), weighted_pooling=wmode
    )
    opt = OptConfig(name=optname, lr=0.1)
    seed = 5
    batches = _make_batches(cfg, n_batches=3, b=8, l=2, seed=17)

    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    p1, s1 = params1, init_opt_state(opt, params1, groups)
    losses1 = []
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    if mode == "row":
        from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner as R
    else:
        from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner as R
    r = R(cfg, opt, data=2, model=2, seed=seed)
    p2, s2 = r.params, r.opt_state
    losses2 = []
    for it, b in enumerate(batches):
        p2, s2, loss = r.train_step(p2, s2, r.prepare_batch(b), it)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,wmode,optname", [
    ("row", "fixed", "sgd"),
    ("row", "learned", "rwsadagrad"),
    ("col", "fixed", "adagrad"),
    ("col", "learned", "sgd"),
])
def test_mesh_grad_accum_weighted_pooling(mode, wmode, optname):
    """--mlperf-grad-accum-iter composes with v_W weighted pooling on the
    row/col-sharded meshes: matches the single-device accumulation step
    (which trains learned v_W with coalesced-once momentum)."""
    import dataclasses

    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    if 4 > len(jax.devices()):
        pytest.skip("not enough devices")
    n_accum = 2
    cfg = dataclasses.replace(
        make_cfg(t=4, rows=40, dim=8), weighted_pooling=wmode
    )
    opt = OptConfig(name=optname, lr=0.1)
    seed = 5
    micros = _make_batches(cfg, n_batches=4, b=8, l=2, seed=33)

    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    s1 = init_opt_state(opt, params1, groups)
    step1 = make_accum_train_step(cfg, opt, n_accum)
    losses1, p1 = [], params1
    for it in range(2):
        group = micros[it * n_accum : (it + 1) * n_accum]
        stacked = Batch(*[
            jnp.stack([jnp.asarray(getattr(b, f)) for b in group])
            for f in Batch._fields
        ])
        p1, s1, loss = step1(p1, s1, stacked, it)
        losses1.append(float(loss))
    if wmode == "learned":
        delta = max(
            float(np.abs(np.asarray(v) - 1.0).max()) for v in p1["vw"]
        )
        assert delta > 1e-6, "learned v_W did not train under accumulation"

    if mode == "row":
        from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner as R
    else:
        from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner as R
    r = R(cfg, opt, data=2, model=2, seed=seed, n_accum=n_accum)
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
