"""End-to-end differential training tests: JAX framework vs torch oracle,
plus optimizer unit tests vs the numpy oracle and golden-loss regression."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
from dlrm_yx_tpu.models.dlrm import forward, init_dlrm
from dlrm_yx_tpu.ops.embedding import build_table_groups, unpack_store
from dlrm_yx_tpu.optim.lr_policy import LRPolicy
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state, sparse_update
from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step

import oracle


def tiny_setup(l=2, n_batches=4, batch=2, seed=123):
    cfg = DLRMConfig.tiny()
    params = init_dlrm(cfg, seed=seed)
    data_cfg = RandomDataConfig(
        emb_rows=cfg.emb_rows,
        m_den=cfg.ln_bot[0],
        mini_batch_size=batch,
        num_batches=n_batches,
        num_indices_per_lookup=l,
        num_indices_per_lookup_fixed=False,
        round_targets=True,
        seed=seed,
    )
    batches = make_random_batches(data_cfg)
    return cfg, params, batches


def tables_from_params(cfg, params):
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    per_table = {}
    for g, store in zip(groups, params["emb"]):
        s = np.asarray(unpack_store(store, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            per_table[tid] = s[off : off + n]
    return [per_table[t] for t in range(cfg.num_tables)]


def test_forward_matches_numpy_oracle():
    cfg, params, batches = tiny_setup()
    b = batches[0]
    got = np.asarray(
        forward(
            params, cfg, build_table_groups(cfg.emb_rows, cfg.emb_dims),
            jnp.asarray(b.dense), jnp.asarray(b.indices), jnp.asarray(b.weights),
        )
    )
    tables = tables_from_params(cfg, params)
    bot = [(np.asarray(w), np.asarray(bb)) for w, bb in params["bot"]]
    top = [(np.asarray(w), np.asarray(bb)) for w, bb in params["top"]]
    want, _ = oracle.dlrm_forward(tables, bot, top, b.dense, b.indices, b.weights)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad"])
def test_training_matches_torch_oracle(optimizer):
    """Same init, same data, 4 steps: losses must track the torch
    implementation to fp32 tolerance (the reference's dlrm_s_test.sh
    strategy)."""
    torch_oracle = pytest.importorskip("torch_oracle")
    cfg, params, batches = tiny_setup()
    opt = OptConfig(name=optimizer, lr=0.1)
    step = make_train_step(cfg, opt)
    opt_state = init_opt_state(opt, params, build_table_groups(cfg.emb_rows, cfg.emb_dims))

    # torch twin from the same params
    tmodel = torch_oracle.TorchDLRM(params)
    tmodel.add_tables(tables_from_params(cfg, params))
    torch_losses = torch_oracle.train_steps(tmodel, batches, lr=0.1, optimizer=optimizer)

    losses = []
    p, s = params, opt_state
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, torch_losses, rtol=2e-4, atol=2e-5)

    # final embedding tables must match too (sparse updates are exercised)
    got_tables = tables_from_params(cfg, p)
    want_tables = [t.weight.detach().numpy() for t in tmodel.tables]
    for g, w in zip(got_tables, want_tables):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_rwsadagrad_sparse_update_matches_oracle():
    """Row-wise sparse Adagrad with duplicate indices vs numpy oracle
    (semantics of /root/reference/optim/rwsadagrad.py:98-115)."""
    rng = np.random.RandomState(7)
    r, d = 12, 4
    store = rng.randn(r, d).astype(np.float32)
    mom = np.abs(rng.randn(r).astype(np.float32))
    flat_idx = np.array([3, 1, 3, 7, 1, 1], dtype=np.int32)
    flat_g = rng.randn(6, d).astype(np.float32)
    lr = 0.05

    opt = OptConfig(name="rwsadagrad", lr=lr)
    got_store, got_mom = sparse_update(
        opt, jnp.asarray(store), jnp.asarray(mom),
        jnp.asarray(flat_idx), jnp.asarray(flat_g), lr, sentinel=r,
    )
    uniq, g = oracle.coalesce(flat_idx, flat_g.astype(np.float64))
    want_store, want_mom = oracle.rwsadagrad_row_update(
        store.astype(np.float64), mom.astype(np.float64), uniq, g, lr
    )
    np.testing.assert_allclose(np.asarray(got_store), want_store, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mom), want_mom, rtol=1e-5, atol=1e-6)


def test_rwsadagrad_end_to_end_trains():
    cfg, params, batches = tiny_setup(n_batches=8)
    opt = OptConfig(name="rwsadagrad", lr=0.2)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step = make_train_step(cfg, opt)
    s = init_opt_state(opt, params, groups)
    p = params
    losses = []
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        losses.append(float(loss))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])  # it learns
    assert all(np.isfinite(losses))


def test_lr_policy_matches_reference_semantics():
    pol = LRPolicy(base_lr=1.0, num_warmup_steps=4, decay_start_step=8, num_decay_steps=4)
    # iteration k -> step_count k+1
    got = [float(pol(k)) for k in range(14)]
    # warmup: s/W for s=1..3; freeze at 3/4 between warmup and decay;
    # decay at s=8..11: ((4-(s-8))/4)^2; freeze at last decay value
    want = [
        0.25, 0.5, 0.75,          # s=1,2,3
        0.75, 0.75, 0.75, 0.75,   # s=4..7 frozen at (W-1)/W
        1.0, (3 / 4) ** 2, (2 / 4) ** 2, (1 / 4) ** 2,  # s=8..11
        (1 / 4) ** 2, (1 / 4) ** 2, (1 / 4) ** 2,       # frozen after decay
    ]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # no-op policy
    flat = LRPolicy(base_lr=0.1)
    assert float(flat(0)) == pytest.approx(0.1)
    assert float(flat(1000)) == pytest.approx(0.1)


def test_weighted_pooling_learned():
    cfg = DLRMConfig(
        emb_rows=(4, 3, 2), ln_bot=(4, 3, 2), ln_top=(8, 4, 2, 1),
        weighted_pooling="learned",
    )
    params = init_dlrm(cfg, seed=5)
    assert params["vw"] is not None
    data_cfg = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=4, mini_batch_size=2, num_batches=3,
        num_indices_per_lookup=2, num_indices_per_lookup_fixed=False, seed=5,
    )
    batches = make_random_batches(data_cfg)
    opt = OptConfig(name="adagrad", lr=0.1)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step = make_train_step(cfg, opt)
    s = init_opt_state(opt, params, groups)
    p = params
    vw0 = [np.asarray(v).copy() for v in params["vw"]]
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        assert np.isfinite(float(loss))
    # learned weights actually moved
    assert any(np.abs(np.asarray(v) - v0).max() > 0 for v, v0 in zip(p["vw"], vw0))


def test_eval_step():
    cfg, params, batches = tiny_setup()
    ev = make_eval_step(cfg)
    preds, loss = ev(params, Batch(*map(jnp.asarray, batches[0])))
    assert preds.shape == (2, 1)
    assert np.all((np.asarray(preds) >= 0) & (np.asarray(preds) <= 1))


GOLDEN_LOSSES = None  # filled by test_golden_regression generation below


def test_golden_regression():
    """Seeded tiny run produces these exact losses (this framework's analog
    of the reference's README.md:141-146 golden printout; values recorded at
    framework version 0.1)."""
    import json, os

    cfg, params, batches = tiny_setup(l=2, n_batches=3, batch=2, seed=123)
    opt = OptConfig(name="sgd", lr=0.1)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step = make_train_step(cfg, opt)
    s = init_opt_state(opt, params, groups)
    p = params
    losses = []
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        losses.append(round(float(loss), 6))
    golden_path = os.path.join(os.path.dirname(__file__), "golden_tiny.json")
    if not os.path.exists(golden_path):
        with open(golden_path, "w") as f:
            json.dump({"losses": losses}, f)
        pytest.skip("golden file generated")
    with open(golden_path) as f:
        want = json.load(f)["losses"]
    np.testing.assert_allclose(losses, want, rtol=1e-5)


def test_grad_accumulation_matches_manual_sum():
    """make_accum_train_step == summed per-micro-batch grads, one step
    (--mlperf-grad-accum-iter, dlrm_s_pytorch.py:1925-1932)."""
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.models.dlrm import (
        forward_from_pooled,
        lookup_all_groups,
        model_groups,
    )
    from dlrm_yx_tpu.ops.losses import loss_fn as _loss
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    cfg = DLRMConfig(
        emb_rows=(300, 40, 500), ln_bot=(4, 8, 2), ln_top=(4 * 3 // 2 + 2, 8, 1)
    )
    opt = OptConfig("sgd", 0.1)
    n, bsz = 4, 8
    rr = np.random.RandomState(0)

    def mk(seed):
        r2 = np.random.RandomState(seed)
        return Batch(
            r2.rand(bsz, 4).astype(np.float32),
            np.stack([r2.randint(0, x, (bsz, 2)) for x in cfg.emb_rows]).astype(np.int32),
            np.ones((3, bsz, 2), np.float32),
            (r2.rand(bsz, 1) > 0.5).astype(np.float32),
        )

    micro = [mk(i) for i in range(n)]
    stacked = Batch(
        *[jnp.asarray(np.stack([np.asarray(getattr(b, f)) for b in micro]))
          for f in Batch._fields]
    )
    p = init_dlrm(cfg, seed=5)
    groups = model_groups(cfg)
    s = init_opt_state(opt, p, groups)

    def one_loss(dp, batch):
        pooled = lookup_all_groups({**p, **dp}, groups, batch.indices, batch.weights, "xla")
        logits = forward_from_pooled({**p, **dp}, cfg, groups, batch.dense, pooled)
        return _loss(logits, batch.labels, cfg.loss, cfg.loss_threshold, cfg.wbce_weights)

    dp = {"bot": p["bot"], "top": p["top"]}
    gsum = jax.tree.map(jnp.zeros_like, dp)
    for b in micro:
        g = jax.grad(one_loss)(dp, Batch(*map(jnp.asarray, b)))
        gsum = jax.tree.map(jnp.add, gsum, g)
    w_expect = np.asarray(p["bot"][0][0] - 0.1 * gsum["bot"][0][0])

    step = make_accum_train_step(cfg, opt, n)
    p2, s2, loss = step(p, s, stacked, 0)
    np.testing.assert_allclose(
        np.asarray(p2["bot"][0][0]), w_expect, rtol=1e-6, atol=1e-7
    )
    assert np.isfinite(float(loss))


def test_cli_grad_accum():
    from dlrm_yx_tpu.cli import main

    s = main([
        "--arch-embedding-size=300-40", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=5-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=8", "--loss-function=bce",
        "--round-targets=True", "--test-freq=2",
        "--mlperf-grad-accum-iter=4", "--print-freq=1",
    ])
    assert 0.0 <= s["accuracy"] <= 1.0


def test_grad_accumulation_qr_tables():
    """make_accum_train_step with QR tables: the accumulated QR sub-table
    update equals the manually summed per-micro-batch QR gradients applied
    once (SGD exactness; momentum-once follows from the single coalesced
    update)."""
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.models.dlrm import (
        forward_from_pooled,
        lookup_all_groups,
        model_groups,
        qr_lookup_all,
    )
    from dlrm_yx_tpu.ops.losses import loss_fn as _loss
    from dlrm_yx_tpu.train.train_step import make_accum_train_step

    cfg = DLRMConfig.build(
        emb_rows=[300, 40], emb_dims=(8, 8), ln_bot=[4, 8], ln_top=[8, 1],
        qr_flag=True, qr_threshold=100, qr_collisions=4,
    )
    assert cfg.qr_table_ids == (0,)
    opt = OptConfig("sgd", 0.1)
    n, bsz = 3, 8

    def mk(seed):
        r2 = np.random.RandomState(seed)
        return Batch(
            r2.rand(bsz, 4).astype(np.float32),
            np.stack(
                [r2.randint(0, x, (bsz, 2)) for x in cfg.emb_rows]
            ).astype(np.int32),
            np.ones((2, bsz, 2), np.float32),
            (r2.rand(bsz, 1) > 0.5).astype(np.float32),
        )

    micro = [mk(i) for i in range(n)]
    stacked = Batch(
        *[jnp.asarray(np.stack([np.asarray(getattr(b, f)) for b in micro]))
          for f in Batch._fields]
    )
    p = init_dlrm(cfg, seed=5)
    groups = model_groups(cfg)
    s = init_opt_state(opt, p, groups)

    def one_loss(qr_params, batch):
        p2 = {**p, "qr": qr_params}
        pooled = lookup_all_groups(
            p2, groups, batch.indices, batch.weights, "xla"
        )
        qr_pooled = qr_lookup_all(p2, cfg, batch.indices, batch.weights)
        logits = forward_from_pooled(
            p2, cfg, groups, batch.dense, pooled, qr_pooled
        )
        return _loss(
            logits, batch.labels, cfg.loss, cfg.loss_threshold, cfg.wbce_weights
        )

    gsum = jax.tree.map(jnp.zeros_like, p["qr"])
    for b in micro:
        g = jax.grad(one_loss)(p["qr"], Batch(*map(jnp.asarray, b)))
        gsum = jax.tree.map(jnp.add, gsum, g)
    q_expect = np.asarray(p["qr"][0][0] - 0.1 * gsum[0][0])
    r_expect = np.asarray(p["qr"][0][1] - 0.1 * gsum[0][1])

    step = make_accum_train_step(cfg, opt, n)
    p2, s2, loss = step(p, s, stacked, 0)
    np.testing.assert_allclose(
        np.asarray(p2["qr"][0][0]), q_expect, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(p2["qr"][0][1]), r_expect, rtol=1e-5, atol=1e-7
    )
    assert np.isfinite(float(loss))

    # rwsadagrad composes too (momentum sees the accumulated grad once)
    p_fresh = init_dlrm(cfg, seed=5)  # the first step donated p
    opt2 = OptConfig("rwsadagrad", 0.1)
    s3 = init_opt_state(opt2, p_fresh, groups)
    step2 = make_accum_train_step(cfg, opt2, n)
    p3, s4, loss2 = step2(p_fresh, s3, stacked, 0)
    assert np.isfinite(float(loss2))
    assert float(np.abs(np.asarray(s4["qr"][0][0])).max()) > 0
