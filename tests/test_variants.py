"""QR / MD / quantized embedding variants + CLI smoke tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
from dlrm_yx_tpu.models.dlrm import forward, init_dlrm, model_groups
from dlrm_yx_tpu.ops.md_embedding import md_solver, pow_2_round
from dlrm_yx_tpu.ops.qr_embedding import QRSpec, qr_lookup, qr_row_grads
from dlrm_yx_tpu.ops.quantized import (
    make_quantized_eval_step,
    quantize_model_embeddings,
    quantize_store,
    dequantize_rows,
)
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step


# ------------------------------- QR -------------------------------------------

@pytest.mark.parametrize("op", ["mult", "add", "concat"])
def test_qr_lookup_matches_numpy(op):
    rng = np.random.RandomState(0)
    spec = QRSpec(table_id=0, rows=50, dim=8, collisions=4, operation=op)
    q = rng.randn(spec.q_rows, 8).astype(np.float32)
    r = rng.randn(4, 8).astype(np.float32)
    idx = rng.randint(0, 50, size=(6, 3)).astype(np.int32)
    w = (rng.rand(6, 3) > 0.3).astype(np.float32)
    got = np.asarray(qr_lookup(jnp.asarray(q), jnp.asarray(r), spec,
                               jnp.asarray(idx), jnp.asarray(w)))
    qe, re = q[idx // 4], r[idx % 4]
    if op == "mult":
        emb = qe * re
    elif op == "add":
        emb = qe + re
    else:
        emb = np.concatenate([qe, re], axis=-1)
    want = np.einsum("bl,bld->bd", w, emb)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("op", ["mult", "add", "concat"])
def test_qr_row_grads_match_autodiff(op):
    import jax

    rng = np.random.RandomState(1)
    spec = QRSpec(table_id=0, rows=40, dim=4, collisions=4, operation=op)
    q = jnp.asarray(rng.randn(spec.q_rows, 4).astype(np.float32))
    r = jnp.asarray(rng.randn(4, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 40, size=(5, 2)).astype(np.int32))
    w = jnp.asarray(rng.rand(5, 2).astype(np.float32))

    def f(q_, r_):
        return jnp.sum(jnp.sin(qr_lookup(q_, r_, spec, idx, w)))

    gq_dense, gr_dense = jax.grad(f, argnums=(0, 1))(q, r)
    pooled = qr_lookup(q, r, spec, idx, w)
    g_pooled = jnp.cos(pooled)
    (qi, gq), (ri, gr) = qr_row_grads(q, r, spec, idx, w, g_pooled)
    got_q = jnp.zeros_like(q).at[qi].add(gq)
    got_r = jnp.zeros_like(r).at[ri].add(gr)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(gq_dense), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(gr_dense), rtol=1e-5, atol=1e-6)


def qr_config():
    # tables 0,2 above threshold -> QR; table 1 regular
    return DLRMConfig(
        emb_rows=(300, 50, 400),
        ln_bot=(4, 8, 4),
        ln_top=(4 * 3 // 2 + 4, 8, 1),
        qr_flag=True,
        qr_threshold=200,
        qr_collisions=4,
        qr_operation="mult",
    )


def test_qr_model_trains():
    cfg = qr_config()
    assert cfg.qr_table_ids == (0, 2)
    params = init_dlrm(cfg, seed=2)
    assert len(params["qr"]) == 2
    assert params["qr"][0][0].shape == (75, 4)  # ceil(300/4)
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=4, mini_batch_size=8, num_batches=6,
        num_indices_per_lookup=2, num_indices_per_lookup_fixed=False, seed=3,
        round_targets=True,
    )
    batches = make_random_batches(dc)
    opt = OptConfig("rwsadagrad", lr=0.05)
    step = make_train_step(cfg, opt)
    s = init_opt_state(opt, params, model_groups(cfg))
    p = params
    qr0 = np.asarray(params["qr"][0][0]).copy()
    losses = []
    b = Batch(*map(jnp.asarray, batches[0]))
    for it in range(8):  # repeat one batch: memorization must reduce loss
        p, s, loss = step(p, s, b, it)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # QR tables actually updated
    assert np.abs(np.asarray(p["qr"][0][0]) - qr0).max() > 0


# ------------------------------- MD -------------------------------------------

def test_md_solver_power_rule():
    n = np.array([100, 1000, 10000])
    d = md_solver(n, alpha=0.5, d0=16, round_dim=False)
    assert d[0] == 16
    assert d[1] < d[0] and d[2] < d[1]  # bigger tables get smaller dims
    d2 = md_solver(n, alpha=0.5, d0=16, round_dim=True)
    assert all((x & (x - 1)) == 0 for x in d2)  # powers of 2
    np.testing.assert_array_equal(pow_2_round(np.array([3, 5, 9])), [4, 4, 8])
    # budget variant
    d3 = md_solver(n, alpha=0.3, b_budget=n.sum() * 8, round_dim=False)
    assert (n * d3).sum() <= n.sum() * 8 * 1.6


def md_config():
    # table 1 is large -> reduced dim 2 with projection to base 4
    return DLRMConfig(
        emb_rows=(50, 5000, 60),
        emb_dims=(4, 2, 4),
        ln_bot=(4, 8, 4),
        ln_top=(4 * 3 // 2 + 4, 8, 1),
        md_flag=True,
        md_threshold=200,
    )


def test_md_model_trains():
    cfg = md_config()
    assert cfg.md_table_ids == (1,)
    assert cfg.slots_per_table == (1, 1, 1)
    params = init_dlrm(cfg, seed=4)
    assert params["md_proj"][0].shape == (2, 4)
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=4, mini_batch_size=8, num_batches=6,
        num_indices_per_lookup=2, num_indices_per_lookup_fixed=False, seed=5,
        round_targets=True,
    )
    batches = make_random_batches(dc)
    opt = OptConfig("adagrad", lr=0.1)
    step = make_train_step(cfg, opt)
    s = init_opt_state(opt, params, model_groups(cfg))
    p = params
    proj0 = np.asarray(params["md_proj"][0]).copy()
    for it, b in enumerate(batches):
        p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
        assert np.isfinite(float(loss))
    assert np.abs(np.asarray(p["md_proj"][0]) - proj0).max() > 0  # proj learns


# ------------------------------ quantized --------------------------------------

@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_dequantize_error(bits):
    rng = np.random.RandomState(6)
    store = rng.randn(32, 8).astype(np.float32)
    qs = quantize_store(store, bits)
    deq = np.asarray(dequantize_rows(qs, jnp.arange(32)))
    row_range = store.max(1) - store.min(1)
    tol = row_range / ((1 << bits) - 1) * 0.51
    assert (np.abs(deq - store).max(axis=1) <= tol + 1e-6).all()


def test_quantized_eval_non_dividing_dim_falls_back():
    """Dims whose quantized byte-width does not divide 128 (e.g. 96)
    cannot take the fused 128-lane layout — the serving step must fall
    back to the raw dequantize path instead of raising."""
    import dataclasses as _dc

    from dlrm_yx_tpu.ops.quantized import (
        make_quantized_eval_step,
        quantize_model_embeddings,
    )
    from dlrm_yx_tpu.data.batch import Batch as _B

    cfg = DLRMConfig(
        emb_rows=(40, 30, 20),
        ln_bot=(4, 8, 96),
        ln_top=(3 * 4 // 2 + 96, 8, 1),  # dot interaction, 3 tables
    )
    del _dc  # (dims default to base_dim=96 for every table)
    params = init_dlrm(cfg, seed=7)
    groups = model_groups(cfg)
    qs = quantize_model_embeddings(
        {"emb": [np.asarray(e) for e in params["emb"]]}, groups, 8
    )
    step = make_quantized_eval_step(cfg, groups, qs)
    r = np.random.RandomState(0)
    t = cfg.num_tables
    b = _B(
        jnp.asarray(r.rand(4, 4).astype(np.float32)),
        jnp.asarray(np.stack(
            [r.randint(0, n, (4, 1)) for n in cfg.emb_rows]
        ).astype(np.int32)),
        jnp.ones((t, 4, 1), jnp.float32),
        jnp.asarray((r.rand(4, 1) > 0.5).astype(np.float32)),
    )
    dp = {k: params[k] for k in ("bot", "top")}
    dp["vw"] = None
    preds = np.asarray(step(dp, b))
    assert np.isfinite(preds).all() and preds.shape == (4, 1)


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_rows_match_unfused(bits):
    """The one-gather fused row layout (quantized bytes + f32 scale/bias
    bytes per row, the serving-path format) must dequantize identically to
    the separate data/scale/bias arrays."""
    from dlrm_yx_tpu.ops.quantized import dequantize_fused_rows, fuse_qstore

    rng = np.random.RandomState(9)
    store = rng.randn(64, 16).astype(np.float32)
    qs = quantize_store(store, bits)
    fused = fuse_qstore(qs)
    ids = jnp.asarray(rng.randint(0, 64, (3, 7)).astype(np.int32))
    want = np.asarray(dequantize_rows(qs, ids))
    got = np.asarray(dequantize_fused_rows(fused, ids, qs.bits, qs.dim))
    np.testing.assert_array_equal(got, want)


def test_quantized_eval_close_to_fp32():
    cfg = DLRMConfig.tiny()
    params = init_dlrm(cfg, seed=7)
    groups = model_groups(cfg)
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=4, mini_batch_size=4, num_batches=1,
        num_indices_per_lookup=2, num_indices_per_lookup_fixed=False, seed=8,
    )
    b = make_random_batches(dc)[0]
    jb = Batch(*map(jnp.asarray, b))
    ev = make_eval_step(cfg)
    ref_preds, _ = ev(params, jb)
    qstores = quantize_model_embeddings(params, groups, bits=8)
    qev = make_quantized_eval_step(cfg, groups, qstores)
    q_preds = qev(params, jb)
    np.testing.assert_allclose(
        np.asarray(q_preds), np.asarray(ref_preds), atol=0.05
    )


# ------------------------------ CLI smoke --------------------------------------

def test_cli_tiny_run(capsys):
    from dlrm_yx_tpu.cli import main

    main([
        "--mini-batch-size=2", "--data-size=6", "--round-targets=True",
        "--loss-function=bce", "--learning-rate=0.1", "--debug-mode",
        "--print-freq=1",
    ])
    out = capsys.readouterr().out
    assert "model arch:" in out
    assert "updated parameters" in out
    assert "Finished training it 3" in out


def test_cli_qr_and_mlperf(capsys):
    from dlrm_yx_tpu.cli import main

    summary = main([
        "--arch-embedding-size=300-40-500", "--arch-mlp-bot=4-3-2",
        "--arch-mlp-top=8-2-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=4", "--num-batches=4", "--qr-flag",
        "--qr-threshold=200", "--qr-collisions=4", "--loss-function=bce",
        "--round-targets=True", "--mlperf-logging", "--test-freq=4",
        "--optimizer=rwsadagrad",
    ])
    assert "roc_auc" in summary
    out = capsys.readouterr().out
    assert ":::MLLOG" in out


# ------------------------------ quantized MLP -----------------------------------

@pytest.mark.parametrize("mode", ["int8", "fp16"])
def test_fully_quantized_inference_close_to_fp32(mode):
    """Dynamic MLP quantization + int8 tables vs fp32 inference
    (dlrm_s_pytorch.py:549-576,1757-1781 capability)."""
    from dlrm_yx_tpu.ops.quantized import (
        apply_quantized_mlp,
        make_fully_quantized_eval_step,
        quantize_mlp,
    )

    cfg = DLRMConfig(
        emb_rows=(300, 200, 100), ln_bot=(13, 64, 8), ln_top=(4 * 3 // 2 + 8, 64, 1)
    )
    p = init_dlrm(cfg, seed=1)
    groups = model_groups(cfg)
    r = np.random.RandomState(0)
    b = Batch(
        dense=jnp.asarray(r.rand(32, 13).astype(np.float32)),
        indices=jnp.asarray(r.randint(0, 100, (3, 32, 2)).astype(np.int32)),
        weights=jnp.ones((3, 32, 2), jnp.float32),
        labels=jnp.asarray((r.rand(32, 1) > 0.5).astype(np.float32)),
    )
    ref_preds, _ = make_eval_step(cfg)(p, b)
    qbot, qtop = quantize_mlp(p["bot"], mode), quantize_mlp(p["top"], mode)
    qs = quantize_model_embeddings(p, groups, 8)
    ev = make_fully_quantized_eval_step(cfg, groups, qs, qbot, qtop)
    preds = ev(p, b)
    assert float(jnp.max(jnp.abs(preds - ref_preds))) < 0.05

    # tower-level check too
    y32 = np.asarray(ref_preds)
    x = jnp.asarray(r.rand(16, 13).astype(np.float32))
    from dlrm_yx_tpu.ops.mlp import apply_mlp

    yq = apply_quantized_mlp(x, qbot, cfg.sigmoid_bot)
    yf = apply_mlp(x, p["bot"], cfg.sigmoid_bot)
    assert float(jnp.max(jnp.abs(yq - yf))) < 0.05 * float(jnp.max(jnp.abs(yf)) + 1)
    assert y32.shape == (32, 1)
