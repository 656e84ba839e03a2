"""Fused dot-interaction kernel (ops/pallas_interaction.py) vs the XLA
interact_features formulation — interpret mode on CPU, values and grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.pallas_interaction import fused_interaction


@pytest.mark.parametrize(
    "b,s,d,itself,cdt",
    [
        (256, 26, 128, False, jnp.float32),   # headline shape (f32 exact)
        (256, 26, 128, False, jnp.bfloat16),  # headline compute dtype
        (128, 7, 128, True, jnp.float32),     # interact_itself, f_pad == f
        (128, 2, 256, False, jnp.float32),    # wide dim, tiny slot count
    ],
)
def test_fused_matches_xla(b, s, d, itself, cdt):
    rng = np.random.RandomState(s * d)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))
    ly = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    want = interact_features(x, ly, "dot", itself, compute_dtype=cdt)
    got = fused_interaction(x, ly, itself, cdt, 64, True)
    assert got.shape == want.shape
    tol = 1e-6 if cdt == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), rtol=tol, atol=tol
    )


@pytest.mark.parametrize("itself", [False, True])
def test_fused_grads_match_xla(itself):
    b, s, d = 128, 10, 128
    f = s + 1
    n_pairs = f * (f + 1) // 2 if itself else f * (f - 1) // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))
    ly = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    co = jnp.asarray(rng.randn(b, d + n_pairs).astype(np.float32))

    def loss_ref(x, ly):
        return jnp.vdot(
            interact_features(x, ly, "dot", itself, jnp.float32), co
        )

    def loss_ker(x, ly):
        return jnp.vdot(
            fused_interaction(x, ly, itself, jnp.float32, 64, True), co
        )

    gx0, gly0 = jax.grad(loss_ref, argnums=(0, 1))(x, ly)
    gx1, gly1 = jax.grad(loss_ker, argnums=(0, 1))(x, ly)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gly1), np.asarray(gly0),
                               rtol=1e-5, atol=1e-5)


def test_fused_rejects_unaligned_dim():
    x = jnp.zeros((64, 64), jnp.float32)
    ly = jnp.zeros((64, 3, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_interaction(x, ly, False, jnp.float32, 64, True)


def test_train_step_losses_match_xla_impl():
    """Full train steps with interaction_impl=pallas track the xla impl."""
    import dataclasses

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.data.synthetic import (
        RandomDataConfig,
        make_random_batches,
    )
    from dlrm_yx_tpu.models.dlrm import init_dlrm
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.ops.embedding import build_table_groups
    from dlrm_yx_tpu.train.train_step import make_train_step

    rows = (60, 80, 50)
    cfg = DLRMConfig(
        emb_rows=rows,
        emb_dims=(128,) * 3,
        ln_bot=(13, 64, 128),
        ln_top=(134, 32, 1),
        loss="bce",
    )
    data_cfg = RandomDataConfig(
        emb_rows=rows, m_den=13, mini_batch_size=64, num_batches=3,
        num_indices_per_lookup=2, num_indices_per_lookup_fixed=True,
        round_targets=True, seed=7,
    )
    batches = make_random_batches(data_cfg)
    opt = OptConfig(name="rwsadagrad", lr=0.05)
    losses = {}
    for impl in ("xla", "pallas"):
        c = dataclasses.replace(cfg, interaction_impl=impl)
        params = init_dlrm(c, seed=11)
        state = init_opt_state(
            opt, params, build_table_groups(c.emb_rows, c.emb_dims)
        )
        step = make_train_step(c, opt)
        out = []
        p, s = params, state
        for it, b in enumerate(batches):
            p, s, loss = step(p, s, Batch(*map(jnp.asarray, b)), it)
            out.append(float(loss))
        losses[impl] = out
    np.testing.assert_allclose(
        losses["pallas"], losses["xla"], rtol=1e-5, atol=1e-6
    )
