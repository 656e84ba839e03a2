"""Pallas fused-lookup kernel vs the XLA path (interpret mode on CPU;
the same kernel was validated bit-exact on TPU v5e hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dlrm_yx_tpu.ops.pallas_embedding import fused_lookup, supports_dim


@pytest.mark.parametrize("d,l", [(128, 1), (128, 4), (256, 2)])
def test_fused_lookup_matches_reference(d, l):
    rng = np.random.RandomState(0)
    r, t, b = 512, 3, 16
    store = rng.randn(r, d).astype(np.float32)
    gidx = rng.randint(0, r, size=(t, b, l)).astype(np.int32)
    w = (rng.rand(t, b, l) > 0.3).astype(np.float32)
    got = np.asarray(
        fused_lookup(jnp.asarray(store), jnp.asarray(gidx), jnp.asarray(w), interpret=True)
    )
    want = np.einsum("tbl,tbld->tbd", w, store[gidx])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_lookup_rejects_unsupported_dim():
    with pytest.raises(ValueError):
        fused_lookup(
            jnp.zeros((8, 64)), jnp.zeros((1, 8, 1), jnp.int32), jnp.ones((1, 8, 1)),
            interpret=True,
        )
    assert supports_dim(128) and supports_dim(256)
    assert not supports_dim(64)


def test_fused_lookup_weighted_pooling():
    rng = np.random.RandomState(1)
    r, d, t, b, l = 64, 128, 2, 8, 3
    store = rng.randn(r, d).astype(np.float32)
    gidx = rng.randint(0, r, size=(t, b, l)).astype(np.int32)
    w = rng.rand(t, b, l).astype(np.float32)  # arbitrary per-sample weights
    got = np.asarray(
        fused_lookup(jnp.asarray(store), jnp.asarray(gidx), jnp.asarray(w), interpret=True)
    )
    want = np.einsum("tbl,tbld->tbd", w, store[gidx])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
