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
    # a 64-wide store passed WITHOUT dim is not a valid layout: sub-128
    # dims must arrive packed as [R/pack, 128] with dim=d
    with pytest.raises(ValueError):
        fused_lookup(
            jnp.zeros((8, 64)), jnp.zeros((1, 8, 1), jnp.int32), jnp.ones((1, 8, 1)),
            interpret=True,
        )
    with pytest.raises(ValueError):  # dim must divide the 128-lane width
        fused_lookup(
            jnp.zeros((8, 128)), jnp.zeros((1, 8, 1), jnp.int32),
            jnp.ones((1, 8, 1)), interpret=True, dim=48,
        )
    assert supports_dim(128) and supports_dim(256)
    assert supports_dim(64) and supports_dim(8)
    assert not supports_dim(48)


@pytest.mark.parametrize("d,l", [(64, 1), (64, 5), (32, 3), (8, 2)])
def test_fused_lookup_packed_sub128_dims(d, l):
    """Sub-128 dims on the packed [R/pack, 128] store: DMA whole physical
    rows, mask-accumulate per lane block, fold blocks after the kernel."""
    rng = np.random.RandomState(2)
    pack = 128 // d
    r, t, b = 512 * pack, 3, 16  # logical rows
    store = rng.randn(r, d).astype(np.float32)
    gidx = rng.randint(0, r, size=(t, b, l)).astype(np.int32)
    w = rng.rand(t, b, l).astype(np.float32)
    got = np.asarray(
        fused_lookup(
            jnp.asarray(store.reshape(r // pack, 128)), jnp.asarray(gidx),
            jnp.asarray(w), interpret=True, dim=d,
        )
    )
    want = np.einsum("tbl,tbld->tbd", w, store[gidx])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


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
