"""Fused dense-accumulate finish kernel (ops/pallas_dense_finish.py) —
interpret mode on CPU. The kernel must reproduce the XLA dense-path
rwsadagrad chain (optim/optimizer.py dense branch) bit-for-bit up to f32
reduction order: mom += mean(g^2) per logical row; store -= lr*g/(sqrt+eps).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dlrm_yx_tpu.ops.pallas_dense_finish import (
    BLOCK_ROWS,
    rwsadagrad_dense_finish,
)


def _ref(store, acc, g, lr, dim, eps):
    r, w = store.shape
    pack = w // dim
    g3 = g.reshape(r, pack, dim)
    mom = np.mean(g3 * g3, axis=-1).reshape(-1)  # [r*pack]
    acc2 = acc.copy()
    acc2[: r * pack] += mom
    denom = np.sqrt(acc2[: r * pack]).reshape(r, pack)[..., None] + eps
    return (store - lr * (g3 / denom).reshape(r, w)).astype(np.float32), acc2


@pytest.mark.parametrize(
    "r,dim,w,acc_extra",
    [
        (512, 128, 128, 0),          # single partial block, exact acc
        (BLOCK_ROWS + 72, 128, 128, 0),   # ragged tail block
        (640, 64, 128, 0),           # packed pack=2
        (1024, 32, 128, 24),         # packed pack=4, acc padded past r*pack
        (384, 256, 256, 0),          # wide natural rows
        (BLOCK_ROWS, 128, 128, 128),  # store exactly block-aligned, acc longer
    ],
)
def test_finish_matches_reference(r, dim, w, acc_extra):
    rng = np.random.RandomState(r + dim)
    pack = w // dim if dim < w else 1
    store = rng.randn(r, w).astype(np.float32)
    acc = np.abs(rng.randn(r * pack + acc_extra)).astype(np.float32)
    # coalesced gradient: most rows untouched (zero), like the scatter's out
    g = np.zeros((r, w), np.float32)
    touched = rng.choice(r, size=max(4, r // 5), replace=False)
    g[touched] = rng.randn(len(touched), w).astype(np.float32)
    lr, eps = 0.05, 1e-10
    got_s, got_a = rwsadagrad_dense_finish(
        jnp.asarray(store), jnp.asarray(acc), jnp.asarray(g), lr,
        dim=dim, eps=eps, interpret=True,
    )
    want_s, want_a = _ref(store, acc, g, lr, dim, eps)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-6, atol=1e-6)
    assert got_a.shape == acc.shape  # padding preserved, shape round-trips
    if acc_extra:
        np.testing.assert_array_equal(
            np.asarray(got_a)[r * pack:], acc[r * pack:]
        )


def test_finish_untouched_rows_are_noops():
    """Rows with zero gradient must come back bit-identical (no eps drift)."""
    rng = np.random.RandomState(0)
    r, w = 300, 128
    store = rng.randn(r, w).astype(np.float32)
    acc = np.abs(rng.randn(r)).astype(np.float32)
    g = np.zeros((r, w), np.float32)
    g[7] = 1.0
    got_s, got_a = rwsadagrad_dense_finish(
        jnp.asarray(store), jnp.asarray(acc), jnp.asarray(g), 0.1,
        dim=128, eps=1e-10, interpret=True,
    )
    got_s = np.asarray(got_s)
    np.testing.assert_array_equal(got_s[:7], store[:7])
    np.testing.assert_array_equal(got_s[8:], store[8:])
    assert np.all(got_s[7] != store[7])
    np.testing.assert_array_equal(np.asarray(got_a)[np.arange(r) != 7],
                                  acc[np.arange(r) != 7])


def test_finish_rejects_bad_layouts():
    s = jnp.zeros((8, 64), jnp.float32)
    with pytest.raises(ValueError):
        rwsadagrad_dense_finish(s, jnp.zeros(8), jnp.zeros((8, 64)), 0.1,
                                dim=64, eps=1e-10, interpret=True)
    s = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError):  # acc too short for logical rows
        rwsadagrad_dense_finish(s, jnp.zeros(8), jnp.zeros((8, 128)), 0.1,
                                dim=64, eps=1e-10, interpret=True)


def test_finish_bf16_store_matches_xla_dense_path():
    """bf16 stores through the kernel must equal the XLA dense chain
    (f32 math, deterministic bf16 rounding at write-back)."""
    rng = np.random.RandomState(5)
    r, w = 640, 128
    store = rng.randn(r, w).astype(jnp.bfloat16)
    acc = np.abs(rng.randn(r)).astype(np.float32)
    g = np.zeros((r, w), np.float32)
    touched = rng.choice(r, size=100, replace=False)
    g[touched] = rng.randn(100, w).astype(np.float32)
    lr, eps = 0.05, 1e-10
    got_s, got_a = rwsadagrad_dense_finish(
        jnp.asarray(store), jnp.asarray(acc), jnp.asarray(g), lr,
        dim=w, eps=eps, interpret=True,
    )
    assert got_s.dtype == jnp.bfloat16
    # XLA dense-path reference: f32 math then astype(bf16)
    acc2 = acc + np.mean(g * g, axis=1)
    want = (
        np.asarray(store, np.float32)
        - lr * g / (np.sqrt(acc2)[:, None] + eps)
    )
    np.testing.assert_allclose(np.asarray(got_a), acc2, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_s, np.float32),
        np.asarray(jnp.asarray(want).astype(jnp.bfloat16), np.float32),
        rtol=0, atol=0,
    )
