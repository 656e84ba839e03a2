"""Unit tests for core ops vs the numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.ops.coalesce import coalesce_rows
from dlrm_yx_tpu.ops.embedding import (
    build_table_groups,
    flat_row_grads,
    lookup_group,
    pack_store,
)
from dlrm_yx_tpu.ops.interaction import interact_features, tril_flat_indices
from dlrm_yx_tpu.ops.losses import loss_fn
from dlrm_yx_tpu.ops.mlp import apply_mlp, init_mlp

import oracle


def test_mlp_matches_oracle():
    rng = np.random.RandomState(0)
    layers = init_mlp(rng, (13, 64, 32, 1))
    x = rng.randn(8, 13).astype(np.float32)
    got = apply_mlp(jnp.asarray(x), layers, sigmoid_layer=-1)
    want = oracle.mlp_forward(x, layers)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # sigmoid at a middle layer
    got = apply_mlp(jnp.asarray(x), layers, sigmoid_layer=1)
    want = oracle.mlp_forward(x, layers, sigmoid_layer=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mlp_init_distribution():
    rng = np.random.RandomState(1)
    (w, b), = init_mlp(rng, (256, 128))
    assert w.shape == (256, 128) and b.shape == (128,)
    assert abs(w.std() - np.sqrt(2.0 / (256 + 128))) < 0.005
    assert abs(b.std() - np.sqrt(1.0 / 128)) < 0.02


@pytest.mark.parametrize("itself", [False, True])
def test_dot_interaction_matches_oracle(itself):
    rng = np.random.RandomState(2)
    b, s, d = 4, 5, 8
    x = rng.randn(b, d).astype(np.float32)
    ly = rng.randn(b, s, d).astype(np.float32)
    got = interact_features(jnp.asarray(x), jnp.asarray(ly), "dot", itself)
    want = oracle.dot_interaction(x, [ly[:, i] for i in range(s)], itself)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_tril_indices_row_major_order():
    # must match torch.tril_indices ordering (row-major)
    idx = tril_flat_indices(4, -1)
    # rows (1,0) (2,0) (2,1) (3,0) (3,1) (3,2) -> flat 4,8,9,12,13,14
    np.testing.assert_array_equal(idx, [4, 8, 9, 12, 13, 14])


def test_cat_interaction():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4).astype(np.float32)
    ly = rng.randn(2, 3, 4).astype(np.float32)
    got = interact_features(jnp.asarray(x), jnp.asarray(ly), "cat")
    want = np.concatenate([x[:, None, :], ly], axis=1).reshape(2, -1)
    np.testing.assert_allclose(np.asarray(got), want)


def test_lookup_group_matches_embedding_bag():
    rng = np.random.RandomState(4)
    rows, dim = (10, 7, 5), 8
    groups = build_table_groups(rows, (dim,) * 3)
    assert len(groups) == 1
    g = groups[0]
    tables = [rng.randn(n, dim).astype(np.float32) for n in rows]
    store = np.zeros((g.total_rows, dim), dtype=np.float32)
    for tab, n, off in zip(tables, g.rows, g.row_offsets):
        store[off : off + n] = tab
    b, l = 6, 3
    indices = np.stack([rng.randint(0, n, size=(b, l)) for n in rows]).astype(np.int32)
    weights = (rng.random_sample((3, b, l)) > 0.3).astype(np.float32)
    got = lookup_group(
        jnp.asarray(pack_store(store, g)), g, jnp.asarray(indices),
        jnp.asarray(weights),
    )
    want = np.stack(
        [oracle.embedding_bag(tables[t], indices[t], weights[t]) for t in range(3)]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_lookup_group_heterogeneous_dims():
    rows = (10, 6)
    dims = (8, 16)
    groups = build_table_groups(rows, dims)
    assert len(groups) == 2
    assert groups[0].dim == 8 and groups[1].dim == 16
    assert groups[0].table_ids == (0,) and groups[1].table_ids == (1,)


def test_coalesce_rows():
    idx = jnp.asarray(np.array([3, 1, 3, 7, 1, 1], dtype=np.int32))
    g = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    uniq, summed = coalesce_rows(idx, g, sentinel=100)
    uniq, summed = np.asarray(uniq), np.asarray(summed)
    want_idx, want_g = oracle.coalesce(np.asarray(idx), np.asarray(g))
    # unique entries packed at front, ascending
    np.testing.assert_array_equal(uniq[: len(want_idx)], want_idx)
    np.testing.assert_allclose(summed[: len(want_idx)], want_g)
    assert np.all(uniq[len(want_idx) :] == 100)
    np.testing.assert_allclose(summed[len(want_idx) :], 0.0)


def test_flat_row_grads_scatter_equals_dense_grad():
    """flat_row_grads + scatter-add must equal the autodiff dense gradient."""
    rng = np.random.RandomState(5)
    rows, dim = (9, 4), 6
    groups = build_table_groups(rows, (dim,) * 2)
    g = groups[0]
    store = jnp.asarray(rng.randn(g.total_rows, dim).astype(np.float32))
    b, l = 3, 2
    indices = jnp.asarray(
        np.stack([rng.randint(0, n, size=(b, l)) for n in rows]).astype(np.int32)
    )
    weights = jnp.asarray(rng.random_sample((2, b, l)).astype(np.float32))

    def f(s):
        return jnp.sum(jnp.sin(lookup_group(s, g, indices, weights)))

    dense_grad = jax.grad(f)(store)
    pooled = lookup_group(store, g, indices, weights)
    g_pooled = jnp.cos(pooled)  # d sum(sin(x))/dx
    fidx, fg = flat_row_grads(g, indices, weights, g_pooled)
    scattered = jnp.zeros_like(store).at[fidx].add(fg, mode="drop")
    np.testing.assert_allclose(
        np.asarray(scattered), np.asarray(dense_grad), rtol=1e-5, atol=1e-6
    )


def test_bce_loss_matches_oracle():
    rng = np.random.RandomState(6)
    logits = rng.randn(16, 1).astype(np.float32)
    t = (rng.random_sample((16, 1)) > 0.5).astype(np.float32)
    got = float(loss_fn(jnp.asarray(logits), jnp.asarray(t), "bce"))
    prob = 1.0 / (1.0 + np.exp(-logits))
    want = oracle.bce_loss(prob, t)
    assert abs(got - want) < 1e-5


def test_wbce_and_mse():
    logits = jnp.asarray([[0.5], [-0.5]])
    t = jnp.asarray([[1.0], [0.0]])
    bce = float(loss_fn(logits, t, "bce"))
    wbce = float(loss_fn(logits, t, "wbce", wbce_weights=(2.0, 2.0)))
    assert abs(wbce - 2 * bce) < 1e-6
    mse = float(loss_fn(logits, t, "mse"))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    assert abs(mse - float(np.mean((p - np.asarray(t)) ** 2))) < 1e-6


def test_config_validation():
    cfg = DLRMConfig.tiny()
    assert cfg.num_features == 4  # 3 tables + dense
    assert cfg.ln_top[0] == 4 * 3 // 2 + 2
    kaggle = DLRMConfig.kaggle()
    assert kaggle.ln_top[0] == 27 * 26 // 2 + 16 == 367
    tb = DLRMConfig.terabyte_mlperf()
    assert tb.ln_top[0] == 479
    with pytest.raises(ValueError):
        DLRMConfig(emb_rows=(4, 3), ln_bot=(4, 2), ln_top=(6, 1))


def test_config_from_flags():
    cfg = DLRMConfig.from_flags(
        arch_embedding_size="4-3-2",
        arch_mlp_bot="4-3-2",
        arch_mlp_top="4-2-1",
        arch_sparse_feature_size=2,
    )
    assert cfg.ln_top == (8, 4, 2, 1)
