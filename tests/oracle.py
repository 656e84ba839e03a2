"""Pure-numpy DLRM oracle for differential testing.

Plays the role the Caffe2 twin plays for the reference
(``/root/reference/test/dlrm_s_test.sh`` diffs PyTorch vs Caffe2 output —
two independent implementations as mutual oracles, SURVEY.md §4). This is an
independent, straight-line numpy implementation of the same math: EmbeddingBag
sum-pooling, custom-Xavier MLPs, dot interaction over the lower triangle, BCE,
and SGD / Adagrad / RWSAdagrad updates with duplicate-index coalescing.
"""

from __future__ import annotations

import numpy as np


def mlp_forward(x, layers, sigmoid_layer=-1, skip_last_activation=False):
    n = len(layers)
    for i, (w, b) in enumerate(layers):
        y = x @ w + b
        if i == n - 1 and skip_last_activation:
            return y
        if i == sigmoid_layer:
            x = 1.0 / (1.0 + np.exp(-y))
        else:
            x = np.maximum(y, 0.0)
    return x


def embedding_bag(table, idx, w):
    """table [n, d]; idx [B, L]; w [B, L] -> pooled [B, d]."""
    rows = table[idx]  # [B, L, d]
    return np.einsum("bl,bld->bd", w, rows)


def dot_interaction(x, ly, interact_itself=False):
    """x [B, D], ly list of [B, D] slots."""
    b, d = x.shape
    t = np.stack([x] + list(ly), axis=1)  # [B, F, D]
    z = np.einsum("bfd,bgd->bfg", t, t)
    f = t.shape[1]
    li, lj = np.tril_indices(f, k=0 if interact_itself else -1)
    zflat = z[:, li, lj]
    return np.concatenate([x, zflat], axis=1)


def dlrm_forward(tables, bot, top, dense_x, indices, weights, sigmoid_bot=-1):
    """tables: list of [n, d]; indices/weights: [T, B, L].
    Returns (prob [B,1], logits [B,1])."""
    x = mlp_forward(dense_x, bot, sigmoid_bot)
    ly = [embedding_bag(tables[t], indices[t], weights[t]) for t in range(len(tables))]
    # split trick for wide tables
    d = x.shape[1]
    slots = []
    for y in ly:
        k = y.shape[1] // d
        if k == 1:
            slots.append(y)
        else:
            slots.extend(np.split(y, k, axis=1))
    z = dot_interaction(x, slots)
    logits = mlp_forward(z, top, sigmoid_layer=len(top) - 1, skip_last_activation=True)
    prob = 1.0 / (1.0 + np.exp(-logits))
    return prob, logits


def bce_loss(prob, target):
    eps = 0.0
    return float(np.mean(-(target * np.log(prob + eps) + (1 - target) * np.log(1 - prob + eps))))


def coalesce(flat_idx, flat_g):
    """Sum duplicate-index grads (torch sparse coalesce semantics)."""
    uniq = np.unique(flat_idx)
    out = np.zeros((len(uniq),) + flat_g.shape[1:], dtype=np.float64)
    for i, u in enumerate(uniq):
        out[i] = flat_g[flat_idx == u].sum(axis=0)
    return uniq, out


def rwsadagrad_row_update(table, momentum, uniq, g, lr, eps=1e-10):
    momentum[uniq] += (g * g).mean(axis=1)
    denom = np.sqrt(momentum[uniq]) + eps
    table[uniq] -= lr * g / denom[:, None]
    return table, momentum


def adagrad_update(p, acc, g, lr, eps=1e-10):
    acc += g * g
    p -= lr * g / (np.sqrt(acc) + eps)
    return p, acc
