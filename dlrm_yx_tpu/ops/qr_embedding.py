"""Quotient-Remainder compositional embeddings.

Capability parity with ``QREmbeddingBag`` in
``/root/reference/tricks/qr_embedding_bag.py:25-185`` (Shi et al.,
"Compositional Embeddings Using Complementary Partitions",
arXiv:1909.02107): a table of n rows is replaced by a quotient table of
ceil(n/c) rows and a remainder table of c rows; the embedding of index i is
combine(Q[i // c], R[i % c]) with combine ∈ {mult, add, concat}; pooling
sums the COMBINED per-index vectors (combine happens before the bag sum).

Applied to tables with rows > qr_threshold when qr_flag is set
(dlrm_s_pytorch.py:282-290).

TPU-native: both sub-tables are plain arrays; lookup is two gathers + a
VPU combine + masked sum — fully fused by XLA. Training uses the same
pooled-cotangent sparse-update path as regular tables; the chain rule
through the combine is applied explicitly in ``qr_row_grads``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QRSpec:
    """Static metadata for one QR-compressed table."""

    table_id: int      # canonical table index
    rows: int          # original number of categories n
    dim: int           # embedding dim of each sub-table
    collisions: int    # c
    operation: str     # mult | add | concat

    @property
    def q_rows(self) -> int:
        return int(np.ceil(self.rows / self.collisions))

    @property
    def out_dim(self) -> int:
        return 2 * self.dim if self.operation == "concat" else self.dim


def init_qr(rng: np.random.RandomState, spec: QRSpec) -> Tuple[np.ndarray, np.ndarray]:
    """Both sub-tables ~ U(-sqrt(1/n), sqrt(1/n)) over the ORIGINAL n
    (qr_embedding_bag.py init, which uses num_categories)."""
    bound = np.sqrt(1.0 / spec.rows)
    q = rng.uniform(-bound, bound, size=(spec.q_rows, spec.dim)).astype(np.float32)
    r = rng.uniform(-bound, bound, size=(spec.collisions, spec.dim)).astype(np.float32)
    return q, r


def _combine(q: jax.Array, r: jax.Array, op: str) -> jax.Array:
    if op == "mult":
        return q * r
    if op == "add":
        return q + r
    if op == "concat":
        return jnp.concatenate([q, r], axis=-1)
    raise ValueError(f"unknown qr operation {op!r}")


def qr_lookup(
    q_store: jax.Array,
    r_store: jax.Array,
    spec: QRSpec,
    indices: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """indices/weights: [B, L] for this table. Returns pooled [B, out_dim]."""
    qi = indices // spec.collisions
    ri = indices % spec.collisions
    q = jnp.take(q_store, qi.reshape(-1), axis=0).reshape(*indices.shape, spec.dim)
    r = jnp.take(r_store, ri.reshape(-1), axis=0).reshape(*indices.shape, spec.dim)
    emb = _combine(q, r, spec.operation)  # [B, L, out_dim]
    return jnp.einsum("bl,bld->bd", weights, emb)


def qr_row_grads(
    q_store: jax.Array,
    r_store: jax.Array,
    spec: QRSpec,
    indices: jax.Array,
    weights: jax.Array,
    g_pooled: jax.Array,
):
    """Chain rule through the combine for the pooled cotangent
    g_pooled [B, out_dim]. Returns ((q_idx [K], q_g [K, dim]),
    (r_idx [K], r_g [K, dim])) flat per-occurrence grads (uncoalesced)."""
    b, l = indices.shape
    qi = (indices // spec.collisions).reshape(-1)
    ri = (indices % spec.collisions).reshape(-1)
    w = weights[..., None]  # [B, L, 1]
    g = g_pooled[:, None, :]  # [B, 1, out_dim]
    if spec.operation == "mult":
        q = jnp.take(q_store, qi, axis=0).reshape(b, l, spec.dim)
        r = jnp.take(r_store, ri, axis=0).reshape(b, l, spec.dim)
        gq = (w * g * r).reshape(b * l, spec.dim)
        gr = (w * g * q).reshape(b * l, spec.dim)
    elif spec.operation == "add":
        gq = jnp.broadcast_to(w * g, (b, l, spec.dim)).reshape(b * l, spec.dim)
        gr = gq
    elif spec.operation == "concat":
        gq = jnp.broadcast_to(
            w * g[..., : spec.dim], (b, l, spec.dim)
        ).reshape(-1, spec.dim)
        gr = jnp.broadcast_to(
            w * g[..., spec.dim :], (b, l, spec.dim)
        ).reshape(-1, spec.dim)
    else:
        raise ValueError(spec.operation)
    return (qi, gq), (ri, gr)
