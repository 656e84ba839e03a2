"""Duplicate-index coalescing for sparse gradients.

The reference relies on ``torch.sparse.coalesce()`` before non-linear
optimizer updates (``/root/reference/optim/rwsadagrad.py:98``: "the update is
non-linear so indices must be unique"). On TPU there are no atomics-with-sort
shortcuts; the idiomatic equivalent is sort + segment-sum, which is exactly
what this module does — all static shapes, fully jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def coalesce_rows(
    flat_idx: jax.Array, flat_g: jax.Array, sentinel: int, aux=None
):
    """Sum gradient rows that share an index.

    flat_idx: [K] int32 row ids (may repeat).
    flat_g:   [K, D] (or [K]) gradient contributions.
    sentinel: an id strictly greater than any valid row id; slots in the
      output that do not correspond to a unique input index get this id so a
      downstream ``.at[].add(mode='drop')`` scatter ignores them.
    aux: optional [K, W] per-occurrence payload carried by REPRESENTATIVE
      (not summed) — duplicate occurrences of one row hold identical aux
      (e.g. the pre-update store row the forward lookup gathered), so any
      member stands for the segment.

    Returns (unique_idx [K], summed_g like flat_g[, aux_rep like aux]):
    unique indices packed at the front (ascending), remainder = sentinel
    with zero grads.
    """
    k = flat_idx.shape[0]
    order = jnp.argsort(flat_idx)
    s_idx = flat_idx[order]
    s_g = flat_g[order]
    # segment id = number of index changes before this position
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (s_idx[1:] != s_idx[:-1]).astype(jnp.int32)]
    )
    seg_id = jnp.cumsum(new_seg)
    summed = jax.ops.segment_sum(s_g, seg_id, num_segments=k)
    # representative index per segment: scatter (first occurrence wins — all
    # members share the same index anyway)
    uniq = jnp.full((k,), sentinel, dtype=s_idx.dtype).at[seg_id].set(s_idx, mode="drop")
    if aux is None:
        return uniq, summed
    aux_rep = (
        jnp.zeros_like(aux).at[seg_id].set(aux[order], mode="drop")
    )
    return uniq, summed, aux_rep
