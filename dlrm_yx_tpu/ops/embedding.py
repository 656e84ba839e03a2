"""Table-batched embedding storage and lookup (EmbeddingBag-sum semantics).

Capability parity with the reference's three embedding paths:
  * per-table ``nn.EmbeddingBag(n, m, mode="sum", sparse=True)``
    (``/root/reference/dlrm_s_pytorch.py:267-318,526-587``),
  * the table-batched layout of the custom CUDA kernel — one tall
    ``[sum(rows), D]`` weight matrix + ``table_offsets`` per device
    (``/root/reference/yx_modfs/table_batched_embeddings_cuda_yx.cu:191-249``),
  * per-sample pooling weights v_W (dlrm_s_pytorch.py:308-316,545-548).

TPU-native design:
  * Tables are grouped by embedding dim; each group is ONE flat fp32/bf16
    array ``[total_rows_padded, dim]`` (static numpy ``row_offsets``). Flat
    storage turns the multi-table lookup into a single gather — the same
    insight as the reference's CUDA kernel, and the natural layout for a
    row-sharded array on a TPU mesh.
  * Sparse inputs are fixed shape: ``indices [T, B, L]`` int32 and
    ``weights [T, B, L]`` float (0 where padded). The reference's CSR
    (indices, offsets) layout is converted at the data layer — XLA wants
    static shapes.
  * The backward never materializes a dense ``[rows, dim]`` gradient:
    training code takes the cotangent w.r.t. the pooled output and feeds
    ``flat_row_grads`` + ``coalesce_rows`` + a scatter-based optimizer update
    (see optim/), mirroring what fused CUDA embedding optimizers do.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ROW_ALIGN = 8  # pad each table's row block so tables start sublane-aligned
SENTINEL_ROWS = 8  # dead rows at the end of every group store: redirect
                   # target for the pallas sparse-update kernel's masked
                   # items (ops/pallas_sparse_update.py)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class TableGroup:
    """Static metadata for one dim-group of tables (hashable; safe to close
    over in jit).

    table_ids: canonical table indices in this group (order within group).
    rows: true row counts per table.
    dim: embedding dim shared by the group.
    row_offsets: start row of each table inside the flat array.
    total_rows: padded total rows of the flat array (also used as the
      out-of-range sentinel index for dropped scatter updates).
    size_class: 0 = small-table group (always takes the exact XLA
      dense-accumulate update), 1 = big/unsplit (row-RMW-kernel eligible).
    """

    table_ids: Tuple[int, ...]
    rows: Tuple[int, ...]
    dim: int
    row_offsets: Tuple[int, ...]
    total_rows: int
    size_class: int = 1

    @property
    def num_tables(self) -> int:
        return len(self.table_ids)


def build_table_groups(
    emb_rows: Sequence[int],
    emb_dims: Sequence[int],
    table_ids: Optional[Sequence[int]] = None,
    small_threshold: Optional[int] = None,
) -> List[TableGroup]:
    """Group tables by dim; compute aligned flat-array row offsets.
    table_ids restricts to a subset of canonical tables (e.g. the non-QR
    tables; QR tables get their own compositional stores).

    small_threshold: when set, tables are additionally split into
    (rows <= threshold) and (rows > threshold) groups per dim. Small-table
    stores stay small enough that XLA's full-store-rewrite scatter is cheap
    and exactly coalescing, while big-table stores route through the pallas
    row-RMW kernel — see ops/pallas_sparse_update.py.

    Every group store carries SENTINEL_ROWS dead rows at the end (never
    looked up; scratch target for masked kernel updates)."""
    if table_ids is None:
        table_ids = range(len(emb_rows))
    by_key = {}
    for t in table_ids:
        n, d = emb_rows[t], emb_dims[t]
        size_class = 0 if small_threshold is None or n <= small_threshold else 1
        by_key.setdefault((int(d), size_class), []).append((int(t), int(n)))
    groups = []
    for key in sorted(by_key):
        d, size_class = key
        entries = by_key[key]
        offsets, cur = [], 0
        for _, n in entries:
            offsets.append(cur)
            cur += _round_up(n, ROW_ALIGN)
        groups.append(
            TableGroup(
                table_ids=tuple(t for t, _ in entries),
                rows=tuple(n for _, n in entries),
                dim=d,
                row_offsets=tuple(offsets),
                total_rows=cur + SENTINEL_ROWS,
                # without a split threshold there are no "small" groups —
                # every group stays kernel-eligible (byte gate still applies)
                size_class=1 if small_threshold is None else size_class,
            )
        )
    return groups


def init_emb_group(rng: np.random.RandomState, group: TableGroup) -> np.ndarray:
    """U(-sqrt(1/n), sqrt(1/n)) per table (dlrm_s_pytorch.py:294-299);
    padding rows are zero."""
    store = np.zeros((group.total_rows, group.dim), dtype=np.float32)
    for n, off in zip(group.rows, group.row_offsets):
        bound = np.sqrt(1.0 / n)
        store[off : off + n] = rng.uniform(-bound, bound, size=(n, group.dim)).astype(
            np.float32
        )
    return store


def global_row_ids(group: TableGroup, indices: jax.Array) -> jax.Array:
    """Map per-table indices [T, B, L] to rows of the flat array."""
    offs = jnp.asarray(np.array(group.row_offsets, dtype=np.int32))
    return indices + offs[:, None, None]


def lookup_group(
    store: jax.Array,
    group: TableGroup,
    indices: jax.Array,
    weights: jax.Array,
    vw: Optional[jax.Array] = None,
    impl: str = "xla",
) -> jax.Array:
    """Pooled-sum lookup.

    store: [total_rows, dim]; indices: [T, B, L] per-table row ids;
    weights: [T, B, L] per-sample weights (0 = padding);
    vw: optional [total_rows] learned/fixed per-row pooling weights
        (the reference's v_W_l, gathered by index:
        dlrm_s_pytorch.py:545-548).
    impl: 'xla' (native gather — measured fastest on v5e, see
        ops/pallas_embedding.py) or 'pallas' (fused DMA kernel, requires
        dim % 128 == 0).
    Returns pooled [T, B, dim] = sum_l w * store[idx].
    """
    t, b, l = indices.shape
    gidx = global_row_ids(group, indices)
    w = weights
    if vw is not None:
        w = w * jnp.take(vw, gidx.reshape(-1)).reshape(t, b, l)
    if impl == "pallas" and store.dtype == jnp.float32:
        from dlrm_yx_tpu.ops.pallas_embedding import fused_lookup

        return fused_lookup(store, jnp.minimum(gidx, store.shape[0] - 1), w)
    rows = jnp.take(store, gidx.reshape(-1), axis=0).reshape(t, b, l, group.dim)
    if l == 1:
        return rows[:, :, 0, :].astype(jnp.float32) * w[:, :, 0][..., None]
    return jnp.einsum("tbl,tbld->tbd", w, rows.astype(jnp.float32))


def flat_row_grads(
    group: TableGroup,
    indices: jax.Array,
    weights: jax.Array,
    g_pooled: jax.Array,
    vw: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Expand the pooled-output cotangent into per-row gradient contributions.

    d loss / d store[idx[t,b,l]] += w[t,b,l] * g_pooled[t,b]  (duplicates NOT
    yet coalesced — feed through coalesce_rows for non-linear optimizers,
    mirroring grad.coalesce() in /root/reference/optim/rwsadagrad.py:98).

    Returns (flat_idx [T*B*L] int32 global row ids, flat_g [T*B*L, dim]).
    Padded entries (weight 0) keep their row id but contribute zero grad.
    """
    t, b, l = indices.shape
    gidx = global_row_ids(group, indices)
    w = weights
    if vw is not None:
        w = w * jnp.take(vw, gidx.reshape(-1)).reshape(t, b, l)
    flat_g = (w[..., None] * g_pooled[:, :, None, :]).reshape(t * b * l, group.dim)
    return gidx.reshape(-1), flat_g


def vw_row_grads(
    group: TableGroup,
    store: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    g_pooled: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Gradient contributions for *learned* per-row pooling weights v_W:
    d loss / d vw[idx[t,b,l]] += mask[t,b,l] * <g_pooled[t,b], store[idx]>.

    Returns (flat_idx [T*B*L], flat_g [T*B*L])."""
    t, b, l = indices.shape
    gidx = global_row_ids(group, indices)
    rows = jnp.take(store, gidx.reshape(-1), axis=0).reshape(t, b, l, group.dim)
    g = jnp.einsum("tbld,tbd->tbl", rows.astype(jnp.float32), g_pooled) * weights
    return gidx.reshape(-1), g.reshape(-1)
