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
    array (static numpy ``row_offsets``). Flat storage turns the multi-table
    lookup into a single gather — the same insight as the reference's CUDA
    kernel, and the natural layout for a row-sharded array on a TPU mesh.
  * Sub-128 dims that divide 128 (the reference's flagship 64-dim configs,
    Kaggle's 16-dim, MD-reduced dims) are stored PACKED: pack = 128/dim
    logical rows per 128-lane physical row, array shape
    ``[total_rows/pack, 128]``. XLA lays a narrow [R, dim] array out with
    lane-padded (8, 128) tiles — pack× wasted HBM and a relayout copy at
    every kernel call; the packed layout is compact and is what the Pallas
    kernels (ops/pallas_sparse_update.py, ops/pallas_stream_update.py) DMA
    directly. Dims ≥ 128 (or not dividing 128) keep the natural
    ``[total_rows, dim]`` shape (pack == 1).
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

LANES = 128
ROW_ALIGN = 8  # pad each table's row block so tables start sublane-aligned
               # (in PHYSICAL rows; packed groups align to 8*pack logical)
SENTINEL_ROWS = 8  # dead PHYSICAL rows at the end of every group store:
                   # redirect target for the pallas sparse-update kernel's
                   # masked items (ops/pallas_sparse_update.py). One full
                   # bf16 transfer unit, so sentinel writes never share a
                   # DMA unit with live rows. Packed groups carry
                   # SENTINEL_ROWS * pack logical sentinel rows.


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
    pack: logical rows per physical store row (128/dim for sub-128 dims
      dividing 128, else 1). The store array is [total_rows/pack, dim*pack].
    """

    table_ids: Tuple[int, ...]
    rows: Tuple[int, ...]
    dim: int
    row_offsets: Tuple[int, ...]
    total_rows: int
    size_class: int = 1
    pack: int = 1

    @property
    def num_tables(self) -> int:
        return len(self.table_ids)

    @property
    def store_shape(self) -> Tuple[int, int]:
        """Physical shape of this group's flat store array."""
        return (self.total_rows // self.pack, self.dim * self.pack)


def dim_pack(d: int) -> int:
    """Logical rows per 128-lane physical row for dim d."""
    return LANES // d if d < LANES and LANES % d == 0 else 1


def pack_store(arr, group: TableGroup):
    """[total_rows, dim] (logical) -> the group's physical store shape.
    numpy or jnp; a pure row-major reshape."""
    return arr.reshape(group.store_shape)


def unpack_store(arr, group: TableGroup):
    """Physical store -> [total_rows, dim] logical rows (for export,
    printing, quantization — off the hot path)."""
    return arr.reshape(group.total_rows, group.dim)


def _pad_l_sublane(gidx: jax.Array, w: jax.Array, fill_idx=0):
    """Pad the L axis of [T, B, L] indices/weights to a multiple of 8
    (zero weight, fill_idx rows) so downstream [t,b,l,width] <-> [K,width]
    reshapes are layout-preserving bitcasts (sublane tiling pads l to 8)."""
    l = gidx.shape[2]
    pad = (-l) % 8
    if pad == 0 or l == 1:
        return gidx, w
    gp = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad)), constant_values=fill_idx)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
    return gp, wp


def gather_rows(store: jax.Array, flat_gidx: jax.Array, group: TableGroup) -> jax.Array:
    """store rows at LOGICAL global ids -> [N, dim] (packed-aware)."""
    if group.pack == 1:
        return jnp.take(store, flat_gidx, axis=0)
    rows = jnp.take(store, flat_gidx // group.pack, axis=0)
    sub = (flat_gidx % group.pack).astype(jnp.int32)
    return jnp.take_along_axis(
        rows.reshape(-1, group.pack, group.dim), sub[:, None, None], axis=1
    )[:, 0]


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
        pack = dim_pack(d)
        align = ROW_ALIGN * pack  # table blocks stay physically 8-aligned
        offsets, cur = [], 0
        for _, n in entries:
            offsets.append(cur)
            cur += _round_up(n, align)
        groups.append(
            TableGroup(
                table_ids=tuple(t for t, _ in entries),
                rows=tuple(n for _, n in entries),
                dim=d,
                row_offsets=tuple(offsets),
                total_rows=cur + SENTINEL_ROWS * pack,
                # without a split threshold there are no "small" groups —
                # every group stays kernel-eligible (byte gate still applies)
                size_class=1 if small_threshold is None else size_class,
                pack=pack,
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
    return_rows: bool = False,
) -> jax.Array:
    """Pooled-sum lookup.

    store: the group's physical store (``group.store_shape``); indices:
    [T, B, L] per-table row ids; weights: [T, B, L] per-sample weights
    (0 = padding);
    vw: optional [total_rows] learned/fixed per-row pooling weights
        (the reference's v_W_l, gathered by index:
        dlrm_s_pytorch.py:545-548).
    impl: accepted for CLI parity; the fused-DMA pallas lookup kernel was
        REMOVED in round 3 after losing to the XLA gather at every measured
        (L, D) — crossover table in MEASUREMENTS.md, decision in PARITY.md
        (per-sample sequential DMA issue cannot beat the gather unit's
        issue rate). All lookups take the XLA path.
    Returns pooled [T, B, dim] = sum_l w * store[idx].
    """
    del impl
    t, b, l = indices.shape
    gidx = global_row_ids(group, indices)
    w = weights
    if vw is not None:
        w = w * jnp.take(vw, gidx.reshape(-1)).reshape(t, b, l)
    if group.pack > 1:
        # stay 128-lane-wide: gather physical rows, mask each contribution
        # to its lane block, pool, then fold blocks. A take_along_axis on a
        # [N, pack, dim] view would force a T(pack,128)->T(8,128) relayout
        # of the whole gather (profiled 19 ms at the L=100 bench shapes).
        # L is padded to a sublane multiple so [t,b,l,128]<->[K,128]
        # reshapes are bitcasts — at l=100 the (l,128) tiling pads l to
        # 104, turning every such reshape into a materialized copy
        # (~2.6 ms each at bench shapes).
        gidx, w = _pad_l_sublane(gidx, w)
        l8 = gidx.shape[2]
        width = group.dim * group.pack
        rows128 = jnp.take(store, gidx // group.pack, axis=0).astype(
            jnp.float32
        )  # [t,b,l8,width]
        blk = (
            jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // group.dim
        )
        mask = blk[None, None, None, :] == (gidx % group.pack)[..., None]
        pooled128 = jnp.sum(
            jnp.where(mask, rows128, 0.0) * w[..., None], axis=2
        )
        pooled = pooled128.reshape(t, b, group.pack, group.dim).sum(axis=2)
        if return_rows and l == 1:
            # the gathered PHYSICAL rows (all 128 lanes) enable the
            # write-only update on packed stores too
            return pooled, rows128[:, :, 0, :]
        return pooled
    rows = jnp.take(store, gidx.reshape(-1), axis=0).reshape(
        t, b, l, group.dim
    )
    if l == 1:
        r1 = rows[:, :, 0, :].astype(jnp.float32)
        pooled = r1 * w[:, :, 0][..., None]
        if return_rows:
            # the gathered rows ARE the rows the optimizer will update —
            # returning them lets the write-only update kernel skip its
            # per-row DMA read phase (ops/pallas_sparse_update.
            # sparse_rows_write); no extra gather — XLA reuses the one
            # materialization
            return pooled, r1
        return pooled
    # pooling is bandwidth-bound: a fused VPU multiply-sum is exact f32,
    # while an einsum would lower to bf16 MXU passes on TPU (measured
    # ~1e-3 relative error at L=100 — the reference pools in f32)
    return jnp.sum(w[..., None] * rows.astype(jnp.float32), axis=2)


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

    Returns (flat_idx [T*B*L] int32 LOGICAL global row ids, flat_g
    [T*B*L, dim*pack] PHYSICAL update rows — for packed groups each update
    sits in its logical row's lane block, zeros elsewhere). Emitting the
    128-lane physical rows directly keeps the big intermediate row-major:
    a [K, dim] tensor at sub-128 dims gets a column-major layout from XLA
    (to dodge lane padding) and then a chunked-transpose while-loop to feed
    the scatter — profiled ~23 ms at the L=100 bench shapes.
    Padded entries (weight 0) keep their row id but contribute zero grad.
    """
    t, b, l = indices.shape
    gidx = global_row_ids(group, indices)
    w = weights
    if vw is not None:
        w = w * jnp.take(vw, gidx.reshape(-1)).reshape(t, b, l)
    if group.pack > 1:
        # one kLoop fusion in [t,b,l,width]; L padded to a sublane multiple
        # so the trailing reshape to [K, width] is a bitcast (padding
        # entries carry the sentinel id -> dropped by the scatter)
        gidx, w = _pad_l_sublane(gidx, w, fill_idx=group.total_rows)
        l8 = gidx.shape[2]
        width = group.dim * group.pack
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // group.dim
        mask = blk[None, None, None, :] == (gidx % group.pack)[..., None]
        g128 = jnp.tile(g_pooled, (1, 1, group.pack))[:, :, None, :]
        flat_g = jnp.where(mask, w[..., None] * g128, 0.0).reshape(
            t * b * l8, width
        )
        return gidx.reshape(-1), flat_g
    if l == 1:
        # no size-1 L axis: a [T,B,1,D] intermediate gets a T(1,128)
        # layout (one sublane per tile, ~5x the elementwise cost —
        # profiled 0.10 ms at the headline config)
        flat_g = (w[:, :, 0, None] * g_pooled).reshape(t * b, group.dim)
        return gidx.reshape(-1), flat_g
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
    if group.pack > 1:
        # <store[idx], g> without un-packing rows: mask the physical row to
        # the target lane block and dot against the block-tiled cotangent
        width = group.dim * group.pack
        rows128 = jnp.take(store, gidx // group.pack, axis=0).astype(
            jnp.float32
        )
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // group.dim
        mask = blk[None, None, None, :] == (gidx % group.pack)[..., None]
        g128 = jnp.tile(g_pooled, (1, 1, group.pack))[:, :, None, :]
        g = jnp.sum(jnp.where(mask, rows128 * g128, 0.0), axis=-1) * weights
        return gidx.reshape(-1), g.reshape(-1)
    rows = jnp.take(store, gidx.reshape(-1), axis=0).reshape(
        t, b, l, group.dim
    )
    g = jnp.sum(rows.astype(jnp.float32) * g_pooled[:, :, None, :], axis=-1) * weights
    return gidx.reshape(-1), g.reshape(-1)
