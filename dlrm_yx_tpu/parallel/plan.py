"""Hybrid-parallel placement plan.

Encodes the reference's hybrid layout (SURVEY.md §2.4): embedding tables
model-parallel over the "model" mesh axis by whole-table placement
(``sharders``), dense MLPs data-parallel, pooled vectors exchanged with
all-to-all. All the static bookkeeping — device-major table order, padded
slab sizes, per-device row offsets, the canonical-order restoring permutation
(the reference's table-order permutation after its butterfly shuffle,
``dlrm_s_pytorch.py:948-956``) — lives here as numpy, computed once.

Current scope: homogeneous table dim (all tables share one dim, possibly
k*D); this covers Kaggle / Terabyte / bench configs. Mixed-dim (MD) models
run on the single-device or data-parallel path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.ops.embedding import SENTINEL_ROWS
from dlrm_yx_tpu.parallel.sharders import shard

ROW_ALIGN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """All-static layout for one (config, n_model, sharder) choice.

    table_device: canonical table -> model-shard id.
    t_pad: per-shard table-slot count (max tables on any shard; short shards
      padded with dummy tables).
    device_table_order: [n_model * t_pad] table ids in device-major order,
      -1 = padding slot.
    canonical_gather: [T] position of canonical table t in device-major order
      (applied after the all-to-all to restore canonical feature order).
    row_offsets: [n_model * t_pad] start row of each device-major table slot
      inside its SECTION's store (big slots index the big store, small slots
      the small store); padding slots point past their section's live rows
      (clamped to the dead sentinel row on gather, dropped on scatter).
    """

    n_model: int
    table_device: Tuple[int, ...]
    t_pad: int
    device_table_order: Tuple[int, ...]
    canonical_gather: Tuple[int, ...]
    row_offsets: Tuple[int, ...]
    dim: int
    # big/small partition (uniform across shards, so shard_map code can
    # statically split slots): slots [0, n_big_slots) hold big tables (or
    # padding) living in the BIG store [r_big + SENTINEL_ROWS, dim]; slots
    # after hold small tables living in a SEPARATE small store
    # [r_small + SENTINEL_ROWS, dim]. Separate arrays keep the small-table
    # dense-accumulate update a full-array elementwise rewrite of the SMALL
    # store only — one array would cost a full-store dynamic-update-slice
    # copy per step (profiled ~0.9 ms at bench scale). Big tables update
    # through the pallas row-RMW kernel (sparse_update_impl='pallas').
    n_big_slots: int = 0
    r_big: int = 0
    r_small: int = 0
    # pseudo-table expansion for QR 'concat' (out_dim 2D -> the table
    # contributes TWO canonical slots, quotient then remainder, each a
    # plain D-wide table in the sharded stores — concat needs NO combine,
    # so unlike mult/add there is no replicated remainder store and no
    # chain rule; identity mapping otherwise):
    #   pseudo_table[pid] = canonical table id
    #   pseudo_xform[pid] = 0 plain | 1 idx//c | 2 idx%c
    #   pseudo_rows[pid]  = rows of the pseudo-table
    # device_table_order / canonical_gather / row_offsets index PSEUDO ids.
    pseudo_table: Tuple[int, ...] = ()
    pseudo_xform: Tuple[int, ...] = ()
    pseudo_rows: Tuple[int, ...] = ()
    # logical rows per 128-lane physical store row (128/dim for sub-128
    # dims dividing 128 on plain-table plans; 1 with QR/MD, whose lookups
    # need per-row values) — see ops/embedding.py
    pack: int = 1

    @property
    def r_big_pad(self) -> int:
        """LOGICAL rows of the big store (live + dead sentinel unit)."""
        return self.r_big + SENTINEL_ROWS * self.pack

    @property
    def r_small_pad(self) -> int:
        return self.r_small + SENTINEL_ROWS * self.pack

    def store_shape(self, section: str):
        """Physical per-shard store array shape for 'big' / 'small'."""
        rows = self.r_big_pad if section == "big" else self.r_small_pad
        return (rows // self.pack, self.dim * self.pack)
    # QR compression (qr_flag): the QUOTIENT store of a QR table is sharded
    # like a normal table (the planner sees q_rows); the tiny REMAINDER
    # stores are replicated on every shard as one flat [qr_r_rows, dim]
    # array. Per device-major slot: collisions c (0 = not QR) and the
    # remainder store row offset (0 for non-QR slots).
    slot_coll: Tuple[int, ...] = ()
    slot_roff: Tuple[int, ...] = ()
    qr_r_rows: int = 0

    @property
    def num_tables(self) -> int:
        return len(self.table_device)


def make_plan(
    config: DLRMConfig,
    n_model: int,
    alg: str = "greedy",
    allocation: Optional[Sequence[int]] = None,
) -> ShardingPlan:
    dims = set(config.emb_dims)
    if len(dims) == 1:
        dim = dims.pop()
    elif config.md_table_ids:
        # mixed-dimension (MD) tables: every slot uses the max dim; MD
        # tables' rows are stored with zero-padded columns and their pooled
        # outputs are sliced back to d_t + up-projected AFTER the exchange
        # (PrEmbeddingBag's Linear, applied post-all-to-all)
        dim = max(dims)
        for t, d in enumerate(config.emb_dims):
            if d != dim and t not in config.md_table_ids:
                raise ValueError(
                    f"table {t} has dim {d} != {dim} but is not an MD table"
                )
    else:
        # arbitrary k*D dim mixes (the reference's split trick composes
        # with every mode, dlrm_s_pytorch.py:579-585): slots carry the max
        # dim, narrower tables' rows are stored with zero-padded columns
        # and their pooled outputs sliced back after the exchange
        dim = max(dims)
        for t, d in enumerate(config.emb_dims):
            if d % config.base_dim:
                raise ValueError(
                    f"table {t} dim {d} is not a multiple of the base dim"
                )
    # QR tables contribute their QUOTIENT store to the sharded layout
    # (combine happens before pooling inside the shard; remainder stores
    # are replicated). 'concat' changes the slot dim — unsupported here.
    qr_ids = set(config.qr_table_ids)
    c = config.qr_collisions
    concat = bool(qr_ids) and config.qr_operation == "concat"
    if concat and len(set(config.emb_dims)) > 1:
        raise NotImplementedError(
            "hybrid QR concat with mixed k*D table dims is unsupported "
            "(slot bookkeeping assumes uniform D with concat)"
        )
    if concat:
        # expand QR tables into (quotient, remainder) pseudo-tables; both
        # are plain tables in the sharded stores (adjacent canonical slots
        # match torch's concat order [q ; r])
        pseudo_table, pseudo_xform, pseudo_rows = [], [], []
        for tt, n in enumerate(config.emb_rows):
            if tt in qr_ids:
                pseudo_table += [tt, tt]
                pseudo_xform += [1, 2]
                pseudo_rows += [int(np.ceil(n / c)), c]
            else:
                pseudo_table.append(tt)
                pseudo_xform.append(0)
                pseudo_rows.append(n)
        rows = tuple(pseudo_rows)
    else:
        pseudo_table = list(range(len(config.emb_rows)))
        pseudo_xform = [0] * len(config.emb_rows)
        rows = tuple(
            int(np.ceil(n / c)) if tt in qr_ids else n
            for tt, n in enumerate(config.emb_rows)
        )
        pseudo_rows = list(rows)
    # replicated remainder-store layout for the mult/add combines (concat
    # has no combine, so no replicated store)
    r_offs: dict = {}
    cur_r = 0
    if not concat:
        for tt in sorted(qr_ids):
            r_offs[tt] = cur_r
            cur_r += _round_up(c, ROW_ALIGN)
    thr = config.emb_split_threshold or 0
    table_device = shard(rows, n_model, alg, allocation)
    from dlrm_yx_tpu.ops.embedding import dim_pack

    pack = 1 if (qr_ids or config.md_table_ids) else dim_pack(dim)

    # per shard: big tables first, then small — the slot partition must be
    # UNIFORM across shards (shard_map code is SPMD), so both sections are
    # padded to the max over shards
    per_big: List[List[int]] = [[] for _ in range(n_model)]
    per_small: List[List[int]] = [[] for _ in range(n_model)]
    for t, d in enumerate(table_device):
        # threshold disabled -> everything "big" (kernel-eligible)
        (per_small if thr and rows[t] <= thr else per_big)[d].append(t)
    n_big_slots = max(len(ts) for ts in per_big)
    n_small_slots = max(len(ts) for ts in per_small)
    t_pad = n_big_slots + n_small_slots

    align = ROW_ALIGN * pack  # table blocks stay physically 8-row aligned

    def layout(per_dev, base):
        """Row offsets per shard starting at base; returns (offsets, extent)."""
        extent = 0
        out = []
        for ts in per_dev:
            offs, cur = [], base
            for t in ts:
                offs.append(cur)
                cur += _round_up(rows[t], align)
            out.append(offs)
            extent = max(extent, cur - base, 0)
        return out, _round_up(extent, align)

    big_offsets, r_big = layout(per_big, 0)
    small_offsets, r_small = layout(per_small, 0)

    device_table_order: List[int] = []
    row_offsets: List[int] = []
    for d in range(n_model):
        device_table_order.extend(
            per_big[d] + [-1] * (n_big_slots - len(per_big[d]))
            + per_small[d] + [-1] * (n_small_slots - len(per_small[d]))
        )
        # padding slots point one past their section's live rows: the gather
        # clamps them onto the section's dead sentinel rows, scatter drops
        row_offsets.extend(
            big_offsets[d]
            + [r_big + SENTINEL_ROWS * pack] * (n_big_slots - len(per_big[d]))
            + small_offsets[d]
            + [r_small + SENTINEL_ROWS * pack]
            * (n_small_slots - len(per_small[d]))
        )

    canonical_gather = [0] * len(rows)
    for pos, t in enumerate(device_table_order):
        if t >= 0:
            canonical_gather[t] = pos

    slot_coll = tuple(
        (c if (not concat and t in qr_ids) else 0) if t >= 0 else 0
        for t in device_table_order
    )
    slot_roff = tuple(
        r_offs.get(t, 0) if t >= 0 else 0 for t in device_table_order
    )

    return ShardingPlan(
        n_model=n_model,
        table_device=tuple(table_device),
        t_pad=t_pad,
        device_table_order=tuple(device_table_order),
        canonical_gather=tuple(canonical_gather),
        row_offsets=tuple(row_offsets),
        dim=dim,
        n_big_slots=n_big_slots,
        r_big=r_big,
        r_small=r_small,
        pack=pack,
        slot_coll=slot_coll,
        slot_roff=slot_roff,
        qr_r_rows=cur_r,
        pseudo_table=tuple(pseudo_table),
        pseudo_xform=tuple(pseudo_xform),
        pseudo_rows=tuple(pseudo_rows),
    )


def build_sharded_emb(plan: ShardingPlan, config: DLRMConfig, per_table):
    """Assemble the (big, small) parameter arrays ([n_model, r_big_pad, dim]
    and [n_model, r_small_pad, dim]) from per-table weights (dict or list
    of [rows_t, dim])."""
    big = np.zeros((plan.n_model, plan.r_big_pad, plan.dim), dtype=np.float32)
    small = np.zeros(
        (plan.n_model, plan.r_small_pad, plan.dim), dtype=np.float32
    )
    for pos, t in enumerate(plan.device_table_order):
        if t < 0:
            continue
        d = pos // plan.t_pad
        off = plan.row_offsets[pos]
        w = np.asarray(per_table[t])
        out = big if pos % plan.t_pad < plan.n_big_slots else small
        # MD tables have d_t < dim: zero-padded columns
        out[d, off : off + w.shape[0], : w.shape[1]] = w
    return (
        big.reshape((plan.n_model,) + plan.store_shape("big")),
        small.reshape((plan.n_model,) + plan.store_shape("small")),
    )


def extract_tables(plan: ShardingPlan, config: DLRMConfig, emb, emb_small=None):
    """Inverse of build_sharded_emb: per-canonical-table weights (for
    checkpoint export / tests). QR tables yield their QUOTIENT store."""
    emb = np.asarray(emb).reshape(plan.n_model, plan.r_big_pad, plan.dim)
    emb_small = (
        np.asarray(emb_small).reshape(
            plan.n_model, plan.r_small_pad, plan.dim
        )
        if emb_small is not None
        else None
    )
    out = {}
    for pos, pid in enumerate(plan.device_table_order):
        if pid < 0:
            continue
        if plan.pseudo_xform[pid] == 2:
            continue  # concat remainder slot: canonical extract = quotient
        tt = plan.pseudo_table[pid]
        d = pos // plan.t_pad
        off = plan.row_offsets[pos]
        n = plan.pseudo_rows[pid]
        src = emb if pos % plan.t_pad < plan.n_big_slots else emb_small
        out[tt] = np.asarray(src[d, off : off + n, : config.emb_dims[tt]])
    return [out[tt] for tt in range(len(config.emb_rows))]


def arrange_sparse_inputs(
    plan: ShardingPlan, indices: np.ndarray, weights: np.ndarray
):
    """Reorder canonical [T, B, L] sparse inputs into device-major
    [n_model * t_pad, B, L] slots (padding slots: index 0, weight 0).

    This is the TPU equivalent of the reference's per-rank input re-layout
    (``distribute_batched_emb_data``, dlrm_s_pytorch.py:772-824)."""
    order = np.asarray(plan.device_table_order)
    src = np.asarray(plan.pseudo_table)
    _, b, l = indices.shape
    out_i = np.zeros((len(order), b, l), dtype=indices.dtype)
    out_w = np.zeros((len(order), b, l), dtype=weights.dtype)
    valid = order >= 0
    out_i[valid] = indices[src[order[valid]]]
    out_w[valid] = weights[src[order[valid]]]
    return out_i, out_w
