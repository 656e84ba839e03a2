"""Row-sharded embedding tables over the "model" mesh axis.

The reference places WHOLE tables on devices (``/root/reference/sharders.py``;
``dlrm_s_pytorch.py:443-489``) — a table never spans ranks, so its largest
table must fit one GPU. This module is the idiomatic-TPU generalization
(SURVEY.md §7 stage 8, the north-star extension): big tables' flat
row space ``[total_rows, D]`` is split row-wise into ``n_model`` equal
shards, so a 40M-row MLPerf table spans the whole mesh and HBM scales with
the slice.

Store split (round 4): only tables with rows > config.emb_split_threshold
live in the sharded row space. Small tables — the dup-heavy ones whose
adagrad-family momentum must coalesce exactly, and whose whole footprint
is a few tens of MB — live in ONE replicated group store per shard
(ops/embedding.TableGroup), exactly like the single-device path's small
group. This buys three things over the round-3 unified row space:
  * the row-RMW/write-only kernel only sees big-table items (random ids
    into millions of rows, duplicates rare), so the write-only fast path
    (forward-gathered rows, one DMA issue per row) applies — the round-3
    unified space had to pre-coalesce every step (a sort) because tiny
    tables flooded the kernel's serialized conflict tail;
  * small tables update via the exactly-coalescing XLA dense-accumulate
    (size_class=0) on a store small enough that a full rewrite is cheap;
  * small-table lookups happen AFTER the batch-splitting collective, on
    the local batch slice, from the replicated store — the psum_scatter
    moves only big-table partials.

Routing for the sharded (big) space (all static shapes, no data-dependent
all-to-all sizes):
  * every model shard sees the full per-data-shard index block ``[T, Bd, L]``
    (indices are replicated over "model" — they are int32 and tiny next to
    the pooled vectors);
  * a shard pools only rows it owns: ``local = global_id - base``; rows
    outside ``[0, rows_local)`` are masked to weight 0, so each shard
    produces a PARTIAL pooled sum ``[T, Bd, D]``;
  * ``psum_scatter`` over "model" both completes the sum (each global row
    lives on exactly one shard) and splits the batch axis, yielding the
    batch-sharded pooled layout the dense towers want — one collective does
    reduce + re-partition, the row-sharded analog of the whole-table design's
    all-to-all;
  * backward: the pooled cotangent is ``all_gather``-ed back over "model"
    (the transpose of psum_scatter, which jax.vjp would also produce), each
    shard extracts gradient rows it owns and applies local scatter updates —
    no cross-shard optimizer state, same contract as the reference's
    per-rank sparse updates (SURVEY.md §2.4). The forward's gathered rows
    ride the same "data" all_gather as the gradients so the write-only
    kernel can skip its read phase (parallel/hybrid.py does the same).

Dense MLPs stay replicated / data-parallel over ("data", "model") exactly as
in parallel/hybrid.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.parallel.mesh import mesh_jit
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.losses import loss_fn, predictions_from_logits
from dlrm_yx_tpu.ops.mlp import apply_mlp, init_mlp
from dlrm_yx_tpu.ops.embedding import (
    SENTINEL_ROWS,
    TableGroup,
    build_table_groups,
    flat_row_grads,
    lookup_group,
    vw_row_grads,
)
from dlrm_yx_tpu.optim.optimizer import (
    OptConfig,
    dense_update,
    sparse_update,
    sparse_update_1d,
    update_dense_towers,
)

ROW_ALIGN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _reject_unsupported_variants(config: DLRMConfig, mode: str) -> None:
    """The row/col-sharded paths train plain uncompressed tables; silently
    training a DIFFERENT model than requested (QR/MD/weighted pooling) would
    raise no shape error because rows are homogeneous — reject instead
    (use --shard-mode=table, which supports these variants)."""
    unsupported = []
    if config.qr_table_ids:
        unsupported.append("--qr-flag")
    if config.md_table_ids:
        unsupported.append("--md-flag")
    if unsupported:
        raise NotImplementedError(
            f"{mode}-sharded mode does not support {', '.join(unsupported)}; "
            "use --shard-mode=table (hybrid) for these model variants"
        )


@dataclasses.dataclass(frozen=True)
class RowShardPlan:
    """Static layout: BIG tables (one shared dim) concatenated into a flat
    row space split evenly over n_model shards; small tables in one
    replicated TableGroup store per shard (None when every table is big —
    or when all are small: a degenerate config keeps everything sharded so
    the path still exercises its collectives).

    big_ids: canonical table ids in the sharded row space (order matches
    rows/row_offsets).
    row_offsets: start of each big table in the global row space.
    rows_local: rows per shard (global rows padded to n_model * ROW_ALIGN).
    small_group: replicated small-table group (canonical ids in
    small_group.table_ids), or None.
    """

    n_model: int
    dim: int
    rows: tuple
    row_offsets: tuple
    rows_local: int   # ADDRESS-space rows per shard (owner = gid // rows_local)
    pack: int = 1     # logical rows per 128-lane store row (128/dim for
                      # sub-128 dims dividing 128 — see ops/embedding.py)
    big_ids: tuple = ()
    small_group: Optional[TableGroup] = None
    # True when dup-heavy small tables share the SHARDED space (split
    # disabled or every table under the threshold): updates must
    # pre-coalesce (round-3 finding: uncoalesced tiny-table duplicates
    # explode the kernel's serialized conflict tail) and the write-only
    # path stays off. False when the big space holds only big tables.
    dups_in_big: bool = True

    @property
    def total_rows(self) -> int:
        return self.n_model * self.rows_local

    @property
    def store_rows(self) -> int:
        """LOGICAL rows per shard store: the address space plus dead
        sentinel rows (one full kernel transfer unit)."""
        return self.rows_local + SENTINEL_ROWS * self.pack

    @property
    def store_shape(self):
        """Physical per-shard store array shape."""
        return (self.store_rows // self.pack, self.dim * self.pack)

    @property
    def num_tables(self) -> int:
        """Tables in the SHARDED row space (small tables not counted)."""
        return len(self.rows)

    @property
    def canonical_perm(self) -> np.ndarray:
        """Static permutation: concat([big tables, small tables]) order ->
        canonical table order (positions of each canonical table in the
        concatenated pooled tensor)."""
        order = list(self.big_ids) + (
            list(self.small_group.table_ids) if self.small_group else []
        )
        return np.argsort(np.asarray(order))


def make_row_plan(config: DLRMConfig, n_model: int) -> RowShardPlan:
    _reject_unsupported_variants(config, "row")
    dims = set(config.emb_dims)
    if len(dims) != 1:
        raise ValueError("row-sharded plan requires homogeneous table dims")
    dim = dims.pop()
    from dlrm_yx_tpu.ops.embedding import dim_pack

    pack = dim_pack(dim)
    thr = config.emb_split_threshold or 0
    ids = list(range(len(config.emb_rows)))
    small_ids = [t for t in ids if thr and config.emb_rows[t] <= thr]
    big_ids = [t for t in ids if t not in set(small_ids)]
    if not big_ids:
        # every table under the threshold: keep them all in the sharded
        # space so the path still shards (tiny configs — tests, smoke runs)
        big_ids, small_ids = ids, []
    small_group = None
    if small_ids:
        (small_group,) = build_table_groups(
            config.emb_rows, config.emb_dims, table_ids=small_ids
        )
        # small stores always take the exact dense-accumulate update
        small_group = dataclasses.replace(small_group, size_class=0)

    align = ROW_ALIGN * pack  # shard stores stay physically 8-row aligned
    offsets, cur = [], 0
    for t in big_ids:
        offsets.append(cur)
        cur += _round_up(config.emb_rows[t], align)
    rows_local = _round_up(cur, n_model * align) // n_model
    dup_thr = thr if thr > 0 else 65536
    return RowShardPlan(
        n_model=n_model,
        dim=dim,
        rows=tuple(config.emb_rows[t] for t in big_ids),
        row_offsets=tuple(offsets),
        rows_local=rows_local,
        pack=pack,
        big_ids=tuple(big_ids),
        small_group=small_group,
        dups_in_big=any(config.emb_rows[t] <= dup_thr for t in big_ids),
    )


def build_row_sharded_emb(plan: RowShardPlan, per_table) -> np.ndarray:
    """[n_model, *store_shape] from per-BIG-table weights in plan.big_ids
    order (each shard's slice followed by dead sentinel rows; sub-128 dims
    store packed pack-rows-per-physical-row)."""
    flat = np.zeros((plan.total_rows, plan.dim), np.float32)
    for t, w in enumerate(per_table):
        off = plan.row_offsets[t]
        flat[off : off + w.shape[0]] = np.asarray(w)
    flat = flat.reshape(plan.n_model, plan.rows_local, plan.dim)
    out = np.zeros((plan.n_model, plan.store_rows, plan.dim), np.float32)
    out[:, : plan.rows_local] = flat
    return out.reshape((plan.n_model,) + plan.store_shape)


def build_small_store(group: TableGroup, per_table) -> np.ndarray:
    """Replicated small-table group store from per-table weights in
    group.table_ids order (the single-device group layout)."""
    store = np.zeros((group.total_rows, group.dim), np.float32)
    for w, off in zip(per_table, group.row_offsets):
        w = np.asarray(w)
        store[off : off + w.shape[0]] = w
    return store.reshape(group.store_shape)


def extract_row_sharded_tables(plan: RowShardPlan, emb: np.ndarray,
                               emb_small: Optional[np.ndarray] = None):
    """Inverse of build_row_sharded_emb/build_small_store: canonical
    per-table weights (checkpoint export / tests)."""
    logical = np.asarray(emb).reshape(
        plan.n_model, plan.store_rows, plan.dim
    )
    flat = logical[:, : plan.rows_local].reshape(plan.total_rows, plan.dim)
    out: Dict[int, np.ndarray] = {}
    for t, off, n in zip(plan.big_ids, plan.row_offsets, plan.rows):
        out[t] = flat[off : off + n].copy()
    if plan.small_group is not None:
        g = plan.small_group
        s = np.asarray(emb_small).reshape(g.total_rows, g.dim)
        for t, off, n in zip(g.table_ids, g.row_offsets, g.rows):
            out[t] = s[off : off + n].copy()
    return [out[t] for t in sorted(out)]


def init_row_sharded_params(
    config: DLRMConfig, plan: RowShardPlan, seed: int = 123
) -> Dict:
    """Same per-table draws as init_dlrm (identical table weights), laid out
    row-sharded (big tables) + replicated (small group)."""
    rng = np.random.RandomState(seed)
    per_table = []
    for n, d in zip(config.emb_rows, config.emb_dims):
        bound = np.sqrt(1.0 / n)
        per_table.append(rng.uniform(-bound, bound, size=(n, d)).astype(np.float32))
    emb = build_row_sharded_emb(plan, [per_table[t] for t in plan.big_ids])
    emb_small = None
    if plan.small_group is not None:
        emb_small = jnp.asarray(
            build_small_store(
                plan.small_group,
                [per_table[t] for t in plan.small_group.table_ids],
            )
        )
    vw = vw_small = None
    if config.weighted_pooling is not None:
        # v_W = ones per real row (dlrm_s_pytorch.py:313-316), sharded with
        # the big row space / replicated with the small store;
        # padding/sentinel rows carry 0 so clamped gathers contribute nothing
        flat = np.zeros((plan.total_rows,), np.float32)
        for off, n in zip(plan.row_offsets, plan.rows):
            flat[off : off + n] = 1.0
        shards = np.zeros((plan.n_model, plan.store_rows), np.float32)
        shards[:, : plan.rows_local] = flat.reshape(
            plan.n_model, plan.rows_local
        )
        vw = jnp.asarray(shards)
        if plan.small_group is not None:
            g = plan.small_group
            vs = np.zeros((g.total_rows,), np.float32)
            for off, n in zip(g.row_offsets, g.rows):
                vs[off : off + n] = 1.0
            vw_small = jnp.asarray(vs)
    return {
        "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_bot)],
        "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_top)],
        "emb": jnp.asarray(emb),
        "emb_small": emb_small,
        "vw": vw,
        "vw_small": vw_small,
    }


def init_row_sharded_opt_state(
    opt: OptConfig, params: Dict, plan: RowShardPlan = None
) -> Dict:
    if opt.name == "sgd":
        return {}
    dense = {
        k: [(jnp.zeros_like(w), jnp.zeros_like(b)) for (w, b) in params[k]]
        for k in ("bot", "top")
    }
    emb = params["emb"]
    pack = plan.pack if plan is not None else 1
    if opt.name == "adagrad":
        acc = jnp.zeros_like(emb)
    else:
        # rwsadagrad: one accumulator per LOGICAL row, carried FLAT per
        # shard (global 1-D sharded over "model") — 2-D forms with a size-1
        # shard axis take a T(1,128) layout and pay boundary relayouts
        from dlrm_yx_tpu.optim.optimizer import acc_len

        n_log = emb.shape[1] * pack
        acc = jnp.zeros((emb.shape[0] * acc_len(n_log),), jnp.float32)
    state = {"dense": dense, "emb": acc}
    if params.get("emb_small") is not None:
        g = plan.small_group
        if opt.name == "adagrad":
            state["emb_small"] = jnp.zeros_like(params["emb_small"])
        else:
            state["emb_small"] = jnp.zeros((g.total_rows,), jnp.float32)
    if params.get("vw") is not None:
        state["vw"] = jnp.zeros_like(params["vw"])
        if params.get("vw_small") is not None:
            state["vw_small"] = jnp.zeros_like(params["vw_small"])
    return state


def _row_pspecs(config: DLRMConfig, plan: RowShardPlan):
    return {
        "bot": [(P(), P())] * (len(config.ln_bot) - 1),
        "top": [(P(), P())] * (len(config.ln_top) - 1),
        "emb": P("model"),
        "emb_small": P() if plan.small_group is not None else None,
        "vw": P("model") if config.weighted_pooling is not None else None,
        "vw_small": (
            P()
            if config.weighted_pooling is not None
            and plan.small_group is not None
            else None
        ),
    }


def _row_sspecs(config: DLRMConfig, plan: RowShardPlan, opt: OptConfig):
    if opt.name == "sgd":
        return {}
    s = {
        "dense": {
            "bot": [(P(), P())] * (len(config.ln_bot) - 1),
            "top": [(P(), P())] * (len(config.ln_top) - 1),
        },
        "emb": P("model"),
    }
    if plan.small_group is not None:
        s["emb_small"] = P()
    if config.weighted_pooling is not None:
        # fixed mode carries (dead, zero) vw accumulators too —
        # init_row_opt_state creates them whenever params have vw
        s["vw"] = P("model")
        if plan.small_group is not None:
            s["vw_small"] = P()
    return s


def shard_row_params(mesh: Mesh, params: Dict, opt: OptConfig, opt_state: Dict):
    p = dict(params)
    p["emb"] = jax.device_put(params["emb"], NamedSharding(mesh, P("model")))
    if params.get("emb_small") is not None:
        p["emb_small"] = jax.device_put(
            params["emb_small"], NamedSharding(mesh, P())
        )
    if params.get("vw") is not None:
        p["vw"] = jax.device_put(params["vw"], NamedSharding(mesh, P("model")))
        if params.get("vw_small") is not None:
            p["vw_small"] = jax.device_put(
                params["vw_small"], NamedSharding(mesh, P())
            )
    for k in ("bot", "top"):
        p[k] = [
            tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
            for layer in params[k]
        ]
    s = dict(opt_state)
    if opt.name != "sgd":
        s["emb"] = jax.device_put(opt_state["emb"], NamedSharding(mesh, P("model")))
        for k in ("emb_small", "vw_small"):
            if k in opt_state:
                s[k] = jax.device_put(opt_state[k], NamedSharding(mesh, P()))
        if "vw" in opt_state:
            s["vw"] = jax.device_put(
                opt_state["vw"], NamedSharding(mesh, P("model"))
            )
        s["dense"] = {
            k: [
                tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
                for layer in opt_state["dense"][k]
            ]
            for k in ("bot", "top")
        }
    return p, s


def _shard_stacked_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Place a stacked [n_accum, ...] micro-batch group for the accum steps
    (leading axis unsharded; same inner specs as shard_row_batch)."""
    return Batch(
        dense=jax.device_put(
            np.asarray(batch.dense),
            NamedSharding(mesh, P(None, ("data", "model"))),
        ),
        indices=jax.device_put(
            np.asarray(batch.indices),
            NamedSharding(mesh, P(None, None, "data")),
        ),
        weights=jax.device_put(
            np.asarray(batch.weights),
            NamedSharding(mesh, P(None, None, "data")),
        ),
        labels=jax.device_put(
            np.asarray(batch.labels),
            NamedSharding(mesh, P(None, ("data", "model"))),
        ),
    )


def shard_row_batch(mesh: Mesh, batch: Batch) -> Batch:
    """dense/labels over the flattened ("data","model") batch axis; sparse
    inputs batch-sharded over "data" and REPLICATED over "model" (every model
    shard must inspect every index to find its rows)."""
    return Batch(
        dense=jax.device_put(batch.dense, NamedSharding(mesh, P(("data", "model")))),
        indices=jax.device_put(batch.indices, NamedSharding(mesh, P(None, "data"))),
        weights=jax.device_put(batch.weights, NamedSharding(mesh, P(None, "data"))),
        labels=jax.device_put(batch.labels, NamedSharding(mesh, P(("data", "model")))),
    )


def _partial_pooled(store, plan: RowShardPlan, gid, weights, vw=None):
    """Masked pooled-sum over locally-owned rows of the BIG (sharded) space.
    gid: [T, Bd, L] global LOGICAL row ids; vw: optional [store_rows]
    per-row pooling weights (the reference's v_W_l); returns
    ([T, Bd, dim], local ids with non-owned entries at the rows_local
    sentinel, effective weights, gathered PHYSICAL rows [t,b,l,width],
    lane-block mask or None when pack == 1)."""
    m = jax.lax.axis_index("model")
    base = m * plan.rows_local
    local = gid - base
    owned = (local >= 0) & (local < plan.rows_local)
    w = jnp.where(owned, weights, 0.0)
    safe = jnp.clip(local, 0, plan.rows_local - 1)  # sentinel rows never read
    t, b, l = gid.shape
    if vw is not None:
        w = w * jnp.take(vw, safe.reshape(-1)).reshape(t, b, l)
    pack = plan.pack
    if pack > 1:
        # packed store: gather physical rows, mask to the target lane
        # block, pool, fold blocks (see ops/embedding.lookup_group)
        width = plan.dim * pack
        rows = jnp.take(store, safe // pack, axis=0)  # [t,b,l,width]
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // plan.dim
        mask = blk[None, None, None, :] == (safe % pack)[..., None]
        pooled128 = jnp.sum(jnp.where(mask, rows, 0.0) * w[..., None], axis=2)
        pooled = pooled128.reshape(t, b, pack, plan.dim).sum(axis=2)
    else:
        mask = None
        rows = jnp.take(store, safe.reshape(-1), axis=0).reshape(
            t, b, l, plan.dim
        )
        if l == 1:
            pooled = rows[:, :, 0, :] * w[:, :, 0][..., None]
        else:
            pooled = jnp.sum(w[..., None] * rows, axis=2)
    sent_local = jnp.where(owned & (weights > 0), local, plan.rows_local)
    return pooled, sent_local.astype(jnp.int32), w, rows, mask


def _take_tables(arr, ids: np.ndarray):
    """Static table-subset slice of a [T, ...] array (identity when the
    subset is everything in order)."""
    if ids is None or len(ids) == arr.shape[0] and np.array_equal(
        ids, np.arange(arr.shape[0])
    ):
        return arr
    return jnp.take(arr, jnp.asarray(ids), axis=0)


def _assemble_pooled(plan: RowShardPlan, pooled_big, pooled_small):
    """Concat big+small pooled tensors and restore canonical table order."""
    if pooled_small is None:
        return pooled_big
    both = jnp.concatenate([pooled_big, pooled_small], axis=0)
    return jnp.take(both, jnp.asarray(plan.canonical_perm), axis=0)


def _tower_forward(config: DLRMConfig, plan, dense_params, dense_x, pooled,
                   labels, bsz_global):
    """Shared dense towers: pooled [T, b, dim] (canonical order) -> scaled
    local loss share (and logits for eval)."""
    ly = jnp.transpose(pooled, (1, 0, 2))  # [b, T, dim]
    d = config.base_dim
    if plan.dim != d:
        k = plan.dim // d
        b_loc, t_loc = ly.shape[0], ly.shape[1]
        ly = ly.reshape(b_loc, t_loc, k, d).reshape(b_loc, t_loc * k, d)
    cdt = jnp.dtype(config.compute_dtype)
    x = apply_mlp(dense_x, dense_params["bot"], config.sigmoid_bot, cdt)
    z = interact_features(
        x, ly, config.interaction, config.interact_itself, cdt,
        impl=config.interaction_impl,
    )
    logits = apply_mlp(
        z, dense_params["top"], config.sigmoid_top, cdt,
        skip_last_activation=True,
    )
    local = loss_fn(
        logits, labels, config.loss, config.loss_threshold,
        config.wbce_weights,
    )
    return local * (labels.shape[0] / bsz_global), logits


def _small_lookup(params, plan: RowShardPlan, batch, small_ids, bs):
    """Small-table pooled values for THIS shard's post-exchange batch slice,
    from the replicated small store. Returns (pooled [Ts, bs, dim],
    full-batch idx [Ts, Bd, L], full-batch weights)."""
    sg = plan.small_group
    m = jax.lax.axis_index("model")
    idx_s = _take_tables(batch.indices, small_ids)
    w_s = _take_tables(batch.weights, small_ids)
    idx_loc = jax.lax.dynamic_slice_in_dim(idx_s, m * bs, bs, axis=1)
    w_loc = jax.lax.dynamic_slice_in_dim(w_s, m * bs, bs, axis=1)
    pooled_small = lookup_group(
        params["emb_small"], sg, idx_loc, w_loc, vw=params.get("vw_small")
    )
    return pooled_small, idx_s, w_s


def _update_small(config, opt, plan, params, opt_state, idx_s, w_s,
                  g_small, lr, interp, new_params, new_state):
    """Replicated small-store update: identical on every shard (inputs are
    all_gathered over the mesh), exactly-coalescing dense-accumulate
    (size_class=0) like the single-device small group."""
    sg = plan.small_group
    g_s_full = jax.lax.all_gather(g_small, "model", axis=1, tiled=True)
    vws = params.get("vw_small")
    fidx, fg = flat_row_grads(sg, idx_s, w_s, g_s_full, vws)
    fidx = jax.lax.all_gather(fidx, "data", tiled=True)
    fg = jax.lax.all_gather(fg, "data", tiled=True)
    acc_s = opt_state.get("emb_small") if opt.name != "sgd" else None
    store_s2, acc_s2 = sparse_update(
        opt, params["emb_small"], acc_s, fidx, fg, lr, sg.total_rows,
        impl=config.sparse_update_impl, interpret=interp,
        size_class=0, dim=sg.dim,
    )
    new_params["emb_small"] = store_s2
    if opt.name != "sgd":
        new_state["emb_small"] = acc_s2
    if vws is not None and config.weighted_pooling == "learned":
        vidx, vg = vw_row_grads(sg, params["emb_small"], idx_s, w_s, g_s_full)
        vidx = jax.lax.all_gather(vidx, "data", tiled=True)
        vg = jax.lax.all_gather(vg, "data", tiled=True)
        vacc = opt_state.get("vw_small") if opt.name != "sgd" else None
        vw2, vacc2 = sparse_update_1d(
            opt, vws, vacc, vidx, vg, lr, sg.total_rows
        )
        new_params["vw_small"] = vw2
        if opt.name != "sgd":
            new_state["vw_small"] = vacc2


def make_row_sharded_train_step(
    config: DLRMConfig,
    plan: RowShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    lr_fn=None,
    global_batch: Optional[int] = None,
    jit: bool = True,
):
    """Returns jitted step(params, opt_state, batch, iteration) ->
    (params, opt_state, loss). batch must be canonical [T, B, L] sparse
    layout, sharded with shard_row_batch."""
    offs = np.asarray(plan.row_offsets, np.int32)
    n_model = plan.n_model
    big_ids = np.asarray(plan.big_ids, np.int32)
    sg = plan.small_group
    small_ids = np.asarray(sg.table_ids, np.int32) if sg is not None else None

    def local_step(params, opt_state, batch, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        store = params["emb"][0]  # [rows_local, dim]
        if opt.name == "rwsadagrad":
            acc = opt_state["emb"]  # flat 1-D shard
        elif opt.name != "sgd":
            acc = opt_state["emb"][0]
        else:
            acc = None

        idx_b = _take_tables(batch.indices, big_ids)
        w_b = _take_tables(batch.weights, big_ids)
        gid = idx_b + jnp.asarray(offs)[:, None, None]
        vw = params.get("vw")
        vw = vw[0] if vw is not None else None
        partial, local_ids, w_eff, row_vals, blk_mask = _partial_pooled(
            store, plan, gid, w_b, vw
        )
        # complete the sum AND split the batch over "model" in one collective
        pooled_big = jax.lax.psum_scatter(
            partial, "model", scatter_dimension=1, tiled=True
        )  # [Tb, Bd/n_model, dim]

        bs = batch.labels.shape[0]
        n_total = mesh.shape["data"] * mesh.shape["model"]
        bsz_global = bs * n_total if global_batch is None else global_batch
        if sg is not None:
            pooled_small, idx_s, w_s = _small_lookup(
                params, plan, batch, small_ids, bs
            )
            pooled_args = (pooled_big, pooled_small)
        else:
            pooled_args = (pooled_big,)

        def dense_loss(dense_params, *pooled_in):
            pooled = _assemble_pooled(
                plan, pooled_in[0], pooled_in[1] if sg is not None else None
            )
            share, _ = _tower_forward(
                config, plan, dense_params, batch.dense, pooled,
                batch.labels, bsz_global,
            )
            return share

        dense_params = {"bot": params["bot"], "top": params["top"]}
        argnums = (0, 1, 2) if sg is not None else (0, 1)
        out = jax.value_and_grad(dense_loss, argnums=argnums)(
            dense_params, *pooled_args
        )
        loss_share, grads = out
        g_dense, g_big = grads[0], grads[1]
        g_small = grads[2] if sg is not None else None
        loss = jax.lax.psum(loss_share, ("data", "model"))
        g_dense = jax.lax.psum(g_dense, ("data", "model"))

        new_params = dict(params)
        new_state = dict(opt_state)
        dp_new, ds_new = update_dense_towers(opt, params, opt_state, g_dense, lr)
        new_params.update({k: dp_new[k] for k in ("bot", "top")})
        if opt.name != "sgd":
            new_state["dense"] = dict(new_state["dense"])
            new_state["dense"].update({k: ds_new[k] for k in ("bot", "top")})

        # transpose of psum_scatter: reassemble the full pooled cotangent
        g_full = jax.lax.all_gather(
            g_big, "model", axis=1, tiled=True
        )  # [Tb, Bd, dim]
        t, bd, l = idx_b.shape
        flat_idx = local_ids.reshape(t * bd * l)
        if plan.pack > 1:
            # PHYSICAL update rows: lane-place each contribution in its
            # logical row's block (ops/embedding.flat_row_grads form)
            width = plan.dim * plan.pack
            blk = (
                jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // plan.dim
            )
            lmask = (
                blk[None, None, None, :]
                == (local_ids % plan.pack)[..., None]
            )
            g128 = jnp.tile(g_full, (1, 1, plan.pack))[:, :, None, :]
            flat_g = jnp.where(lmask, w_eff[..., None] * g128, 0.0).reshape(
                t * bd * l, width
            )
        else:
            flat_g = (w_eff[..., None] * g_full[:, :, None, :]).reshape(
                t * bd * l, plan.dim
            )
        # write-only fast path (round 4): the masked lookup already gathered
        # this shard's physical rows for every occurrence it owns; ride the
        # "data" all_gather alongside the gradient exchange so the kernel
        # writes new = old + delta with ONE DMA issue per row (non-owned
        # occurrences carry the sentinel id -> inactive, their gathered rows
        # ignored). Only meaningful where the kernel engages (f32, L=1).
        old_rows = None
        if (
            l == 1
            and not plan.dups_in_big  # a mixed space floods the dup tail
            and store.dtype == jnp.float32
            and not config.exact_row_momentum
            and not config.stochastic_rounding
            and config.sparse_update_impl in ("pallas", "stream")
        ):
            old_loc = row_vals[:, :, 0, :].astype(jnp.float32)
            old_rows = jax.lax.all_gather(
                old_loc.reshape(t * bd, -1), "data", tiled=True
            )
        # big-store shards are replicated over "data": fold in every data
        # shard's contributions (same as hybrid.py's all_gather over "data")
        flat_idx = jax.lax.all_gather(flat_idx, "data", tiled=True)
        flat_g = jax.lax.all_gather(flat_g, "data", tiled=True)
        store2, acc2 = sparse_update(
            opt, store, acc, flat_idx, flat_g, lr, plan.rows_local,
            impl=config.sparse_update_impl,
            interpret=jax.default_backend() != "tpu",
            # round 4: the small/dup-heavy tables live in their own
            # replicated store now, so the big space no longer needs the
            # unconditional pre-coalesce that blocked the write-only path;
            # momentum semantics match the single-device kernel path
            # (--exact-row-momentum still forces coalesce-first). A plan
            # with dup-heavy tables in the sharded space keeps
            # coalesce-first (round-3 finding).
            exact_momentum=config.exact_row_momentum or plan.dups_in_big,
            dim=plan.dim,
            old_rows=old_rows,
            density_hint=config.dup_density_hint,
        )
        new_params["emb"] = store2[None]
        if opt.name != "sgd":
            if opt.name == "rwsadagrad":
                new_state["emb"] = acc2  # flat per shard
            else:
                new_state["emb"] = acc2[None]
        if sg is not None:
            _update_small(
                config, opt, plan, params, opt_state, idx_s, w_s, g_small,
                lr, jax.default_backend() != "tpu", new_params, new_state,
            )
        if vw is not None and config.weighted_pooling == "learned":
            # d loss / d vw[row] += base_w * <g_full, store[row]>
            if blk_mask is not None:
                g128v = jnp.tile(g_full, (1, 1, plan.pack))[:, :, None, :]
                dots = jnp.sum(
                    jnp.where(blk_mask, row_vals * g128v, 0.0), axis=-1
                )
            else:
                dots = jnp.sum(row_vals * g_full[:, :, None, :], axis=-1)
            gv = (
                dots
                * jnp.where(local_ids < plan.rows_local, w_b, 0.0)
            ).reshape(t * bd * l)
            vidx = jax.lax.all_gather(
                local_ids.reshape(-1), "data", tiled=True
            )
            gv = jax.lax.all_gather(gv, "data", tiled=True)
            vacc = opt_state["vw"][0] if opt.name != "sgd" else None
            vw2, vacc2 = sparse_update_1d(
                opt, vw, vacc, vidx, gv, lr, plan.rows_local
            )
            new_params["vw"] = vw2[None]
            if opt.name != "sgd":
                new_state["vw"] = vacc2[None]
        return new_params, new_state, loss

    bspecs = Batch(
        dense=P(("data", "model")),
        indices=P(None, "data"),
        weights=P(None, "data"),
        labels=P(("data", "model")),
    )
    pspecs = _row_pspecs(config, plan)
    sspecs = _row_sspecs(config, plan, opt)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, sspecs, bspecs, P()),
        out_specs=(pspecs, sspecs, P()),
        check_vma=False,
    )
    if not jit:
        return sharded
    return mesh_jit(sharded, donate_argnums=(0, 1))


def make_row_sharded_accum_train_step(
    config: DLRMConfig,
    plan: RowShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_accum: int,
    lr_fn=None,
):
    """Gradient accumulation over n_accum micro-batches with ONE optimizer
    step on the row-sharded mesh (--mlperf-grad-accum-iter; every Batch
    leaf carries a leading [n_accum] axis). Dense grads summed over
    micro-batches, sparse grads applied in one coalesced update; v_W
    weighted pooling composes (learned v_W grads accumulate across all
    micro-batches into one coalesced 1-D update)."""
    offs = np.asarray(plan.row_offsets, np.int32)
    n_model = plan.n_model
    big_ids = np.asarray(plan.big_ids, np.int32)
    sg = plan.small_group
    small_ids = np.asarray(sg.table_ids, np.int32) if sg is not None else None

    def local_step(params, opt_state, batches, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        store = params["emb"][0]
        if opt.name == "rwsadagrad":
            acc = opt_state["emb"]  # flat 1-D shard
        elif opt.name != "sgd":
            acc = opt_state["emb"][0]
        else:
            acc = None
        n_total = mesh.shape["data"] * mesh.shape["model"]
        dense_params = {"bot": params["bot"], "top": params["top"]}
        vw = params.get("vw")
        vw = vw[0] if vw is not None else None

        def micro(carry, b):
            g_sum, loss_sum = carry
            batch = Batch(*b)
            idx_b = _take_tables(batch.indices, big_ids)
            w_b = _take_tables(batch.weights, big_ids)
            gid = idx_b + jnp.asarray(offs)[:, None, None]
            partial, local_ids, _, _, _ = _partial_pooled(
                store, plan, gid, w_b, vw
            )
            pooled_big = jax.lax.psum_scatter(
                partial, "model", scatter_dimension=1, tiled=True
            )
            bs = batch.labels.shape[0]
            bsz_global = bs * n_total
            if sg is not None:
                pooled_small, _, _ = _small_lookup(
                    params, plan, batch, small_ids, bs
                )
                pooled_args = (pooled_big, pooled_small)
            else:
                pooled_args = (pooled_big,)

            def dense_loss(dp, *pooled_in):
                pooled = _assemble_pooled(
                    plan, pooled_in[0],
                    pooled_in[1] if sg is not None else None,
                )
                share, _ = _tower_forward(
                    config, plan, dp, batch.dense, pooled, batch.labels,
                    bsz_global,
                )
                return share

            argnums = (0, 1, 2) if sg is not None else (0, 1)
            loss_share, grads = jax.value_and_grad(
                dense_loss, argnums=argnums
            )(dense_params, *pooled_args)
            g_dense, g_big = grads[0], grads[1]
            g_full = jax.lax.all_gather(g_big, "model", axis=1, tiled=True)
            g_s_full = (
                jax.lax.all_gather(grads[2], "model", axis=1, tiled=True)
                if sg is not None
                else jnp.zeros((0,), jnp.float32)
            )
            g_sum = jax.tree.map(jnp.add, g_sum, g_dense)
            return (g_sum, loss_sum + loss_share), (
                local_ids, g_full, g_s_full,
            )

        g0 = jax.tree.map(jnp.zeros_like, dense_params)
        (g_sum, loss_sum), (ids_stk, g_full_stk, g_s_stk) = jax.lax.scan(
            micro, (g0, jnp.float32(0.0)), tuple(batches)
        )
        loss = jax.lax.psum(loss_sum, ("data", "model")) / n_accum
        g_dense = jax.lax.psum(g_sum, ("data", "model"))

        new_params = dict(params)
        new_state = dict(opt_state)
        dp_new, ds_new = update_dense_towers(opt, params, opt_state, g_dense, lr)
        new_params.update({k: dp_new[k] for k in ("bot", "top")})
        if opt.name != "sgd":
            new_state["dense"] = dict(new_state["dense"])
            new_state["dense"].update({k: ds_new[k] for k in ("bot", "top")})

        w_big_stk = _take_tables(
            jnp.moveaxis(batches.weights, 0, 1), big_ids
        )  # [Tb, na, Bd, L]
        w_big_stk = jnp.moveaxis(w_big_stk, 1, 0)  # [na, Tb, Bd, L]
        flat_idx = ids_stk.reshape(-1)
        # update-side pooling weights: the v_W-scaled weights the forward
        # used; non-owned occurrences carry the sentinel id and weight 0
        wt = jnp.where(ids_stk < plan.rows_local, w_big_stk, 0.0)
        safe_stk = jnp.clip(ids_stk, 0, plan.rows_local - 1)
        if vw is not None:
            wt = wt * jnp.take(vw, safe_stk.reshape(-1)).reshape(
                safe_stk.shape
            )
        if plan.pack > 1:
            width = plan.dim * plan.pack
            blk = (
                jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // plan.dim
            )
            lmask = blk[None, None, None, None, :] == (
                ids_stk % plan.pack
            )[..., None]
            g128 = jnp.tile(g_full_stk, (1, 1, 1, plan.pack))[:, :, :, None, :]
            flat_g = jnp.where(
                lmask, wt[..., None] * g128, 0.0
            ).reshape(-1, width)
        else:
            flat_g = (
                wt[..., None] * g_full_stk[:, :, :, None, :]
            ).reshape(-1, plan.dim)
        flat_idx = jax.lax.all_gather(flat_idx, "data", tiled=True)
        flat_g = jax.lax.all_gather(flat_g, "data", tiled=True)
        store2, acc2 = sparse_update(
            opt, store, acc, flat_idx, flat_g, lr, plan.rows_local,
            impl=config.sparse_update_impl,
            interpret=jax.default_backend() != "tpu",
            exact_momentum=config.exact_row_momentum or plan.dups_in_big,
            dim=plan.dim,
            density_hint=config.dup_density_hint,
        )
        new_params["emb"] = store2[None]
        if opt.name != "sgd":
            if opt.name == "rwsadagrad":
                new_state["emb"] = acc2  # flat per shard
            else:
                new_state["emb"] = acc2[None]
        if sg is not None:
            # fold the micro axis into the batch axis: one coalesced small
            # update so momentum sees the accumulated gradient once
            na = g_s_stk.shape[0]
            idx_s_all = _take_tables(
                jnp.moveaxis(batches.indices, 0, 1), small_ids
            )  # [Ts, na, Bd, L]
            w_s_all = _take_tables(
                jnp.moveaxis(batches.weights, 0, 1), small_ids
            )
            ts, _, bd_s, l_s = idx_s_all.shape
            idx_s = idx_s_all.reshape(ts, na * bd_s, l_s)
            w_s = w_s_all.reshape(ts, na * bd_s, l_s)
            g_small = jnp.moveaxis(g_s_stk, 0, 1).reshape(
                ts, na * bd_s, -1
            )
            # _update_small all_gathers over "model" itself; here g is
            # already full-batch per micro (gathered in the scan), so wrap
            # it as the identity by passing the pre-gathered cotangent
            vws = params.get("vw_small")
            fidx, fg = flat_row_grads(sg, idx_s, w_s, g_small, vws)
            fidx = jax.lax.all_gather(fidx, "data", tiled=True)
            fg = jax.lax.all_gather(fg, "data", tiled=True)
            acc_s = opt_state.get("emb_small") if opt.name != "sgd" else None
            store_s2, acc_s2 = sparse_update(
                opt, params["emb_small"], acc_s, fidx, fg, lr,
                sg.total_rows, impl=config.sparse_update_impl,
                interpret=jax.default_backend() != "tpu",
                size_class=0, dim=sg.dim,
            )
            new_params["emb_small"] = store_s2
            if opt.name != "sgd":
                new_state["emb_small"] = acc_s2
            if vws is not None and config.weighted_pooling == "learned":
                vidx, vg = vw_row_grads(
                    sg, params["emb_small"], idx_s, w_s, g_small
                )
                vidx = jax.lax.all_gather(vidx, "data", tiled=True)
                vg = jax.lax.all_gather(vg, "data", tiled=True)
                vacc = (
                    opt_state.get("vw_small") if opt.name != "sgd" else None
                )
                vw2, vacc2 = sparse_update_1d(
                    opt, vws, vacc, vidx, vg, lr, sg.total_rows
                )
                new_params["vw_small"] = vw2
                if opt.name != "sgd":
                    new_state["vw_small"] = vacc2
        if vw is not None and config.weighted_pooling == "learned":
            # accumulated d loss / d vw[row] = base_w * <g_full, store[row]>
            # over ALL micro-batches (rows from the PRE-update store), one
            # coalesced 1-D update so momentum sees the sum once
            width = plan.dim * plan.pack
            if plan.pack > 1:
                rows128 = jnp.take(
                    store, (safe_stk // plan.pack).reshape(-1), axis=0
                ).reshape(*safe_stk.shape, width)
                # lmask/g128 from the embedding-grad branch above: lmask
                # differs from a safe_stk-derived mask only at sentinel
                # entries, whose contribution gv zeroes via the weight mask
                dots = jnp.sum(jnp.where(lmask, rows128 * g128, 0.0), axis=-1)
            else:
                rows = jnp.take(
                    store, safe_stk.reshape(-1), axis=0
                ).reshape(*safe_stk.shape, plan.dim)
                dots = jnp.sum(rows * g_full_stk[:, :, :, None, :], axis=-1)
            gv = dots * jnp.where(
                ids_stk < plan.rows_local, w_big_stk, 0.0
            )
            vidx = jax.lax.all_gather(ids_stk.reshape(-1), "data", tiled=True)
            gvf = jax.lax.all_gather(gv.reshape(-1), "data", tiled=True)
            vacc = opt_state["vw"][0] if opt.name != "sgd" else None
            vw2, vacc2 = sparse_update_1d(
                opt, vw, vacc, vidx, gvf, lr, plan.rows_local
            )
            new_params["vw"] = vw2[None]
            if opt.name != "sgd":
                new_state["vw"] = vacc2[None]
        return new_params, new_state, loss

    bspecs = Batch(
        dense=P(None, ("data", "model")),
        indices=P(None, None, "data"),
        weights=P(None, None, "data"),
        labels=P(None, ("data", "model")),
    )
    pspecs = _row_pspecs(config, plan)
    sspecs = _row_sspecs(config, plan, opt)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, sspecs, bspecs, P()),
        out_specs=(pspecs, sspecs, P()),
        check_vma=False,
    )
    return mesh_jit(sharded, donate_argnums=(0, 1))


def make_row_sharded_eval_step(config: DLRMConfig, plan: RowShardPlan, mesh: Mesh):
    """Returns jitted eval(params, batch) -> (preds [B,1], loss)."""
    offs = np.asarray(plan.row_offsets, np.int32)
    big_ids = np.asarray(plan.big_ids, np.int32)
    sg = plan.small_group
    small_ids = np.asarray(sg.table_ids, np.int32) if sg is not None else None

    def local_eval(params, batch):
        store = params["emb"][0]
        idx_b = _take_tables(batch.indices, big_ids)
        w_b = _take_tables(batch.weights, big_ids)
        gid = idx_b + jnp.asarray(offs)[:, None, None]
        vw = params.get("vw")
        vw = vw[0] if vw is not None else None
        partial, _, _, _, _ = _partial_pooled(store, plan, gid, w_b, vw)
        pooled_big = jax.lax.psum_scatter(
            partial, "model", scatter_dimension=1, tiled=True
        )
        bs = batch.labels.shape[0]
        pooled_small = None
        if sg is not None:
            pooled_small, _, _ = _small_lookup(
                params, plan, batch, small_ids, bs
            )
        pooled = _assemble_pooled(plan, pooled_big, pooled_small)
        dense_params = {"bot": params["bot"], "top": params["top"]}
        share, logits = _tower_forward(
            config, plan, dense_params, batch.dense, pooled, batch.labels,
            batch.labels.shape[0],
        )
        preds = predictions_from_logits(logits, config.loss_threshold)
        loss = jax.lax.pmean(jax.lax.pmean(share, "data"), "model")
        return preds, loss

    bspecs = Batch(
        dense=P(("data", "model")),
        indices=P(None, "data"),
        weights=P(None, "data"),
        labels=P(("data", "model")),
    )
    pspecs = _row_pspecs(config, plan)
    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(pspecs, bspecs),
        out_specs=(P(("data", "model")), P()),
        check_vma=False,
    )
    return mesh_jit(sharded)


def make_row_sharded_multistep_train_step(
    config: DLRMConfig,
    plan: RowShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_steps: int,
    lr_fn=None,
):
    """``n_steps`` full sharded optimizer steps under one ``lax.scan`` —
    one dispatch per n_steps iterations (see
    parallel.hybrid.make_hybrid_multistep_train_step)."""
    import jax.numpy as jnp

    inner = make_row_sharded_train_step(config, plan, opt, mesh, lr_fn, jit=False)

    from dlrm_yx_tpu.train.train_step import scan_multistep

    return scan_multistep(
        inner, n_steps, lambda f: mesh_jit(f, donate_argnums=(0, 1))
    )


class RowShardedRunner:
    """Trainer runner for the row-sharded path (--shard-mode=row)."""

    def __init__(self, config, opt, data=1, model=None, lr_fn=None, seed=123,
                 n_accum=1):
        from dlrm_yx_tpu.parallel.mesh import make_mesh

        self.config = config
        self.opt = opt
        self._lr_fn = lr_fn
        self.n_accum = max(1, n_accum)
        self.mesh = make_mesh(data, model)
        self.plan = make_row_plan(config, self.mesh.shape["model"])
        params = init_row_sharded_params(config, self.plan, seed)
        state = init_row_sharded_opt_state(opt, params, self.plan)
        self.params, self.opt_state = shard_row_params(
            self.mesh, params, opt, state
        )
        if self.n_accum > 1:
            self.train_step = make_row_sharded_accum_train_step(
                config, self.plan, opt, self.mesh, self.n_accum, lr_fn
            )
        else:
            self.train_step = make_row_sharded_train_step(
                config, self.plan, opt, self.mesh, lr_fn
            )
        self.eval_step = make_row_sharded_eval_step(config, self.plan, self.mesh)

    def make_multi_step(self, n_steps: int):
        """Scanned multi-step dispatch (Trainer --steps-per-dispatch)."""
        if self.n_accum > 1:
            raise ValueError("multi-step dispatch composes with accum at "
                             "the trainer level, not both at once")
        return make_row_sharded_multistep_train_step(
            self.config, self.plan, self.opt, self.mesh, n_steps,
            self._lr_fn,
        )

    def prepare_batch(self, b):
        import jax.numpy as jnp

        if np.asarray(b.labels).ndim == 3:  # stacked micro-batches
            return _shard_stacked_batch(self.mesh, b)
        return shard_row_batch(self.mesh, Batch(*map(jnp.asarray, b)))

    def reshard(self, params, opt_state):
        return shard_row_params(self.mesh, params, self.opt, opt_state)
