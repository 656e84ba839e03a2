"""Column-sharded embedding tables over the "model" mesh axis.

Complement to row sharding (parallel/row_sharded.py) and whole-table
placement (parallel/hybrid.py) — together the three cover the north-star
"row/column-sharded arrays across a pod slice". The reference has no
intra-table sharding at all (whole-table only, SURVEY.md §5).

Layout: every BIG table keeps all rows on every model shard, but only a
``D / n_model`` column slice. Sub-128 slices live PACKED —
``[n_model, total_rows/pack, 128]`` with pack = 128/d_local logical rows
per physical row (round-3: the narrow ``[R, d_local]`` form took a
lane-padded T(8,128) layout and a ~3.8 ms full-store XLA rewrite per
update at bench shapes; the packed form gathers/scatters 128-wide
lane-placed rows like the row-sharded path).

Store split (round 4, same as parallel/row_sharded.py): tables at or under
config.emb_split_threshold rows live FULL-WIDTH in one replicated
TableGroup store per shard. They update via the exactly-coalescing XLA
dense-accumulate (size_class=0), their lookups happen after the exchange
on the local batch slice, and the column-sharded space holds only big
tables — so its updates have rare duplicates and can take the write-only
kernel path (forward-gathered rows, one DMA issue per row) instead of the
round-3 unconditional coalesce + RMW.

Dataflow per step (shard_map over ("data", "model")):
  * indices are replicated over "model" (each shard pools its column slice
    for the full per-data-shard batch);
  * ONE ``all_to_all`` splits the batch axis and concatenates the dim axis:
    ``[Tb, Bd, d_local] -> [Tb, Bd/n_model, D]`` — batch-sharded full-width
    pooled vectors for the dense towers. Unlike row sharding's psum_scatter
    there is NO reduction (each shard owns disjoint columns);
  * backward: the reverse all_to_all falls out of jax.vjp; each shard
    applies scatter updates to its OWN column slice — sparse gradients
    never cross shards;
  * RWSAdagrad's per-row momentum needs the full-width row norm:
    ``psum`` of the per-slice sum-of-squares over "model" (a [K] vector —
    tiny); Adagrad's per-element state stays local; SGD needs nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.parallel.mesh import mesh_jit
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.ops.coalesce import coalesce_rows
from dlrm_yx_tpu.ops.embedding import TableGroup, build_table_groups
from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.losses import loss_fn, predictions_from_logits
from dlrm_yx_tpu.ops.mlp import apply_mlp, init_mlp
from dlrm_yx_tpu.optim.optimizer import (
    OptConfig,
    dense_update,
    update_dense_towers,
)
from dlrm_yx_tpu.parallel.row_sharded import (
    _reject_unsupported_variants,
    _small_lookup,
    _take_tables,
    _update_small,
)

ROW_ALIGN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ColShardPlan:
    n_model: int
    dim: int          # full embedding dim D
    d_local: int      # D / n_model columns per shard
    rows: tuple       # BIG tables' row counts (plan.big_ids order)
    row_offsets: tuple
    total_rows: int
    # sub-128 column slices live PACKED: pack = 128/d_local logical rows
    # per physical [*, 128] store row (a narrow [R, d_local] f32 array
    # would take a lane-padded T(8,128) layout AND push every update
    # through an XLA full-store rewrite — the round-2 layout rules)
    pack: int = 1
    big_ids: tuple = ()
    small_group: Optional[TableGroup] = None
    dups_in_big: bool = True  # see parallel/row_sharded.RowShardPlan

    @property
    def store_rows(self) -> int:
        return self.total_rows // self.pack

    @property
    def store_width(self) -> int:
        return self.d_local * self.pack

    @property
    def canonical_perm(self) -> np.ndarray:
        order = list(self.big_ids) + (
            list(self.small_group.table_ids) if self.small_group else []
        )
        return np.argsort(np.asarray(order))


def make_col_plan(config: DLRMConfig, n_model: int) -> ColShardPlan:
    _reject_unsupported_variants(config, "col")
    dims = set(config.emb_dims)
    if len(dims) != 1:
        raise ValueError("col-sharded plan requires homogeneous table dims")
    dim = dims.pop()
    if dim % n_model:
        raise ValueError(f"dim {dim} not divisible by n_model {n_model}")
    d_local = dim // n_model
    pack = 128 // d_local if d_local < 128 and 128 % d_local == 0 else 1

    thr = config.emb_split_threshold or 0
    ids = list(range(len(config.emb_rows)))
    small_ids = [t for t in ids if thr and config.emb_rows[t] <= thr]
    big_ids = [t for t in ids if t not in set(small_ids)]
    if not big_ids:
        big_ids, small_ids = ids, []
    small_group = None
    if small_ids:
        (small_group,) = build_table_groups(
            config.emb_rows, config.emb_dims, table_ids=small_ids
        )
        small_group = dataclasses.replace(small_group, size_class=0)

    align = max(ROW_ALIGN, pack)
    offsets, cur = [], 0
    for t in big_ids:
        offsets.append(cur)
        cur += _round_up(config.emb_rows[t], align)
    # dead sentinel tail (one full kernel transfer unit) so the pallas
    # row-RMW kernel can apply the slice updates (ops/pallas_sparse_update
    # requires it); indices never reach these rows
    from dlrm_yx_tpu.ops.embedding import SENTINEL_ROWS

    dup_thr = thr if thr > 0 else 65536
    return ColShardPlan(
        n_model=n_model,
        dim=dim,
        d_local=d_local,
        rows=tuple(config.emb_rows[t] for t in big_ids),
        row_offsets=tuple(offsets),
        total_rows=cur + SENTINEL_ROWS * pack,
        pack=pack,
        big_ids=tuple(big_ids),
        small_group=small_group,
        dups_in_big=any(config.emb_rows[t] <= dup_thr for t in big_ids),
    )


def _sparse_slice_update(
    plan: ColShardPlan,
    config: DLRMConfig,
    opt: OptConfig,
    store: jax.Array,
    acc,
    flat_idx: jax.Array,
    flat_g: jax.Array,
    lr,
    old_rows=None,
):
    """Sparse update of the local column slice (+ optimizer state).

    flat_idx: [K] LOGICAL row ids (>= plan.total_rows = padding);
    flat_g: [K, store_width] lane-placed physical gradient rows;
    old_rows: optional [K, store_width] CURRENT physical store rows (the
    forward lookup's gather, all_gathered over "data" alongside the grads).

    The store scatter routes through the pallas kernels when eligible:
    XLA's scatter-add into a multi-GB [R, 128] store compiles to a
    full-store rewrite (~3.8 ms at bench shapes, MEASUREMENTS.md round 3);
    the kernels touch only the updated rows. With old_rows (round 4, big
    tables only in this space so duplicates are rare) the write-only pass
    applies new = old + delta with ONE DMA issue per row and reroutes
    whole-batch duplicate rows to the serialized exact RMW tail
    (ops/pallas_sparse_update.sparse_rows_overwrite); adagrad-family
    momentum then accumulates per-occurrence like the single-device kernel
    path. Without old_rows duplicates are coalesced first —
    grad.coalesce() momentum semantics (rwsadagrad.py:98)."""
    from dlrm_yx_tpu.optim.optimizer import (
        DENSE_ACCUM_FACTOR,
        PALLAS_MIN_STORE_BYTES,
        _store_bytes,
    )

    pk = plan.pack
    interp = jax.default_backend() != "tpu"
    kern = (
        config.sparse_update_impl in ("pallas", "stream")
        and store.dtype == jnp.float32
        and (
            (pk == 1 and plan.store_width % 128 == 0)
            or (pk > 1 and plan.store_width == 128)
        )
        and _store_bytes(store) >= PALLAS_MIN_STORE_BYTES
        and flat_idx.shape[0] * DENSE_ACCUM_FACTOR < store.shape[0]
    )

    def kernel_add(arr, uniq, vals):
        from dlrm_yx_tpu.ops import pallas_sparse_update as psu

        return psu.sparse_rows_add(
            arr,
            uniq,
            vals,
            (uniq < plan.total_rows).astype(jnp.int32),
            interpret=interp,
            dim=plan.d_local if pk > 1 else None,
        )

    write_only = (
        kern
        and old_rows is not None
        and not config.exact_row_momentum
    )
    if write_only:
        from dlrm_yx_tpu.ops import pallas_sparse_update as psu

        active = (flat_idx < plan.total_rows).astype(jnp.int32)
        pidx = flat_idx // pk if pk > 1 else flat_idx

        def apply_store(delta):
            return psu.sparse_rows_overwrite(
                store, pidx, old_rows + delta, delta, active,
                interpret=interp,
            )

        if opt.name == "sgd":
            return apply_store(-lr * flat_g), acc
        safe = jnp.where(active > 0, flat_idx, plan.total_rows)
        if opt.name == "adagrad":
            acc2 = kernel_add(acc, flat_idx, flat_g * flat_g)
            denom = (
                jnp.sqrt(
                    jnp.take(
                        acc2, pidx, axis=0, mode="fill", fill_value=1.0
                    )
                )
                + opt.eps
            )
            return apply_store(-lr * flat_g / denom), acc2
        # rwsadagrad: full-width per-occurrence row norm via psum over
        # "model"; [R]-accumulator scatter is a cheap 1-D rewrite
        sq = jnp.sum(flat_g * flat_g, axis=-1)
        sq = jax.lax.psum(sq, "model") / plan.dim
        acc2 = acc.at[safe].add(sq * active, mode="drop")
        denom = (
            jnp.sqrt(jnp.take(acc2, safe, mode="fill", fill_value=1.0))
            + opt.eps
        )
        return apply_store(-lr * flat_g / denom[:, None]), acc2

    if opt.name == "sgd":
        if not kern:
            return store.at[flat_idx // pk].add(-lr * flat_g, mode="drop"), acc
        uniq, sg = coalesce_rows(flat_idx, flat_g, plan.total_rows)
        return kernel_add(store, uniq, -lr * sg), acc

    uniq, sg = coalesce_rows(flat_idx, flat_g, plan.total_rows)
    if opt.name == "adagrad":
        gsq = sg * sg
        acc2 = (
            kernel_add(acc, uniq, gsq)
            if kern
            else acc.at[uniq // pk].add(gsq, mode="drop")
        )
        denom = (
            jnp.sqrt(acc2.at[uniq // pk].get(mode="fill", fill_value=1.0))
            + opt.eps
        )
        # off-block lanes of sg are zero, so the per-element divide only
        # moves the logical row's block
        delta = -lr * sg / denom
    else:  # rwsadagrad: full-width row norm via psum over "model"
        sq = jnp.sum(sg * sg, axis=-1)
        sq = jax.lax.psum(sq, "model") / plan.dim
        acc2 = acc.at[uniq].add(sq, mode="drop")
        denom = (
            jnp.sqrt(acc2.at[uniq].get(mode="fill", fill_value=1.0)) + opt.eps
        )
        delta = -lr * sg / denom[:, None]
    store2 = (
        kernel_add(store, uniq, delta)
        if kern
        else store.at[uniq // pk].add(delta, mode="drop")
    )
    return store2, acc2


def build_col_sharded_emb(plan: ColShardPlan, per_table) -> np.ndarray:
    """[n_model, store_rows, 128] packed stores from per-BIG-table weights
    in plan.big_ids order (pack == 1 keeps [n_model, total_rows, d_local])."""
    flat = np.zeros((plan.total_rows, plan.dim), np.float32)
    for t, w in enumerate(per_table):
        off = plan.row_offsets[t]
        flat[off : off + w.shape[0]] = np.asarray(w)
    parts = flat.reshape(plan.total_rows, plan.n_model, plan.d_local)
    sliced = np.ascontiguousarray(np.transpose(parts, (1, 0, 2)))
    # pack sub-128 slices: [R, d_local] -> [R/pack, 128] (row-major)
    return sliced.reshape(plan.n_model, plan.store_rows, plan.store_width)


def extract_col_sharded_tables(plan: ColShardPlan, emb: np.ndarray,
                               emb_small: Optional[np.ndarray] = None):
    unpacked = np.asarray(emb).reshape(
        plan.n_model, plan.total_rows, plan.d_local
    )
    flat = np.transpose(unpacked, (1, 0, 2)).reshape(
        plan.total_rows, plan.dim
    )
    out: Dict[int, np.ndarray] = {}
    for t, off, n in zip(plan.big_ids, plan.row_offsets, plan.rows):
        out[t] = flat[off : off + n].copy()
    if plan.small_group is not None:
        g = plan.small_group
        s = np.asarray(emb_small).reshape(g.total_rows, g.dim)
        for t, off, n in zip(g.table_ids, g.row_offsets, g.rows):
            out[t] = s[off : off + n].copy()
    return [out[t] for t in sorted(out)]


def init_col_sharded_params(
    config: DLRMConfig, plan: ColShardPlan, seed: int = 123
) -> Dict:
    """Same per-table draws as init_dlrm, laid out column-sharded (big) +
    replicated full-width (small group)."""
    from dlrm_yx_tpu.parallel.row_sharded import build_small_store

    rng = np.random.RandomState(seed)
    per_table = []
    for n, d in zip(config.emb_rows, config.emb_dims):
        bound = np.sqrt(1.0 / n)
        per_table.append(rng.uniform(-bound, bound, size=(n, d)).astype(np.float32))
    emb = build_col_sharded_emb(plan, [per_table[t] for t in plan.big_ids])
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
        # v_W = ones per real row; REPLICATED over "model" (every shard
        # holds all big rows, only a column slice each) — the learned update
        # psums the full-width row dot so replicas stay identical
        flat = np.zeros((plan.total_rows,), np.float32)
        for off, n in zip(plan.row_offsets, plan.rows):
            flat[off : off + n] = 1.0
        vw = jnp.asarray(flat)
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


def init_col_sharded_opt_state(
    opt: OptConfig, params: Dict, plan: Optional[ColShardPlan] = None
) -> Dict:
    if opt.name == "sgd":
        return {}
    dense = {
        k: [(jnp.zeros_like(w), jnp.zeros_like(b)) for (w, b) in params[k]]
        for k in ("bot", "top")
    }
    emb = params["emb"]
    # rwsadagrad: per-LOGICAL-row accumulator REPLICATED per shard
    # (identical values maintained by the psum'd update); adagrad:
    # per-element, local slice (the packed store's shape)
    if opt.name == "adagrad":
        acc = jnp.zeros_like(emb)
    else:
        from dlrm_yx_tpu.optim.optimizer import acc_len

        logical_rows = plan.total_rows if plan is not None else emb.shape[1]
        # round 3: FLAT per shard (see row_sharded) — avoids the T(1,128)
        # boundary layout on the size-1 shard axis; round 4: acc_len pads
        # a sentinel tail so huge accumulators take the RMW kernel
        acc = jnp.zeros((emb.shape[0] * acc_len(logical_rows),), jnp.float32)
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


def _col_pspecs(config: DLRMConfig, plan: ColShardPlan):
    return {
        "bot": [(P(), P())] * (len(config.ln_bot) - 1),
        "top": [(P(), P())] * (len(config.ln_top) - 1),
        "emb": P("model"),
        "emb_small": P() if plan.small_group is not None else None,
        "vw": P() if config.weighted_pooling is not None else None,
        "vw_small": (
            P()
            if config.weighted_pooling is not None
            and plan.small_group is not None
            else None
        ),
    }


def _col_sspecs(config: DLRMConfig, plan: ColShardPlan, opt: OptConfig):
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
        s["vw"] = P()
        if plan.small_group is not None:
            s["vw_small"] = P()
    return s


def shard_col_params(mesh: Mesh, params: Dict, opt: OptConfig, opt_state: Dict):
    p = dict(params)
    p["emb"] = jax.device_put(params["emb"], NamedSharding(mesh, P("model")))
    for k in ("emb_small", "vw", "vw_small"):
        if params.get(k) is not None:
            p[k] = jax.device_put(params[k], NamedSharding(mesh, P()))
    for k in ("bot", "top"):
        p[k] = [
            tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
            for layer in params[k]
        ]
    s = dict(opt_state)
    if opt.name != "sgd":
        s["emb"] = jax.device_put(opt_state["emb"], NamedSharding(mesh, P("model")))
        for k in ("emb_small", "vw", "vw_small"):
            if k in opt_state:
                s[k] = jax.device_put(opt_state[k], NamedSharding(mesh, P()))
        s["dense"] = {
            k: [
                tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
                for layer in opt_state["dense"][k]
            ]
            for k in ("bot", "top")
        }
    return p, s


def shard_col_batch(mesh: Mesh, batch: Batch) -> Batch:
    return Batch(
        dense=jax.device_put(batch.dense, NamedSharding(mesh, P(("data", "model")))),
        indices=jax.device_put(batch.indices, NamedSharding(mesh, P(None, "data"))),
        weights=jax.device_put(batch.weights, NamedSharding(mesh, P(None, "data"))),
        labels=jax.device_put(batch.labels, NamedSharding(mesh, P(("data", "model")))),
    )


def _local_pooled(store, plan: ColShardPlan, gid, weights, vw=None):
    """Returns (pooled [T,B,d_local], effective weights, gathered PHYSICAL
    rows [T,B,L,store_width], lane-block mask or None when pack == 1)."""
    t, b, l = gid.shape
    safe = jnp.minimum(gid, plan.total_rows - 1)
    w = weights
    if vw is not None:
        w = w * jnp.take(vw, safe.reshape(-1)).reshape(t, b, l)
    if plan.pack > 1:
        # packed slice: gather physical rows, mask each contribution to
        # its lane block, pool, fold blocks (ops/embedding.lookup_group)
        width = plan.store_width
        rows = jnp.take(store, (safe // plan.pack).reshape(-1), axis=0
                        ).reshape(t, b, l, width)
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // plan.d_local
        mask = blk[None, None, None, :] == (safe % plan.pack)[..., None]
        pooled128 = jnp.sum(jnp.where(mask, rows, 0.0) * w[..., None], axis=2)
        pooled = pooled128.reshape(t, b, plan.pack, plan.d_local).sum(axis=2)
        return pooled, w, rows, mask
    rows = jnp.take(store, safe.reshape(-1), axis=0).reshape(
        t, b, l, plan.d_local
    )
    if l == 1:
        pooled = rows[:, :, 0, :] * w[:, :, 0][..., None]
    else:
        pooled = jnp.sum(w[..., None] * rows, axis=2)
    return pooled, w, rows, None


def _lane_place(plan: ColShardPlan, gid, w, g_pooled):
    """[T,B,d_local] pooled cotangent -> per-occurrence update rows
    [T,B,L,store_width]: weighted rows lane-placed in each logical row's
    block (identity when pack == 1)."""
    if plan.pack == 1:
        return w[..., None] * g_pooled[:, :, None, :]
    width = plan.store_width
    safe = jnp.minimum(gid, plan.total_rows - 1)
    blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // plan.d_local
    mask = blk[None, None, None, :] == (safe % plan.pack)[..., None]
    g128 = jnp.tile(g_pooled, (1, 1, plan.pack))[:, :, None, :]
    return jnp.where(mask, w[..., None] * g128, 0.0)


def _col_towers(config: DLRMConfig, plan: ColShardPlan, dense_params,
                dense_x, pooled_big_local, pooled_small, labels, bsz_global):
    """a2a-exchange the big column slices, merge the (already local-batch)
    small pooled values, run the dense towers. Returns (scaled local loss
    share, logits)."""
    ly_full = jax.lax.all_to_all(
        pooled_big_local, "model", split_axis=1, concat_axis=2, tiled=True
    )  # [Tb, Bd/n_model, D]
    if pooled_small is not None:
        both = jnp.concatenate([ly_full, pooled_small], axis=0)
        ly_full = jnp.take(both, jnp.asarray(plan.canonical_perm), axis=0)
    ly = jnp.transpose(ly_full, (1, 0, 2))
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


def make_col_sharded_train_step(
    config: DLRMConfig,
    plan: ColShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    lr_fn=None,
    global_batch: Optional[int] = None,
    jit: bool = True,
):
    offs = np.asarray(plan.row_offsets, np.int32)
    big_ids = np.asarray(plan.big_ids, np.int32)
    sg = plan.small_group
    small_ids = np.asarray(sg.table_ids, np.int32) if sg is not None else None

    def local_step(params, opt_state, batch, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        store = params["emb"][0]  # [total_rows/pack, store_width]
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
        pooled_local, w_eff, row_vals, blk_mask = _local_pooled(
            store, plan, gid, w_b, vw
        )

        n_total = mesh.shape["data"] * mesh.shape["model"]
        bs = batch.labels.shape[0]
        bsz_global = bs * n_total if global_batch is None else global_batch
        if sg is not None:
            # params dict for _small_lookup: keys emb_small / vw_small
            pooled_small, idx_s, w_s = _small_lookup(
                params, plan, batch, small_ids, bs
            )
            pooled_args = (pooled_local, pooled_small)
        else:
            pooled_args = (pooled_local,)

        def dense_loss(dense_params, *pooled_in):
            share, _ = _col_towers(
                config, plan, dense_params, batch.dense, pooled_in[0],
                pooled_in[1] if sg is not None else None,
                batch.labels, bsz_global,
            )
            return share

        dense_params = {"bot": params["bot"], "top": params["top"]}
        argnums = (0, 1, 2) if sg is not None else (0, 1)
        loss_share, grads = jax.value_and_grad(dense_loss, argnums=argnums)(
            dense_params, *pooled_args
        )
        g_dense, g_pooled = grads[0], grads[1]
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

        # sparse updates on the local column slice; fold batch over "data".
        # Packed slices emit LANE-PLACED update rows (each contribution in
        # its logical row's lane block, zeros elsewhere) and scatter at
        # PHYSICAL row ids — logical rows sharing a physical row occupy
        # disjoint blocks, so scatter-add stays exact
        t, bd, l = idx_b.shape
        flat_idx = gid.reshape(t * bd * l)
        flat_g = _lane_place(plan, gid, w_eff, g_pooled).reshape(
            t * bd * l, plan.store_width
        )
        # write-only fast path (round 4): col shards own every row of their
        # slice, so the forward's gathered rows are valid old values for
        # every occurrence; ride the "data" all_gather alongside the grads
        old_rows = None
        if (
            l == 1
            and not plan.dups_in_big
            and store.dtype == jnp.float32
            and not config.exact_row_momentum
            and not config.stochastic_rounding
            and config.sparse_update_impl in ("pallas", "stream")
        ):
            old_loc = row_vals[:, :, 0, :].astype(jnp.float32)
            old_rows = jax.lax.all_gather(
                old_loc.reshape(t * bd, -1), "data", tiled=True
            )
        flat_idx = jax.lax.all_gather(flat_idx, "data", tiled=True)
        flat_g = jax.lax.all_gather(flat_g, "data", tiled=True)
        store2, acc2 = _sparse_slice_update(
            plan, config, opt, store, acc, flat_idx, flat_g, lr,
            old_rows=old_rows,
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
            # d loss / d vw[row] += base_w * <g_pooled_full, store_full[row]>
            # = psum over "model" of the per-slice partial dots (each shard
            # holds d_local columns); the replicated vw update is identical
            # on every shard
            from dlrm_yx_tpu.optim.optimizer import sparse_update_1d

            if blk_mask is not None:
                g128 = jnp.tile(g_pooled, (1, 1, plan.pack))[:, :, None, :]
                dots = jnp.sum(
                    jnp.where(blk_mask, row_vals * g128, 0.0), axis=-1
                )
            else:
                dots = jnp.sum(row_vals * g_pooled[:, :, None, :], axis=-1)
            gv = (dots * w_b).reshape(t * bd * l)
            gv = jax.lax.psum(gv, "model")
            vidx = jnp.where(
                gid.reshape(-1) < plan.total_rows, gid.reshape(-1),
                plan.total_rows,
            )
            vidx = jax.lax.all_gather(vidx, "data", tiled=True)
            gv = jax.lax.all_gather(gv, "data", tiled=True)
            vacc = opt_state.get("vw") if opt.name != "sgd" else None
            vw2, vacc2 = sparse_update_1d(
                opt, vw, vacc, vidx, gv, lr, plan.total_rows
            )
            new_params["vw"] = vw2
            if opt.name != "sgd":
                new_state["vw"] = vacc2
        return new_params, new_state, loss

    bspecs = Batch(
        dense=P(("data", "model")),
        indices=P(None, "data"),
        weights=P(None, "data"),
        labels=P(("data", "model")),
    )
    pspecs = _col_pspecs(config, plan)
    sspecs = _col_sspecs(config, plan, opt)
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


def make_col_sharded_accum_train_step(
    config: DLRMConfig,
    plan: ColShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_accum: int,
    lr_fn=None,
):
    """Gradient accumulation over n_accum micro-batches with ONE optimizer
    step on the column-sharded mesh (--mlperf-grad-accum-iter; every Batch
    leaf carries a leading [n_accum] axis); v_W weighted pooling composes
    (learned v_W grads accumulate across all micro-batches into one
    coalesced replicated update)."""
    offs = np.asarray(plan.row_offsets, np.int32)
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

        def micro(carry, b):
            g_sum, loss_sum = carry
            batch = Batch(*b)
            idx_b = _take_tables(batch.indices, big_ids)
            w_b = _take_tables(batch.weights, big_ids)
            gid = idx_b + jnp.asarray(offs)[:, None, None]
            pooled_local, _, _, _ = _local_pooled(
                store, plan, gid, w_b, vw
            )
            bs = batch.labels.shape[0]
            bsz_global = bs * n_total
            if sg is not None:
                pooled_small, _, _ = _small_lookup(
                    params, plan, batch, small_ids, bs
                )
                pooled_args = (pooled_local, pooled_small)
            else:
                pooled_args = (pooled_local,)

            def dense_loss(dp, *pooled_in):
                share, _ = _col_towers(
                    config, plan, dp, batch.dense, pooled_in[0],
                    pooled_in[1] if sg is not None else None,
                    batch.labels, bsz_global,
                )
                return share

            argnums = (0, 1, 2) if sg is not None else (0, 1)
            loss_share, grads = jax.value_and_grad(
                dense_loss, argnums=argnums
            )(dense_params, *pooled_args)
            g_dense, g_pooled = grads[0], grads[1]
            g_s_full = (
                jax.lax.all_gather(grads[2], "model", axis=1, tiled=True)
                if sg is not None
                else jnp.zeros((0,), jnp.float32)
            )
            g_sum = jax.tree.map(jnp.add, g_sum, g_dense)
            return (g_sum, loss_sum + loss_share), (gid, g_pooled, g_s_full)

        g0 = jax.tree.map(jnp.zeros_like, dense_params)
        (g_sum, loss_sum), (gid_stk, g_pooled_stk, g_s_stk) = jax.lax.scan(
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

        w_big_stk = jnp.moveaxis(
            _take_tables(jnp.moveaxis(batches.weights, 0, 1), big_ids), 1, 0
        )  # [na, Tb, Bd, L]
        flat_idx = gid_stk.reshape(-1)
        # update-side weights carry the v_W factor the forward applied
        wt = w_big_stk
        safe_stk = jnp.minimum(gid_stk, plan.total_rows - 1)
        if vw is not None:
            wt = wt * jnp.take(vw, safe_stk.reshape(-1)).reshape(
                safe_stk.shape
            )
        if plan.pack > 1:
            width = plan.store_width
            blk = (
                jax.lax.broadcasted_iota(jnp.int32, (width,), 0)
                // plan.d_local
            )
            lmask = blk[None, None, None, None, :] == (
                safe_stk % plan.pack
            )[..., None]
            g128 = jnp.tile(
                g_pooled_stk, (1, 1, 1, plan.pack)
            )[:, :, :, None, :]
            flat_g = jnp.where(
                lmask, wt[..., None] * g128, 0.0
            ).reshape(-1, width)
        else:
            flat_g = (
                wt[..., None] * g_pooled_stk[:, :, :, None, :]
            ).reshape(-1, plan.d_local)
        flat_idx = jax.lax.all_gather(flat_idx, "data", tiled=True)
        flat_g = jax.lax.all_gather(flat_g, "data", tiled=True)
        store2, acc2 = _sparse_slice_update(
            plan, config, opt, store, acc, flat_idx, flat_g, lr
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
            from dlrm_yx_tpu.ops.embedding import flat_row_grads, vw_row_grads
            from dlrm_yx_tpu.optim.optimizer import (
                sparse_update,
                sparse_update_1d,
            )

            na = g_s_stk.shape[0]
            idx_s_all = _take_tables(
                jnp.moveaxis(batches.indices, 0, 1), small_ids
            )
            w_s_all = _take_tables(
                jnp.moveaxis(batches.weights, 0, 1), small_ids
            )
            ts, _, bd_s, l_s = idx_s_all.shape
            idx_s = idx_s_all.reshape(ts, na * bd_s, l_s)
            w_s = w_s_all.reshape(ts, na * bd_s, l_s)
            g_small = jnp.moveaxis(g_s_stk, 0, 1).reshape(ts, na * bd_s, -1)
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
            # accumulated d loss / d vw[row] = base_w * <g_pooled_full,
            # store_full[row]> over ALL micro-batches: psum the per-slice
            # partial dots over "model" (each shard holds d_local columns),
            # rows from the PRE-update store; the replicated update is
            # identical on every shard
            from dlrm_yx_tpu.optim.optimizer import sparse_update_1d

            if plan.pack > 1:
                rows = jnp.take(
                    store, (safe_stk // plan.pack).reshape(-1), axis=0
                ).reshape(*safe_stk.shape, plan.store_width)
                # lmask/g128 from the update branch above
                dots = jnp.sum(jnp.where(lmask, rows * g128, 0.0), axis=-1)
            else:
                rows = jnp.take(
                    store, safe_stk.reshape(-1), axis=0
                ).reshape(*safe_stk.shape, plan.d_local)
                dots = jnp.sum(
                    rows * g_pooled_stk[:, :, :, None, :], axis=-1
                )
            gv = (dots * w_big_stk).reshape(-1)
            gv = jax.lax.psum(gv, "model")
            vidx = jnp.where(
                gid_stk.reshape(-1) < plan.total_rows,
                gid_stk.reshape(-1), plan.total_rows,
            )
            vidx = jax.lax.all_gather(vidx, "data", tiled=True)
            gv = jax.lax.all_gather(gv, "data", tiled=True)
            vacc = opt_state.get("vw") if opt.name != "sgd" else None
            vw2, vacc2 = sparse_update_1d(
                opt, vw, vacc, vidx, gv, lr, plan.total_rows
            )
            new_params["vw"] = vw2
            if opt.name != "sgd":
                new_state["vw"] = vacc2
        return new_params, new_state, loss

    bspecs = Batch(
        dense=P(None, ("data", "model")),
        indices=P(None, None, "data"),
        weights=P(None, None, "data"),
        labels=P(None, ("data", "model")),
    )
    pspecs = _col_pspecs(config, plan)
    sspecs = _col_sspecs(config, plan, opt)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, sspecs, bspecs, P()),
        out_specs=(pspecs, sspecs, P()),
        check_vma=False,
    )
    return mesh_jit(sharded, donate_argnums=(0, 1))


def make_col_sharded_eval_step(config: DLRMConfig, plan: ColShardPlan, mesh: Mesh):
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
        pooled_local, _, _, _ = _local_pooled(store, plan, gid, w_b, vw)
        bs = batch.labels.shape[0]
        pooled_small = None
        if sg is not None:
            pooled_small, _, _ = _small_lookup(
                params, plan, batch, small_ids, bs
            )
        dense_params = {"bot": params["bot"], "top": params["top"]}
        share, logits = _col_towers(
            config, plan, dense_params, batch.dense, pooled_local,
            pooled_small, batch.labels, batch.labels.shape[0],
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
    pspecs = _col_pspecs(config, plan)
    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(pspecs, bspecs),
        out_specs=(P(("data", "model")), P()),
        check_vma=False,
    )
    return mesh_jit(sharded)


def make_col_sharded_multistep_train_step(
    config: DLRMConfig,
    plan: ColShardPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_steps: int,
    lr_fn=None,
):
    """``n_steps`` full sharded optimizer steps under one ``lax.scan`` —
    one dispatch per n_steps iterations (see
    parallel.hybrid.make_hybrid_multistep_train_step)."""
    import jax.numpy as jnp

    inner = make_col_sharded_train_step(config, plan, opt, mesh, lr_fn, jit=False)

    from dlrm_yx_tpu.train.train_step import scan_multistep

    return scan_multistep(
        inner, n_steps, lambda f: mesh_jit(f, donate_argnums=(0, 1))
    )


class ColShardedRunner:
    """Trainer runner for the column-sharded path (--shard-mode=col)."""

    def __init__(self, config, opt, data=1, model=None, lr_fn=None, seed=123,
                 n_accum=1):
        from dlrm_yx_tpu.parallel.mesh import make_mesh

        self.config = config
        self.opt = opt
        self._lr_fn = lr_fn
        self.n_accum = max(1, n_accum)
        self.mesh = make_mesh(data, model)
        self.plan = make_col_plan(config, self.mesh.shape["model"])
        params = init_col_sharded_params(config, self.plan, seed)
        state = init_col_sharded_opt_state(opt, params, self.plan)
        self.params, self.opt_state = shard_col_params(
            self.mesh, params, opt, state
        )
        if self.n_accum > 1:
            self.train_step = make_col_sharded_accum_train_step(
                config, self.plan, opt, self.mesh, self.n_accum, lr_fn
            )
        else:
            self.train_step = make_col_sharded_train_step(
                config, self.plan, opt, self.mesh, lr_fn
            )
        self.eval_step = make_col_sharded_eval_step(config, self.plan, self.mesh)

    def make_multi_step(self, n_steps: int):
        """Scanned multi-step dispatch (Trainer --steps-per-dispatch)."""
        if self.n_accum > 1:
            raise ValueError("multi-step dispatch composes with accum at "
                             "the trainer level, not both at once")
        return make_col_sharded_multistep_train_step(
            self.config, self.plan, self.opt, self.mesh, n_steps,
            self._lr_fn,
        )

    def prepare_batch(self, b):
        import jax.numpy as jnp

        if np.asarray(b.labels).ndim == 3:  # stacked micro-batches
            from dlrm_yx_tpu.parallel.row_sharded import _shard_stacked_batch

            return _shard_stacked_batch(self.mesh, b)
        return shard_col_batch(self.mesh, Batch(*map(jnp.asarray, b)))

    def reshard(self, params, opt_state):
        return shard_col_params(self.mesh, params, self.opt, opt_state)
