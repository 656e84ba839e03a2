"""Hybrid-parallel DLRM training over a ("data", "model") TPU mesh.

This is the TPU-native rebuild of the reference's two multi-device paths
(``/root/reference/dlrm_s_pytorch.py``):
  * ``distributed_forward`` (:686-730): each rank holds whole tables, does
    full-batch lookups for its tables, exchanges pooled vectors with an async
    NCCL all-to-all overlapped with the bottom MLP, then runs
    interaction/top-MLP on its batch shard; dense grads allreduced (DDP),
    sparse grads reverse-all-to-all'd and applied locally.
  * ``parallel_forward``'s butterfly shuffle (:938-958) — the same exchange
    expressed with scatters.

TPU-native shape of the same contract (SURVEY.md §2.4 "hybrid-parallel
semantics to preserve"):
  * one ``shard_map`` over mesh axes ("data", "model");
  * tables sharded over "model" as TWO flat arrays per shard — big tables
    in [n_model, r_big_pad, dim] (updated by the pallas row-RMW kernel)
    and small tables in a separate [n_model, r_small_pad, dim] (updated by
    an exact full-array dense accumulate; a single combined store would
    pay a full-store dynamic-update-slice copy for the small section every
    step) — whole-table placement from parallel/sharders.py;
  * batch sharded over "data" for lookups and over ("data","model") for the
    dense towers;
  * the exchange is ``jax.lax.all_to_all`` — XLA schedules it
    asynchronously, giving the a2a/bottom-MLP overlap the reference
    hand-codes with Req/Wait autograd pairs (extend_distributed.py:405-508);
  * the backward all-to-all comes out of jax.vjp automatically;
  * dense grads are ``psum`` over both axes (what DDP's allreduce does);
  * sparse row grads are all-gathered over "data" only (table shards are
    replicated across "data") and applied as local scatter updates — no
    cross-"model" embedding sync, exactly the reference contract.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm
from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.losses import loss_fn, predictions_from_logits
from dlrm_yx_tpu.ops.mlp import apply_mlp
from dlrm_yx_tpu.utils.profiling import phase_scope
from dlrm_yx_tpu.parallel.mesh import mesh_jit
import dataclasses as _dc


@_dc.dataclass(frozen=True)
class _StreamGroupShim:
    """Minimal TableGroup stand-in for sparse_update_stream on the hybrid
    big store (it reads only dim / pack / total_rows)."""

    dim: int
    pack: int
    total_rows: int
    size_class: int = 1


from dlrm_yx_tpu.optim.optimizer import (
    DENSE_ACCUM_FACTOR,
    OptConfig,
    dense_update,
    sparse_update,
    sparse_update_stream,
    stream_eligible,
    update_dense_towers,
)
from dlrm_yx_tpu.parallel.plan import ShardingPlan, build_sharded_emb


# ---------------------------------------------------------------------------
# parameter / batch placement
# ---------------------------------------------------------------------------

def init_hybrid_params(
    config: DLRMConfig, plan: ShardingPlan, seed: int = 123
) -> Dict:
    """Same draws as init_dlrm (identical dense params and per-table weights)
    but with tables assembled into the sharded big/small two-store layout.
    QR tables (qr_flag) contribute their quotient store to the sharded array
    and their remainder store to the replicated flat ``qr_r`` array."""
    from dlrm_yx_tpu.models.dlrm import qr_specs
    from dlrm_yx_tpu.ops.qr_embedding import init_qr

    rng = np.random.RandomState(seed)
    qr_ids = set(config.qr_table_ids)
    spec_by_id = {s.table_id: s for s in qr_specs(config)}
    concat = bool(qr_ids) and config.qr_operation == "concat"
    per_table = []  # indexed by PSEUDO id (identity unless QR concat)
    qr_r = (
        np.zeros((plan.qr_r_rows, plan.dim), np.float32)
        if plan.qr_r_rows
        else None
    )
    roff_by_table = {}
    for pos, t in enumerate(plan.device_table_order):
        if t >= 0 and plan.slot_coll[pos]:
            roff_by_table[t] = plan.slot_roff[pos]
    for t, (n, d) in enumerate(zip(config.emb_rows, config.emb_dims)):
        if t in qr_ids:
            q, r = init_qr(rng, spec_by_id[t])
            per_table.append(q)
            if concat:
                # remainder is its own pseudo-table in the sharded stores
                per_table.append(r)
            else:
                off = roff_by_table[t]
                qr_r[off : off + r.shape[0]] = r
        else:
            bound = np.sqrt(1.0 / n)
            per_table.append(
                rng.uniform(-bound, bound, size=(n, d)).astype(np.float32)
            )
    md_proj = None
    if config.md_table_ids:
        from dlrm_yx_tpu.ops.md_embedding import init_md_projection

        md_proj = [
            jnp.asarray(
                init_md_projection(rng, config.emb_dims[t], config.base_dim)
            )
            for t in config.md_table_ids
        ]
    emb_big, emb_small = build_sharded_emb(plan, config, per_table)
    from dlrm_yx_tpu.ops.mlp import init_mlp

    vw = vw_small = None
    if config.weighted_pooling is not None:
        if config.qr_table_ids and config.weighted_pooling == "learned":
            # learned per-row weights for a QR slot would train at
            # quotient-row granularity, not the original table's rows —
            # semantics the reference doesn't define; fixed mode is the
            # identity (ones) and composes fine
            raise NotImplementedError("learned weighted pooling with QR tables")
        # v_W = ones per real row (dlrm_s_pytorch.py:313-316), zero padding
        vw = np.zeros((plan.n_model, plan.r_big_pad), np.float32)
        vw_small = np.zeros((plan.n_model, plan.r_small_pad), np.float32)
        for pos, pid in enumerate(plan.device_table_order):
            if pid < 0:
                continue
            dsh = pos // plan.t_pad
            off = plan.row_offsets[pos]
            dst = vw if pos % plan.t_pad < plan.n_big_slots else vw_small
            dst[dsh, off : off + plan.pseudo_rows[pid]] = 1.0
        vw = jnp.asarray(vw)
        vw_small = jnp.asarray(vw_small)
    params = {
        "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_bot)],
        "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_top)],
        "emb": jnp.asarray(emb_big),
        "emb_small": jnp.asarray(emb_small),
        "vw": vw,
    }
    if vw_small is not None:
        params["vw_small"] = vw_small
    if qr_r is not None:
        params["qr_r"] = jnp.asarray(qr_r)
    if md_proj is not None:
        params["md_proj"] = md_proj
    return params


def init_hybrid_opt_state(
    opt: OptConfig, params: Dict, plan: ShardingPlan = None
) -> Dict:
    if opt.name == "sgd":
        return {}
    dense = {
        k: [(jnp.zeros_like(w), jnp.zeros_like(b)) for (w, b) in params[k]]
        for k in ("bot", "top")
    }
    pack = plan.pack if plan is not None else 1

    def emb_acc(e):
        if opt.name == "adagrad":
            return jnp.zeros_like(e)
        # rwsadagrad: one accumulator per LOGICAL row, carried 2-D as
        # [ceil(R/128), 128] — a [1, R] boundary value gets a T(1,128)
        # layout and XLA pays ~0.6 ms of chunked relayout while-loops per
        # step converting it to the 1-D T(1024) form the scatters want;
        # the 2-D form crosses the shard_map boundary in the native
        # (8,128) tiling and flattens to 1-D as a bitcast
        from dlrm_yx_tpu.optim.optimizer import acc_len

        n_log = e.shape[1] * pack
        # round 3: carried FLAT per shard — global [n_shard * n128] 1-D
        # sharded over "model". A [1, n128/128, 128] boundary block puts
        # the size-1 shard axis in sublanes (T(1,128): one sublane per
        # tile) and XLA pays ~0.28 ms/step of relayout reduce/broadcast
        # pairs; the flat form crosses in the native T(1024) 1-D tiling
        # the momentum scatters want. Round 4: acc_len pads a sentinel
        # tail so huge accumulators update via the RMW kernel.
        return jnp.zeros((e.shape[0] * acc_len(n_log),), jnp.float32)

    state = {
        "dense": dense,
        "emb": emb_acc(params["emb"]),
        "emb_small": emb_acc(params["emb_small"]),
    }
    if params.get("vw") is not None:
        state["vw"] = jnp.zeros_like(params["vw"])
        state["vw_small"] = jnp.zeros_like(params["vw_small"])
    if "md_proj" in params:
        state["md_proj"] = [jnp.zeros_like(w) for w in params["md_proj"]]
    if "qr_r" in params:
        state["qr_r"] = (
            jnp.zeros_like(params["qr_r"])
            if opt.name == "adagrad"
            else jnp.zeros((params["qr_r"].shape[0],), jnp.float32)
        )
    return state


def shard_params(mesh: Mesh, params: Dict, opt: OptConfig, opt_state: Dict):
    """device_put params/opt_state with their hybrid shardings."""
    p = dict(params)
    p["emb"] = jax.device_put(params["emb"], NamedSharding(mesh, P("model")))
    p["emb_small"] = jax.device_put(
        params["emb_small"], NamedSharding(mesh, P("model"))
    )
    for k in ("bot", "top"):
        p[k] = [
            tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
            for layer in params[k]
        ]
    if params.get("vw") is not None:
        p["vw"] = jax.device_put(params["vw"], NamedSharding(mesh, P("model")))
        p["vw_small"] = jax.device_put(
            params["vw_small"], NamedSharding(mesh, P("model"))
        )
    if "qr_r" in params:  # replicated remainder stores
        p["qr_r"] = jax.device_put(params["qr_r"], NamedSharding(mesh, P()))
    if "md_proj" in params:  # replicated up-projections
        p["md_proj"] = [
            jax.device_put(w, NamedSharding(mesh, P())) for w in params["md_proj"]
        ]
    s = dict(opt_state)
    if opt.name != "sgd":
        s["emb"] = jax.device_put(opt_state["emb"], NamedSharding(mesh, P("model")))
        s["emb_small"] = jax.device_put(
            opt_state["emb_small"], NamedSharding(mesh, P("model"))
        )
        s["dense"] = {
            k: [
                tuple(jax.device_put(x, NamedSharding(mesh, P())) for x in layer)
                for layer in opt_state["dense"][k]
            ]
            for k in ("bot", "top")
        }
        if "vw" in opt_state:
            s["vw"] = jax.device_put(opt_state["vw"], NamedSharding(mesh, P("model")))
            s["vw_small"] = jax.device_put(
                opt_state["vw_small"], NamedSharding(mesh, P("model"))
            )
        if "qr_r" in opt_state:
            s["qr_r"] = jax.device_put(opt_state["qr_r"], NamedSharding(mesh, P()))
        if "md_proj" in opt_state:
            s["md_proj"] = [
                jax.device_put(w, NamedSharding(mesh, P()))
                for w in opt_state["md_proj"]
            ]
    return p, s


def shard_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Place a device-major-arranged batch on the mesh: dense/labels over
    the flattened batch axis, sparse slots over "model" x batch over
    "data"."""
    return Batch(
        dense=jax.device_put(batch.dense, NamedSharding(mesh, P(("data", "model")))),
        indices=jax.device_put(batch.indices, NamedSharding(mesh, P("model", "data"))),
        weights=jax.device_put(batch.weights, NamedSharding(mesh, P("model", "data"))),
        labels=jax.device_put(batch.labels, NamedSharding(mesh, P(("data", "model")))),
    )


# ---------------------------------------------------------------------------
# the sharded step
# ---------------------------------------------------------------------------

def _local_lookup(
    store, offs, indices, weights, r_pad, dim,
    r_store=None, coll=None, roff=None, qr_op="mult", vw=None, pack=1,
    xform=None, collisions=1,
):
    """Per-shard pooled lookup on the flat [r_pad, dim] store.
    indices/weights: [t_pad, Bd, L]; offs: [t_pad] local row offsets
    (padding slots point at r_pad → clamped gather, zero weight).

    QR slots (coll[s] > 0): the sharded store holds the QUOTIENT table, so
    the gather index is idx // c; the replicated ``r_store`` supplies the
    remainder rows (idx % c + roff[s]) and the combine happens per sample
    BEFORE pooling (QREmbeddingBag semantics, qr_embedding_bag.py:25-185).

    Returns (pooled [t,b,dim], q_gidx, q_rows, r_rows, is_qr) — the row
    values are needed again for the mult-combine chain rule.
    """
    t, b, l = indices.shape
    if xform is not None:
        # QR 'concat' pseudo-slots: 1 = quotient (idx // c), 2 = remainder
        # (idx % c) — plain lookups with a per-slot index transform, no
        # combine (QREmbeddingBag concat semantics)
        xf = xform[:, None, None]
        qidx = jnp.where(
            xf == 1,
            indices // collisions,
            jnp.where(xf == 2, indices % collisions, indices),
        )
    elif r_store is not None:
        c = jnp.maximum(coll, 1)[:, None, None]
        qidx = jnp.where(coll[:, None, None] > 0, indices // c, indices)
    else:
        qidx = indices
    gidx = qidx + offs[:, None, None]
    safe = jnp.minimum(gidx, r_pad - 1)
    if vw is not None:
        # per-row pooling weights v_W (dlrm_s_pytorch.py:545-548); padding
        # rows carry vw = 0 so clamped gathers contribute nothing
        weights = weights * jnp.take(vw, safe.reshape(-1)).reshape(t, b, l)
    if pack > 1:
        # packed store (sub-128 dims): gather physical rows, mask each
        # contribution to its lane block, pool, fold blocks (QR needs raw
        # row values and keeps pack == 1 — see plan.py)
        assert r_store is None
        width = dim * pack
        rows128 = jnp.take(store, safe // pack, axis=0)  # [t,b,l,width]
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // dim
        mask = blk[None, None, None, :] == (safe % pack)[..., None]
        pooled128 = jnp.sum(
            jnp.where(mask, rows128, 0.0) * weights[..., None], axis=2
        )
        pooled = pooled128.reshape(t, b, pack, dim).sum(axis=2)
        return pooled, gidx, rows128, None, None, mask
    q_rows = jnp.take(store, safe.reshape(-1), axis=0).reshape(t, b, l, dim)
    r_rows = None
    is_qr = None
    emb = q_rows
    if r_store is not None:
        ridx = (
            jnp.where(coll[:, None, None] > 0, indices % c, 0)
            + roff[:, None, None]
        )
        r_rows = jnp.take(r_store, ridx.reshape(-1), axis=0).reshape(
            t, b, l, dim
        )
        is_qr = (coll > 0)[:, None, None, None]
        if qr_op == "mult":
            emb = jnp.where(is_qr, q_rows * r_rows, q_rows)
        else:  # add
            emb = jnp.where(is_qr, q_rows + r_rows, q_rows)
        r_rows = (ridx, r_rows)
    if l == 1:
        pooled = emb[:, :, 0, :] * weights[:, :, 0][..., None]
    else:
        pooled = jnp.sum(weights[..., None] * emb, axis=2)
    return pooled, gidx, q_rows, r_rows, is_qr, None


def _slots_from_canonical(ly_can, config: DLRMConfig, md_proj=None):
    """[T, b, dim] canonical pooled -> [b, S, D] interaction slots
    (split trick for dim = k*D; MD tables sliced to d_t and up-projected
    with PrEmbeddingBag's Linear AFTER the exchange). With QR concat the
    leading axis is canonical SLOTS (each dim D) rather than tables."""
    t, b, dim = ly_can.shape
    d = config.base_dim
    if config.md_table_ids:
        md_ids = {tid: i for i, tid in enumerate(config.md_table_ids)}
        slots = []
        for tid in range(t):
            y = ly_can[tid]
            if tid in md_ids:
                dt = config.emb_dims[tid]
                y = jnp.dot(y[:, :dt], md_proj[md_ids[tid]])
            slots.append(y)
        return jnp.stack(slots, axis=1)
    if t == len(config.emb_dims) and len(set(config.emb_dims)) > 1:
        # arbitrary k*D mixes: slice each table's true dim off the padded
        # slot, split into its k_t sub-slots (dlrm_s_pytorch.py:579-585)
        slots = []
        for tid, dt in enumerate(config.emb_dims):
            k_t = dt // d
            slots.append(
                jnp.transpose(ly_can[tid, :, :dt].reshape(b, k_t, d), (1, 0, 2))
            )
        return jnp.transpose(jnp.concatenate(slots, axis=0), (1, 0, 2))
    k = dim // d
    if k == 1:
        return jnp.transpose(ly_can, (1, 0, 2))
    ly = ly_can.reshape(t, b, k, d)
    return jnp.transpose(ly, (1, 0, 2, 3)).reshape(b, t * k, d)


def _row_dim_tables(config: DLRMConfig, plan: ShardingPlan):
    """Per-(shard, store-section) true embedding dims for rwsadagrad's
    per-row momentum with MD zero-padded columns. Returns (big, small)
    float32 arrays [n_model, r_{big,small}_pad]."""
    import numpy as _np

    nb = plan.n_big_slots
    big = _np.full(
        (plan.n_model, plan.r_big_pad), float(plan.dim), _np.float32
    )
    small = _np.full(
        (plan.n_model, plan.r_small_pad), float(plan.dim), _np.float32
    )
    for pos, pid in enumerate(plan.device_table_order):
        if pid < 0:
            continue
        dsh = pos // plan.t_pad
        off = plan.row_offsets[pos]
        dst = big if pos % plan.t_pad < nb else small
        nrows = plan.pseudo_rows[pid]
        dst[dsh, off : off + nrows] = float(
            config.emb_dims[plan.pseudo_table[pid]]
        )
    return big, small


def make_hybrid_accum_train_step(
    config: DLRMConfig,
    plan: ShardingPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_accum: int,
    lr_fn=None,
):
    """Gradient accumulation over ``n_accum`` micro-batches with ONE
    optimizer step on the hybrid mesh (--mlperf-grad-accum-iter on the
    multi-device paths; the reference's accumulation composes with every
    execution mode, dlrm_s_pytorch.py:1925-1932).

    step(params, opt_state, stacked_batch, iteration): every Batch leaf
    carries a leading [n_accum] axis (device-major arranged per micro,
    then stacked). Dense grads are SUMMED over micro-batches (torch
    autograd semantics); all micro-batches' sparse row grads are applied
    in one coalesced update per store section, so Adagrad-family momenta
    see the accumulated gradient exactly once. Returns the mean
    micro-batch loss."""
    n_model = plan.n_model
    nb = plan.n_big_slots
    ns_slots = plan.t_pad - nb
    offs_all = np.asarray(plan.row_offsets, np.int32).reshape(n_model, plan.t_pad)
    gather_all = np.asarray(plan.canonical_gather, np.int32)
    coll_all = np.asarray(plan.slot_coll, np.int32).reshape(n_model, plan.t_pad)
    roff_all = np.asarray(plan.slot_roff, np.int32).reshape(n_model, plan.t_pad)
    has_qr = plan.qr_r_rows > 0
    has_xf = any(plan.pseudo_xform)
    xform_all = (
        np.asarray(
            [
                plan.pseudo_xform[pid] if pid >= 0 else 0
                for pid in plan.device_table_order
            ],
            np.int32,
        ).reshape(n_model, plan.t_pad)
        if has_xf
        else None
    )
    row_dim_big_all = row_dim_small_all = None
    if opt.name == "rwsadagrad" and (
        config.md_table_ids or len(set(config.emb_dims)) > 1
    ):
        row_dim_big_all, row_dim_small_all = _row_dim_tables(config, plan)

    def local_step(params, opt_state, batches, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        m = jax.lax.axis_index("model")
        offs = jax.lax.dynamic_index_in_dim(
            jnp.asarray(offs_all), m, 0, keepdims=False
        )
        store_b = params["emb"][0]
        store_s = params["emb_small"][0]
        if opt.name == "rwsadagrad":
            acc_b = opt_state["emb"]        # flat 1-D shard [n128]
            acc_s = opt_state["emb_small"]
        elif opt.name != "sgd":
            acc_b = opt_state["emb"][0]
            acc_s = opt_state["emb_small"][0]
        else:
            acc_b = acc_s = None
        row_dim_b = row_dim_s = None
        if row_dim_big_all is not None:
            row_dim_b = jax.lax.dynamic_index_in_dim(
                jnp.asarray(row_dim_big_all), m, 0, keepdims=False
            )
            row_dim_s = jax.lax.dynamic_index_in_dim(
                jnp.asarray(row_dim_small_all), m, 0, keepdims=False
            )
        n_total = mesh.shape["data"] * mesh.shape["model"]
        dense_params = {"bot": params["bot"], "top": params["top"]}
        if "md_proj" in params:
            dense_params["md_proj"] = params["md_proj"]
        vw_b = params.get("vw")
        vw_b = vw_b[0] if vw_b is not None else None
        vw_s = params.get("vw_small")
        vw_s = vw_s[0] if vw_s is not None else None
        r_store = params.get("qr_r") if has_qr else None
        coll = roff = None
        if has_qr:
            coll = jax.lax.dynamic_index_in_dim(
                jnp.asarray(coll_all), m, 0, keepdims=False
            )
            roff = jax.lax.dynamic_index_in_dim(
                jnp.asarray(roff_all), m, 0, keepdims=False
            )
        xf = None
        if xform_all is not None:
            xf = jax.lax.dynamic_index_in_dim(
                jnp.asarray(xform_all), m, 0, keepdims=False
            )

        def micro(carry, b):
            g_sum, loss_sum = carry
            batch = Batch(*b)
            parts = []
            if nb > 0:
                parts.append(_local_lookup(
                    store_b, offs[:nb], batch.indices[:nb],
                    batch.weights[:nb], plan.r_big_pad, plan.dim,
                    r_store,
                    coll[:nb] if coll is not None else None,
                    roff[:nb] if roff is not None else None,
                    config.qr_operation, vw_b, plan.pack,
                    xf[:nb] if xf is not None else None,
                    config.qr_collisions,
                ))
            if ns_slots > 0:
                parts.append(_local_lookup(
                    store_s, offs[nb:], batch.indices[nb:],
                    batch.weights[nb:], plan.r_small_pad, plan.dim,
                    r_store,
                    coll[nb:] if coll is not None else None,
                    roff[nb:] if roff is not None else None,
                    config.qr_operation, vw_s, plan.pack,
                    xf[nb:] if xf is not None else None,
                    config.qr_collisions,
                ))
            pooled = (
                parts[0][0]
                if len(parts) == 1
                else jnp.concatenate([p[0] for p in parts], 0)
            )
            bsz_global = batch.labels.shape[0] * n_total

            def dense_loss(dp, pooled_in):
                with phase_scope("alltoall_fwd"):
                    ly_ex = jax.lax.all_to_all(
                        pooled_in, "model", split_axis=1, concat_axis=0,
                        tiled=True,
                    )
                ly_can = jnp.take(ly_ex, jnp.asarray(gather_all), axis=0)
                ly = _slots_from_canonical(ly_can, config, dp.get("md_proj"))
                cdt = jnp.dtype(config.compute_dtype)
                with phase_scope("bottom_mlp"):
                    x = apply_mlp(
                        batch.dense, dp["bot"], config.sigmoid_bot, cdt
                    )
                z = interact_features(
                    x, ly, config.interaction, config.interact_itself, cdt,
                    impl=config.interaction_impl,
                )
                logits = apply_mlp(
                    z, dp["top"], config.sigmoid_top, cdt,
                    skip_last_activation=True,
                )
                local = loss_fn(
                    logits, batch.labels, config.loss, config.loss_threshold,
                    config.wbce_weights,
                )
                return local * (batch.labels.shape[0] / bsz_global)

            loss_share, (g_dense, g_pooled) = jax.value_and_grad(
                dense_loss, argnums=(0, 1)
            )(dense_params, pooled)
            g_sum = jax.tree.map(jnp.add, g_sum, g_dense)
            ys = (g_pooled,)
            if nb > 0:
                ys += (parts[0][1],)
            if ns_slots > 0:
                ys += (parts[-1][1],)
            return (g_sum, loss_sum + loss_share), ys

        g0 = jax.tree.map(jnp.zeros_like, dense_params)
        (g_sum, loss_sum), ys = jax.lax.scan(
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
        if "md_proj" in params:
            new_proj, new_proj_acc = [], []
            for i, w in enumerate(params["md_proj"]):
                pa = opt_state["md_proj"][i] if opt.name != "sgd" else None
                w2, pa2 = dense_update(opt, w, g_dense["md_proj"][i], pa, lr)
                new_proj.append(w2)
                new_proj_acc.append(pa2)
            new_params["md_proj"] = new_proj
            if opt.name != "sgd":
                new_state["md_proj"] = new_proj_acc

        # one coalesced sparse update per section over ALL micro-batches
        g_pooled_stk = ys[0]  # [n_accum, t_pad, bd, dim]
        yi = 1
        interp = jax.default_backend() != "tpu"

        def eff_weights(slot_lo, slot_hi, gidx_stk, vw_sec, bound):
            """Update-side pooling weights: the base per-sample weights
            scaled by the per-row v_W factor the forward applied (padding
            rows carry vw = 0, like _local_lookup)."""
            wt = batches.weights[:, slot_lo:slot_hi]
            if vw_sec is not None:
                safe = jnp.minimum(gidx_stk, bound - 1)
                wt = wt * jnp.take(vw_sec, safe.reshape(-1)).reshape(
                    safe.shape
                )
            return wt

        # QR chain-rule pieces, recomputed post-scan from the static plan
        # (the stores are constant through the accumulation window):
        # quotient grads scale by d combine/d Q (r_rows for mult, 1 for
        # add); remainder grads accumulate densely into the replicated
        # qr_r store (mirrors the per-step block above)
        isq5 = r_rows_all = ridx_all = None
        if has_qr:
            isq = (coll > 0)[None, :, None, None]
            c4 = jnp.maximum(coll, 1)[None, :, None, None]
            ridx_all = jnp.where(
                isq, batches.indices % c4 + roff[None, :, None, None],
                plan.qr_r_rows,
            )
            safe_r = jnp.clip(ridx_all, 0, plan.qr_r_rows - 1)
            r_rows_all = jnp.take(
                r_store, safe_r.reshape(-1), axis=0
            ).reshape(*safe_r.shape, plan.dim)
            isq5 = isq[..., None]

        def accum_flat(slot_lo, slot_hi, gidx_stk, vw_sec, bound, store_sec):
            wt = eff_weights(slot_lo, slot_hi, gidx_stk, vw_sec, bound)
            if plan.pack > 1:
                width = plan.dim * plan.pack
                blk = (
                    jax.lax.broadcasted_iota(jnp.int32, (width,), 0)
                    // plan.dim
                )
                lmask = blk[None, None, None, None, :] == (
                    gidx_stk % plan.pack
                )[..., None]
                g128 = jnp.tile(
                    g_pooled_stk[:, slot_lo:slot_hi], (1, 1, 1, plan.pack)
                )[:, :, :, None, :]
                return jnp.where(
                    lmask, wt[..., None] * g128, 0.0
                ).reshape(-1, width), None, None
            w_g = (
                wt[..., None]
                * g_pooled_stk[:, slot_lo:slot_hi][:, :, :, None, :]
            )
            gr_flat = ridx_flat = None
            if has_qr:
                isq_sec = isq5[:, slot_lo:slot_hi]
                if config.qr_operation == "mult":
                    safe = jnp.minimum(gidx_stk, bound - 1)
                    q_rows = jnp.take(
                        store_sec, safe.reshape(-1), axis=0
                    ).reshape(*safe.shape, plan.dim)
                    gr = jnp.where(isq_sec, w_g * q_rows, 0.0)
                    w_g = w_g * jnp.where(
                        isq_sec, r_rows_all[:, slot_lo:slot_hi], 1.0
                    )
                else:  # add
                    gr = jnp.where(isq_sec, w_g, 0.0)
                gr_flat = gr.reshape(-1, plan.dim)
                ridx_flat = ridx_all[:, slot_lo:slot_hi].reshape(-1)
            return w_g.reshape(-1, plan.dim), gr_flat, ridx_flat

        gidx_b_stk = gidx_s_stk = None
        qr_gr_parts, qr_ridx_parts = [], []
        if nb > 0:
            gidx_b_stk = ys[yi]
            yi += 1
            fi = jax.lax.all_gather(
                gidx_b_stk.reshape(-1), "data", tiled=True
            )
            fg_sec, gr_f, ridx_f = accum_flat(
                0, nb, gidx_b_stk, vw_b, plan.r_big_pad, store_b
            )
            if gr_f is not None:
                qr_gr_parts.append(gr_f)
                qr_ridx_parts.append(ridx_f)
            fg = jax.lax.all_gather(fg_sec, "data", tiled=True)
            store_b2, acc_b2 = sparse_update(
                opt, store_b, acc_b, fi, fg, lr, plan.r_big_pad,
                impl=config.sparse_update_impl, interpret=interp,
                row_dim=row_dim_b,
                exact_momentum=config.exact_row_momentum,
                dim=plan.dim,
                density_hint=config.dup_density_hint,
            )
        else:
            store_b2, acc_b2 = store_b, acc_b
        if ns_slots > 0:
            gidx_s_stk = ys[yi]
            fi = jax.lax.all_gather(
                gidx_s_stk.reshape(-1), "data", tiled=True
            )
            fg_sec, gr_f, ridx_f = accum_flat(
                nb, plan.t_pad, gidx_s_stk, vw_s, plan.r_small_pad, store_s
            )
            if gr_f is not None:
                qr_gr_parts.append(gr_f)
                qr_ridx_parts.append(ridx_f)
            fg = jax.lax.all_gather(fg_sec, "data", tiled=True)
            store_s2, acc_s2 = sparse_update(
                opt, store_s, acc_s, fi, fg, lr, plan.r_small_pad,
                impl=config.sparse_update_impl, interpret=interp,
                row_dim=row_dim_s, size_class=0, dim=plan.dim,
            )
        else:
            store_s2, acc_s2 = store_s, acc_s
        new_params["emb"] = store_b2[None]
        new_params["emb_small"] = store_s2[None]
        if opt.name != "sgd":
            if opt.name == "rwsadagrad":
                new_state["emb"] = acc_b2          # flat per shard
                new_state["emb_small"] = acc_s2
            else:
                new_state["emb"] = acc_b2[None]
                new_state["emb_small"] = acc_s2[None]

        if has_qr and qr_gr_parts:
            ridx_flat = jnp.concatenate(qr_ridx_parts)
            gr_flat = jnp.concatenate(qr_gr_parts)
            dense_gr = jnp.zeros(
                (plan.qr_r_rows, plan.dim), store_b.dtype
            ).at[ridx_flat].add(gr_flat, mode="drop")
            dense_gr = jax.lax.psum(dense_gr, ("data", "model"))
            qr_r = params["qr_r"]
            if opt.name == "sgd":
                new_params["qr_r"] = qr_r - lr * dense_gr
            elif opt.name == "adagrad":
                acc_r = opt_state["qr_r"] + dense_gr * dense_gr
                new_state["qr_r"] = acc_r
                new_params["qr_r"] = qr_r - lr * dense_gr / (
                    jnp.sqrt(acc_r) + opt.eps
                )
            else:  # rwsadagrad
                acc_r = opt_state["qr_r"] + jnp.mean(dense_gr * dense_gr, -1)
                new_state["qr_r"] = acc_r
                new_params["qr_r"] = qr_r - lr * dense_gr / (
                    jnp.sqrt(acc_r) + opt.eps
                )[:, None]

        if vw_b is not None and config.weighted_pooling == "learned":
            # accumulated v_W gradient: for every occurrence across ALL
            # micro-batches, d loss / d vw[row] += base_w * <g_pooled,
            # store[row]> (rows gathered from the PRE-update store — the
            # same rows the forwards read); one coalesced 1-D update per
            # section, so Adagrad-family momenta see the accumulated
            # gradient exactly once (mirrors the per-step path)
            from dlrm_yx_tpu.optim.optimizer import sparse_update_1d

            def gv_section(store_sec, gidx_stk, slot_lo, slot_hi, bound):
                safe = jnp.minimum(gidx_stk, bound - 1)
                gp = g_pooled_stk[:, slot_lo:slot_hi]
                if plan.pack > 1:
                    width = plan.dim * plan.pack
                    rows128 = jnp.take(
                        store_sec, (safe // plan.pack).reshape(-1), axis=0
                    ).reshape(*safe.shape, width)
                    blk = (
                        jax.lax.broadcasted_iota(jnp.int32, (width,), 0)
                        // plan.dim
                    )
                    mask = blk[None, None, None, None, :] == (
                        safe % plan.pack
                    )[..., None]
                    g128 = jnp.tile(gp, (1, 1, 1, plan.pack))[:, :, :, None, :]
                    gv = jnp.sum(jnp.where(mask, rows128 * g128, 0.0), axis=-1)
                else:
                    rows = jnp.take(
                        store_sec, safe.reshape(-1), axis=0
                    ).reshape(*safe.shape, plan.dim)
                    gv = jnp.sum(rows * gp[:, :, :, None, :], axis=-1)
                return gv * batches.weights[:, slot_lo:slot_hi]

            def vw_section(vw_sec, vacc_sec, gidx_stk, gv, bound):
                vidx = jnp.where(
                    gidx_stk.reshape(-1) < bound,
                    jnp.minimum(gidx_stk, bound - 1).reshape(-1),
                    bound,
                )
                vidx = jax.lax.all_gather(vidx, "data", tiled=True)
                gvf = jax.lax.all_gather(gv.reshape(-1), "data", tiled=True)
                return sparse_update_1d(
                    opt, vw_sec, vacc_sec, vidx, gvf, lr, bound
                )

            if nb > 0:
                vacc = opt_state["vw"][0] if opt.name != "sgd" else None
                gv_b = gv_section(store_b, gidx_b_stk, 0, nb, plan.r_big_pad)
                vw_b2, vacc_b2 = vw_section(
                    vw_b, vacc, gidx_b_stk, gv_b, plan.r_big_pad
                )
                new_params["vw"] = vw_b2[None]
                if opt.name != "sgd":
                    new_state["vw"] = vacc_b2[None]
            if ns_slots > 0:
                vacc = (
                    opt_state["vw_small"][0] if opt.name != "sgd" else None
                )
                gv_s = gv_section(
                    store_s, gidx_s_stk, nb, plan.t_pad, plan.r_small_pad
                )
                vw_s2, vacc_s2 = vw_section(
                    vw_s, vacc, gidx_s_stk, gv_s, plan.r_small_pad
                )
                new_params["vw_small"] = vw_s2[None]
                if opt.name != "sgd":
                    new_state["vw_small"] = vacc_s2[None]
        return new_params, new_state, loss

    pspecs = {
        "bot": [(P(), P())] * (len(config.ln_bot) - 1),
        "top": [(P(), P())] * (len(config.ln_top) - 1),
        "emb": P("model"),
        "emb_small": P("model"),
        "vw": P("model") if config.weighted_pooling is not None else None,
    }
    if config.weighted_pooling is not None:
        pspecs["vw_small"] = P("model")
    if has_qr:
        pspecs["qr_r"] = P()
    if config.md_table_ids:
        pspecs["md_proj"] = [P()] * len(config.md_table_ids)
    sspecs = (
        {}
        if opt.name == "sgd"
        else {
            "dense": {
                "bot": [(P(), P())] * (len(config.ln_bot) - 1),
                "top": [(P(), P())] * (len(config.ln_top) - 1),
            },
            "emb": P("model"),
            "emb_small": P("model"),
            **(
                {"vw": P("model"), "vw_small": P("model")}
                if config.weighted_pooling is not None
                else {}
            ),
            **({"qr_r": P()} if has_qr else {}),
            **(
                {"md_proj": [P()] * len(config.md_table_ids)}
                if config.md_table_ids
                else {}
            ),
        }
    )
    bspecs = Batch(
        dense=P(None, ("data", "model")),
        indices=P(None, "model", "data"),
        weights=P(None, "model", "data"),
        labels=P(None, ("data", "model")),
    )
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, sspecs, bspecs, P()),
        out_specs=(pspecs, sspecs, P()),
        check_vma=False,
    )
    return mesh_jit(sharded, donate_argnums=(0, 1))


def make_hybrid_train_step(
    config: DLRMConfig,
    plan: ShardingPlan,
    opt: OptConfig,
    mesh: Mesh,
    lr_fn=None,
    global_batch: Optional[int] = None,
    jit: bool = True,
):
    """Returns jitted step(params, opt_state, batch, iteration) ->
    (params, opt_state, loss). ``batch`` must be device-major arranged
    (parallel.plan.arrange_sparse_inputs) and sharded (shard_batch).
    jit=False returns the raw shard_mapped body (for the scanned
    multi-step dispatch wrapper)."""
    n_model = plan.n_model
    nb = plan.n_big_slots
    ns_slots = plan.t_pad - nb
    offs_all = np.asarray(plan.row_offsets, np.int32).reshape(n_model, plan.t_pad)
    gather_all = np.asarray(plan.canonical_gather, np.int32)
    coll_all = np.asarray(plan.slot_coll, np.int32).reshape(n_model, plan.t_pad)
    roff_all = np.asarray(plan.slot_roff, np.int32).reshape(n_model, plan.t_pad)
    has_qr = plan.qr_r_rows > 0
    # QR 'concat' pseudo-slot index transforms (0/1/2 per slot)
    has_xf = any(plan.pseudo_xform)
    xform_all = (
        np.asarray(
            [
                plan.pseudo_xform[pid] if pid >= 0 else 0
                for pid in plan.device_table_order
            ],
            np.int32,
        ).reshape(n_model, plan.t_pad)
        if has_xf
        else None
    )
    # per-row true dims (MD zero-padded columns) for rwsadagrad momentum,
    # one array per store section
    row_dim_big_all = row_dim_small_all = None
    if opt.name == "rwsadagrad" and (
        config.md_table_ids or len(set(config.emb_dims)) > 1
    ):
        # zero-padded columns (MD or mixed k*D dims): per-row momentum must
        # normalize by the TRUE dim (rwsadagrad.py:108)
        row_dim_big_all, row_dim_small_all = _row_dim_tables(config, plan)

    def local_step(params, opt_state, batch, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        m = jax.lax.axis_index("model")
        offs = jax.lax.dynamic_index_in_dim(jnp.asarray(offs_all), m, 0, keepdims=False)
        store_b = params["emb"][0]        # big-table shard [r_big_pad, dim]
        store_s = params["emb_small"][0]  # small-table shard [r_small_pad, dim]
        if opt.name == "rwsadagrad":
            acc_b = opt_state["emb"]        # flat 1-D shard [n128]
            acc_s = opt_state["emb_small"]
        elif opt.name != "sgd":
            acc_b = opt_state["emb"][0]
            acc_s = opt_state["emb_small"][0]
        else:
            acc_b = acc_s = None
        row_dim_b = row_dim_s = None
        if row_dim_big_all is not None:
            row_dim_b = jax.lax.dynamic_index_in_dim(
                jnp.asarray(row_dim_big_all), m, 0, keepdims=False
            )
            row_dim_s = jax.lax.dynamic_index_in_dim(
                jnp.asarray(row_dim_small_all), m, 0, keepdims=False
            )
        r_store = params.get("qr_r") if has_qr else None
        coll = roff = None
        if has_qr:
            coll = jax.lax.dynamic_index_in_dim(
                jnp.asarray(coll_all), m, 0, keepdims=False
            )
            roff = jax.lax.dynamic_index_in_dim(
                jnp.asarray(roff_all), m, 0, keepdims=False
            )

        vw_b = params.get("vw")
        vw_b = vw_b[0] if vw_b is not None else None
        vw_s = params.get("vw_small")
        vw_s = vw_s[0] if vw_s is not None else None
        xf = None
        if xform_all is not None:
            xf = jax.lax.dynamic_index_in_dim(
                jnp.asarray(xform_all), m, 0, keepdims=False
            )
        # per-section lookups: slots [0, nb) on the big store, the rest on
        # the small store; slot order matches device_table_order so the
        # concatenated pooled tensor feeds the same all-to-all + gather
        parts = []
        if nb > 0:
            parts.append(_local_lookup(
                store_b, offs[:nb], batch.indices[:nb], batch.weights[:nb],
                plan.r_big_pad, plan.dim, r_store,
                coll[:nb] if coll is not None else None,
                roff[:nb] if roff is not None else None,
                config.qr_operation, vw_b, plan.pack,
                xf[:nb] if xf is not None else None, config.qr_collisions,
            ))
        if ns_slots > 0:
            parts.append(_local_lookup(
                store_s, offs[nb:], batch.indices[nb:], batch.weights[nb:],
                plan.r_small_pad, plan.dim, r_store,
                coll[nb:] if coll is not None else None,
                roff[nb:] if roff is not None else None,
                config.qr_operation, vw_s, plan.pack,
                xf[nb:] if xf is not None else None, config.qr_collisions,
            ))

        def _cat(i):
            vals = [p[i] for p in parts]
            return vals[0] if len(vals) == 1 else jnp.concatenate(vals, 0)

        pooled = _cat(0)
        gidx_b = parts[0][1] if nb > 0 else None
        gidx_s = parts[-1][1] if ns_slots > 0 else None
        q_rows = _cat(2)
        blk_mask = _cat(5) if plan.pack > 1 else None
        if has_qr:
            r_pack = (
                _cat(3) if len(parts) == 1 else (
                    jnp.concatenate([p[3][0] for p in parts], 0),
                    jnp.concatenate([p[3][1] for p in parts], 0),
                )
            )
            is_qr = _cat(4)
        else:
            r_pack = is_qr = None

        n_total = mesh.shape["data"] * mesh.shape["model"]
        bsz_global = (
            batch.labels.shape[0] * n_total if global_batch is None else global_batch
        )

        def dense_loss(dense_params, pooled_in):
            # the exchange: model-parallel pooled -> batch-sharded canonical
            with phase_scope("alltoall_fwd"):
                ly_ex = jax.lax.all_to_all(
                    pooled_in, "model", split_axis=1, concat_axis=0,
                    tiled=True,
                )  # [n_model * t_pad, b, dim]
            ly_can = jnp.take(ly_ex, jnp.asarray(gather_all), axis=0)
            ly = _slots_from_canonical(
                ly_can, config, dense_params.get("md_proj")
            )
            cdt = jnp.dtype(config.compute_dtype)
            with phase_scope("bottom_mlp"):
                x = apply_mlp(
                    batch.dense, dense_params["bot"], config.sigmoid_bot, cdt
                )
            z = interact_features(
                x, ly, config.interaction, config.interact_itself, cdt,
                impl=config.interaction_impl,
            )
            logits = apply_mlp(
                z, dense_params["top"], config.sigmoid_top, cdt,
                skip_last_activation=True,
            )
            local = loss_fn(
                logits, batch.labels, config.loss, config.loss_threshold,
                config.wbce_weights,
            )
            # local mean * local_count / global_count = global-mean share
            return local * (batch.labels.shape[0] / bsz_global)

        dense_params = {"bot": params["bot"], "top": params["top"]}
        if "md_proj" in params:
            dense_params["md_proj"] = params["md_proj"]
        loss_share, (g_dense, g_pooled) = jax.value_and_grad(
            dense_loss, argnums=(0, 1)
        )(dense_params, pooled)
        loss = jax.lax.psum(loss_share, ("data", "model"))
        g_dense = jax.lax.psum(g_dense, ("data", "model"))

        # ----- dense updates (replicated) -----
        new_params = dict(params)
        new_state = dict(opt_state)
        dp_new, ds_new = update_dense_towers(opt, params, opt_state, g_dense, lr)
        new_params.update({k: dp_new[k] for k in ("bot", "top")})
        if opt.name != "sgd":
            new_state["dense"] = dict(new_state["dense"])
            new_state["dense"].update({k: ds_new[k] for k in ("bot", "top")})
        if "md_proj" in params:
            new_proj, new_proj_acc = [], []
            for i, w in enumerate(params["md_proj"]):
                pa = opt_state["md_proj"][i] if opt.name != "sgd" else None
                w2, pa2 = dense_update(opt, w, g_dense["md_proj"][i], pa, lr)
                new_proj.append(w2)
                new_proj_acc.append(pa2)
            new_params["md_proj"] = new_proj
            if opt.name != "sgd":
                new_state["md_proj"] = new_proj_acc

        # ----- sparse updates: gather full-batch row grads over "data" -----
        t, bd, l = batch.indices.shape
        w_eff = batch.weights
        if vw_b is not None:
            parts_w = []
            if nb > 0:
                safe_b = jnp.minimum(gidx_b, plan.r_big_pad - 1)
                parts_w.append(
                    batch.weights[:nb]
                    * jnp.take(vw_b, safe_b.reshape(-1)).reshape(nb, bd, l)
                )
            if ns_slots > 0:
                safe_s = jnp.minimum(gidx_s, plan.r_small_pad - 1)
                parts_w.append(
                    batch.weights[nb:]
                    * jnp.take(vw_s, safe_s.reshape(-1)).reshape(
                        ns_slots, bd, l
                    )
                )
            w_eff = (
                parts_w[0]
                if len(parts_w) == 1
                else jnp.concatenate(parts_w, 0)
            )
        w_g = w_eff[..., None] * g_pooled[:, :, None, :]  # [t,bd,l,dim]
        if has_qr:
            # chain rule through the per-sample combine: d/dQ (Q*R) = R,
            # d/dQ (Q+R) = 1 (qr_embedding.qr_row_grads semantics)
            _, r_rows = r_pack
            if config.qr_operation == "mult":
                gq_fac = jnp.where(is_qr, r_rows, 1.0)
                gr = jnp.where(is_qr, w_g * q_rows, 0.0)
            else:  # add
                gq_fac = 1.0
                gr = jnp.where(is_qr, w_g, 0.0)
            w_g = w_g * gq_fac
            ridx_flat = r_pack[0].reshape(t * bd * l)
            gr_flat = gr.reshape(t * bd * l, plan.dim)
            dense_gr = jnp.zeros((plan.qr_r_rows, plan.dim), store_b.dtype).at[
                ridx_flat
            ].add(gr_flat, mode="drop")
            dense_gr = jax.lax.psum(dense_gr, ("data", "model"))
            qr_r = params["qr_r"]
            if opt.name == "sgd":
                new_params["qr_r"] = qr_r - lr * dense_gr
            elif opt.name == "adagrad":
                acc_r = opt_state["qr_r"] + dense_gr * dense_gr
                new_state["qr_r"] = acc_r
                new_params["qr_r"] = qr_r - lr * dense_gr / (
                    jnp.sqrt(acc_r) + opt.eps
                )
            else:  # rwsadagrad
                acc_r = opt_state["qr_r"] + jnp.mean(dense_gr * dense_gr, -1)
                new_state["qr_r"] = acc_r
                new_params["qr_r"] = qr_r - lr * dense_gr / (
                    jnp.sqrt(acc_r) + opt.eps
                )[:, None]
        interp = jax.default_backend() != "tpu"

        def gathered(slot_lo, slot_hi, gidx_sec):
            fi = gidx_sec.reshape(-1)
            if plan.pack > 1:
                # PHYSICAL update rows: lane-place each contribution in its
                # logical row's block (ops/embedding.flat_row_grads form)
                width = plan.dim * plan.pack
                blk = (
                    jax.lax.broadcasted_iota(jnp.int32, (width,), 0)
                    // plan.dim
                )
                lmask = (
                    blk[None, None, None, :]
                    == (gidx_sec % plan.pack)[..., None]
                )
                g128 = jnp.tile(
                    g_pooled[slot_lo:slot_hi], (1, 1, plan.pack)
                )[:, :, None, :]
                fg = jnp.where(
                    lmask, w_eff[slot_lo:slot_hi][..., None] * g128, 0.0
                ).reshape(-1, width)
            else:
                fg = w_g[slot_lo:slot_hi].reshape(-1, plan.dim)
            return (
                jax.lax.all_gather(fi, "data", tiled=True),
                jax.lax.all_gather(fg, "data", tiled=True),
            )

        # big tables through the configured impl (the pallas row-RMW kernel
        # when sparse_update_impl='pallas')
        n_data = mesh.shape["data"]
        use_stream_b = (
            nb > 0
            and (
                config.sparse_update_impl == "stream"
                # pallas+SGD auto-routes its dense regime through the
                # streaming kernel — same rule as the single-device
                # router (train/train_step.py); adagrad-family momentum
                # is per-occurrence on the stream path, so it stays
                # opt-in there.
                or (
                    config.sparse_update_impl == "pallas"
                    and opt.name == "sgd"
                )
            )
            and stream_eligible(
                opt, store_b,
                _StreamGroupShim(plan.dim, plan.pack, plan.r_big_pad),
            )
            and not has_qr
            and not config.exact_row_momentum
            and not config.stochastic_rounding
            # dense regime: K_global vs per-shard physical rows (same
            # crossover as the single-device router)
            and nb * bd * l * n_data * DENSE_ACCUM_FACTOR
            >= store_b.shape[0]
        )
        if use_stream_b:
            # factored exchange for the sorted-run streaming kernel: gather
            # SCALARS (row ids, weights) + the POOLED cotangent over "data"
            # instead of per-occurrence [K,128] gradient rows — at L=100
            # that is ~L x less exchange volume (14 MB vs 840 MB per step
            # at bench shapes); values expand post-sort on each model shard
            # (optim/optimizer.sparse_update_stream)
            gidx_g = jax.lax.all_gather(gidx_b, "data", axis=1, tiled=True)
            w_gth = jax.lax.all_gather(
                w_eff[:nb].astype(jnp.float32), "data", axis=1, tiled=True
            )
            gp_gth = jax.lax.all_gather(
                g_pooled[:nb].astype(jnp.float32), "data", axis=1, tiled=True
            )
            shim = _StreamGroupShim(plan.dim, plan.pack, plan.r_big_pad)
            store_b2, acc_b2 = sparse_update_stream(
                opt, store_b, acc_b, shim, gidx_g, w_gth, gp_gth, lr,
                interpret=interp, row_dim=row_dim_b,
            )
        elif nb > 0:
            idx_bf, g_bf = gathered(0, nb, gidx_b)
            # write-only fast path: the local lookup already gathered the
            # big store's raw (physical) rows; all_gather them alongside
            # the grads so the kernel can write new = old + delta with one
            # DMA issue per row (ops/pallas_sparse_update.
            # sparse_rows_overwrite). One extra all_gather of the same
            # volume as the grads exchange — ICI-cheap vs ~40 ns/row of
            # read-DMA issues saved.
            old_bf = None
            if (
                batch.indices.shape[2] == 1
                and store_b.dtype == jnp.float32
                and not config.exact_row_momentum
                and not config.stochastic_rounding
                and config.sparse_update_impl in ("pallas", "stream")
            ):
                old_loc = parts[0][2][:, :, 0, :].astype(jnp.float32)
                old_bf = jax.lax.all_gather(
                    old_loc.reshape(-1, old_loc.shape[-1]), "data",
                    tiled=True,
                )
            store_b2, acc_b2 = sparse_update(
                opt, store_b, acc_b, idx_bf, g_bf, lr, plan.r_big_pad,
                impl=config.sparse_update_impl, interpret=interp,
                row_dim=row_dim_b,
                exact_momentum=config.exact_row_momentum,
                dim=plan.dim,
                old_rows=old_bf,
                density_hint=config.dup_density_hint,
            )
        else:
            store_b2, acc_b2 = store_b, acc_b
        # small tables: exact dense accumulation over the whole (separate)
        # small store — a full-array elementwise rewrite, never a
        # dynamic-update-slice copy of the big store (size_class=0 forces
        # the coalescing-exact dense path)
        if ns_slots > 0:
            idx_sf, g_sf = gathered(nb, t, gidx_s)
            store_s2, acc_s2 = sparse_update(
                opt, store_s, acc_s, idx_sf, g_sf, lr, plan.r_small_pad,
                impl=config.sparse_update_impl, interpret=interp,
                row_dim=row_dim_s, size_class=0, dim=plan.dim,
            )
        else:
            store_s2, acc_s2 = store_s, acc_s
        new_params["emb"] = store_b2[None]
        new_params["emb_small"] = store_s2[None]
        if opt.name != "sgd":
            if opt.name == "rwsadagrad":
                new_state["emb"] = acc_b2          # flat per shard
                new_state["emb_small"] = acc_s2
            else:
                new_state["emb"] = acc_b2[None]
                new_state["emb_small"] = acc_s2[None]
        if vw_b is not None and config.weighted_pooling == "learned":
            # d loss / d vw[row] += base_w * <g_pooled, store[row]>
            from dlrm_yx_tpu.optim.optimizer import sparse_update_1d

            if blk_mask is not None:
                g128v = jnp.tile(g_pooled, (1, 1, plan.pack))[:, :, None, :]
                gv_all = (
                    jnp.sum(jnp.where(blk_mask, q_rows * g128v, 0.0), axis=-1)
                    * batch.weights
                )
            else:
                gv_all = (
                    jnp.sum(q_rows * g_pooled[:, :, None, :], axis=-1)
                    * batch.weights
                )

            def vw_section(vw_sec, vacc_sec, gidx_sec, gv_sec, bound):
                vidx = jnp.where(
                    gidx_sec.reshape(-1) < bound,
                    jnp.minimum(gidx_sec, bound - 1).reshape(-1),
                    bound,
                )
                vidx = jax.lax.all_gather(vidx, "data", tiled=True)
                gv = jax.lax.all_gather(gv_sec.reshape(-1), "data", tiled=True)
                return sparse_update_1d(
                    opt, vw_sec, vacc_sec, vidx, gv, lr, bound
                )

            if nb > 0:
                vacc = opt_state["vw"][0] if opt.name != "sgd" else None
                vw_b2, vacc_b2 = vw_section(
                    vw_b, vacc, gidx_b, gv_all[:nb], plan.r_big_pad
                )
                new_params["vw"] = vw_b2[None]
                if opt.name != "sgd":
                    new_state["vw"] = vacc_b2[None]
            if ns_slots > 0:
                vacc = (
                    opt_state["vw_small"][0] if opt.name != "sgd" else None
                )
                vw_s2, vacc_s2 = vw_section(
                    vw_s, vacc, gidx_s, gv_all[nb:], plan.r_small_pad
                )
                new_params["vw_small"] = vw_s2[None]
                if opt.name != "sgd":
                    new_state["vw_small"] = vacc_s2[None]
        return new_params, new_state, loss

    pspecs = {
        "bot": [(P(), P())] * (len(config.ln_bot) - 1),
        "top": [(P(), P())] * (len(config.ln_top) - 1),
        "emb": P("model"),
        "emb_small": P("model"),
        "vw": P("model") if config.weighted_pooling is not None else None,
    }
    if config.weighted_pooling is not None:
        pspecs["vw_small"] = P("model")
    if has_qr:
        pspecs["qr_r"] = P()
    if config.md_table_ids:
        pspecs["md_proj"] = [P()] * len(config.md_table_ids)
    sspecs = (
        {}
        if opt.name == "sgd"
        else {
            "dense": {
                "bot": [(P(), P())] * (len(config.ln_bot) - 1),
                "top": [(P(), P())] * (len(config.ln_top) - 1),
            },
            "emb": P("model"),
            "emb_small": P("model"),
            **(
                # fixed mode carries (dead, zero) vw accumulators too:
                # init_hybrid_opt_state creates them whenever params have
                # vw, and shard_map specs must match the state pytree
                {"vw": P("model"), "vw_small": P("model")}
                if config.weighted_pooling is not None
                else {}
            ),
            **({"qr_r": P()} if has_qr else {}),
            **(
                {"md_proj": [P()] * len(config.md_table_ids)}
                if config.md_table_ids
                else {}
            ),
        }
    )
    bspecs = Batch(
        dense=P(("data", "model")),
        indices=P("model", "data"),
        weights=P("model", "data"),
        labels=P(("data", "model")),
    )

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


def make_hybrid_multistep_train_step(
    config: DLRMConfig,
    plan: ShardingPlan,
    opt: OptConfig,
    mesh: Mesh,
    n_steps: int,
    lr_fn=None,
):
    """``n_steps`` full hybrid-parallel optimizer steps under one
    ``lax.scan`` — ONE dispatch per n_steps iterations (the mesh analog of
    train_step.make_multistep_train_step; same bit-identical-sequence
    contract). ``batches``: every Batch leaf carries a leading [n_steps]
    axis, sharded like a single step's batch with the leading axis
    unsharded (HybridRunner.prepare_batch's stacked form)."""
    import jax.numpy as jnp

    inner = make_hybrid_train_step(
        config, plan, opt, mesh, lr_fn, jit=False
    )

    from dlrm_yx_tpu.train.train_step import scan_multistep

    return scan_multistep(
        inner, n_steps, lambda f: mesh_jit(f, donate_argnums=(0, 1))
    )


class HybridRunner:
    """Bundles the hybrid-parallel pieces behind the Trainer's runner
    interface (params/opt_state init + sharding, batch placement, jitted
    train/eval steps) so the CLI's --mesh-data/--mesh-model flags drive the
    same epoch loop as single-device training (the reference selects its
    parallel path inside DLRM_Net.forward, dlrm_s_pytorch.py:675-684; here
    the selection is a runner object)."""

    def __init__(
        self,
        config: DLRMConfig,
        opt: OptConfig,
        data: int = 1,
        model: Optional[int] = None,
        sharder: str = "greedy",
        allocation=None,
        lr_fn=None,
        seed: int = 123,
        n_accum: int = 1,
    ):
        from dlrm_yx_tpu.parallel.mesh import make_mesh
        from dlrm_yx_tpu.parallel.plan import arrange_sparse_inputs, make_plan

        self.config = config
        self.opt = opt
        self._lr_fn = lr_fn
        self.n_accum = max(1, n_accum)
        self.mesh = make_mesh(data, model)
        n_model = self.mesh.shape["model"]
        self.plan = make_plan(config, n_model, sharder, allocation)
        self._arrange = arrange_sparse_inputs
        params = init_hybrid_params(config, self.plan, seed)
        state = init_hybrid_opt_state(opt, params, self.plan)
        self.params, self.opt_state = shard_params(self.mesh, params, opt, state)
        if self.n_accum > 1:
            self.train_step = make_hybrid_accum_train_step(
                config, self.plan, opt, self.mesh, self.n_accum, lr_fn
            )
        else:
            self.train_step = make_hybrid_train_step(
                config, self.plan, opt, self.mesh, lr_fn
            )
        self.eval_step = make_hybrid_eval_step(config, self.plan, self.mesh)

    def make_multi_step(self, n_steps: int):
        """Scanned multi-step dispatch (Trainer --steps-per-dispatch): one
        device dispatch per n_steps full optimizer steps."""
        if self.n_accum > 1:
            raise ValueError("multi-step dispatch composes with accum at "
                             "the trainer level, not both at once")
        return make_hybrid_multistep_train_step(
            self.config, self.plan, self.opt, self.mesh, n_steps,
            self._lr_fn,
        )

    def prepare_batch(self, b: Batch) -> Batch:
        if np.asarray(b.labels).ndim == 3:
            # stacked micro-batches (--mlperf-grad-accum-iter): arrange
            # each micro, stack, shard with a leading unsharded axis
            micros = [
                self._prepare_one(Batch(*[np.asarray(x)[i] for x in b]))
                for i in range(np.asarray(b.labels).shape[0])
            ]
            stacked = Batch(
                *[np.stack([getattr(mb, f) for mb in micros])
                  for f in Batch._fields]
            )
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            return Batch(
                dense=jax.device_put(
                    stacked.dense,
                    NamedSharding(self.mesh, P(None, ("data", "model"))),
                ),
                indices=jax.device_put(
                    stacked.indices,
                    NamedSharding(self.mesh, P(None, "model", "data")),
                ),
                weights=jax.device_put(
                    stacked.weights,
                    NamedSharding(self.mesh, P(None, "model", "data")),
                ),
                labels=jax.device_put(
                    stacked.labels,
                    NamedSharding(self.mesh, P(None, ("data", "model"))),
                ),
            )
        return shard_batch(self.mesh, self._prepare_one(b))

    def _prepare_one(self, b: Batch) -> Batch:
        n_total = self.mesh.shape["data"] * self.mesh.shape["model"]
        bsz = np.asarray(b.labels).shape[0]
        if bsz % n_total or (bsz // self.mesh.shape["data"]) % self.mesh.shape["model"]:
            raise ValueError(
                f"batch size {bsz} incompatible with mesh "
                f"{dict(self.mesh.shape)} (needs B % (data*model) == 0 and "
                f"(B/data) % model == 0)"
            )
        ai, aw = self._arrange(
            self.plan, np.asarray(b.indices), np.asarray(b.weights)
        )
        return Batch(np.asarray(b.dense), ai, aw, np.asarray(b.labels))

    def reshard(self, params, opt_state):
        """Re-place host pytrees (e.g. from a loaded checkpoint) on the
        mesh."""
        return shard_params(self.mesh, params, self.opt, opt_state)


def make_hybrid_eval_step(config: DLRMConfig, plan: ShardingPlan, mesh: Mesh):
    """Returns jitted eval(params, batch) -> (preds [B,1], loss) with preds
    re-assembled across the mesh (the reference's eval all_gather,
    dlrm_s_pytorch.py:1067-1069 — here just an out_spec)."""
    n_model = plan.n_model
    nb = plan.n_big_slots
    ns_slots = plan.t_pad - nb
    offs_all = np.asarray(plan.row_offsets, np.int32).reshape(n_model, plan.t_pad)
    gather_all = np.asarray(plan.canonical_gather, np.int32)
    coll_all = np.asarray(plan.slot_coll, np.int32).reshape(n_model, plan.t_pad)
    roff_all = np.asarray(plan.slot_roff, np.int32).reshape(n_model, plan.t_pad)
    has_qr = plan.qr_r_rows > 0
    has_xf = any(plan.pseudo_xform)
    xform_all = (
        np.asarray(
            [
                plan.pseudo_xform[pid] if pid >= 0 else 0
                for pid in plan.device_table_order
            ],
            np.int32,
        ).reshape(n_model, plan.t_pad)
        if has_xf
        else None
    )

    def local_eval(params, batch):
        m = jax.lax.axis_index("model")
        offs = jax.lax.dynamic_index_in_dim(jnp.asarray(offs_all), m, 0, keepdims=False)
        r_store = params.get("qr_r") if has_qr else None
        coll = roff = None
        if has_qr:
            coll = jax.lax.dynamic_index_in_dim(
                jnp.asarray(coll_all), m, 0, keepdims=False
            )
            roff = jax.lax.dynamic_index_in_dim(
                jnp.asarray(roff_all), m, 0, keepdims=False
            )
        vw_b = params.get("vw")
        vw_b = vw_b[0] if vw_b is not None else None
        vw_s = params.get("vw_small")
        vw_s = vw_s[0] if vw_s is not None else None
        xf = None
        if xform_all is not None:
            xf = jax.lax.dynamic_index_in_dim(
                jnp.asarray(xform_all), m, 0, keepdims=False
            )
        parts = []
        if nb > 0:
            parts.append(_local_lookup(
                params["emb"][0], offs[:nb], batch.indices[:nb],
                batch.weights[:nb], plan.r_big_pad, plan.dim, r_store,
                coll[:nb] if coll is not None else None,
                roff[:nb] if roff is not None else None,
                config.qr_operation, vw_b, plan.pack,
                xf[:nb] if xf is not None else None, config.qr_collisions,
            )[0])
        if ns_slots > 0:
            parts.append(_local_lookup(
                params["emb_small"][0], offs[nb:], batch.indices[nb:],
                batch.weights[nb:], plan.r_small_pad, plan.dim, r_store,
                coll[nb:] if coll is not None else None,
                roff[nb:] if roff is not None else None,
                config.qr_operation, vw_s, plan.pack,
                xf[nb:] if xf is not None else None, config.qr_collisions,
            )[0])
        pooled = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        with phase_scope("alltoall_fwd"):
            ly_ex = jax.lax.all_to_all(
                pooled, "model", split_axis=1, concat_axis=0, tiled=True
            )
        ly_can = jnp.take(ly_ex, jnp.asarray(gather_all), axis=0)
        ly = _slots_from_canonical(ly_can, config, params.get("md_proj"))
        cdt = jnp.dtype(config.compute_dtype)
        with phase_scope("bottom_mlp"):
            x = apply_mlp(
                batch.dense, params["bot"], config.sigmoid_bot, cdt
            )
        z = interact_features(x, ly, config.interaction, config.interact_itself, cdt, impl=config.interaction_impl)
        logits = apply_mlp(
            z, params["top"], config.sigmoid_top, cdt, skip_last_activation=True
        )
        preds = predictions_from_logits(logits, config.loss_threshold)
        local = loss_fn(
            logits, batch.labels, config.loss, config.loss_threshold,
            config.wbce_weights,
        )
        loss = jax.lax.pmean(jax.lax.pmean(local, "data"), "model")
        return preds, loss

    pspecs = {
        "bot": [(P(), P())] * (len(config.ln_bot) - 1),
        "top": [(P(), P())] * (len(config.ln_top) - 1),
        "emb": P("model"),
        "emb_small": P("model"),
        "vw": P("model") if config.weighted_pooling is not None else None,
    }
    if config.weighted_pooling is not None:
        pspecs["vw_small"] = P("model")
    if has_qr:
        pspecs["qr_r"] = P()
    if config.md_table_ids:
        pspecs["md_proj"] = [P()] * len(config.md_table_ids)
    bspecs = Batch(
        dense=P(("data", "model")),
        indices=P("model", "data"),
        weights=P("model", "data"),
        labels=P(("data", "model")),
    )
    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(pspecs, bspecs),
        out_specs=(P(("data", "model")), P()),
        check_vma=False,
    )
    return mesh_jit(sharded)
