"""Optimizers: SGD / Adagrad / RWSAdagrad with sparse row updates.

Capability parity with the reference's optimizer wiring
(``/root/reference/dlrm_s_pytorch.py:1639-1666``): --optimizer ∈
{sgd, adagrad, rwsadagrad}; MLP (dense) params get the standard dense update,
embedding tables get *sparse* per-row updates.

Behavioral contracts mirrored:
  * torch SGD: p -= lr * g (sparse grads applied without coalescing — sum of
    duplicate contributions, which plain scatter-add reproduces exactly).
  * torch Adagrad (eps 1e-10): per-ELEMENT accumulator; sparse path coalesces
    first, sum += g^2, p -= lr * g / (sqrt(sum_new) + eps).
  * RWSAdagrad (``/root/reference/optim/rwsadagrad.py:57-122``): sparse grads
    keep ONE accumulator per row, updated with mean(g^2 over dim 1); dense
    grads fall back to full Adagrad. Coalescing first is mandatory (the
    update is non-linear; rwsadagrad.py:98).

TPU-native design: there is no dense [rows, D] gradient anywhere. Updates are
XLA scatters on coalesced (index, row-grad) pairs — O(touched rows · D)
memory traffic, the same asymptotics as the fused CUDA optimizers the
reference links against (table_batched_embeddings_ops, SURVEY.md §2.3).
Out-of-range sentinel indices are dropped by ``mode='drop'``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.ops.coalesce import coalesce_rows
from dlrm_yx_tpu.ops.embedding import TableGroup, dim_pack


@dataclasses.dataclass(frozen=True)
class OptConfig:
    name: str = "sgd"  # sgd | adagrad | rwsadagrad
    lr: float = 0.1    # base lr (may be rescaled per step by LRPolicy)
    eps: float = 1e-10

    def __post_init__(self):
        if self.name not in ("sgd", "adagrad", "rwsadagrad"):
            raise ValueError(f"unknown optimizer {self.name!r}")


def init_opt_state(opt: OptConfig, params: Dict, groups: Sequence[TableGroup]) -> Dict:
    """Accumulator pytree. SGD: empty. Adagrad: per-element sums everywhere.
    RWSAdagrad: per-element sums for dense, per-ROW momenta for tables."""
    if opt.name == "sgd":
        return {}
    dense = {
        k: [(jnp.zeros_like(w), jnp.zeros_like(b)) for (w, b) in params[k]]
        for k in ("bot", "top")
    }
    if len(groups) != len(params["emb"]):
        raise ValueError(
            f"{len(groups)} groups vs {len(params['emb'])} emb stores — "
            "pass the same groups the params were built with "
            "(models.dlrm.model_groups(cfg))"
        )
    if opt.name == "adagrad":
        emb = [jnp.zeros(e.shape, jnp.float32) for e in params["emb"]]
    else:  # rwsadagrad: one accumulator per LOGICAL row (stores may be
        # packed pack-rows-per-physical-row; groups carry the true count),
        # padded to acc_len so huge accumulators can update via the RMW
        # kernel instead of XLA's full-buffer rewrite (round 4)
        emb = [
            jnp.zeros((acc_len(g.total_rows),), jnp.float32)
            for g, e in zip(groups, params["emb"])
        ]
    state = {"dense": dense, "emb": emb}
    if params.get("vw") is not None:
        state["vw"] = [jnp.zeros_like(v) for v in params["vw"]]
    if "qr" in params:
        if opt.name == "adagrad":
            state["qr"] = [
                (jnp.zeros_like(q), jnp.zeros_like(r)) for q, r in params["qr"]
            ]
        else:
            state["qr"] = [
                (
                    jnp.zeros((q.shape[0],), jnp.float32),
                    jnp.zeros((r.shape[0],), jnp.float32),
                )
                for q, r in params["qr"]
            ]
    if "md_proj" in params:
        state["md_proj"] = [jnp.zeros_like(w) for w in params["md_proj"]]
    return state


def dense_update(
    opt: OptConfig, p: jax.Array, g: jax.Array, acc, lr
) -> Tuple[jax.Array, jax.Array]:
    """One dense-parameter update. Returns (new_p, new_acc)."""
    if opt.name == "sgd":
        return p - lr * g, acc
    # adagrad and rwsadagrad-dense are both full Adagrad
    # (rwsadagrad.py:118-121)
    acc = acc + g * g
    return p - lr * g / (jnp.sqrt(acc) + opt.eps), acc


def update_dense_towers(opt: OptConfig, params, opt_state, g_dense, lr):
    """Apply dense updates to the bot/top MLP towers (shared by the
    single-device and every sharded train step). Returns
    (new_params_partial, new_state_partial) dicts keyed 'bot'/'top'."""
    new_p, new_s = {}, {}
    for k in ("bot", "top"):
        layers, accs = [], []
        for i, (w, b) in enumerate(params[k]):
            gw, gb = g_dense[k][i]
            aw, ab = (
                opt_state["dense"][k][i] if opt.name != "sgd" else (None, None)
            )
            w2, aw2 = dense_update(opt, w, gw, aw, lr)
            b2, ab2 = dense_update(opt, b, gb, ab, lr)
            layers.append((w2, b2))
            accs.append((aw2, ab2))
        new_p[k] = layers
        new_s[k] = accs
    return new_p, new_s


# use the row-RMW kernel only when the XLA full-store rewrite would be
# expensive; small stores scatter fast and exactly in XLA
PALLAS_MIN_STORE_BYTES = 64 << 20

# 1-D row-momentum accumulators: XLA keeps the [R] scatter in place (issue-
# bound, ~240 us at 104 MB) up to a size where it flips to a full-buffer
# rewrite fusion (measured round 4: 1.53 ms on the 216 MB accumulator of
# the 54M-row bf16 capacity config). Past this gate the update routes
# through the row-RMW kernel on the accumulator viewed as a packed
# [len/128, 128] dim-1 store (~40 ns per touched entry).
ACC_KERNEL_MIN_BYTES = 160 << 20

# dead logical slots appended to 1-D momenta so the kernel view has its
# sentinel tail (last physical row dead + clip headroom past real ids)
ACC_SENTINEL_PAD = 256


def acc_len(total_rows: int) -> int:
    """Padded length of a per-LOGICAL-row 1-D momentum accumulator: rounds
    to the 128-lane tiling and appends a dead sentinel tail so the row-RMW
    kernel can apply huge-accumulator updates in place (see
    ACC_KERNEL_MIN_BYTES). All consumers tolerate the padding (updates
    address rows < total_rows; the dense finish splits the tail off)."""
    return ((total_rows + 127) // 128) * 128 + ACC_SENTINEL_PAD


def _acc_update_1d(
    opt, acc, flat_idx, mom_inc, active, sentinel, impl, interpret
):
    """acc[idx] += mom_inc for active items — XLA scatter for small
    accumulators, the row-RMW kernel (dim=1 packed view) once the scatter
    would lower to a full-buffer rewrite."""
    from dlrm_yx_tpu.ops import pallas_sparse_update as psu

    if (
        impl in ("pallas", "stream")
        and acc.shape[0] % 128 == 0
        and acc.shape[0] >= sentinel + 129  # clip headroom for real ids
        and acc.shape[0] * 4 >= ACC_KERNEL_MIN_BYTES
    ):
        # NOTE (round 4, measured and rejected): three alternatives to this
        # RMW route were built and profiled on the 216 MB capacity-config
        # accumulator — chunked slice+scatter+concat (1.66 ms: XLA
        # materializes the slice and concat copies), an optimization_barrier
        # around the plain scatter (no effect: the full-rewrite lowering is
        # the scatter op itself at this size, not a fusion decision), and a
        # write-only unit kernel (1.6 ms: the whole-batch duplicate tail is
        # DMA-latency-bound at ~300 physical-row dups). A fused store+momentum+denominator kernel (fbgemm
        # fused-optimizer style) was also built: 2.61 ms vs the separate
        # kernels' 1.77 — the per-item vector latency chain (select,
        # reduce, sqrt, divide) does not pipeline against the DMA issue
        # loop on the single scalar core, even fully vectorized. The RMW
        # kernel stays.
        acc2 = psu.sparse_rows_add(
            acc.reshape(-1, 128), flat_idx, mom_inc[:, None], active,
            interpret=interpret, dim=1,
        )
        return acc2.reshape(-1)
    safe = jnp.where(active > 0, flat_idx, sentinel)
    return acc.at[safe].add(mom_inc * active, mode="drop")

# update-density crossover: the RMW kernel moves one transfer unit per
# update occurrence and is DMA-ISSUE-bound (~25M rows/s on v5e, ~40 ns/row),
# while a dense accumulate + full-store rewrite is BANDWIDTH-bound
# (~4x store bytes). With K occurrences and R physical store rows the
# kernel wins while K << R; past K >= R / DENSE_ACCUM_FACTOR the dense
# rewrite is cheaper (the reference's high-L benchmark configs, 100
# indices/lookup on 1M-row tables, land far past it: K = T*B*L = 1.6M vs
# R = 4.2M physical rows). The dense path coalesces exactly, so
# adagrad-family momentum is also bit-exact there (grad.coalesce()
# semantics, /root/reference/optim/rwsadagrad.py:98).
DENSE_ACCUM_FACTOR = 8

# Momentum-exactness routing (round 5): per-occurrence Adagrad-family
# momentum (the fbgemm-style kernel-path approximation) measured 0.006
# held-out AUC below coalesce-exact at 5000 steps on trace-driven
# (realistically duplicate-heavy) streams, while coalesce-exact sat at
# the ~0.001 chaos floor (bench/results/auc_scaled_5000.json). The
# coalesce costs ~0.4 ms at headline shapes, which dup-LIGHT uniform
# hashed streams shouldn't pay: when the measured unique-rows-per-
# occurrence density (config.dup_density_hint, taken from a real first
# batch) is above this threshold, <=5% of occurrences share a row and
# per-occurrence is indistinguishable; below it — or when nothing was
# measured — coalesce first (correctness-first default).
MOMENTUM_EXACT_DENSITY = 0.95


def uniform_stream_density(
    emb_rows, emb_split_threshold: int, n_draws: int, seed: int = 0
) -> float:
    """Unique-rows-per-occurrence of a uniform synthetic stream over the
    kernel-eligible (big) tables — the statistic cli._measure_dup_density
    computes from a real first batch. Benches with synthetic uniform
    streams use THIS (with n_draws = their true batch*L) so their
    momentum routing matches what a production run measuring the same
    stream would pick."""
    import numpy as _np

    r = _np.random.RandomState(seed)
    big = [
        n for n in emb_rows
        if not emb_split_threshold or n > emb_split_threshold
    ]
    if not big:
        return 1.0
    uniq = sum(len(_np.unique(r.randint(0, n, n_draws))) for n in big)
    return max(1e-3, min(1.0, uniq / (len(big) * n_draws)))


def _store_bytes(store: jax.Array) -> int:
    return store.shape[0] * store.shape[1] * jnp.dtype(store.dtype).itemsize


def sparse_update(
    opt: OptConfig,
    store: jax.Array,
    acc,
    flat_idx: jax.Array,
    flat_g: jax.Array,
    lr,
    sentinel: int,
    impl: str = "xla",
    interpret: bool = False,
    row_dim=None,
    stochastic_round: bool = False,
    sr_seed=0,
    size_class: int = 1,
    dim: int | None = None,
    exact_momentum: bool = False,
    old_rows=None,
    density_hint: float = -1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse row update on a flat table store.

    store: [R, D] natural layout, or the packed [R/pack, dim*pack] layout
    for sub-128 dims (pass dim = logical row width; see ops/embedding.py);
    flat_idx: [K] LOGICAL row ids (duplicates allowed, sentinel = R for
    padding); flat_g: [K, store_width] PHYSICAL gradient rows — for packed
    stores each contribution is lane-placed in its logical row's block with
    zeros elsewhere (ops/embedding.flat_row_grads emits this form), which
    keeps every op here a 128-lane-wide elementwise/scatter op: per-row
    optimizer math works because the off-block lanes are zero.

    row_dim: optional [R] float32 of each row's TRUE embedding dim, for
    stores holding zero-padded mixed-dim (MD) tables — rwsadagrad's per-row
    momentum is mean(g^2) over the true dim (rwsadagrad.py:108), not the
    padded width. None = all rows use the full width D.

    impl='pallas' routes large stores through the row-RMW kernel
    (ops/pallas_sparse_update.py). SGD stays exact (linear). For
    adagrad/rwsadagrad the momentum accumulates per-OCCURRENCE on rows
    duplicated within one step (fbgemm approx-rowwise style) instead of
    coalesce-then-square; identical whenever a row appears once per step —
    the overwhelmingly common case for the big hashed tables this path is
    gated to (PALLAS_MIN_STORE_BYTES).

    size_class: the group's size class from ops/embedding.build_table_groups
    (0 = small-table group). Small groups ALWAYS take the exact XLA
    dense-accumulate path regardless of aggregate store bytes — they hold
    the dup-heavy tables whose adagrad-family momentum must coalesce
    exactly; the byte threshold alone would misroute a >64 MB aggregation
    of many small tables through the kernel.
    """
    from dlrm_yx_tpu.ops import pallas_sparse_update as psu

    width = store.shape[1]
    d = width if dim is None else dim
    pack = width // d if d < width else 1
    if d * pack != width:
        raise ValueError(f"dim {d} does not tile store width {width}")
    # kernel needs either the natural wide layout or a proper packed store
    layout_ok = (pack == 1 and d % 128 == 0) or (
        pack > 1 and width == 128 and pack == dim_pack(d)
    )
    # density-driven crossover (round 4): the static K-vs-R rule assumes
    # every occurrence is a distinct row; a measured duplicate-density
    # hint (config.dup_density_hint — unique rows / occurrences on a real
    # batch) replaces K with the EFFECTIVE unique count, so skewed
    # production streams near the crossover take the row-touching kernel
    # (coalesce-first, exactness preserved) instead of a full-store dense
    # rewrite whose cost ignores duplication entirely.
    k_raw = flat_idx.shape[0]
    k_eff = k_raw
    if 0.0 < density_hint <= 1.0:
        k_eff = max(1, int(k_raw * density_hint))
    dense_by_density = k_eff * DENSE_ACCUM_FACTOR >= store.shape[0]
    if k_eff != k_raw and k_raw * DENSE_ACCUM_FACTOR >= store.shape[0]:
        # the hint flipped a dense-regime decision to the kernel: the raw
        # stream IS dup-heavy, so coalesce first (also keeps the kernel's
        # serialized conflict tail off the dup storm)
        exact_momentum = True
    use_kernel = (
        # 'stream' routes the dense regime through sparse_update_stream at
        # the train-step level; through THIS interface it behaves as
        # 'pallas' (mesh paths, non-factored callers)
        impl in ("pallas", "stream")
        and size_class != 0
        and layout_ok
        and not dense_by_density
        and _store_bytes(store) >= PALLAS_MIN_STORE_BYTES
    )
    if use_kernel and opt.name != "sgd" and not exact_momentum:
        # density-driven momentum exactness (see MOMENTUM_EXACT_DENSITY):
        # unmeasured or dup-heavy streams coalesce first; measured
        # dup-light streams keep the cheaper per-occurrence form
        exact_momentum = not (density_hint >= MOMENTUM_EXACT_DENSITY)
    if use_kernel:
        if exact_momentum:
            # --exact-row-momentum (and the row-sharded path, which mixes
            # dup-heavy tiny tables into one row space): coalesce
            # duplicates FIRST so adagrad-family momentum sees each row's
            # summed gradient once (grad.coalesce() semantics,
            # rwsadagrad.py:98) instead of the per-occurrence fbgemm-style
            # approximation. Pays a sort — which also collapses the
            # kernel's serialized conflict tail (duplicates are the only
            # conflict source beyond pack-sharing), a large win when
            # duplicates are plentiful. Duplicate occurrences carry
            # IDENTICAL pre-update rows, so old_rows coalesce by
            # representative and the write-only path survives coalescing
            # (round 5) — post-coalesce the stream is duplicate-free, so
            # it hits sparse_rows_overwrite's no-conflict fast path.
            if old_rows is not None:
                flat_idx, flat_g, old_rows = coalesce_rows(
                    flat_idx, flat_g, sentinel, aux=old_rows
                )
            else:
                flat_idx, flat_g = coalesce_rows(flat_idx, flat_g, sentinel)
        active = (flat_idx < sentinel).astype(jnp.int32)
        # write-only fast path: when the caller supplies the CURRENT store
        # rows (the forward lookup's gather — L=1, natural layout), the
        # new row values are computable in-graph and the kernel skips its
        # per-row DMA READ phase (~half the 40 ns/row issue cost;
        # ops/pallas_sparse_update.sparse_rows_overwrite).
        can_overwrite = (
            old_rows is not None
            and not stochastic_round
            and store.dtype == jnp.float32
        )
        # NOTE (round 4, measured and rejected): a write-only UNIT kernel
        # for bf16 stores (gather each 8-row transfer unit in-graph, splice
        # the updated row, blind-write whole units with one DMA issue per
        # item) was built and profiled at the capacity config. The write
        # half works (0.46 ms vs the RMW's 0.81) but every way of READING
        # the old units loses more than the write saves: row-granular XLA
        # take = 1.2 ms (issue-bound at 8x the rows), lax.gather with
        # slice_sizes=(8,width) = 25+ ms (XLA:TPU serializes multi-row
        # slice gathers into a while loop), and a [n_units, 8*width]
        # reshape is not layout-compatible (full-store relayout copy,
        # OOM). bf16 stores keep the 8-row-unit RMW kernel.

        def apply_store(delta):
            if can_overwrite:
                # packed stores work too: old_rows are PHYSICAL rows (all
                # 128 lanes from the lookup's gather) and delta is
                # lane-placed, so new = old + delta is a full physical
                # row; dup detection at physical granularity also
                # serializes two logical rows sharing one physical row
                pidx = flat_idx // pack if pack > 1 else flat_idx
                return psu.sparse_rows_overwrite(
                    store, pidx, old_rows + delta, delta, active,
                    interpret=interpret,
                )
            return psu.sparse_rows_add(
                store, flat_idx, delta, active, interpret=interpret,
                stochastic_round=stochastic_round, seed=sr_seed, dim=d,
            )

        if opt.name == "sgd":
            return apply_store(-lr * flat_g), acc
        safe = jnp.where(active > 0, flat_idx, sentinel)
        if opt.name == "adagrad":
            acc = psu.sparse_rows_add(
                acc, flat_idx, flat_g * flat_g, active, interpret=interpret,
                dim=d,
            )
            # physical-row gather: off-block lanes divide zeros -> harmless
            denom = (
                jnp.sqrt(
                    jnp.take(
                        acc, safe // pack, axis=0, mode="fill", fill_value=1.0
                    )
                )
                + opt.eps
            )
            return apply_store(-lr * flat_g / denom), acc
        # rwsadagrad: 1-D per-LOGICAL-row momentum — the [R] scatter is a
        # cheap full rewrite (4 bytes/row), no kernel needed. Off-block
        # lanes are zero, so the sum over the physical width IS the sum
        # over the logical row; normalize by the LOGICAL dim.
        if row_dim is None:
            mom_inc = (jnp.sum(flat_g * flat_g, axis=-1) / d) * active
        else:
            mom_inc = (
                jnp.sum(flat_g * flat_g, axis=-1)
                / jnp.take(row_dim, safe, mode="fill", fill_value=1.0)
            ) * active
        acc = _acc_update_1d(
            opt, acc, flat_idx, mom_inc, active, sentinel, impl, interpret
        )
        denom = (
            jnp.sqrt(jnp.take(acc, safe, mode="fill", fill_value=1.0)) + opt.eps
        )
        return apply_store(-lr * flat_g / denom[:, None]), acc

    punit = flat_idx // pack if pack > 1 else flat_idx
    if opt.name == "sgd":
        # linear update: scatter-add handles duplicates exactly (lane
        # blocks of logical rows sharing a physical row are disjoint)
        return (
            store.at[punit].add((-lr * flat_g).astype(store.dtype), mode="drop"),
            acc,
        )

    if (
        size_class == 0
        or dense_by_density
        or _store_bytes(store) < PALLAS_MIN_STORE_BYTES
    ):
        # small store OR dense update (high-L): dense-accumulate instead of
        # sort-based coalescing.
        # NOTE (round 4, measured and rejected): a fused scatter+finish
        # kernel (ops/pallas_dense_finish.rwsadagrad_scatter_finish) that
        # accumulates SORTED per-occurrence updates in VMEM instead of
        # materializing dense_g was built and profiled at the headline
        # config — 620 us kernel + ~430 us of sort/permute/pad prep vs the
        # XLA scatter + dense-finish chain's 460 + 249 us: the zeros+
        # scatter pass is near its floor (memset + 36.8k row writes), and
        # the kernel pays fixed CHP-window DMAs and ~7 ns/item scalar RMWs
        # on top. The XLA dense_g path stays the route (MEASUREMENTS.md
        # round 4).
        # The scatter into a zero buffer IS the coalesced gradient (XLA's
        # full-store rewrite is cheap at this size and exact on duplicates);
        # untouched rows see zero grad, so the Adagrad-family update is a
        # no-op for them — identical semantics, no 36k-key sort (~2 ms on
        # v5e) in the hot path.
        dense_g = (
            jnp.zeros(store.shape, jnp.float32)
            .at[punit]
            .add(flat_g, mode="drop")
        )
        if opt.name == "adagrad":
            acc = acc + dense_g * dense_g
            upd = store.astype(jnp.float32) - lr * dense_g / (jnp.sqrt(acc) + opt.eps)
            return upd.astype(store.dtype), acc
        if (
            impl in ("pallas", "stream")
            and row_dim is None
            # bf16 stores supported round 4: the kernel reads bf16, does
            # the math in f32, rounds deterministically at write-back —
            # fusing the ~5 XLA passes + 2 dtype-convert copies the bf16
            # chain paid (profiled 0.64 ms of the 4.05 ms capacity step)
            and store.dtype in (jnp.float32, jnp.bfloat16)
            and acc.ndim == 1
            # the kernel's layouts: natural wide rows, or the standard
            # packed [R/pack, 128] form (ops/embedding.dim_pack)
            and (
                (pack == 1 and d == width and width % 128 == 0)
                or (pack > 1 and width == 128 and pack == dim_pack(d))
            )
        ):
            # fused finish: XLA runs the momentum/denominator/apply chain
            # below as ~5 separate store-sized passes (the per-row momentum
            # reduction's 1-D layout is a fusion barrier); the pallas pass
            # does it in 3 (ops/pallas_dense_finish.py) — same exactly-
            # coalescing semantics (dense_g IS the coalesced gradient)
            from dlrm_yx_tpu.ops.pallas_dense_finish import (
                rwsadagrad_dense_finish,
            )

            return rwsadagrad_dense_finish(
                store, acc, dense_g, lr, dim=d, eps=opt.eps,
                interpret=interpret,
            )
        # rwsadagrad momentum is per LOGICAL row: reduce each lane block
        g3 = dense_g.reshape(store.shape[0], pack, d)
        if row_dim is None:
            mom = jnp.mean(g3 * g3, axis=-1)
        else:
            mom = jnp.sum(g3 * g3, axis=-1) / row_dim.reshape(
                store.shape[0], pack
            )
        # the accumulator may be padded past the logical rows (callers that
        # carry it 2-D across shard_map boundaries round it to 128)
        r_log = store.shape[0] * pack
        mom_flat = mom.reshape(r_log)
        if acc.shape[0] != r_log:
            acc = acc.at[:r_log].add(mom_flat)
        else:
            acc = acc + mom_flat
        denom3 = (
            jnp.sqrt(acc[:r_log].reshape(store.shape[0], pack))[..., None]
            + opt.eps
        )
        upd = store.astype(jnp.float32) - lr * (g3 / denom3).reshape(
            store.shape
        )
        return upd.astype(store.dtype), acc

    # coalescing operates on LOGICAL ids with PHYSICAL rows: contributions
    # of one logical row share a lane block, so their sums coincide
    uniq, sg = coalesce_rows(flat_idx, flat_g, sentinel)
    puniq = uniq // pack if pack > 1 else uniq
    if opt.name == "adagrad":
        acc = acc.at[puniq].add(sg * sg, mode="drop")
        denom = (
            jnp.sqrt(
                jnp.take(acc, puniq, axis=0, mode="fill", fill_value=1.0)
            )
            + opt.eps
        )
        return (
            store.at[puniq].add(
                (-lr * sg / denom).astype(store.dtype), mode="drop"
            ),
            acc,
        )

    # rwsadagrad: row momentum += mean(g^2 over dim); update rows by
    # g / (sqrt(momentum_new) + eps)  (rwsadagrad.py:108-115)
    if row_dim is None:
        mom_inc = jnp.sum(sg * sg, axis=-1) / d
    else:
        mom_inc = jnp.sum(sg * sg, axis=-1) / jnp.take(
            row_dim, uniq, mode="fill", fill_value=1.0
        )
    acc = acc.at[uniq].add(mom_inc, mode="drop")
    denom = jnp.sqrt(acc.at[uniq].get(mode="fill", fill_value=1.0)) + opt.eps
    return (
        store.at[puniq].add(
            (-lr * sg / denom[:, None]).astype(store.dtype), mode="drop"
        ),
        acc,
    )


def sparse_update_1d(
    opt: OptConfig,
    vec: jax.Array,
    acc,
    flat_idx: jax.Array,
    flat_g: jax.Array,
    lr,
    sentinel: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse update for 1-D per-row parameters (learned pooling weights v_W).

    Equivalent to the dense update the reference applies to v_W_l Parameters
    (entries with zero grad are no-ops in Adagrad-family updates, so the
    sparse form matches the dense semantics exactly)."""
    if opt.name == "sgd":
        return vec.at[flat_idx].add(-lr * flat_g, mode="drop"), acc
    uniq, sg = coalesce_rows(flat_idx, flat_g, sentinel)
    acc = acc.at[uniq].add(sg * sg, mode="drop")
    denom = jnp.sqrt(acc.at[uniq].get(mode="fill", fill_value=1.0)) + opt.eps
    return vec.at[uniq].add(-lr * sg / denom, mode="drop"), acc


def stream_eligible(opt: OptConfig, store: jax.Array, group) -> bool:
    """Can this (optimizer, store, group) take the sorted-stream update?"""
    return (
        opt.name in ("sgd", "rwsadagrad")
        and store.dtype == jnp.float32
        and group.dim * group.pack == 128
        and group.size_class != 0
    )


def sparse_update_stream(
    opt: OptConfig,
    store: jax.Array,
    acc,
    group,
    gidx: jax.Array,
    weights: jax.Array,
    g_pooled: jax.Array,
    lr,
    interpret: bool = False,
    row_dim=None,
):
    """Sorted-run streaming sparse update (--sparse-update-impl=stream).

    The factored form of the dense-regime update: instead of materializing
    per-occurrence gradient rows in NATURAL order and scatter-adding them
    (XLA: full-store rewrite + ~15 ns per occurrence,
    bench/probe_vmem_dynamic*.py), sort the SCALAR (row, segment, weight)
    triples (4.1 ms at K=1.64M — no [K,128] payload moves), expand values
    AFTER the sort with a small-operand gather from the 8 MB pooled-grad
    table (~3.4 ns/row), and apply with ops/pallas_stream_update.
    sorted_stream_add — one full-store stream + in-VMEM row RMWs.

    Measured at the reference L=100 bench shapes (f32, 2 GB store):
    ~even with XLA on uniform-random indices; 30.2 -> ~19 ms on a
    Zipf(1.2) stream (11% unique) where sorted duplicates hit VMEM-resident
    rows instead of paying per-occurrence scatter issues; and no [R,128]
    dense-gradient buffer is materialized (in-place, halves peak memory of
    the update at capacity configs).

    gidx: [T,B,L] GLOBAL logical row ids for this group (padding entries
    must carry id group.total_rows); weights: [T,B,L] (0 = padding);
    g_pooled: [T_g, B, dim] pooled cotangent. SGD is exact (linear);
    rwsadagrad momentum accumulates per-occurrence (the kernel path's
    documented fbgemm-style semantics) — use the dense path for
    --exact-row-momentum.

    Reference parity: the CUDA backward's sorted-segment scatter in the
    fused-optimizer kernels (SURVEY.md §2.3); grad.coalesce() exactness
    holds for SGD, rwsadagrad approximates per-occurrence like fbgemm.
    """
    from dlrm_yx_tpu.ops.pallas_stream_update import (
        CHP,
        GTAB_MAX_BYTES,
        LANES,
        sorted_stream_add,
        sorted_stream_apply,
    )

    t, b, l = gidx.shape
    k = t * b * l
    dim, pack = group.dim, group.pack

    rows = gidx.reshape(-1).astype(jnp.int32)
    seg = jnp.broadcast_to(
        (jnp.arange(t * b, dtype=jnp.int32) * 1).reshape(t, b, 1), (t, b, l)
    ).reshape(-1)
    w = weights.reshape(-1).astype(jnp.float32)
    rows_s, seg_s, w_s = jax.lax.sort((rows, seg, w), num_keys=1)
    # pad the SCALAR streams only — no [K,128] value array is ever built
    # (round-5: the expansion moved INSIDE the kernel, which reads the
    # VMEM-resident [t*b,128] pooled-grad table per occurrence; the old
    # gather+select expansion cost 5.6 ms at the L=100 bench shapes); the
    # sentinel logical row maps to a physical pos >= store rows, so the
    # kernel drops it
    r_phys = store.shape[0]
    rows_s = jnp.pad(rows_s, (0, CHP), constant_values=jnp.int32(r_phys * pack))
    seg_s = jnp.pad(seg_s, (0, CHP))
    w_s = jnp.pad(w_s, (0, CHP))

    gp2 = g_pooled.astype(jnp.float32).reshape(t * b, dim)
    sumsq_g = jnp.sum(gp2 * gp2, axis=-1)  # [t*b]; for the momentum path
    if pack > 1:
        gp2 = jnp.tile(gp2, (1, pack))  # [t*b, 128]
    pos = rows_s // pack if pack > 1 else rows_s
    h_sub = (rows_s % pack).astype(jnp.int32) if pack > 1 else rows_s

    gtab = gp2
    pad_rows = (-gtab.shape[0]) % 8
    if pad_rows:
        gtab = jnp.pad(gtab, ((0, pad_rows), (0, 0)))
    fits_vmem = (
        gtab.shape[0] * LANES * 4 <= GTAB_MAX_BYTES and gtab.shape[1] == LANES
    )

    def apply_update(st, w_eff):
        if fits_vmem:
            return sorted_stream_apply(
                st, pos, seg_s, w_eff, h_sub, gtab,
                dim=dim, pack=pack, n_live=k, interpret=interpret,
            )
        # fallback: expand values in XLA (grad table too big for VMEM)
        vals = jnp.take(gp2, seg_s, axis=0) * w_eff[:, None]
        if pack > 1:
            blk = jax.lax.broadcasted_iota(jnp.int32, (128,), 0) // dim
            vals = jnp.where(blk[None, :] == h_sub[:, None], vals, 0.0)
        return sorted_stream_add(st, pos, vals, n_live=k, interpret=interpret)

    if opt.name == "sgd":
        return apply_update(store, -lr * w_s), acc

    # rwsadagrad: per-LOGICAL-row 1-D momentum, per-occurrence accumulation.
    # sum(vals^2) factors as w^2 * sum(g[seg]^2): no expansion needed here
    # either (the mask keeps exactly one dim-lane copy of g).
    active = (rows_s < group.total_rows).astype(jnp.float32)
    wsq = w_s * w_s * jnp.take(
        sumsq_g, seg_s, mode="fill", fill_value=0.0
    )
    if row_dim is None:
        mom_inc = wsq / dim * active
    else:
        mom_inc = (
            wsq / jnp.take(row_dim, rows_s, mode="fill", fill_value=1.0)
        ) * active
    safe = jnp.where(active > 0, rows_s, group.total_rows)
    acc = acc.at[safe].add(mom_inc, mode="drop")
    denom = jnp.sqrt(jnp.take(acc, safe, mode="fill", fill_value=1.0)) + opt.eps
    return apply_update(store, -lr * w_s / denom), acc
