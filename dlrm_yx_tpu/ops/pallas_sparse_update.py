"""Sparse embedding-row update as a pipelined read-modify-write Pallas kernel.

Why this exists: XLA:TPU lowers ``store.at[idx].add(upd)`` on a large
``[R, D]`` table as a fusion that REWRITES THE ENTIRE STORE every step
(profiled on v5e: 3.9 ms for a 3.6 GB store regardless of how few rows are
touched, with or without uniqueness/sortedness hints). The reference solves
the same problem on GPU with fused optimizer kernels doing in-place atomic
row updates (fbgemm's ``SplitTableBatchedEmbeddingBagsCodegen`` and the
``TableBatchedEmbeddingBags`` SGD fused backward, SURVEY.md §2.3). This
kernel is the TPU equivalent: per-row DMA read -> VPU add -> DMA write back,
software-pipelined over a W-deep slot window, touching ONLY the K updated
rows (~40 ns/row measured on v5e vs a 3.9 ms full rewrite).

The steady-state loop is branch-free — no per-item flag checks, which
measured 2-4x slower (TPU scalar-core branches stall DMA issue). Masked
items (padding, zero grads) and DUPLICATE rows inside the 2W-item hazard
window are handled OUTSIDE the kernel, vectorized on the VPU:
  * masked/conflicted items are redirected to a dead sentinel row at the end
    of the store (ops/embedding.SENTINEL_ROWS) with a zero update — the
    races they could cause only ever rewrite the sentinel row;
  * the (rare) conflicted items are then applied EXACTLY afterwards by a
    short serialized loop over a fixed-size gathered buffer; if an
    adversarial input overflows it, a cond falls back to the exact XLA
    scatter for those items. Random indices into millions of rows conflict
    ~0.5 times per step; tiny dup-heavy tables belong in small group stores
    (ops/embedding.build_table_groups small_threshold) where XLA scatter is
    cheap and exactly coalescing.

The reference's correctness anchor for duplicates is grad.coalesce()
(optim/rwsadagrad.py:98); here row updates are pure additions (optimizer
math pre-applied in XLA), so duplicate handling is linear and exact.

Dtypes: float32 stores move one row per DMA. bfloat16 stores (emb_dtype —
the fbgemm fp16-weights parity that fits the 10M-ind-range Terabyte tables
on one 16 GB chip) are sublane-packed on TPU and Mosaic requires 8-aligned
slices, so the kernel works at 8-ROW granularity for bf16: read the 8-row
unit, add the update into the target row via a vector select, write the
unit back. Conflicts are detected at unit granularity. Updates arrive in
float32 and round to the store dtype at write-back.

Dims: D multiples of 128 work on the natural [R, D] layout. Sub-128 dims
that divide 128 (the reference's flagship 64-dim configs,
``/root/reference/bench/dlrm_s_benchmark.sh:41-44`` and
``bench/dlrm_s_criteo_terabyte.sh:24``; also 32/16/8) are supported via
PACKED stores: pack = 128/D logical rows per 128-lane physical row, the
same role Vec4T plays for the CUDA kernel's any-D support
(``…cuda_yx.cu:40-129``). The caller keeps the store as ``[R/pack, 128]``
(ops/embedding.py builds group stores that way — an [R, 64] array would
get a lane-padded T(8,128) layout from XLA, wasting HBM and forcing a
relayout copy at every kernel call). Updates are lane-placed into
128-wide rows by vectorized XLA preprocessing; the kernel body is
identical — conflicts are detected at transfer-unit granularity, which
also serializes two different logical rows sharing a physical row.
Dims that do not divide 128 take the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
W = 32          # in-flight read AND write window depth
BK = 4096       # items per grid block
WINDOW = 2 * W  # hazard look-back distance (items)
CMAX = 256      # serialized-pass capacity for conflicted items


def supports_dim(d: int) -> bool:
    """Multiples of 128 run on the natural layout; divisors of 128 run on
    the packed [R/pack, 128] layout (see module docstring)."""
    return d % LANES == 0 or LANES % d == 0


def pack_factor(d: int) -> int:
    """Logical rows per 128-lane physical row for dim d."""
    return LANES // d if d < LANES and LANES % d == 0 else 1


def conflict_flags(idx: jax.Array, active: jax.Array) -> jax.Array:
    """Flag item k if any of the previous WINDOW-1 ACTIVE items updates the
    same row/pair (vectorized shifts + compares; no sort)."""
    k = idx.shape[0]
    pos = jnp.arange(k, dtype=jnp.int32)
    c = jnp.zeros((k,), jnp.bool_)
    for j in range(1, WINDOW):
        c = c | (
            (idx == jnp.roll(idx, j)) & (jnp.roll(active, j) > 0) & (pos >= j)
        )
    return (c & (active > 0)).astype(jnp.int32)


def _kernel(seed_ref, idx_ref, sub_ref, upd_ref, store_ref, out_ref,
            rrow, wrow, rsem, wsem, *, bk: int, kk: int, pk: int,
            sr: bool):
    """One grid block of bk items; branch-free steady state.

    idx_ref: SMEM [bk] transfer-unit ids (masked items point at the
    sentinel unit with a zero update); sub_ref: SMEM [bk]
    target row within the pk-row transfer; upd_ref: VMEM [bk, kk, LANES].
    All row DMA goes through out_ref: on TPU it is the same buffer as
    store_ref (input_output_aliases); in interpret mode (copy-in/copy-out)
    reads must see earlier writes.
    """
    del store_ref
    if sr:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    def read(slot, s):
        # offset = unit * (pk*kk): the product with the static tile count is
        # provably aligned for Mosaic's bf16 8-sublane tiling check
        pltpu.make_async_copy(
            out_ref.at[pl.ds(idx_ref[s] * (pk * kk), pk * kk)],
            rrow.at[slot], rsem.at[slot],
        ).start()

    def wait_read(slot):
        pltpu.make_async_copy(
            out_ref.at[pl.ds(0, pk * kk)], rrow.at[slot], rsem.at[slot]
        ).wait()

    def write(slot, s):
        pltpu.make_async_copy(
            wrow.at[slot],
            out_ref.at[pl.ds(idx_ref[s] * (pk * kk), pk * kk)],
            wsem.at[slot],
        ).start()

    def wait_write(slot):
        pltpu.make_async_copy(
            wrow.at[slot], out_ref.at[pl.ds(0, pk * kk)], wsem.at[slot]
        ).wait()

    def _round(v, sel):
        """f32 -> store dtype; optional stochastic rounding (the reference
        kernel's stochastic_rounding flag, dlrm_s_pytorch.py:333) applied
        ONLY to updated rows — SR on an exactly-representable unchanged
        value could bump it to the next bf16."""
        if not sr:
            return v.astype(wrow.dtype)
        bits = pltpu.prng_random_bits(v.shape)
        u = pltpu.bitcast(v, jnp.uint32) + (
            pltpu.bitcast(bits, jnp.uint32) & jnp.uint32(0xFFFF)
        )
        sr_val = pltpu.bitcast(
            u & jnp.uint32(0xFFFF0000), jnp.float32
        ).astype(wrow.dtype)
        return jnp.where(sel, sr_val, v.astype(wrow.dtype))

    def accumulate(slot, s):
        if pk == 1:
            v = rrow[slot].astype(jnp.float32) + upd_ref[s]
            wrow[slot] = _round(v, jnp.bool_(True))
        else:
            # add into the target row of the pk-row transfer (vector select)
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (pk, kk, LANES), 0)
                == sub_ref[s]
            )
            delta = jnp.where(sel, upd_ref[s][None], 0.0)
            v = rrow[slot].reshape(pk, kk, LANES).astype(jnp.float32) + delta
            wrow[slot] = _round(v, sel).reshape(pk * kk, LANES)

    for s in range(W):  # prologue: fill the read pipeline
        read(s, s)

    def body1(s, _):  # first W items: no writes pending yet
        slot = s % W
        wait_read(slot)
        accumulate(slot, s)
        write(slot, s)
        read(slot, s + W)  # bk >= 2W, so s + W < bk
        return 0

    jax.lax.fori_loop(0, W, body1, 0)

    def body2(s, _):  # steady state: zero branches in the hot path
        slot = s % W
        wait_read(slot)
        wait_write(slot)  # write issued W items ago on this slot
        accumulate(slot, s)
        write(slot, s)

        @pl.when(s + W < bk)
        def _():
            read(slot, s + W)

        return 0

    jax.lax.fori_loop(W, bk, body2, 0)
    for s in range(W):  # drain writes (also orders cross-block hazards)
        wait_write(s)


@functools.partial(
    jax.jit, static_argnames=("interpret", "stochastic_round", "dim")
)
def sparse_rows_add(
    store: jax.Array,
    idx: jax.Array,
    upd: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    stochastic_round: bool = False,
    seed=0,
    dim: int | None = None,
) -> jax.Array:
    """In-place ``store[idx[k]] += upd[k]`` for active items, touching only
    the updated rows (plus the sentinel rows).

    store: float32 or bfloat16. Either the natural layout [R, D] with
      D % 128 == 0 (dim=None), or a PACKED store [R/pack, 128] holding
      pack = 128/dim logical rows per physical row (pass dim = the logical
      row width; required for sub-128 dims — see module docstring). The
      last transfer unit (pack * 8 logical rows covers every dtype) must be
      dead sentinel rows (ops/embedding.build_table_groups provisions
      them). Donate the buffer.
    idx: [K] int32 LOGICAL row ids in [0, R) (any value OK for inactive).
    upd: [K, dim] float32 update rows (optimizer math pre-applied).
    active: [K] int32/bool; 0 = skip (padding slots, dropped sentinels).
    Returns the updated store (same shape as the input, aliased buffer).
    """
    r_phys, width = store.shape
    d = width if dim is None else dim
    k = idx.shape[0]
    if d >= width:
        if d != width or width % LANES:
            raise ValueError(f"bad store width {width} for dim {d}")
        pack = 1
    else:
        if width != LANES or LANES % d:
            raise ValueError(
                f"packed store must be [R/pack, {LANES}] with dim | {LANES}; "
                f"got width {width}, dim {d}"
            )
        pack = LANES // d
    kk = width // LANES
    r_log = r_phys * pack
    # bf16 HBM/VMEM slices must be 8-sublane aligned on TPU (packed tiling),
    # so bf16 stores move 8-row units; f32 moves single rows
    pk = 1 if store.dtype == jnp.float32 else 8
    if r_phys % pk:
        raise ValueError(f"store rows {r_phys} must be a multiple of {pk}")
    store_phys = store.reshape(r_phys * kk, LANES)
    unit_rows = pk * pack  # logical rows per transfer/hazard unit

    active = active.astype(jnp.int32)
    safe_idx = jnp.where(
        active > 0, jnp.clip(idx, 0, r_log - 1 - unit_rows), r_log - 1
    ).astype(jnp.int32)
    unit = safe_idx // unit_rows  # hazard/transfer granularity
    is_conf = conflict_flags(unit, active)
    redirect = (active == 0) | (is_conf > 0)
    sentinel_unit = r_phys // pk - 1
    main_unit = jnp.where(redirect, sentinel_unit, unit)
    sub = jnp.where(redirect, 0, (safe_idx // pack) % pk).astype(jnp.int32)
    if pack == 1:
        upd_w = upd
    else:
        # lane-place each d-wide update into its block of the 128-lane row
        lsub = safe_idx % pack
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (k, pack), 1) == lsub[:, None]
        )
        upd_w = (
            jnp.where(onehot[:, :, None], upd[:, None, :], 0.0)
        ).reshape(k, width)
    main_upd = jnp.where(redirect[:, None], 0.0, upd_w)
    phys_idx = main_unit.astype(jnp.int32)  # unit ids; kernel scales by pk*kk

    bk = max(2 * W, min(BK, k))
    pad = (-k) % bk
    if pad:
        phys_idx = jnp.pad(phys_idx, (0, pad), constant_values=sentinel_unit)
        sub = jnp.pad(sub, (0, pad))
        main_upd = jnp.pad(main_upd, ((0, pad), (0, 0)))
        k += pad

    sr = bool(stochastic_round) and store.dtype != jnp.float32 and not interpret
    out = pl.pallas_call(
        functools.partial(_kernel, bk=bk, kk=kk, pk=pk, sr=sr),
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((bk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (bk, kk, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(store_phys.shape, store_phys.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, pk * kk, LANES), store.dtype),
            pltpu.VMEM((W, pk * kk, LANES), store.dtype),
            pltpu.SemaphoreType.DMA((W,)),
            pltpu.SemaphoreType.DMA((W,)),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        phys_idx, sub, main_upd.reshape(k, kk, LANES), store_phys,
    )
    out = out.reshape(r_phys, width)

    # exact tail pass for the redirected (conflicted) items, applied on the
    # physical rows (two conflicted items sharing one physical row are
    # serialized by the fori_loop; lane blocks are disjoint per logical row)
    nconf = jnp.sum(is_conf)
    _, conf_pos = jax.lax.top_k(is_conf, min(CMAX, is_conf.shape[0]))
    conf_act = jnp.take(is_conf, conf_pos)
    conf_prow = jnp.where(
        conf_act > 0, jnp.take(safe_idx, conf_pos) // pack, r_phys - 1
    )
    conf_upd = jnp.take(upd_w[: idx.shape[0]], conf_pos, axis=0) * conf_act[
        :, None
    ]

    def apply_seq(s):
        def b(i, s):
            row = conf_prow[i]
            new_row = (
                jax.lax.dynamic_index_in_dim(s, row, 0, False).astype(
                    jnp.float32
                )
                + conf_upd[i]
            ).astype(s.dtype)
            return jax.lax.dynamic_update_index_in_dim(s, new_row, row, 0)

        return jax.lax.fori_loop(0, jnp.minimum(nconf, CMAX), b, s)

    def fallback(s):
        # adversarial overflow: exact XLA scatter of ALL conflicted items
        all_prow = jnp.where(is_conf > 0, safe_idx // pack, r_phys - 1)
        return s.at[all_prow].add(
            (upd_w[: idx.shape[0]] * is_conf[:, None]).astype(s.dtype),
            mode="drop",
        )

    return jax.lax.cond(nconf <= CMAX, apply_seq, fallback, out)
