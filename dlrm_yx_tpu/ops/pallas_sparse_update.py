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
  * the (rare) conflicted items are then applied EXACTLY by a SECOND,
    fully serialized Pallas pass (read-wait-add-write-wait per flagged
    item, skipping unflagged ones with a scalar branch). Keeping the tail
    a kernel — not a lax.cond around XLA scatter — matters twofold: there
    is no capacity limit (any conflict count is exact, just slower), and
    the store buffer stays in-place through the whole chain; a conditional
    holding the store forces XLA to copy the full store into each branch
    (profiled 3x ~11 ms copies at bench scale under shard_map). Random
    indices into millions of rows conflict ~0.5 times per step; tiny
    dup-heavy tables belong in small group stores
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


def _kernel(seed_ref, bflag_ref, idx_ref, sub_ref, upd_ref, store_ref,
            out_ref, rrow, wrow, rsem, wsem, *, bk: int, kk: int, pk: int,
            sr: bool):
    """One grid block of bk items; branch-free steady state.

    bflag_ref: SMEM [n_blocks] any-live-item flags — blocks
    whose items are ALL redirected (inactive / conflicted / coalesce
    padding at the tail of sorted inputs) are skipped wholesale instead of
    issuing bk no-op sentinel DMAs (~40 ns each).
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

    def get_upd(s):
        # kk == 1 updates arrive as a 2-D [bk, 128] block: a [bk, 1, 128]
        # buffer would carry a T(1,128) layout (one sublane per tile) and
        # make the XLA-side prep ~5x slower (profiled 0.10 ms/step)
        if kk == 1:
            return upd_ref[pl.ds(s, 1), :]
        return upd_ref[s]

    def accumulate(slot, s):
        if pk == 1:
            v = rrow[slot].astype(jnp.float32) + get_upd(s)
            wrow[slot] = _round(v, jnp.bool_(True))
        else:
            # add into the target row of the pk-row transfer (vector select)
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (pk, kk, LANES), 0)
                == sub_ref[s]
            )
            delta = jnp.where(sel, get_upd(s).reshape(1, kk, LANES), 0.0)
            v = rrow[slot].reshape(pk, kk, LANES).astype(jnp.float32) + delta
            wrow[slot] = _round(v, sel).reshape(pk * kk, LANES)

    @pl.when(bflag_ref[pl.program_id(0)] > 0)
    def _run_block():
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
            read(slot, s + W)
            return 0

        # split the tail off instead of a per-item @pl.when(s + W < bk)
        # guard: a branch per item costs ~2x on the scalar core (it stalls
        # DMA issue)
        jax.lax.fori_loop(W, bk - W, body2, 0)

        def body3(s, _):  # last W items: nothing left to prefetch
            slot = s % W
            wait_read(slot)
            wait_write(slot)
            accumulate(slot, s)
            write(slot, s)
            return 0

        jax.lax.fori_loop(bk - W, bk, body3, 0)
        for s in range(W):  # drain writes (also orders cross-block hazards)
            wait_write(s)


TAIL_BLOCK = 256


def _tail_kernel(bflag_ref, tid_ref, upd_hbm, store_ref, out_ref, rrow, urow,
                 rsem, usem, wsem, *, kk: int, pk: int, k: int,
                 tb: int = TAIL_BLOCK):
    """Serialized exact pass for conflicted items. bflag_ref: SMEM
    [k/TAIL_BLOCK] any-conflict-in-block flags (scanning all k items costs
    ~15 ns/branch on the scalar core — 0.25 ms of pure idle at k=16k —
    so clean blocks are skipped wholesale); tid_ref: SMEM [k] packed
    (unit * pk + sub) target ids, -1 = skip; upd_hbm: ANY [k * kk, LANES]
    f32 physical update rows; store/out aliased ANY. Each flagged item does
    read -> wait -> add -> write -> wait, so duplicates serialize exactly."""
    del store_ref

    def item(i, _):
        @pl.when(tid_ref[i] >= 0)
        def _():
            unit = tid_ref[i] // pk
            pltpu.make_async_copy(
                out_ref.at[pl.ds(unit * (pk * kk), pk * kk)], rrow, rsem
            ).start()
            pltpu.make_async_copy(
                upd_hbm.at[pl.ds(i * kk, kk)], urow, usem
            ).start()
            pltpu.make_async_copy(
                out_ref.at[pl.ds(0, pk * kk)], rrow, rsem
            ).wait()
            pltpu.make_async_copy(
                upd_hbm.at[pl.ds(0, kk)], urow, usem
            ).wait()
            if pk == 1:
                v = rrow[...].astype(jnp.float32) + urow[...]
                new = v.astype(out_ref.dtype)
            else:
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (pk, kk, LANES), 0)
                    == tid_ref[i] % pk
                )
                delta = jnp.where(sel, urow[...][None], 0.0)
                v = rrow[...].reshape(pk, kk, LANES).astype(jnp.float32) + delta
                new = v.astype(out_ref.dtype).reshape(pk * kk, LANES)
            rrow[...] = new
            pltpu.make_async_copy(
                rrow, out_ref.at[pl.ds(unit * (pk * kk), pk * kk)], wsem
            ).start()
            pltpu.make_async_copy(
                rrow, out_ref.at[pl.ds(0, pk * kk)], wsem
            ).wait()

        return 0

    def block(b, _):
        @pl.when(bflag_ref[b] > 0)
        def _():
            jax.lax.fori_loop(
                b * tb, jnp.minimum((b + 1) * tb, k), item, 0
            )

        return 0

    jax.lax.fori_loop(0, pl.cdiv(k, tb), block, 0)


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
    upd: float32 update rows (optimizer math pre-applied): [K, dim]
      logical rows (lane-placed here), or — preferred for packed stores,
      avoiding a second materialization — [K, store_width] PHYSICAL rows
      with each update already in its logical row's lane block and zeros
      elsewhere (the form ops/embedding.flat_row_grads emits).
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
    if pack == 1 or upd.shape[1] == width:
        upd_w = upd  # already physical rows
    else:
        # lane-place each d-wide update into its block of the 128-lane row
        # (tile+mask keeps it a 128-lane elementwise op; a [K, pack, d]
        # one-hot view would force a relayout of the whole array)
        lsub = safe_idx % pack
        blk = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) // d
        upd_w = jnp.where(
            blk[None, :] == lsub[:, None].astype(jnp.int32),
            jnp.tile(upd, (1, pack)),
            0.0,
        )
    main_upd = jnp.where(redirect[:, None], 0.0, upd_w)
    phys_idx = main_unit.astype(jnp.int32)  # unit ids; kernel scales by pk*kk

    bk = max(2 * W, min(BK, k))
    pad = (-k) % bk
    if pad:
        phys_idx = jnp.pad(phys_idx, (0, pad), constant_values=sentinel_unit)
        sub = jnp.pad(sub, (0, pad))
        main_upd = jnp.pad(main_upd, ((0, pad), (0, 0)))
        k += pad
    live = jnp.pad((~redirect).astype(jnp.int32), (0, pad))
    bflag = jnp.max(live.reshape(k // bk, bk), axis=1)

    sr = bool(stochastic_round) and store.dtype != jnp.float32 and not interpret
    out = pl.pallas_call(
        functools.partial(_kernel, bk=bk, kk=kk, pk=pk, sr=sr),
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full flag vector
            pl.BlockSpec((bk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((bk,), lambda i: (i,), memory_space=pltpu.SMEM),
            (
                pl.BlockSpec(
                    (bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
                if kk == 1
                else pl.BlockSpec(
                    (bk, kk, LANES), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
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
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        bflag, phys_idx, sub,
        main_upd if kk == 1 else main_upd.reshape(k, kk, LANES),
        store_phys,
    )
    # exact serialized tail pass for the redirected (conflicted) items —
    # a second in-place kernel, NOT a lax.cond (a conditional holding the
    # store forces XLA to copy it into each branch; see module docstring).
    # tid packs (physical unit, row-in-unit); -1 = skip.
    k0 = idx.shape[0]
    tid = jnp.where(
        is_conf > 0,
        (safe_idx // (pk * pack)) * pk + (safe_idx // pack) % pk,
        -1,
    ).astype(jnp.int32)
    nblk = (k0 + TAIL_BLOCK - 1) // TAIL_BLOCK
    conf_pad = jnp.pad(is_conf, (0, nblk * TAIL_BLOCK - k0))
    bflag = jnp.max(conf_pad.reshape(nblk, TAIL_BLOCK), axis=1).astype(
        jnp.int32
    )
    upd_phys = upd_w[:k0].reshape(k0 * kk, LANES)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, kk=kk, pk=pk, k=k0),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        scratch_shapes=[
            pltpu.VMEM((pk * kk, LANES), store.dtype),
            pltpu.VMEM((kk, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(bflag, tid, upd_phys, out)
    return out.reshape(r_phys, width)


def _wkernel(bflag_ref, idx_ref, vals_ref, store_ref, out_ref, wsem,
             *, bk: int, kk: int):
    """Write-only pass: out[idx[s]*kk : +kk] = vals[s] — no read phase, so
    each item costs ONE DMA issue instead of the RMW kernel's two (the
    40 ns/row issue cost roughly halves). Rows must be unique among live
    items (duplicates are redirected by the caller to the serialized RMW
    tail); redirected items point at the sentinel unit."""
    del store_ref

    @pl.when(bflag_ref[pl.program_id(0)] > 0)
    def _run():
        def src(s):
            if kk == 1:
                return vals_ref.at[pl.ds(s, 1), :]
            return vals_ref.at[s]

        def write(slot, s):
            pltpu.make_async_copy(
                src(s), out_ref.at[pl.ds(idx_ref[s] * kk, kk)], wsem.at[slot]
            ).start()

        def wait_write(slot):
            pltpu.make_async_copy(
                src(0), out_ref.at[pl.ds(0, kk)], wsem.at[slot]
            ).wait()

        def body1(s, _):
            write(s % W, s)
            return 0

        jax.lax.fori_loop(0, W, body1, 0)

        def body2(s, _):
            slot = s % W
            wait_write(slot)
            write(slot, s)
            return 0

        jax.lax.fori_loop(W, bk, body2, 0)
        for s in range(W):
            wait_write(s)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sparse_rows_overwrite(
    store: jax.Array,
    idx: jax.Array,
    new_vals: jax.Array,
    delta: jax.Array,
    active: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """``store[idx[k]] = new_vals[k]`` for active items whose row appears
    ONCE in the batch; duplicate-row occurrences apply as serialized exact
    RMW adds of ``delta[k]`` instead (their new_vals are ignored — each
    was computed from the same pre-update row).

    The write-only fast path exists because the updated rows are exactly
    the rows the forward lookup already gathered: the caller computes
    new = gathered_row + delta in-graph and the kernel skips its DMA read
    phase. float32 natural-layout stores only (width % 128 == 0; packed
    sub-128 stores share physical rows between logical rows and cannot be
    written blind). Duplicates are detected across the WHOLE batch (sort +
    neighbor compare — the RMW kernel only needs its 2W hazard window, a
    blind write needs global uniqueness).
    """
    if store.dtype != jnp.float32:
        raise ValueError("sparse_rows_overwrite: float32 stores only")
    r_phys, width = store.shape
    if width % LANES:
        raise ValueError("sparse_rows_overwrite: width % 128 != 0")
    kk = width // LANES
    k0 = idx.shape[0]

    active = active.astype(jnp.int32)
    safe_idx = jnp.where(
        active > 0, jnp.clip(idx, 0, r_phys - 1 - 8), 0
    ).astype(jnp.int32)

    # whole-range duplicate detection: sort with a position payload, flag
    # sorted-neighbor equality, and UNSORT THE FLAGS WITH A SECOND SORT —
    # scatter-based unsorting costs ~7 ns per scalar issue (115 us at
    # K=16k) while two [K] sorts + elementwise compares cost ~60 us total
    iota = jnp.arange(k0, dtype=jnp.int32)
    sortkey = jnp.where(active > 0, safe_idx, jnp.int32(2**30))
    s_key, order = jax.lax.sort((sortkey, iota), num_keys=1)
    left = jnp.concatenate([jnp.array([-1], jnp.int32), s_key[:-1]])
    right = jnp.concatenate([s_key[1:], jnp.array([-2], jnp.int32)])
    dup_sorted = (
        ((s_key == left) | (s_key == right)) & (s_key < 2**30)
    ).astype(jnp.int32)
    _, dup_i = jax.lax.sort((order, dup_sorted), num_keys=1)
    dup = dup_i > 0

    redirect = (active == 0) | dup
    sentinel_unit = r_phys - 1
    main_idx = jnp.where(redirect, sentinel_unit, safe_idx).astype(jnp.int32)
    main_vals = jnp.where(redirect[:, None], 0.0, new_vals.astype(jnp.float32))

    bk = max(2 * W, min(BK, k0))
    pad = (-k0) % bk
    k = k0 + pad
    if pad:
        main_idx = jnp.pad(main_idx, (0, pad), constant_values=sentinel_unit)
        main_vals = jnp.pad(main_vals, ((0, pad), (0, 0)))
    live = jnp.pad((~redirect).astype(jnp.int32), (0, pad))
    bflag = jnp.max(live.reshape(k // bk, bk), axis=1)

    store_phys = store.reshape(r_phys * kk, LANES)
    out = pl.pallas_call(
        functools.partial(_wkernel, bk=bk, kk=kk),
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bk,), lambda i: (i,), memory_space=pltpu.SMEM),
            (
                pl.BlockSpec(
                    (bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
                if kk == 1
                else pl.BlockSpec(
                    (bk, kk, LANES), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(store_phys.shape, store_phys.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        bflag,
        main_idx,
        main_vals if kk == 1 else main_vals.reshape(k, kk, LANES),
        store_phys,
    )

    # serialized exact RMW tail for duplicate occurrences (reuses the RMW
    # kernel's tail: read -> add delta -> write, one item at a time).
    # Duplicates are ~tens of items spread over the batch, so the scan
    # granularity is much finer than the RMW tail's (flagged blocks scan
    # every item with a ~30 ns branch; 64-item blocks keep that ~50 us
    # instead of ~120 at 256)
    tb = 64
    tid = jnp.where(dup & (active > 0), safe_idx, -1).astype(jnp.int32)
    nblk = (k0 + tb - 1) // tb
    dpad = jnp.pad(
        (dup & (active > 0)).astype(jnp.int32), (0, nblk * tb - k0)
    )
    tflag = jnp.max(dpad.reshape(nblk, tb), axis=1).astype(jnp.int32)
    delta_phys = delta.astype(jnp.float32).reshape(k0 * kk, LANES)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, kk=kk, pk=1, k=k0, tb=tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
        scratch_shapes=[
            pltpu.VMEM((kk, LANES), store.dtype),
            pltpu.VMEM((kk, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(tflag, tid, delta_phys, out)
    return out.reshape(r_phys, width)
