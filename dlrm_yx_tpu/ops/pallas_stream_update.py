"""Sorted-run streaming sparse-update kernel for DENSE update regimes.

The high-L (multi-hot) benchmark config — 8x1M-row tables, 64-dim, L=100,
mb 2048 (``/root/reference/bench/dlrm_s_benchmark.sh:41``) — produces
K = T*B*L = 1.64M row updates per step, touching ~18% of the store. In that
regime the row-RMW kernel (ops/pallas_sparse_update.py, per-row DMA at
~40 ns issue cost) loses to even XLA's scatter, and XLA's scatter itself
lowers to a full-store rewrite fusion plus ~15 ns per updated row
(measured: 24.7 ms at bench shapes, bench/probe_vmem_dynamic*.py).

This kernel is the TPU equivalent of the CUDA backward's sorted-segment
scatter (the reference's fused-optimizer kernels sort indices and stream
segment runs): updates arrive SORTED by physical row; the kernel streams
the store once, block by block, through VMEM (pipelined 2 MB blocks at HBM
bandwidth) and applies each block's run of updates with in-VMEM row
read-modify-writes (~8 ns/row measured — no HBM round trip per row). Cost
model vs XLA scatter at K updates over R physical rows:

    kernel:  stream R rows once (both paths pay this) + 8 ns * K
    XLA:     slower fusion stream (~2x)               + 15 ns * K

On duplicate-heavy real distributions (trace/Zipf Criteo), callers can
pre-coalesce the sorted runs so K collapses toward the unique-row count
while XLA's scatter still pays per-occurrence.

Contract: ``sorted_stream_add(store, pos, upd)`` computes
``store[pos[k]] += upd[k]`` where ``pos`` is ascending (duplicates allowed
— adds are applied in order within the owning block); entries with
``pos >= store.shape[0]`` are dropped (sentinel padding sorts to the end).
The store is updated in place (donated/aliased). float32 stores only —
bf16 stores take the existing paths.

Cited reference behavior: ``…cuda_yx.cu:191-249`` (the batched kernel this
round's VERDICT asked to beat at L=100), ``optim/rwsadagrad.py:98``
(coalesce-before-momentum, preserved by the caller on adagrad paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 4096      # store rows per grid block (2 MB f32)
CHUNK = 2048           # update rows DMA'd per inner iteration (1 MB)
ALIGN = 1024           # dynamic DMA starts floored to this many rows
                       # (1-D i32 arrays carry a (1024)-lane tiling; slice
                       # offsets must be tile-aligned)
CHP = CHUNK + ALIGN    # chunk buffer rows (covers the alignment slack)


def _kernel(starts_ref, pos_hbm, upd_hbm, blk_ref, out_ref,
            pos_s, upd_s, sems, *, n_blocks: int):
    i = pl.program_id(0)
    j0 = starts_ref[i]
    j1 = starts_ref[i + 1]
    row_base = i * BLOCK_ROWS

    out_ref[:] = blk_ref[:]

    @pl.when(j1 > j0)
    def _():
        n_chunks = (j1 - j0 + CHUNK - 1) // CHUNK

        def chunk_body(c, carry):
            base = j0 + c * CHUNK
            astart = (base // ALIGN) * ALIGN
            cp_pos = pltpu.make_async_copy(
                pos_hbm.at[pl.ds(astart, CHP)], pos_s, sems.at[0]
            )
            cp_upd = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(astart, CHP), :], upd_s, sems.at[1]
            )
            cp_pos.start()
            cp_upd.start()
            cp_pos.wait()
            cp_upd.wait()
            lo = base - astart
            hi = jnp.minimum(j1, base + CHUNK) - astart
            n = hi - lo
            q = n // 4
            ps = pos_s
            us = upd_s

            # four interleaved independent streams: the scalar core overlaps
            # address computation of later items with earlier items' VMEM
            # ops (2-way measured ~10 -> ~7 ns/row; 4-way pushes further).
            # Different rows are independent; duplicate rows are adjacent in
            # the sorted input, so only pairs straddling a stream boundary
            # could interleave — all RMWs inside one body execute in program
            # order, and bodies run sequentially, so sums stay exact.
            def item4(j, _):
                for t in range(4):
                    jj = lo + t * q + j
                    p = ps[jj] - row_base
                    out_ref[pl.ds(p, 1), :] = (
                        out_ref[pl.ds(p, 1), :] + us[pl.ds(jj, 1), :]
                    )
                return 0

            jax.lax.fori_loop(0, q, item4, 0)

            def item(j, _):
                p = ps[j] - row_base
                out_ref[pl.ds(p, 1), :] = (
                    out_ref[pl.ds(p, 1), :] + us[pl.ds(j, 1), :]
                )
                return 0

            jax.lax.fori_loop(lo + 4 * q, hi, item, 0)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


BLOCK_ROWS_APPLY = 2048   # smaller store blocks for the apply variant:
                          # VMEM must also hold the resident grad table
                          # (~8 MB at bench shapes; ~16 MB/core total)
GTAB_MAX_BYTES = 9 << 20  # grad tables beyond this fall back to the
                          # expand-then-add path (VMEM residency budget)


def _apply_kernel(starts_ref, pos_hbm, seg_hbm, w_hbm, h_hbm, gtab_hbm,
                  blk_ref, out_ref, gtab_v,
                  pos_a, seg_a, w_a, h_a, pos_b, seg_b, w_b, h_b, sems,
                  *, n_blocks: int, dim: int, pack: int):
    """sorted_stream_add with the value expansion folded in: update row j
    is w[j] * gtab[seg[j]] (lane-masked to sub-slot h[j] when the store
    packs ``pack`` logical rows per physical row). Only SCALAR streams
    move per occurrence — the [K,128] value array never exists. Chunk
    scalar DMAs ping-pong between the A and B scratch SETS (separate
    refs, not dim-0 slices — Mosaic rejects unaligned dynamic dim-0
    slicing of scratch) via a chunk-PAIR loop, so the RMW loop never
    stalls on a transfer."""
    i = pl.program_id(0)
    j0 = starts_ref[i]
    j1 = starts_ref[i + 1]
    row_base = i * BLOCK_ROWS_APPLY

    @pl.when(i == 0)
    def _():
        # grad table -> VMEM scratch once; persists across grid steps
        cp = pltpu.make_async_copy(gtab_hbm, gtab_v, sems.at[2, 0])
        cp.start()
        cp.wait()

    out_ref[:] = blk_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    half = lane // dim  # sub-slot id per lane (all-zero when pack == 1)

    @pl.when(j1 > j0)
    def _():
        n_chunks = (j1 - j0 + CHUNK - 1) // CHUNK
        bufs_a = (pos_a, seg_a, w_a, h_a, 0)
        bufs_b = (pos_b, seg_b, w_b, h_b, 1)

        def copies(c, bufs):
            pos_s, seg_s, w_s, h_s, srow = bufs
            astart = ((j0 + c * CHUNK) // ALIGN) * ALIGN
            cps = [
                pltpu.make_async_copy(
                    pos_hbm.at[pl.ds(astart, CHP)], pos_s, sems.at[srow, 0]
                ),
                pltpu.make_async_copy(
                    seg_hbm.at[pl.ds(astart, CHP)], seg_s, sems.at[srow, 1]
                ),
                pltpu.make_async_copy(
                    w_hbm.at[pl.ds(astart, CHP)], w_s, sems.at[srow, 2]
                ),
            ]
            if pack > 1:
                cps.append(pltpu.make_async_copy(
                    h_hbm.at[pl.ds(astart, CHP)], h_s, sems.at[srow, 3]
                ))
            return cps

        def start(c, bufs):
            for cp in copies(c, bufs):
                cp.start()

        def wait(c, bufs):
            for cp in copies(c, bufs):
                cp.wait()

        def rmw_chunk(c, bufs):
            pos_s, seg_s, w_s, h_s, _ = bufs
            base = j0 + c * CHUNK
            astart = (base // ALIGN) * ALIGN
            lo = base - astart
            hi = jnp.minimum(j1, base + CHUNK) - astart
            n = hi - lo
            q = n // 4

            def rmw(jj):
                s = seg_s[jj]
                g = gtab_v[pl.ds(s, 1), :]
                p = pos_s[jj] - row_base
                if pack > 1:
                    wv = jnp.where(half == h_s[jj], w_s[jj], 0.0)
                    out_ref[pl.ds(p, 1), :] = (
                        out_ref[pl.ds(p, 1), :] + g * wv
                    )
                else:
                    out_ref[pl.ds(p, 1), :] = (
                        out_ref[pl.ds(p, 1), :] + g * w_s[jj]
                    )

            # 4-way interleave (see _kernel): independent streams let the
            # scalar core overlap later items' address math with earlier
            # items' VMEM ops; duplicates are adjacent in sorted order and
            # bodies run in program order, so sums stay exact.
            def item4(j, _):
                for t in range(4):
                    rmw(lo + t * q + j)
                return 0

            jax.lax.fori_loop(0, q, item4, 0)

            def item(j, _):
                rmw(j)
                return 0

            jax.lax.fori_loop(lo + 4 * q, hi, item, 0)

        start(0, bufs_a)

        def pair_body(p, carry):
            c0 = 2 * p
            wait(c0, bufs_a)

            @pl.when(c0 + 1 < n_chunks)
            def _():
                start(c0 + 1, bufs_b)

            rmw_chunk(c0, bufs_a)

            @pl.when(c0 + 1 < n_chunks)
            def _():
                wait(c0 + 1, bufs_b)

                @pl.when(c0 + 2 < n_chunks)
                def _():
                    start(c0 + 2, bufs_a)

                rmw_chunk(c0 + 1, bufs_b)

            return carry

        jax.lax.fori_loop(0, (n_chunks + 1) // 2, pair_body, 0)


def sorted_stream_apply(
    store: jax.Array,
    pos: jax.Array,
    seg: jax.Array,
    w: jax.Array,
    h: jax.Array,
    gtab: jax.Array,
    *,
    dim: int,
    pack: int,
    n_live: int,
    interpret: bool = False,
) -> jax.Array:
    """store[pos[k], lanes(h[k])] += w[k] * gtab[seg[k], lanes(h[k])] for
    ascending pos — the factored form of ``sorted_stream_add`` where the
    per-occurrence update VALUES are expanded inside the kernel from the
    (small, VMEM-resident) pooled-grad table instead of materializing
    [K,128] in HBM (measured 5.6 ms of gather+select fusions at the L=100
    bench shapes, bench/results/round4_device.log).

    store: [R,128] f32 (aliased in place); pos/seg/h: [>=n_live+CHP] i32
    (sentinel pos >= R drops the entry); w: same length f32, all scalar
    optimizer math (lr, 1/sqrt(acc), pooling weight) pre-folded; gtab:
    [S,128] f32, lane-TILED copy of the [S,dim] pooled cotangent when
    pack > 1; h: sub-slot id (rows % pack), ignored when pack == 1.
    """
    if store.dtype != jnp.float32:
        raise ValueError("sorted_stream_apply: float32 stores only")
    if store.shape[1] != LANES or gtab.shape[1] != LANES:
        raise ValueError("sorted_stream_apply: 128-lane rows required")
    if gtab.size * 4 > GTAB_MAX_BYTES:
        raise ValueError("grad table exceeds VMEM residency budget")
    r = store.shape[0]
    k = n_live
    if pos.shape[0] < k + CHP:
        raise ValueError(f"pos needs >= {CHP} sentinel rows past {k}")
    s_rows = gtab.shape[0]
    if s_rows % 8:
        raise ValueError("gtab rows must be a sublane multiple (pad to 8)")
    n_blocks = (r + BLOCK_ROWS_APPLY - 1) // BLOCK_ROWS_APPLY
    bounds = jnp.minimum(
        jnp.arange(0, n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS_APPLY, r
    )
    starts = jnp.searchsorted(pos[:k], bounds).astype(jnp.int32)

    return pl.pallas_call(
        functools.partial(
            _apply_kernel, n_blocks=n_blocks, dim=dim, pack=pack
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # pos (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # seg (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # w   (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # h   (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # gtab (HBM)
                pl.BlockSpec(
                    (BLOCK_ROWS_APPLY, LANES), lambda i, s: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_ROWS_APPLY, LANES), lambda i, s: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((s_rows, LANES), jnp.float32),  # resident gtab
                pltpu.SMEM((CHP,), jnp.int32),             # pos A
                pltpu.SMEM((CHP,), jnp.int32),             # seg A
                pltpu.SMEM((CHP,), jnp.float32),           # w A
                pltpu.SMEM((CHP,), jnp.int32),             # h A
                pltpu.SMEM((CHP,), jnp.int32),             # pos B
                pltpu.SMEM((CHP,), jnp.int32),             # seg B
                pltpu.SMEM((CHP,), jnp.float32),           # w B
                pltpu.SMEM((CHP,), jnp.int32),             # h B
                pltpu.SemaphoreType.DMA((3, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(starts, pos, seg, w, h, gtab, store)


def sorted_stream_add(
    store: jax.Array,
    pos: jax.Array,
    upd: jax.Array,
    *,
    n_live: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """store[pos[k]] += upd[k] for ascending pos; full-store streaming.

    store: [R, 128] float32, updated IN PLACE (alias; no padding copy — a
    partial last block is handled by Mosaic's clipped block windows).
    pos:   [K] int32 ascending physical row ids; >= R entries dropped.
    upd:   [K, 128] float32 update rows (optimizer math pre-applied).
    n_live: if set, ``pos``/``upd`` already carry >= CHP trailing sentinel
    padding beyond the first n_live entries (callers pad the SCALAR streams
    before value expansion — an [K,128] jnp.pad here would copy ~1 GB at
    bench sizes); if None, this function pads (convenience path).
    """
    if store.dtype != jnp.float32:
        raise ValueError("sorted_stream_add: float32 stores only")
    if store.shape[1] != LANES or upd.shape[1] != LANES:
        raise ValueError("sorted_stream_add: 128-lane rows required")
    r = store.shape[0]
    if n_live is None:
        k = pos.shape[0]
        pos = jnp.pad(
            pos.astype(jnp.int32), (0, CHP), constant_values=jnp.int32(r)
        )
        upd = jnp.pad(upd.astype(jnp.float32), ((0, CHP), (0, 0)))
    else:
        k = n_live
        if pos.shape[0] < k + CHP:
            raise ValueError(
                f"pos needs >= {CHP} sentinel rows past n_live={k}"
            )
    n_blocks = (r + BLOCK_ROWS - 1) // BLOCK_ROWS
    bounds = jnp.minimum(
        jnp.arange(0, n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS, r
    )
    # boundary k-offsets; entries with pos >= r fall past starts[n_blocks]
    starts = jnp.searchsorted(pos[:k], bounds).astype(jnp.int32)

    return pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # pos (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # upd (HBM)
                pl.BlockSpec(
                    (BLOCK_ROWS, LANES), lambda i, s: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_ROWS, LANES), lambda i, s: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.SMEM((CHP,), jnp.int32),
                pltpu.VMEM((CHP, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r, LANES), jnp.float32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(starts, pos, upd, store)
