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
