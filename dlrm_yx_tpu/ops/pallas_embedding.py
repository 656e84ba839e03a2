"""Fused multi-table embedding lookup as a Pallas TPU kernel.

TPU-native rebuild of the reference's centerpiece CUDA kernel
(``/root/reference/yx_modfs/table_batched_embeddings_cuda_yx.cu:191-315``):
one tall ``[sum_rows, D]`` weight matrix, flattened per-table indices, a grid
over (table, batch-tile), vectorized row loads, sum-pooling in registers.

The TPU mapping:
  * the weight store stays in HBM (``pl.ANY``); rows are fetched with
    explicit async DMAs — the TPU analog of the CUDA kernel's ``__ldg``
    vectorized global loads. HBM DMAs must cover whole 128-lane tiles, so
    the store is viewed as a physical ``[R * D/128, 128]`` array (a free,
    layout-preserving reshape when D is a multiple of 128) and each logical
    row is a ``[D/128, 128]`` slice;
  * the index block for each (table, batch-tile) grid cell is staged into
    SMEM by the pipeline (the CUDA kernel's optional shared-memory index
    staging, ``…cuda_yx.cu:205-214``), because DMA addresses are scalars;
  * per-sample row DMAs are double-buffered: sample s+1's L rows stream in
    while sample s is weighted-summed on the VPU;
  * pooling happens in VMEM — the ``[T, B, L, D]`` gather intermediate the
    XLA path materializes in HBM never exists, an O(L) traffic saving
    (L reaches 100+ in the reference's benchmark configs,
    ``bench/dlrm_s_benchmark.sh:41``).

Supported dims: D % 128 == 0 (Terabyte MLPerf D=128 etc.) on the natural
[R, D] layout, and sub-128 divisors of 128 (the reference's flagship 64-dim
benchmark configs, ``bench/dlrm_s_benchmark.sh:41-44``) on the PACKED
[R/pack, 128] layout that ops/embedding.py builds for those dims (pack =
128/D logical rows per physical row — the CUDA kernel's Vec4T any-D role).
For packed stores the kernel DMAs whole physical rows and accumulates them
masked to the target lane block; the pack-block sum that produces the final
[T, B, D] happens in XLA after the kernel (one cheap reshape-reduce).
Other dims take the XLA gather path (see ops/embedding.lookup_group) — at
L=1 that path is already bandwidth-bound and competitive.

Gradients: the training path takes cotangents at the pooled-output boundary
(see train/train_step.py) and applies sparse row updates, so this kernel
needs no VJP. ``fused_lookup`` is correspondingly a plain primal function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def supports_dim(d: int) -> bool:
    return d % LANES == 0 or LANES % d == 0


def _pick_block_b(b: int, l: int) -> int:
    """Batch-tile size: keep the SMEM index block (block_b * l int32) and the
    double-buffered row scratch small."""
    target = max(1, 4096 // max(l, 1))
    # 256 cap: bb=512 crashes the Mosaic compiler on v5e (remote_compile
    # HTTP 500, reproduced 2026-08-16); 256 compiles and is within ~2% of
    # the best measured tile anyway
    bb = min(b, target, 256)
    while b % bb:
        bb -= 1
    return max(bb, 1)


def _lookup_kernel(
    idx_ref, sub_ref, w_ref, store_ref, out_ref, rows, sems,
    *, l: int, k: int, pack: int,
):
    """Grid cell = (table t, batch tile). idx_ref: SMEM [1, BB, L] PHYSICAL
    row ids; sub_ref: SMEM [1, BB, L] lane-block of the target logical row
    (all zero when pack == 1); w_ref: SMEM [1, BB, L] pooling weights (read
    as scalars); store_ref: HBM [R_phys*k, 128] physical; out_ref: VMEM
    [1, BB, k, 128]; rows: VMEM scratch [2, L, k, 128]; sems: DMA [2, L].

    pack > 1: each DMA'd physical row holds `pack` logical rows of d =
    128/pack lanes; the target block is selected by masking lanes
    (block_iota == sub) so each contribution accumulates inside its own
    lane block; the caller reduces blocks after the kernel."""
    bb = out_ref.shape[1]
    d_sub = LANES // pack
    if pack > 1:
        block_iota = jax.lax.broadcasted_iota(jnp.int32, (k, LANES), 1) // d_sub

    def issue(slot, s):
        for j in range(l):
            pltpu.make_async_copy(
                store_ref.at[pl.ds(idx_ref[0, s, j] * k, k)],
                rows.at[slot, j],
                sems.at[slot, j],
            ).start()

    def wait(slot):
        for j in range(l):
            pltpu.make_async_copy(
                store_ref.at[pl.ds(0, k)],  # shape/bytes only; sem matters
                rows.at[slot, j],
                sems.at[slot, j],
            ).wait()

    def contribution(slot, s, j):
        # scalar pooling weight from SMEM x [k, 128] row vector on the VPU
        v = rows[slot, j] * w_ref[0, s, j]
        if pack == 1:
            return v
        return jnp.where(block_iota == sub_ref[0, s, j], v, 0.0)

    issue(0, 0)

    def body(s, _):
        slot = s % 2

        @pl.when(s + 1 < bb)
        def _():
            issue((s + 1) % 2, s + 1)

        wait(slot)
        acc = contribution(slot, s, 0)
        for j in range(1, l):
            acc = acc + contribution(slot, s, j)
        out_ref[0, s] = acc
        return 0

    # Pallas fori_loop supports only unroll=1 or full unroll
    jax.lax.fori_loop(0, bb, body, 0, unroll=bb if bb <= 32 else 1)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret", "dim"))
def fused_lookup(
    store: jax.Array,
    gidx: jax.Array,
    weights: jax.Array,
    block_b: int | None = None,
    interpret: bool = False,
    dim: int | None = None,
) -> jax.Array:
    """Pooled-sum lookup: out[t, b] = sum_l weights[t,b,l] * store[gidx[t,b,l]].

    store: flat table-batched weights (one dim-group). Either [R, D] with
           D % 128 == 0 (dim=None), or the PACKED [R/pack, 128] layout for
           sub-128 dims (pass dim; see module docstring).
    gidx:  [T, B, L] int32 GLOBAL LOGICAL row ids (table offsets applied,
           clamped to [0, R-1]; padding entries must carry weight 0).
    weights: [T, B, L] float32.
    Returns [T, B, dim] float32.
    """
    t, b, l = gidx.shape
    r_phys, width = store.shape
    d = width if dim is None else dim
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
    k = width // LANES
    store_phys = store.reshape(r_phys * k, LANES)
    bb = block_b or _pick_block_b(b, l)
    grid = (t, pl.cdiv(b, bb))
    if pack == 1:
        punit = gidx
        sub = jnp.zeros_like(gidx)
    else:
        punit = jnp.minimum(gidx // pack, r_phys - 1)
        sub = gidx % pack

    kernel = functools.partial(_lookup_kernel, l=l, k=k, pack=pack)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bb, l), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, bb, l), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, bb, l), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, bb, k, LANES), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, b, k, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, l, k, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, l)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * b * l * d,
            bytes_accessed=t * b * l * (width * 4 + 8) + t * b * width * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(punit, sub, weights.astype(jnp.float32), store_phys)
    if pack == 1:
        return out.reshape(t, b, d)
    # each contribution lives in its own lane block; fold blocks together
    return out.reshape(t, b, pack, d).sum(axis=2)
