"""Fused finish pass for the dense-accumulate rwsadagrad update.

The small-table / dense-regime sparse update materializes the coalesced
gradient with one XLA scatter (``zeros.at[rows].add(grads)`` — exact on
duplicates) and then applies RWSAdagrad row-wise momentum
(``/root/reference/optim/rwsadagrad.py:98-115``):

    mom[r]  += mean(dense_g[r] ** 2)          # per-LOGICAL-row scalar
    store[r] -= lr * dense_g[r] / (sqrt(mom[r]) + eps)

XLA cannot fuse that chain: the per-row momentum is a cross-lane reduction
whose result lives in a 1-D ``[rows]`` accumulator (tiled ``[rows/128, 128]``
on TPU), and broadcasting it back over each row's lanes is a lane<->sublane
relayout. The result is ~5 separate full-array passes over the store-sized
buffers (profiled ~710 us on the 62 MB headline small-store chain vs a
~450 us bandwidth floor, MEASUREMENTS.md round 3).

This kernel does the whole finish in ONE streamed pass: per grid block it
reads the gradient and store blocks, computes each row's momentum with a
lane reduction, reads/updates the accumulator block IN ITS NATIVE
``[rows/128, 128]`` tiling, and writes the new store block. The only
non-elementwise step — moving per-row scalars between the ``[BR, 1]``
row-column layout and the accumulator's ``[BR*pack/128, 128]`` layout — is
done with tiny exact 0/1 selector matmuls (``dot(E, acc)`` at HIGHEST
precision: each output element selects exactly one f32 value, so the
bf16-decomposed MXU passes reproduce it bit-exactly).

Traffic: read g + read store + write store (+ the tiny accumulator blocks)
= 3 passes instead of 5 — the measured XLA chain spends ~1.6x its
bandwidth floor, this pass sits on it.

Packed stores (sub-128 dims, pack = 128/dim logical rows per physical row,
ops/embedding.py) are supported: momentum reduces each lane block
separately and the accumulator indexing runs over logical rows.

Reference behavior matched: rwsadagrad.py:98 (coalesce-then-square — the
scatter upstream coalesces exactly), :108-115 (mean over the row dim,
sqrt + eps denominator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 2048  # physical store rows per grid block (1 MB f32 at W=128)


def _finish_math(lr, g, store_vals, acc_old, base, *, r_phys: int, dim: int,
                 pack: int, eps: float, width: int):
    """The rwsadagrad finish on one block: returns (new_store_block,
    new_acc_block). g must already be the block's exactly-coalesced
    gradient; acc_old is the block's accumulator in [bpa, 128] tiling."""
    br = g.shape[0]
    bpa = acc_old.shape[0]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
    # rows past the true store end (clipped tail block) read undefined
    # data; zero their gradients so no garbage reaches the selector dots
    valid = (base + rows_i) < r_phys
    g = jnp.where(valid, g, 0.0)
    gg = g * g

    lanes_w = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    lanes_a = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    cols_a = jax.lax.broadcasted_iota(jnp.int32, (1, bpa), 1)

    acc_new = acc_old
    denom = jnp.zeros((br, width), jnp.float32)
    for b in range(pack):
        blk_mask = ((lanes_w // dim) == b).astype(jnp.float32)  # [1, width]
        mom_b = (
            jnp.sum(gg * blk_mask, axis=1, keepdims=True) / dim
        )  # [br, 1]
        # accumulator entry of logical row pack*(base+i)+b, local to this
        # block: e = pack*i + b -> (row e//128, lane e%128) of the acc block
        e = pack * rows_i + b
        ee = (e // LANES) == cols_a        # [br, bpa] exact 0/1 selector
        ml = ((e % LANES) == lanes_a).astype(jnp.float32)  # [br, 128]
        ef = ee.astype(jnp.float32)
        old_b = jnp.sum(
            jax.lax.dot_general(
                ef, acc_old, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            * ml,
            axis=1,
            keepdims=True,
        )  # [br, 1] — this logical row's momentum sum
        new_b = old_b + mom_b
        acc_new = acc_new + jax.lax.dot_general(
            ef, mom_b * ml, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [bpa, 128] — mom_b placed at (e//128, e%128), zeros elsewhere
        denom_b = jnp.sqrt(new_b) + eps
        denom = jnp.where(blk_mask > 0, denom_b, denom)

    return store_vals - lr * g / denom, acc_new


def _kernel(lr_ref, g_ref, store_ref, acc_ref, out_store_ref, out_acc_ref,
            *, r_phys: int, dim: int, pack: int, eps: float, width: int):
    base = pl.program_id(0) * BLOCK_ROWS
    new_store, new_acc = _finish_math(
        lr_ref[0], g_ref[:], store_ref[:], acc_ref[:], base,
        r_phys=r_phys, dim=dim, pack=pack, eps=eps, width=width,
    )
    out_store_ref[:] = new_store
    out_acc_ref[:] = new_acc


def rwsadagrad_dense_finish(
    store: jax.Array,
    acc: jax.Array,
    dense_g: jax.Array,
    lr,
    *,
    dim: int,
    eps: float,
    interpret: bool = False,
):
    """Apply ``store -= lr * g / (sqrt(acc + mean(g^2)) + eps)`` and
    ``acc += mean(g^2)`` per logical row, in one streamed pass.

    store:   [R, W] float32 (W a multiple of 128; packed stores W=128);
    acc:     [A] float32 per-LOGICAL-row momentum, A >= R*pack (callers may
             carry it padded; extra entries are preserved);
    dense_g: [R, W] float32 exactly-coalesced gradient (zeros for untouched
             rows — their update is a no-op, matching the dense-path
             semantics in optim/optimizer.py).
    Returns (new_store, new_acc) with shapes/dtypes preserved.
    """
    r, w = store.shape
    if store.dtype != jnp.float32 or dense_g.shape != (r, w):
        raise ValueError("rwsadagrad_dense_finish: f32 store/gradient only")
    if w % LANES != 0:
        raise ValueError("store width must be a multiple of 128")
    pack = LANES // dim if dim < LANES else 1
    if pack > 1 and w != LANES:
        raise ValueError("packed stores must be 128 wide")
    if pack == 1 and dim != w:
        raise ValueError(f"dim {dim} != store width {w}")
    a = acc.shape[0]
    if a < r * pack:
        raise ValueError(f"acc holds {a} rows < {r * pack} logical rows")

    bpa = BLOCK_ROWS * pack // LANES
    # the grid covers exactly the store's blocks (an extra block whose
    # store slice is fully out of range would be clamped onto the last
    # real block and re-write it with pre-update values); accumulator
    # entries past the grid's coverage are split off and passed through
    n_blocks = (r + BLOCK_ROWS - 1) // BLOCK_ROWS
    a_pad = n_blocks * bpa * LANES
    a_in = min(a, a_pad)
    acc_tail = acc[a_in:]
    acc2d = jnp.pad(acc[:a_in], (0, a_pad - a_in)).reshape(
        a_pad // LANES, LANES
    )

    new_store, new_acc2d = pl.pallas_call(
        functools.partial(
            _kernel, r_phys=r, dim=dim, pack=pack, eps=float(eps), width=w,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((BLOCK_ROWS, w), lambda i, s: (i, 0)),
                pl.BlockSpec((BLOCK_ROWS, w), lambda i, s: (i, 0)),
                pl.BlockSpec((bpa, LANES), lambda i, s: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_ROWS, w), lambda i, s: (i, 0)),
                pl.BlockSpec((bpa, LANES), lambda i, s: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, w), jnp.float32),
            jax.ShapeDtypeStruct((a_pad // LANES, LANES), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(jnp.asarray(lr, jnp.float32).reshape(1), dense_g, store, acc2d)
    new_acc = new_acc2d.reshape(-1)[:a_in]
    if acc_tail.shape[0]:
        new_acc = jnp.concatenate([new_acc, acc_tail])
    return new_store, new_acc


# ---------------------------------------------------------------------------
# fused scatter + finish: skip the XLA dense-gradient materialization
# ---------------------------------------------------------------------------

CHUNK = 1024           # update rows DMA'd per inner iteration
ALIGN = 1024           # dynamic DMA starts floored to this many rows
                       # (1-D i32 arrays carry a (1024)-lane tiling)
CHP = CHUNK + ALIGN


def _scatter_finish_kernel(starts_ref, lr_ref, pos_hbm, upd_hbm, store_ref,
                           acc_ref, out_store_ref, out_acc_ref, g_scr,
                           pos_s, upd_s, sems, *, r_phys: int, dim: int,
                           pack: int, eps: float, width: int):
    i = pl.program_id(0)
    base = i * BLOCK_ROWS
    j0 = starts_ref[i]
    j1 = starts_ref[i + 1]

    # accumulate this block's SORTED update run into a zeroed VMEM buffer
    # (the in-VMEM row RMW loop of ops/pallas_stream_update, ~7 ns/row) —
    # this replaces the XLA zeros+scatter pass that materialized dense_g
    # in HBM (~0.46 ms of the 0.71 ms small-store chain, MEASUREMENTS.md)
    g_scr[:] = jnp.zeros_like(g_scr)

    @pl.when(j1 > j0)
    def _():
        n_chunks = (j1 - j0 + CHUNK - 1) // CHUNK

        def chunk_body(c, carry):
            kbase = j0 + c * CHUNK
            astart = (kbase // ALIGN) * ALIGN
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
            lo = kbase - astart
            hi = jnp.minimum(j1, kbase + CHUNK) - astart
            n = hi - lo
            half = n // 2

            # two interleaved streams overlap address computation with VMEM
            # ops (see pallas_stream_update); duplicates are adjacent in the
            # sorted input and both RMWs execute in program order
            def item2(j, _):
                p1 = pos_s[lo + j] - base
                g_scr[pl.ds(p1, 1), :] = (
                    g_scr[pl.ds(p1, 1), :] + upd_s[pl.ds(lo + j, 1), :]
                )
                j2 = lo + half + j
                p2 = pos_s[j2] - base
                g_scr[pl.ds(p2, 1), :] = (
                    g_scr[pl.ds(p2, 1), :] + upd_s[pl.ds(j2, 1), :]
                )
                return 0

            jax.lax.fori_loop(0, half, item2, 0)

            def item(j, _):
                p = pos_s[j] - base
                g_scr[pl.ds(p, 1), :] = (
                    g_scr[pl.ds(p, 1), :] + upd_s[pl.ds(j, 1), :]
                )
                return 0

            jax.lax.fori_loop(lo + 2 * half, hi, item, 0)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    new_store, new_acc = _finish_math(
        lr_ref[0], g_scr[:], store_ref[:], acc_ref[:], base,
        r_phys=r_phys, dim=dim, pack=pack, eps=eps, width=width,
    )
    out_store_ref[:] = new_store
    out_acc_ref[:] = new_acc


def rwsadagrad_scatter_finish(
    store: jax.Array,
    acc: jax.Array,
    pos: jax.Array,
    upd: jax.Array,
    lr,
    *,
    dim: int,
    eps: float,
    interpret: bool = False,
):
    """One-pass dense-regime rwsadagrad update from SORTED per-occurrence
    updates: accumulate the block's run in VMEM (exactly-coalescing — adds
    of duplicates happen in the zeroed block buffer), then apply the
    momentum/denominator/store math of rwsadagrad_dense_finish. Replaces
    the XLA zeros+scatter dense_g pass entirely: traffic is read store +
    write store + the [K, W] update stream instead of (scatter-write +
    read g + read store + write store).

    store: [R, W] float32 (W multiple of 128; packed stores W=128);
    acc:   [A] float32 per-logical-row momentum, A >= R*pack;
    pos:   [K] int32 PHYSICAL store rows, ASCENDING (duplicates allowed;
           entries >= R are dropped — sentinels sort to the end);
    upd:   [K, W] float32 physical update rows (lane-placed for packed).
    Returns (new_store, new_acc)."""
    r, w = store.shape
    if store.dtype != jnp.float32:
        raise ValueError("rwsadagrad_scatter_finish: f32 stores only")
    pack = LANES // dim if dim < LANES else 1
    if (pack > 1 and w != LANES) or (pack == 1 and dim != w):
        raise ValueError(f"dim {dim} does not match store width {w}")
    a = acc.shape[0]
    if a < r * pack:
        raise ValueError(f"acc holds {a} rows < {r * pack} logical rows")
    k = pos.shape[0]
    pos = jnp.pad(pos.astype(jnp.int32), (0, CHP), constant_values=jnp.int32(r))
    upd = jnp.pad(upd.astype(jnp.float32), ((0, CHP), (0, 0)))

    bpa = BLOCK_ROWS * pack // LANES
    n_blocks = (r + BLOCK_ROWS - 1) // BLOCK_ROWS
    a_pad = n_blocks * bpa * LANES
    a_in = min(a, a_pad)
    acc_tail = acc[a_in:]
    acc2d = jnp.pad(acc[:a_in], (0, a_pad - a_in)).reshape(
        a_pad // LANES, LANES
    )
    bounds = jnp.minimum(
        jnp.arange(0, n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS, r
    )
    starts = jnp.searchsorted(pos[:k], bounds).astype(jnp.int32)

    new_store, new_acc2d = pl.pallas_call(
        functools.partial(
            _scatter_finish_kernel, r_phys=r, dim=dim, pack=pack,
            eps=float(eps), width=w,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # pos (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # upd (HBM)
                pl.BlockSpec((BLOCK_ROWS, w), lambda i, s, l: (i, 0)),
                pl.BlockSpec((bpa, LANES), lambda i, s, l: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_ROWS, w), lambda i, s, l: (i, 0)),
                pl.BlockSpec((bpa, LANES), lambda i, s, l: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, w), jnp.float32),
                pltpu.SMEM((CHP,), jnp.int32),
                pltpu.VMEM((CHP, w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, w), jnp.float32),
            jax.ShapeDtypeStruct((a_pad // LANES, LANES), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(
        starts, jnp.asarray(lr, jnp.float32).reshape(1),
        pos, upd, store, acc2d,
    )
    new_acc = new_acc2d.reshape(-1)[:a_in]
    if acc_tail.shape[0]:
        new_acc = jnp.concatenate([new_acc, acc_tail])
    return new_store, new_acc
