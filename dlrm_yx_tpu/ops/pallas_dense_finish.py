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

    new_store = store_vals.astype(jnp.float32) - lr * g / denom
    return new_store, acc_new


def _kernel(lr_ref, g_ref, store_ref, acc_ref, out_store_ref, out_acc_ref,
            *, r_phys: int, dim: int, pack: int, eps: float, width: int):
    base = pl.program_id(0) * BLOCK_ROWS
    new_store, new_acc = _finish_math(
        lr_ref[0], g_ref[:], store_ref[:], acc_ref[:], base,
        r_phys=r_phys, dim=dim, pack=pack, eps=eps, width=width,
    )
    # bf16 stores round deterministically at write-back — the same
    # astype the XLA dense path applies (optim/optimizer.py dense branch)
    out_store_ref[:] = new_store.astype(out_store_ref.dtype)
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

    store:   [R, W] float32 or bfloat16 (W a multiple of 128; packed
             stores W=128; bf16 rounds deterministically at write-back,
             matching the XLA dense path's astype);
    acc:     [A] float32 per-LOGICAL-row momentum, A >= R*pack (callers may
             carry it padded; extra entries are preserved);
    dense_g: [R, W] float32 exactly-coalesced gradient (zeros for untouched
             rows — their update is a no-op, matching the dense-path
             semantics in optim/optimizer.py).
    Returns (new_store, new_acc) with shapes/dtypes preserved.
    """
    r, w = store.shape
    if store.dtype not in (jnp.float32, jnp.bfloat16) or dense_g.shape != (
        r, w,
    ) or dense_g.dtype != jnp.float32:
        raise ValueError(
            "rwsadagrad_dense_finish: f32/bf16 store with f32 gradient"
        )
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
            jax.ShapeDtypeStruct((r, w), store.dtype),
            jax.ShapeDtypeStruct((a_pad // LANES, LANES), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(jnp.asarray(lr, jnp.float32).reshape(1), dense_g, store, acc2d)
    new_acc = new_acc2d.reshape(-1)[:a_in]
    if acc_tail.shape[0]:
        new_acc = jnp.concatenate([new_acc, acc_tail])
    return new_store, new_acc
