"""Fused dot-interaction kernel (forward) for the DLRM feature interaction.

The XLA formulation in ``ops/interaction.py`` (einsum ``bfd,bgd->bfg`` +
tril gather + concat) is correct but pays layout costs at the headline
config: XLA materializes a ``{0,2,1}``-transposed copy of the bmm RHS
(~140 us/step measured, MEASUREMENTS.md round 3), round-trips the
``[B, Fp, Fp]`` z matrix through HBM, and runs the tril extraction as a
separate gather.

This kernel fuses the whole chain per batch block: one batched MXU dot
for ``z = t @ t^T`` (operands read in their natural ``[bb, Fp, D]``
layout — no transposed copy), tril extraction via an exact 0/1 selector
matmul (each output selects exactly one f32 z entry, so the MXU's bf16
decomposition at HIGHEST precision reproduces it bit-exactly), and the
dense-feature concat written straight into the output block. HBM
traffic: read t + write out — nothing else.

Output layout: ``[B, out_pad]`` with the dense feature x in lanes
``[0, D)``, the ``P = F*(F-1)/2`` (or +F with interact_itself) tril
entries at ``[D, D+P)``, and zero lanes up to ``out_pad`` (a multiple of
128). The caller slices ``[:, :D+P]`` — or pads the top-MLP's first
weight matrix with zero rows, making the pad free.

Semantics parity: ``interact_features(..., op="dot")`` in
``ops/interaction.py``; reference ``dlrm_s_pytorch.py:627-673``
(torch.tril_indices row-major order).

Backward: analytic XLA expression via ``jax.custom_vjp`` — dz scattered
into a symmetric [Fp, Fp] matrix, one einsum back onto t. The forward
kernel is where the layout copies were; the backward einsum contracts on
the feature axis and needs no transposed operand copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _fwd_kernel(t_ref, x_ref, sel_ref, li_ref, out_ref, *, d: int,
                out_pad: int):
    bb, f_pad, _ = t_ref.shape
    t = t_ref[:]
    z = jax.lax.dot_general(
        t, t, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # f32 operands must not decompose to bf16 MXU passes (~1e-3 rel
        # err) — same contract as the xla impl (ops/interaction.py)
        precision=(
            jax.lax.Precision.HIGHEST
            if t.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )  # [bb, f_pad, f_pad] f32
    zp = jax.lax.dot_general(
        z.reshape(bb * f_pad, f_pad), sel_ref[:],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [bb*f_pad, p_pad]
    p_pad = zp.shape[1]
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (bb * f_pad, p_pad), 0) % f_pad
    keep = f_idx == li_ref[:]
    zflat = jnp.sum(
        jnp.where(keep, zp, 0.0).reshape(bb, f_pad, p_pad), axis=1
    )  # [bb, p_pad]
    # out_pad == d + p_pad exactly, so one concat fills the block (static
    # slice writes / dynamic_update_slice don't lower on all Mosaic versions)
    out_ref[:] = jnp.concatenate(
        [x_ref[:].astype(jnp.float32), zflat], axis=1
    )


def fused_interaction_fwd(
    x: jax.Array,
    ly: jax.Array,
    *,
    interact_itself: bool = False,
    compute_dtype=jnp.bfloat16,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Forward-only fused interaction.

    x: [B, D] dense feature; ly: [B, S, D] pooled slots.
    Returns [B, out_pad] f32: x | tril(z) | zero pad, out_pad the smallest
    multiple of 128 >= D + P.
    """
    b, d = x.shape
    s = ly.shape[1]
    f = s + 1
    f_pad = _round_up(f, 8)
    offset = 0 if interact_itself else -1
    li, lj = np.tril_indices(f, k=offset)
    n_pairs = li.shape[0]
    p_pad = _round_up(n_pairs, LANES)
    # x lands at lanes [0, d), zflat at [d, d + p_pad) — both writes must
    # be lane-tile aligned, so the kernel serves d % 128 == 0 configs
    # (the headline D=128; other dims use the XLA path)
    if d % LANES:
        raise ValueError(f"fused interaction needs dim % 128 == 0, got {d}")
    out_pad = d + p_pad
    if b % block_b:
        raise ValueError(f"batch {b} must divide block_b {block_b}")

    # column selector [f_pad, p_pad]: sel[g, p] = 1 iff lj[p] == g; pad
    # pairs select column f_pad-1 of row f_pad-1 (a padded-zero z entry)
    sel = np.zeros((f_pad, p_pad), np.float32)
    sel[lj, np.arange(n_pairs)] = 1.0
    li_pad = np.full((p_pad,), f_pad - 1, np.int32)
    li_pad[:n_pairs] = li
    sel[f_pad - 1, n_pairs:] = 1.0

    t = jnp.concatenate([x[:, None, :], ly], axis=1)  # [B, f, D]
    if f_pad != f:
        t = jnp.pad(t, ((0, 0), (0, f_pad - f), (0, 0)))
    t = t.astype(compute_dtype)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, out_pad=out_pad),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, f_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, d), lambda i: (i, 0)),
            pl.BlockSpec((f_pad, p_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, p_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, out_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_pad), jnp.float32),
        interpret=interpret,
    )(t, x, jnp.asarray(sel), jnp.asarray(li_pad[None, :]))
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def fused_interaction(
    x: jax.Array,
    ly: jax.Array,
    interact_itself: bool = False,
    compute_dtype=jnp.bfloat16,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused dot interaction; returns [B, D + P] f32
    (sliced to the exact top-MLP input width)."""
    b, d = x.shape
    f = ly.shape[1] + 1
    offset = 0 if interact_itself else -1
    n_pairs = len(np.tril_indices(f, k=offset)[0])
    out = fused_interaction_fwd(
        x, ly, interact_itself=interact_itself,
        compute_dtype=compute_dtype, block_b=block_b, interpret=interpret,
    )
    return out[:, : d + n_pairs]


def _vjp_fwd(x, ly, interact_itself, compute_dtype, block_b, interpret):
    out = fused_interaction(
        x, ly, interact_itself, compute_dtype, block_b, interpret
    )
    return out, (x, ly)


def _vjp_bwd(interact_itself, compute_dtype, block_b, interpret, res, g):
    x, ly = res
    b, d = x.shape
    s = ly.shape[1]
    f = s + 1
    offset = 0 if interact_itself else -1
    li, lj = np.tril_indices(f, k=offset)
    gx_direct = g[:, :d]
    gz = g[:, d:]  # [B, P]
    # scatter the pair grads into a symmetric [F, F] dz. Diagonal pairs
    # (present only with interact_itself) DO double: z_ii = t_i.t_i so
    # d z_ii / d t_i = 2 t_i, which the dt = dz @ t einsum below realizes
    # only if dz[i,i] carries 2*g — matches jax.grad of the xla impl.
    dz = jnp.zeros((b, f, f), gz.dtype)
    dz = dz.at[:, li, lj].add(gz)
    dz = dz.at[:, lj, li].add(gz)
    t = jnp.concatenate([x[:, None, :], ly], axis=1).astype(compute_dtype)
    dz = dz.astype(jnp.float32)
    # dt[b,f,:] = sum_g dz[b,f,g] * t[b,g,:]
    dt = jnp.einsum(
        "bfg,bgd->bfd", dz, t.astype(jnp.float32),
        precision=jax.lax.Precision.DEFAULT
        if jnp.dtype(compute_dtype) == jnp.bfloat16
        else jax.lax.Precision.HIGHEST,
    )
    gx = gx_direct + dt[:, 0, :]
    gly = dt[:, 1:, :].astype(ly.dtype)
    return gx.astype(x.dtype), gly


fused_interaction.defvjp(_vjp_fwd, _vjp_bwd)
