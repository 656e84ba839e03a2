"""Row-wise quantized embedding tables for inference (int8 / int4).

Capability parity with the reference's post-training embedding quantization
(``/root/reference/dlrm_s_pytorch.py:549-576,609-625``, ATen
``embedding_bag_{4bit,byte}_{prepack,rowwise_offsets}``): each row is stored
quantized with its own (scale, bias); lookup dequantizes row-wise and
sum-pools. Inference-only, like the reference (--quantize-emb-with-bit).

Format per row (matching the ATen rowwise scheme semantically):
  q[i, j] = clip(round((w[i, j] - min_i) / scale_i), 0, 2^bits - 1)
  scale_i = (max_i - min_i) / (2^bits - 1);  dequant = q * scale_i + min_i
int4 packs two values per byte (low nibble first).

TPU note: the dequant is a cheap VPU op fused into the gather's consumer;
int8/int4 storage halves/quarters both HBM footprint and gather bandwidth.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class QuantizedStore:
    data: jax.Array    # [R, dim] uint8 (int8 mode) or [R, dim//2] uint8 (int4)
    scale: jax.Array   # [R, 1] float32
    bias: jax.Array    # [R, 1] float32  (the row min)
    bits: int
    dim: int


def quantize_store(store: np.ndarray, bits: int = 8) -> QuantizedStore:
    """Row-wise affine quantization of a [R, dim] fp32 store."""
    if bits not in (4, 8):
        raise ValueError("bits must be 4 or 8")
    w = np.asarray(store, np.float32)
    r, dim = w.shape
    lo = w.min(axis=1, keepdims=True)
    hi = w.max(axis=1, keepdims=True)
    qmax = (1 << bits) - 1
    scale = np.maximum((hi - lo) / qmax, 1e-12)
    q = np.clip(np.round((w - lo) / scale), 0, qmax).astype(np.uint8)
    if bits == 4:
        if dim % 2:
            raise ValueError("int4 requires even dim")
        q = (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)
    return QuantizedStore(
        data=jnp.asarray(q),
        scale=jnp.asarray(scale.astype(np.float32)),
        bias=jnp.asarray(lo.astype(np.float32)),
        bits=bits,
        dim=dim,
    )


LANES = 128


def fuse_qstore(qs: QuantizedStore):
    """Serving layout: (data_phys [Rp, 128] uint8, sb [Rs, 128] f32).

    The ONLY fast gather layout on TPU is a 128-lane minor dim: measured
    9.3 ns/row for uint8/f32 [R,128] vs 43-516 ns/row for 34/64/68/136-
    lane operands (v5e, MEASUREMENTS.md round 5). So:
      * quantized row bytes pack ``128 // cols`` logical rows per
        128-lane physical row (cols = dim for int8, dim/2 for int4);
      * every row's (scale, bias) f32 pair packs 64 pairs per 128-lane
        sb row.
    The lookup is two full-speed gathers + VPU lane selects — the role
    of the reference's fbgemm fused rows (dlrm_s_pytorch.py:549-576),
    laid out for the TPU's tiling instead of the CPU cache line."""
    r = qs.data.shape[0]
    cols = qs.data.shape[1]
    packp = max(1, LANES // cols)
    pad_r = (-r) % packp
    data = qs.data
    if cols * packp != LANES:
        raise ValueError(f"quantized row bytes {cols} must divide 128")
    if pad_r:
        data = jnp.pad(data, ((0, pad_r), (0, 0)))
    data_phys = data.reshape((r + pad_r) // packp, LANES)
    sb = jnp.concatenate([qs.scale, qs.bias], axis=1)  # [R, 2] f32
    pad_s = (-r) % 64
    if pad_s:
        sb = jnp.pad(sb, ((0, pad_s), (0, 0)))
    sb_phys = sb.reshape((r + pad_s) // 64, LANES)
    return data_phys, sb_phys


def dequantize_fused_rows(fused, row_ids: jax.Array, bits: int, dim: int) -> jax.Array:
    """Gather + dequantize from the fuse_qstore layout:
    row_ids [...] -> [..., dim] f32. Keep row_ids >= 2-D when computed
    in-graph (see dequantize_rows)."""
    data_phys, sb_phys = fused
    cols = dim if bits == 8 else dim // 2
    packp = LANES // cols
    q_phys = jnp.take(data_phys, row_ids // packp, axis=0)  # [..., 128]
    if packp > 1:
        # NOTE (round 5, measured and rejected): selecting the logical
        # sub-row AFTER unpacking the whole physical row (so every
        # intermediate stays >=128-lane) measured 1780 us vs this path's
        # 1338 at the int4 serving config — the [K, 256] f32
        # materialization costs more than the narrow byte-block selects
        # it removes. The byte-granular select stays.
        sub = (row_ids % packp)[..., None].astype(jnp.int32)
        data = jnp.zeros((*row_ids.shape, cols), jnp.uint8)
        for i in range(packp):  # static unroll; packp is 1/2/4/8
            blk = q_phys[..., i * cols:(i + 1) * cols]
            data = jnp.where(sub == i, blk, data)
    else:
        data = q_phys
    srow = jnp.take(sb_phys, row_ids // 64, axis=0)  # [..., 128]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * row_ids.ndim + (LANES,), row_ids.ndim
    )
    want = (2 * (row_ids % 64))[..., None]
    scale = jnp.sum(jnp.where(lane == want, srow, 0.0), axis=-1,
                    keepdims=True)
    bias = jnp.sum(jnp.where(lane == want + 1, srow, 0.0), axis=-1,
                   keepdims=True)
    if bits == 4:
        lo = (data & 0xF).astype(jnp.float32)
        hi = (data >> 4).astype(jnp.float32)
        vals = jnp.stack([lo, hi], axis=-1).reshape(*row_ids.shape, dim)
    else:
        vals = data.astype(jnp.float32)
    return vals * scale + bias


def dequantize_rows(qs: QuantizedStore, row_ids: jax.Array) -> jax.Array:
    """Gather + dequantize rows: row_ids [...] -> [..., dim] float32.

    row_ids may be any shape — callers should keep them >= 2-D when the
    ids are computed in-graph: XLA:TPU compiles a gather whose index
    operand is a FLAT in-graph reshape of a multi-dim tensor
    pathologically (measured 436 s vs 0.7 s for the identical gather with
    the 2-D index, v5e; the int8/int4 serving rows were uncollectable for
    two rounds because of this)."""
    q = jnp.take(qs.data, row_ids, axis=0)
    if qs.bits == 4:
        lo = (q & 0xF).astype(jnp.float32)
        hi = (q >> 4).astype(jnp.float32)
        vals = jnp.stack([lo, hi], axis=-1).reshape(*q.shape[:-1], qs.dim)
    else:
        vals = q.astype(jnp.float32)
    scale = jnp.take(qs.scale, row_ids, axis=0)
    bias = jnp.take(qs.bias, row_ids, axis=0)
    return vals * scale + bias


def quantized_lookup_group(
    qs: QuantizedStore,
    row_offsets: Tuple[int, ...],
    indices: jax.Array,
    weights: jax.Array,
    fused: Optional[jax.Array] = None,
) -> jax.Array:
    """Pooled-sum lookup on a quantized group store; same contract as
    ops.embedding.lookup_group. Pass ``fused`` (fuse_qstore output, built
    ONCE outside the step) to serve from the one-gather fused layout."""
    t, b, l = indices.shape
    offs = jnp.asarray(np.array(row_offsets, dtype=np.int32))
    # [t, b*l] — NOT flat: see the compile-time note in dequantize_rows
    gidx = (indices + offs[:, None, None]).reshape(t, b * l)
    if fused is not None:
        rows = dequantize_fused_rows(fused, gidx, qs.bits, qs.dim)
    else:
        rows = dequantize_rows(qs, gidx)
    rows = rows.reshape(t, b, l, qs.dim)
    if l == 1:
        return rows[:, :, 0, :] * weights[:, :, 0][..., None]
    return jnp.einsum("tbl,tbld->tbd", weights, rows)


def quantize_model_embeddings(params: dict, groups, bits: int = 8) -> List[QuantizedStore]:
    """Quantize every dim-group store (the reference's quantize_embedding,
    which drops the fp32 tables afterwards; we return the quantized stores
    and leave dropping to the caller). Row-wise scales need LOGICAL rows,
    so packed stores are unpacked first."""
    from dlrm_yx_tpu.ops.embedding import unpack_store

    return [
        quantize_store(np.asarray(unpack_store(params["emb"][i], g)), bits)
        for i, g in enumerate(groups)
    ]


@dataclasses.dataclass
class QuantizedMLP:
    """Dynamically-quantized MLP tower for inference.

    Capability parity with the reference's MLP dynamic quantization
    (``/root/reference/dlrm_s_pytorch.py:1757-1781``,
    ``torch.quantization.quantize_dynamic`` with qint8 / float16):
      * 'int8': per-output-channel symmetric int8 weights
        (scale_c = max|W[:,c]| / 127) with per-batch dynamic activation
        scaling (scale_x = max|x| / 127) — the int8 x int8 matmul accumulates
        in int32 on the MXU, then rescales to fp32;
      * 'fp16': weights stored float16 (memory halved), compute in bf16
        (TPUs have no fp16 MXU path; bf16 is the native reduced-precision
        matmul and covers the same intent).
    """

    layers: List[tuple]  # (qw, w_scale [m], b [m]) per layer
    mode: str            # 'int8' | 'fp16'


def quantize_mlp(layers, mode: str = "int8") -> QuantizedMLP:
    """Post-training quantization of [(W [n,m], b [m])] fp32 layers."""
    out = []
    for w, b in layers:
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        if mode == "int8":
            scale = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-12).astype(
                np.float32
            )
            qw = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            out.append((jnp.asarray(qw), jnp.asarray(scale), jnp.asarray(b)))
        elif mode == "fp16":
            out.append(
                (jnp.asarray(w.astype(np.float16)), None, jnp.asarray(b))
            )
        else:
            raise ValueError(f"unknown MLP quant mode {mode!r}")
    return QuantizedMLP(layers=out, mode=mode)


def apply_quantized_mlp(
    x: jax.Array,
    qmlp: QuantizedMLP,
    sigmoid_layer: int = -1,
    skip_last_activation: bool = False,
) -> jax.Array:
    """Inference forward through a quantized tower (ops/mlp.py contract)."""
    n_layers = len(qmlp.layers)
    for i, (qw, w_scale, b) in enumerate(qmlp.layers):
        if qmlp.mode == "int8":
            # dynamic per-batch activation scale, like quantize_dynamic
            x_scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
            qx = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot(
                qx, qw, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            y = acc * (x_scale * w_scale) + b
        else:  # fp16 storage, bf16 MXU compute
            y = (
                jnp.dot(
                    x.astype(jnp.bfloat16),
                    qw.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                + b
            )
        is_last = i == n_layers - 1
        if is_last and skip_last_activation:
            return y
        x = jax.nn.sigmoid(y) if i == sigmoid_layer else jax.nn.relu(y)
    return x


def make_fully_quantized_eval_step(
    config,
    groups,
    qstores: List[QuantizedStore],
    qbot: Optional[QuantizedMLP] = None,
    qtop: Optional[QuantizedMLP] = None,
    jit=True,
):
    """Inference with quantized embedding tables AND (optionally) dynamically
    quantized MLP towers — the reference's full --quantize-emb-with-bit +
    --quantize-mlp-with-bit inference configuration
    (dlrm_s_pytorch.py:549-576,1757-1781)."""
    from dlrm_yx_tpu.ops.interaction import interact_features
    from dlrm_yx_tpu.ops.losses import predictions_from_logits
    from dlrm_yx_tpu.ops.mlp import apply_mlp

    layouts = [_serving_layout(qs) for qs in qstores]  # once, outside
    meta = [m for m, _ in layouts]
    fused = [a for _, a in layouts]

    def inner(params, dense, gidx, wg, fused_arg):
        pooled = _pooled_from_fused(meta, fused_arg, gidx, wg)
        from dlrm_yx_tpu.models.dlrm import assemble_slots

        if qbot is not None:
            x = apply_quantized_mlp(dense, qbot, config.sigmoid_bot)
        else:
            x = apply_mlp(dense, params["bot"], config.sigmoid_bot)
        ly = assemble_slots(pooled, groups, config)
        z = interact_features(
            x, ly, config.interaction, config.interact_itself
        )
        if qtop is not None:
            logits = apply_quantized_mlp(
                z, qtop, config.sigmoid_top, skip_last_activation=True
            )
        else:
            logits = apply_mlp(
                z, params["top"], config.sigmoid_top, skip_last_activation=True
            )
        return predictions_from_logits(logits, config.loss_threshold)

    inner_j = jax.jit(inner) if jit else inner

    def eval_step(params, batch):
        gidx, wg = _prepare_group_inputs(
            groups, batch.indices, batch.weights
        )
        return inner_j(params, batch.dense, gidx, wg, fused)

    return eval_step


def _prepare_group_inputs(groups, indices, weights):
    """Per-group (gidx [t, b*l], w [t,b,l]) computed OUTSIDE the jitted
    step (a handful of tiny take/add dispatches). Keeping the table-subset
    take + offset add out of the serving graph matters enormously for
    compile time on XLA:TPU: with the index derivation in-graph the
    quantized eval compiled in minutes (bisected: gathers whose index
    operand chains through an in-graph take explode a compile pass);
    with argument indices the same graph compiles in seconds."""
    from dlrm_yx_tpu.models.dlrm import group_indices

    gidx, wg = [], []
    for g in groups:
        gi = group_indices(g, indices)
        t, b, l = gi.shape
        offs = jnp.asarray(np.array(g.row_offsets, dtype=np.int32))
        gidx.append((gi + offs[:, None, None]).reshape(t, b * l))
        wg.append(group_indices(g, weights))
    return gidx, wg


def _serving_layout(qs: QuantizedStore):
    """(meta, arrays) for one group: the 128-lane fused layout when the
    quantized byte-width divides 128 (the fast path), else the raw
    (data, scale, bias) arrays served through dequantize_rows — dims like
    96/192 keep working as before, just without the relayout win."""
    cols = qs.data.shape[1]
    if LANES % cols == 0:
        return (qs.bits, qs.dim, True), fuse_qstore(qs)
    return (qs.bits, qs.dim, False), (qs.data, qs.scale, qs.bias)


def _pooled_from_fused(meta, stores, gidx, wg):
    """meta: [(bits, dim, is_fused)] per group — static; the store arrays
    arrive as jit ARGUMENTS. Closing over the multi-GB stores embeds them
    as HLO constants, which blew XLA:TPU compile time from ~9 s to
    minutes (bisected on v5e — see MEASUREMENTS.md round 5)."""
    pooled = []
    for (bits, dim, is_fused), st, gi, w in zip(meta, stores, gidx, wg):
        t, bl = gi.shape
        _, b, l = w.shape
        if is_fused:
            rows = dequantize_fused_rows(st, gi, bits, dim)
        else:
            data, scale, bias = st
            rows = dequantize_rows(
                QuantizedStore(data=data, scale=scale, bias=bias,
                               bits=bits, dim=dim),
                gi,
            )
        rows = rows.reshape(t, b, l, dim)
        if l == 1:
            pooled.append(rows[:, :, 0, :] * w[:, :, 0][..., None])
        else:
            pooled.append(jnp.einsum("tbl,tbld->tbd", w, rows))
    return pooled


def make_quantized_eval_step(config, groups, qstores: List[QuantizedStore], jit=True):
    """Inference forward with quantized tables (MLPs stay fp32/bf16 — MLP
    dynamic quantization is a separate concern the reference delegates to
    torch.quantization; XLA's bf16 path covers the same intent).

    Serves from the ONE-gather fused row layout (fuse_qstore) with the
    per-group index prep outside the jit — both required to keep XLA:TPU
    compile time sane (see _prepare_group_inputs / fuse_qstore notes)."""
    from dlrm_yx_tpu.models.dlrm import forward_from_pooled
    from dlrm_yx_tpu.ops.losses import predictions_from_logits

    layouts = [_serving_layout(qs) for qs in qstores]  # once, outside
    meta = [m for m, _ in layouts]
    fused = [a for _, a in layouts]

    def inner(params, dense, gidx, wg, fused_arg):
        pooled = _pooled_from_fused(meta, fused_arg, gidx, wg)
        logits = forward_from_pooled(params, config, groups, dense, pooled)
        return predictions_from_logits(logits, config.loss_threshold)

    inner_j = jax.jit(inner) if jit else inner

    def eval_step(params, batch):
        gidx, wg = _prepare_group_inputs(
            groups, batch.indices, batch.weights
        )
        return inner_j(params, batch.dense, gidx, wg, fused)

    return eval_step
