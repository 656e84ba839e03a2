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
) -> jax.Array:
    """Pooled-sum lookup on a quantized group store; same contract as
    ops.embedding.lookup_group."""
    t, b, l = indices.shape
    offs = jnp.asarray(np.array(row_offsets, dtype=np.int32))
    # [t, b*l] — NOT flat: see the compile-time note in dequantize_rows
    gidx = (indices + offs[:, None, None]).reshape(t, b * l)
    rows = dequantize_rows(qs, gidx).reshape(t, b, l, qs.dim)
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
    from dlrm_yx_tpu.models.dlrm import group_indices
    from dlrm_yx_tpu.ops.interaction import interact_features
    from dlrm_yx_tpu.ops.losses import predictions_from_logits
    from dlrm_yx_tpu.ops.mlp import apply_mlp

    def eval_step(params, batch):
        pooled = []
        for qs, g in zip(qstores, groups):
            pooled.append(
                quantized_lookup_group(
                    qs, g.row_offsets,
                    group_indices(g, batch.indices),
                    group_indices(g, batch.weights),
                )
            )
        from dlrm_yx_tpu.models.dlrm import assemble_slots

        if qbot is not None:
            x = apply_quantized_mlp(batch.dense, qbot, config.sigmoid_bot)
        else:
            x = apply_mlp(batch.dense, params["bot"], config.sigmoid_bot)
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

    return jax.jit(eval_step) if jit else eval_step


def make_quantized_eval_step(config, groups, qstores: List[QuantizedStore], jit=True):
    """Inference forward with quantized tables (MLPs stay fp32/bf16 — MLP
    dynamic quantization is a separate concern the reference delegates to
    torch.quantization; XLA's bf16 path covers the same intent)."""
    from dlrm_yx_tpu.models.dlrm import forward_from_pooled
    from dlrm_yx_tpu.ops.losses import predictions_from_logits

    def eval_step(params, batch):
        pooled = []
        for qs, g in zip(qstores, groups):
            from dlrm_yx_tpu.models.dlrm import group_indices

            pooled.append(
                quantized_lookup_group(
                    qs, g.row_offsets,
                    group_indices(g, batch.indices),
                    group_indices(g, batch.weights),
                )
            )
        logits = forward_from_pooled(params, config, groups, batch.dense, pooled)
        return predictions_from_logits(logits, config.loss_threshold)

    return jax.jit(eval_step) if jit else eval_step
