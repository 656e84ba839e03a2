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
from typing import List, Tuple

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
    """Gather + dequantize rows: row_ids [K] -> [K, dim] float32."""
    q = jnp.take(qs.data, row_ids, axis=0)
    if qs.bits == 4:
        lo = (q & 0xF).astype(jnp.float32)
        hi = (q >> 4).astype(jnp.float32)
        vals = jnp.stack([lo, hi], axis=-1).reshape(q.shape[0], qs.dim)
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
    gidx = (indices + offs[:, None, None]).reshape(-1)
    rows = dequantize_rows(qs, gidx).reshape(t, b, l, qs.dim)
    if l == 1:
        return rows[:, :, 0, :] * weights[:, :, 0][..., None]
    return jnp.einsum("tbl,tbld->tbd", weights, rows)


def quantize_model_embeddings(params: dict, groups, bits: int = 8) -> List[QuantizedStore]:
    """Quantize every dim-group store (the reference's quantize_embedding,
    which drops the fp32 tables afterwards; we return the quantized stores
    and leave dropping to the caller)."""
    return [quantize_store(np.asarray(params["emb"][i]), bits) for i in range(len(groups))]


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
