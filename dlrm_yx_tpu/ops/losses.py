"""Losses: BCE / MSE / weighted-BCE, with optional prediction clamping.

Capability parity with the reference:
  * BCELoss / MSELoss on the sigmoid output (dlrm_s_pytorch.py:425-436).
  * wbce: per-class weights gathered by label (loss_fn_wrap,
    dlrm_s_pytorch.py:170-179).
  * loss_threshold: predictions clamped to [thr, 1-thr] before the loss
    (dlrm_s_pytorch.py:722-728).

TPU-first: the training path computes BCE *from logits*
(log-sigmoid formulation) which is numerically stable in bf16/fp32 and lets
XLA fuse the sigmoid into the loss; when loss_threshold > 0 we clamp the
probabilities exactly as the reference does (the clamp makes plain logs safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predictions_from_logits(logits: jax.Array, loss_threshold: float = 0.0) -> jax.Array:
    p = jax.nn.sigmoid(logits)
    if loss_threshold > 0.0:
        p = jnp.clip(p, loss_threshold, 1.0 - loss_threshold)
    return p


def loss_fn(
    logits: jax.Array,
    targets: jax.Array,
    loss: str = "bce",
    loss_threshold: float = 0.0,
    wbce_weights=(1.0, 1.0),
) -> jax.Array:
    """Mean loss over the batch. logits: [B, 1]; targets: [B, 1] in [0, 1]."""
    t = targets.astype(jnp.float32)
    if loss == "mse":
        p = predictions_from_logits(logits, loss_threshold)
        return jnp.mean((p - t) ** 2)

    if loss_threshold > 0.0:
        p = predictions_from_logits(logits, loss_threshold)
        per = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    else:
        # stable BCE-with-logits: max(z,0) - z*t + log(1+exp(-|z|))
        z = logits.astype(jnp.float32)
        per = jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))

    if loss == "wbce":
        w_neg, w_pos = wbce_weights
        w = jnp.where(t > 0.5, w_pos, w_neg)
        per = per * w
    return jnp.mean(per)
