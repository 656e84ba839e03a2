"""MLP towers (bottom / top).

Capability parity with ``create_mlp``/``apply_mlp`` in
``/root/reference/dlrm_s_pytorch.py:227-265,518-524``: Linear+ReLU stacks with
a sigmoid at one configurable layer, and the reference's explicit numpy init
(W ~ N(0, sqrt(2/(m+n))), b ~ N(0, sqrt(1/m))).

TPU-first: weights stored ``[in, out]`` so the forward is a plain ``x @ W``
feeding the MXU; optional bfloat16 compute with fp32 accumulation.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(
    rng: np.random.RandomState, ln: Sequence[int]
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Initialize one MLP: for each layer (n -> m),
    W ~ N(0, sqrt(2/(m+n))) shape [n, m], b ~ N(0, sqrt(1/m)) shape [m].

    Matches the distribution of dlrm_s_pytorch.py:239-244 (which draws W with
    shape (m, n) for an ``x @ W.T`` forward; we draw [n, m] directly for an
    ``x @ W`` forward — same distribution, our own documented draw order).
    """
    layers = []
    for i in range(len(ln) - 1):
        n, m = int(ln[i]), int(ln[i + 1])
        w = rng.normal(0.0, np.sqrt(2.0 / (m + n)), size=(n, m)).astype(np.float32)
        b = rng.normal(0.0, np.sqrt(1.0 / m), size=(m,)).astype(np.float32)
        layers.append((w, b))
    return layers


def apply_mlp(
    x: jax.Array,
    layers,
    sigmoid_layer: int = -1,
    compute_dtype=jnp.float32,
    skip_last_activation: bool = False,
) -> jax.Array:
    """Run the tower. Activation per layer is ReLU, except layer index
    ``sigmoid_layer`` which uses sigmoid (dlrm_s_pytorch.py:255-259).

    ``skip_last_activation=True`` returns raw logits from the last layer
    (used by the stable BCE-with-logits training path; the sigmoid the
    reference applies at the top (sigmoid_layer = last) is then folded into
    the loss).
    """
    # fp32 compute means *real* fp32 (Precision.HIGHEST); bf16 compute rides
    # the MXU's native bf16 path
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    n_layers = len(layers)
    for i, (w, b) in enumerate(layers):
        xc = x.astype(compute_dtype)
        wc = w.astype(compute_dtype)
        y = jnp.dot(
            xc, wc, precision=precision, preferred_element_type=jnp.float32
        ) + b.astype(jnp.float32)
        is_last = i == n_layers - 1
        if is_last and skip_last_activation:
            return y
        if i == sigmoid_layer:
            x = jax.nn.sigmoid(y)
        else:
            x = jax.nn.relu(y)
    return x
