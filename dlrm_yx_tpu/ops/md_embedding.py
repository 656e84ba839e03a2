"""Mixed-Dimension embeddings: per-table dims + linear up-projection.

Capability parity with ``/root/reference/tricks/md_embedding_bag.py``
(Ginart et al., arXiv:1909.11810): ``md_solver`` assigns each table a dim by
the alpha power-rule on its (sorted) row counts, optionally rounded to a
power of 2; tables whose dim is below the base dim get a bias-free linear
projection up to the base dim after the pooled lookup (``PrEmbeddingBag``).

Applied to tables with rows > md_threshold when md_flag is set
(dlrm_s_pytorch.py:291-299,1510-1516).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def alpha_power_rule(
    n: np.ndarray, alpha: float, d0: Optional[float] = None,
    b_budget: Optional[float] = None,
) -> np.ndarray:
    """d_i = lambda * n_i^-alpha with lambda from the baseline dim d0 of the
    smallest table (or a parameter budget B); dims floored at 1
    (md_embedding_bag.py:43-57). n must be ascending."""
    n = n.astype(np.float64)
    if d0 is not None:
        lamb = d0 * (n[0] ** alpha)
    elif b_budget is not None:
        lamb = b_budget / np.sum(n ** (1 - alpha))
    else:
        raise ValueError("Must specify either d0 or b_budget")
    d = lamb * (n ** -alpha)
    d = np.maximum(d, 1.0)
    if d0 is not None:
        d[0] = d0
    return np.round(d).astype(np.int64)


def pow_2_round(dims: np.ndarray) -> np.ndarray:
    return (2 ** np.round(np.log2(dims.astype(np.float64)))).astype(np.int64)


def md_solver(
    n: np.ndarray,
    alpha: float,
    d0: Optional[float] = None,
    b_budget: Optional[float] = None,
    round_dim: bool = True,
    k: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Mixed-dimension assignment (md_embedding_bag.py:20-40): sort tables by
    rows (optionally query-frequency-normalized), apply the power rule,
    optionally round to powers of 2, undo the sort."""
    n = np.asarray(n)
    order = np.argsort(n, kind="stable")
    ns = n[order].astype(np.float64)
    if k is not None:
        ns = ns / np.asarray(k)[order]
    d = alpha_power_rule(ns, alpha, d0=d0, b_budget=b_budget)
    if round_dim:
        d = pow_2_round(d)
    out = np.empty_like(d)
    out[order] = d
    return out


def init_md_projection(
    rng: np.random.RandomState, in_dim: int, out_dim: int
) -> np.ndarray:
    """Xavier-uniform [in_dim, out_dim] projection (PrEmbeddingBag's
    nn.Linear(embedding_dim, base_dim, bias=False) with xavier init)."""
    bound = np.sqrt(6.0 / (in_dim + out_dim))
    return rng.uniform(-bound, bound, size=(in_dim, out_dim)).astype(np.float32)
