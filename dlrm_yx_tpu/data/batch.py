"""The fixed-shape batch layout every data source emits.

The reference feeds CSR-style (indices, offsets) pairs per table
(EmbeddingBag convention, ``/root/reference/dlrm_s_pytorch.py:526-587``) or a
flattened table-batched layout for the custom kernels. TPU/XLA wants static
shapes, so every loader in this framework emits:

    dense   [B, m_den]  float32   (already log(x+1)-transformed for Criteo)
    indices [T, B, L]   int32     per-table row ids, 0 where padded
    weights [T, B, L]   float32   per-sample weights; 0 marks padding
    labels  [B, 1]      float32

L is the max pooling length (num_indices_per_lookup); Criteo has L = 1.
Conversion helpers to/from the reference's CSR layout live here so data
formats stay interoperable.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import numpy as np


class Batch(NamedTuple):
    dense: "np.ndarray | object"
    indices: "np.ndarray | object"
    weights: "np.ndarray | object"
    labels: "np.ndarray | object"


def csr_to_padded(
    ls_i: Sequence[np.ndarray],
    ls_o: Sequence[np.ndarray],
    batch_size: int,
    l_max: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convert per-table CSR (indices, offsets) lists — the reference's
    EmbeddingBag input layout — to padded [T, B, L] indices + weight mask.

    ls_o[t] has B entries (start offsets); a final implicit end at
    len(ls_i[t]).
    """
    t = len(ls_i)
    indices = np.zeros((t, batch_size, l_max), dtype=np.int32)
    weights = np.zeros((t, batch_size, l_max), dtype=np.float32)
    for k in range(t):
        idx = np.asarray(ls_i[k])
        off = np.asarray(ls_o[k])
        ends = np.concatenate([off[1:], [len(idx)]])
        for b in range(batch_size):
            seg = idx[off[b] : ends[b]]
            n = len(seg)
            if n > l_max:
                raise ValueError(f"pooling length {n} exceeds L={l_max}")
            indices[k, b, :n] = seg
            weights[k, b, :n] = 1.0
    return indices, weights


def padded_to_csr(
    indices: np.ndarray, weights: np.ndarray
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Inverse of csr_to_padded (for format-compat tests and export)."""
    t, b, _ = indices.shape
    ls_i, ls_o = [], []
    for k in range(t):
        idx_list, offsets = [], []
        cur = 0
        for i in range(b):
            valid = weights[k, i] > 0
            seg = indices[k, i][valid]
            offsets.append(cur)
            idx_list.extend(seg.tolist())
            cur += len(seg)
        ls_i.append(np.array(idx_list, dtype=np.int64))
        ls_o.append(np.array(offsets, dtype=np.int64))
    return ls_i, ls_o
