"""dlrm_yx_tpu — a TPU-native DLRM training/inference framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``YuxinxinChen/dlrm-yx`` (a fork of facebookresearch/dlrm): dense bottom MLP +
sparse embedding tables with sum-pooling (EmbeddingBag semantics) + dot-product
feature interaction + top MLP, trained on Criteo Kaggle/Terabyte and synthetic
trace-driven data.

Design (TPU-first, not a port):
  * Embedding tables live as flat ``[sum_rows, D]`` arrays per dim-group
    ("table-batched" layout — the layout the reference's custom CUDA kernel
    uses on GPUs is natively the right TPU layout).
  * Sparse inputs are fixed-shape ``[T, B, L]`` index tensors + weight masks
    (TPU needs static shapes; the reference uses CSR offsets).
  * Hybrid parallelism is a ``("data","model")`` jax.sharding.Mesh: tables
    sharded over "model" (the reference's model-parallel ranks), batch over
    "data"; pooled embedding vectors are exchanged with
    ``jax.lax.all_to_all`` inside ``shard_map`` (the reference's NCCL
    all-to-all, ``extend_distributed.py``).
  * Sparse optimizer updates (RWSAdagrad et al.) are scatter-based per-row
    updates on coalesced indices — no dense gradient materialization.
"""

__version__ = "0.1.0"

from dlrm_yx_tpu.config import DLRMConfig  # noqa: F401
