"""Random / distribution-driven synthetic data generation.

Capability parity with the reference's random pipeline
(``/root/reference/dlrm_data_pytorch.py:1031-1230``):
  * uniform indices: unique-ified groups of round(r * (n-1)); with
    num_indices_per_lookup_fixed the group is re-drawn until exactly L unique
    indices (generate_uniform_input_batch, :1109-1163);
  * variable pooling: group size = round(max(1, r * min(n, L)))
    before unique-ification;
  * gaussian indices with clipping (generate_dist_input_batch, :1165-1230);
  * targets uniform in [0,1), optionally rounded (round_targets).

Emits the framework's fixed-shape padded layout (see data/batch.py) directly
— "table-batched from day one" (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from dlrm_yx_tpu.data.batch import Batch


@dataclasses.dataclass(frozen=True)
class RandomDataConfig:
    emb_rows: Tuple[int, ...]
    m_den: int
    mini_batch_size: int
    num_batches: int
    num_indices_per_lookup: int = 1
    num_indices_per_lookup_fixed: bool = True
    dist: str = "uniform"  # uniform | gaussian
    rand_data_min: float = 0.0
    rand_data_max: float = 1.0
    rand_data_mu: float = -1.0
    rand_data_sigma: float = 1.0
    round_targets: bool = False
    seed: int = 123


def _uniform_group(rng, n: int, l: int, fixed: bool) -> np.ndarray:
    if fixed:
        size = min(n, l)
        while True:
            r = rng.random_sample(size)
            group = np.unique(np.round(r * (n - 1)).astype(np.int64))
            if group.size == size:
                return group
    r = rng.random_sample(1)
    size = np.int64(np.round(max([1.0], r * min(n, l))))
    r = rng.random_sample(size)
    return np.unique(np.round(r * (n - 1)).astype(np.int64))


def _gaussian_group(rng, n: int, l: int, fixed: bool, cfg: "RandomDataConfig") -> np.ndarray:
    if fixed:
        size = np.int64(l)
    else:
        r = rng.random_sample(1)
        size = np.int64(np.round(max([1.0], r * min(n, l))))
    mu = cfg.rand_data_mu
    if mu == -1:
        mu = (cfg.rand_data_max + cfg.rand_data_min) / 2.0
    r = rng.normal(mu, cfg.rand_data_sigma, size)
    group = np.clip(r, cfg.rand_data_min, cfg.rand_data_max)
    return np.unique(group).astype(np.int64)


def make_random_batches(cfg: RandomDataConfig, seed: Optional[int] = None) -> List[Batch]:
    """Pre-generate num_batches batches (the reference also pre-generates
    all batches up front: generate_random_data, dlrm_data_pytorch.py:1031)."""
    rng = np.random.RandomState(cfg.seed if seed is None else seed)
    t = len(cfg.emb_rows)
    b = cfg.mini_batch_size
    l = cfg.num_indices_per_lookup
    batches = []
    for _ in range(cfg.num_batches):
        dense = rng.random_sample((b, cfg.m_den)).astype(np.float32)
        indices = np.zeros((t, b, l), dtype=np.int32)
        weights = np.zeros((t, b, l), dtype=np.float32)
        for k, n in enumerate(cfg.emb_rows):
            for i in range(b):
                if cfg.dist == "uniform":
                    group = _uniform_group(rng, n, l, cfg.num_indices_per_lookup_fixed)
                elif cfg.dist == "gaussian":
                    group = _gaussian_group(rng, n, l, cfg.num_indices_per_lookup_fixed, cfg)
                else:
                    raise ValueError(f"unknown dist {cfg.dist!r}")
                m = min(len(group), l)
                indices[k, i, :m] = group[:m]
                weights[k, i, :m] = 1.0
        labels = rng.random_sample((b, 1)).astype(np.float32)
        if cfg.round_targets:
            labels = np.round(labels).astype(np.float32)
        batches.append(Batch(dense, indices, weights, labels))
    return batches


def make_device_random_batches(
    emb_rows,
    m_den: int,
    mini_batch_size: int,
    num_batches: int,
    num_indices_per_lookup: int,
    num_indices_per_lookup_fixed: bool = False,
    round_targets: bool = True,
    seed: int = 123,
):
    """Random batches generated ON DEVICE with jax.random — no host->device
    transfer at all. The host-side generator (make_random_batches) mirrors
    the reference's numpy generation exactly; this variant exists because a
    synthetic benchmark should not be bound by the host link (33 MB/batch at
    L=100 costs ~0.5 s over a tunneled relay; ~0 when sampled in HBM).

    Returns a list-like lazily sampling [Batch] of device arrays.
    """
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.data.batch import Batch

    t = len(emb_rows)
    l = num_indices_per_lookup
    rows = jnp.asarray(np.array(emb_rows, np.int32))

    @jax.jit
    def sample(key):
        kd, ki, kl, ky = jax.random.split(key, 4)
        dense = jax.random.uniform(kd, (mini_batch_size, m_den), jnp.float32)
        u = jax.random.uniform(ki, (t, mini_batch_size, l), jnp.float32)
        idx = (u * rows[:, None, None]).astype(jnp.int32)
        if num_indices_per_lookup_fixed:
            w = jnp.ones((t, mini_batch_size, l), jnp.float32)
        else:
            lens = jax.random.randint(kl, (t, mini_batch_size), 1, l + 1)
            w = (
                jnp.arange(l)[None, None, :] < lens[..., None]
            ).astype(jnp.float32)
        y = jax.random.uniform(ky, (mini_batch_size, 1), jnp.float32)
        if round_targets:
            y = (y > 0.5).astype(jnp.float32)
        return Batch(dense, idx, w, y)

    key = jax.random.PRNGKey(seed)

    class _DeviceBatches:
        def __len__(self):
            return num_batches

        def __iter__(self):
            for i in range(num_batches):
                yield sample(jax.random.fold_in(key, i))

        def __getitem__(self, i):
            return sample(jax.random.fold_in(key, i))

    return _DeviceBatches()


def save_batches_hdf5(path: str, batches) -> None:
    """Persist generated batches, one HDF5 group per batch (the reference's
    per-batch .hdf5 persistence of RandomDataset, dlrm_data_pytorch.py
    SURVEY.md §2 #18)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["num_batches"] = len(batches)
        for i, b in enumerate(batches):
            g = f.create_group(f"batch_{i}")
            g.create_dataset("dense", data=np.asarray(b.dense))
            g.create_dataset("indices", data=np.asarray(b.indices))
            g.create_dataset("weights", data=np.asarray(b.weights))
            g.create_dataset("labels", data=np.asarray(b.labels))


def load_batches_hdf5(path: str):
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        for i in range(int(f.attrs["num_batches"])):
            g = f[f"batch_{i}"]
            out.append(
                Batch(
                    dense=np.asarray(g["dense"]),
                    indices=np.asarray(g["indices"]),
                    weights=np.asarray(g["weights"]),
                    labels=np.asarray(g["labels"]),
                )
            )
    return out
