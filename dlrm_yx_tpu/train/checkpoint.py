"""Checkpoint / resume.

Capability parity with the reference (``/root/reference/dlrm_s_pytorch.py:
1698-1755, 2025-2038``): checkpoints carry model params, optimizer state,
epoch/iteration counters and the tracked metrics; ``--load-model`` restores
everything and *skips forward* to the saved (epoch, batch) position
(skip_upto semantics); save-on-best during eval.

Format: one directory per checkpoint; pytrees flattened to a single
``.npz`` (arrays) + ``meta.json`` (counters/metrics/treedef) — portable and
dependency-free. Sharded (hybrid) params are gathered to host before save
and re-sharded on load by the caller via parallel.hybrid.shard_params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}, treedef


def save_checkpoint(
    path: str,
    params,
    opt_state,
    *,
    epoch: int = 0,
    iteration: int = 0,
    train_loss: float = 0.0,
    metrics: Dict[str, float] | None = None,
    optimizer: str | None = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    p_leaves, _ = _flatten(params)
    s_leaves, _ = _flatten(opt_state)
    np.savez(os.path.join(path, "params.npz"), **p_leaves)
    np.savez(os.path.join(path, "opt_state.npz"), **s_leaves)
    meta = {
        "epoch": int(epoch),
        "iteration": int(iteration),
        "train_loss": float(train_loss),
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
    }
    if optimizer is not None:
        # lets --load-model reject resuming under a different optimizer
        # (the accumulator pytrees are shape-compatible across optimizers
        # often enough that the mistake would otherwise train silently)
        meta["optimizer"] = optimizer
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, meta). params_like/opt_state_like provide
    the pytree structure (from init)."""
    def unflatten(npz_path, like):
        leaves_like, treedef = jax.tree.flatten(like)
        with np.load(npz_path) as d:
            leaves = [d[f"leaf_{i}"] for i in range(len(leaves_like))]
        return jax.tree.unflatten(treedef, leaves)

    params = unflatten(os.path.join(path, "params.npz"), params_like)
    opt_state = unflatten(os.path.join(path, "opt_state.npz"), opt_state_like)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta


def skip_position(meta: Dict, nbatches: int) -> Tuple[int, int]:
    """skip_upto_epoch / skip_upto_batch from a restored checkpoint
    (dlrm_s_pytorch.py:1838-1839,1854-1855): resume after the saved
    iteration within the saved epoch."""
    it = meta.get("iteration", 0)
    ep = meta.get("epoch", 0)
    if nbatches and it >= nbatches:
        return ep + it // nbatches, it % nbatches
    return ep, it


# ---------------------------------------------------------------------------
# Orbax backend: sharded, multi-host-correct checkpoints
# ---------------------------------------------------------------------------
# The npz backend above gathers every array to THIS host — right for
# single-host runs and portable artifacts, wrong for multi-host meshes where
# each process only holds its addressable shards. Orbax writes/reads shards
# per host (the "orbax-style sharded checkpoint" SURVEY.md §5 calls for).

def save_checkpoint_orbax(
    path: str,
    params,
    opt_state,
    *,
    epoch: int = 0,
    iteration: int = 0,
    train_loss: float = 0.0,
    metrics: Dict[str, float] | None = None,
    optimizer: str | None = None,
) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, "state"),
            {"params": params, "opt_state": opt_state},
            force=True,
        )
    meta = {
        "epoch": int(epoch),
        "iteration": int(iteration),
        "train_loss": float(train_loss),
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
    }
    if optimizer is not None:
        meta["optimizer"] = optimizer
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint_orbax(path: str, params_like, opt_state_like):
    """Restore with the target pytree's shardings (pass pytrees of arrays
    already placed on the mesh — each host restores its shards)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = {"params": params_like, "opt_state": opt_state_like}
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        target,
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"), abstract)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state["params"], state["opt_state"], meta
