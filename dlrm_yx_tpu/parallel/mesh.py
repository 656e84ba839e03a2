"""Device mesh construction.

The reference discovers ranks from MPI/torchrun env vars and picks a
torch.distributed backend (``/root/reference/extend_distributed.py:39-207``).
On TPU the runtime already knows the topology; all we do is lay a logical
("data", "model") mesh over ``jax.devices()`` — XLA routes the collectives
over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


# XLA:TPU leaves all-to-all synchronous by default; this flag turns it
# into an async start/done pair the latency-hiding scheduler then overlaps
# with independent compute — the bottom-MLP overlap the reference
# hand-codes with its Req/Wait autograd functions
# (/root/reference/dlrm_s_pytorch.py:708-713, extend_distributed.py:405-508).
# Verified on the AOT-compiled v5e schedule: bottom_mlp dot_generals sit
# between all-to-all-start and all-to-all-done (tests/test_overlap.py,
# bench/check_overlap.py).
TPU_COMPILER_OPTIONS = {"xla_tpu_enable_async_all_to_all": "true"}


def mesh_jit(fn, **kw):
    """jax.jit for sharded train/eval steps, with the TPU compile options
    that enable collective/compute overlap (no-op off TPU — CPU test
    meshes reject TPU-only flags)."""
    if jax.default_backend() == "tpu":
        kw.setdefault("compiler_options", TPU_COMPILER_OPTIONS)
    return jax.jit(fn, **kw)


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. model=None uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than the {n} devices present")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
