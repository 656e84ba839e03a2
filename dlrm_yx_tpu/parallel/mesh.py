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
