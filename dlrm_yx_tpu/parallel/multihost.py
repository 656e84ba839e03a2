"""Multi-host initialization and mesh construction.

Capability parity with the reference's distributed bring-up
(``/root/reference/extend_distributed.py:39-207``): rank/world discovery
from launcher env vars, backend selection, process-group init. On TPU the
equivalent is ``jax.distributed.initialize`` + one global mesh:

  * every host runs the SAME single-controller program;
  * ``jax.devices()`` then spans all hosts; a mesh laid over it routes
    intra-slice collectives over ICI and cross-host legs over DCN — the
    backend choice the reference makes by hand (nccl/gloo/mpi) is XLA's
    job here;
  * data loading is per-host: each host feeds its local shard of the batch
    (``host_local_batch_slice``), jax.Array assembles the global array.

Launchers: GKE/TPU-VM set COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
(or jax infers them on Cloud TPU); torchrun-style RANK/WORLD_SIZE envs are
also honored for parity with the reference's env2int probing
(extend_distributed.py:91-167).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

from dlrm_yx_tpu.parallel.mesh import make_mesh


def _env_int(names: Sequence[str], default: int = -1) -> int:
    """First integer found among env var names (extend_distributed.env2int
    parity)."""
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            try:
                return int(v)
            except ValueError:
                pass
    return default


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host world. Returns (process_id, num_processes).

    No-op on single-host (returns (0, 1)) so programs run unchanged on one
    machine — mirroring init_distributed's single-process fallback.
    """
    num = (
        num_processes
        if num_processes is not None
        else _env_int(["NUM_PROCESSES", "WORLD_SIZE", "PMI_SIZE", "OMPI_COMM_WORLD_SIZE"], -1)
    )
    pid = (
        process_id
        if process_id is not None
        else _env_int(["PROCESS_ID", "RANK", "PMI_RANK", "OMPI_COMM_WORLD_RANK"], -1)
    )
    coord = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num in (-1, 0, 1) and coord is None:
        return 0, 1  # single host
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=None if num == -1 else num,
        process_id=None if pid == -1 else pid,
    )
    return jax.process_index(), jax.process_count()


def make_global_mesh(data: int = 1, model: Optional[int] = None):
    """A ("data","model") mesh over ALL hosts' devices. Prefer putting
    "model" within a host/ICI domain (the all-to-all of pooled vectors is
    the bandwidth-heavy exchange) and letting "data" span hosts (its psum
    of small dense grads tolerates DCN) — the same placement logic as the
    reference's one-GPU-per-rank table sharding."""
    return make_mesh(data, model, devices=jax.devices())


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch — what the
    reference does with per-rank batch slicing (dlrm_s_pytorch.py:139-143,
    1902-1904), expressed per host."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    size = global_batch // n
    return jax.process_index() * size, size
