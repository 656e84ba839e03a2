"""Multi-host bring-up (parallel/multihost.py): env-parsing units plus a
REAL 2-process jax.distributed smoke test on CPU — the analog of the
reference's 4-process NCCL smoke test (/root/reference/test.py:23-48) and
its env2int rank discovery (extend_distributed.py:91-167)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from dlrm_yx_tpu.parallel.multihost import _env_int, host_local_batch_slice


def test_env_int_fallback_order(monkeypatch):
    for n in ("NUM_PROCESSES", "WORLD_SIZE", "PMI_SIZE"):
        monkeypatch.delenv(n, raising=False)
    assert _env_int(["NUM_PROCESSES", "WORLD_SIZE"], -1) == -1
    monkeypatch.setenv("WORLD_SIZE", "4")
    assert _env_int(["NUM_PROCESSES", "WORLD_SIZE"], -1) == 4
    monkeypatch.setenv("NUM_PROCESSES", "2")  # earlier name wins
    assert _env_int(["NUM_PROCESSES", "WORLD_SIZE"], -1) == 2
    monkeypatch.setenv("NUM_PROCESSES", "garbage")  # non-int skipped
    assert _env_int(["NUM_PROCESSES", "WORLD_SIZE"], -1) == 4


def test_host_local_batch_slice_single_host():
    start, size = host_local_batch_slice(64)
    assert (start, size) == (0, 64)


_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ["DLRM_REPO_ROOT"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dlrm_yx_tpu.parallel.multihost import (
        host_local_batch_slice, init_multihost, make_global_mesh,
    )

    pid, num = init_multihost()
    assert num == 2, num
    assert pid == int(os.environ["PROCESS_ID"]), (pid, os.environ["PROCESS_ID"])
    # every host sees the global device set
    assert jax.device_count() == 2 * jax.local_device_count()
    mesh = make_global_mesh(data=2, model=1)
    start, size = host_local_batch_slice(8)
    assert size == 4 and start == 4 * pid

    # one real cross-host collective: psum of per-host values over the mesh
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = jnp.full((jax.local_device_count(), 1), float(pid + 1))
    arr = jax.make_array_from_single_device_arrays(
        (jax.device_count(), 1),
        NamedSharding(mesh, P(("data", "model"))),
        [jax.device_put(local[i : i + 1], d)
         for i, d in enumerate(jax.local_devices())],
    )
    total = jax.jit(
        lambda x: jnp.sum(x),
        out_shardings=NamedSharding(mesh, P()),
    )(arr)
    # sum over devices: host0 contributes 1 per device, host1 contributes 2
    want = 1.0 * jax.local_device_count() + 2.0 * jax.local_device_count()
    assert float(total) == want, (float(total), want)
    print(f"worker {pid} ok", flush=True)
    """
)


def test_two_process_distributed_smoke(tmp_path):
    """Spawn 2 CPU processes, jax.distributed.initialize via the env-var
    path, build a global mesh, run a cross-process reduction."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            DLRM_REPO_ROOT=root,
        )
        env.pop("PYTHONPATH", None)
        # a host-level --xla_force_host_platform_device_count leaking in
        # would give each worker N local devices instead of 1
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out
