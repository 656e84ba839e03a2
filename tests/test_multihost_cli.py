"""CLI-level 2-process distributed training (VERDICT round-3 item 8): run
``python -m dlrm_yx_tpu.cli --distributed --mesh-model=2 ...`` as TWO real
jax.distributed processes (one CPU device each) and assert the printed
per-iteration losses match a single-process single-device run — one
documented launcher command, like the reference's torchrun/mpirun recipe
(``/root/reference/README.md:340-348``)."""

import os
import re
import socket
import subprocess
import sys

COMMON = [
    "--arch-embedding-size=40-50-30-60",
    "--arch-sparse-feature-size=4",
    "--arch-mlp-bot=4-8-4",
    "--arch-mlp-top=14-8-1",
    "--data-generation=random",
    "--mini-batch-size=8",
    "--num-batches=6",
    "--print-freq=1",
    "--loss-function=bce",
    "--round-targets=True",
    "--numpy-rand-seed=123",
    "--optimizer=rwsadagrad",
    "--learning-rate=0.1",
]

LOSS_RE = re.compile(r"it (\d+) of epoch \d+, [\d.]+ ms/it, loss ([\d.]+)")


def _losses(out: str):
    return [float(m.group(2)) for m in LOSS_RE.finditer(out)]


def test_two_process_cli_loss_parity(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def base_env():
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        return env

    # single-process single-device reference run
    ref = subprocess.run(
        [sys.executable, "-m", "dlrm_yx_tpu.cli", "--force-cpu-devices=1"]
        + COMMON,
        env=base_env(), cwd=root, capture_output=True, text=True, timeout=300,
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    ref_losses = _losses(ref.stdout)
    assert len(ref_losses) == 6

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = base_env()
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "dlrm_yx_tpu.cli",
                    "--distributed", "--force-cpu-devices=1",
                    "--mesh-data=1", "--mesh-model=2", "--shard-mode=table",
                ]
                + COMMON,
                env=env, cwd=root,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    # rank-0 prints; rank 1 is gated silent
    assert "multihost: process 0/2, 2 global devices" in outs[0]
    dist_losses = _losses(outs[0])
    assert len(dist_losses) == 6
    assert _losses(outs[1]) == []  # rank0_print gate
    for a, b in zip(ref_losses, dist_losses):
        assert abs(a - b) < 5e-5, (ref_losses, dist_losses)
    # final end-of-epoch eval crossed the process boundary (allgather path)
    assert "Testing at it" in outs[0]
