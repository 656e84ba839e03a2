"""Structured event logging + rank-0 printing.

Capability parity with ``/root/reference/mlperf_logger.py`` (mllog
INIT/RUN/BLOCK/EPOCH/EVAL start-stop-event wrappers, rank-0 gated) and the
rank-0 print override in ``extend_distributed.py:653-666``. The mlperf_logging
package isn't a dependency: events are emitted as MLPerf-style ``:::MLLOG``
JSON lines to stdout and/or a file, which downstream mlperf tooling parses.

TensorBoard scalars (the reference's SummaryWriter usage,
dlrm_s_pytorch.py:1807-1808) are supported when torch is importable, else
scalars fall back to a JSONL file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax


def is_rank0() -> bool:
    return jax.process_index() == 0


def rank0_print(*args, **kw) -> None:
    """Print only on process 0 (the reference overrides builtins.print;
    single-controller JAX only needs the gate on multi-host)."""
    if is_rank0():
        print(*args, **kw)


class EventLogger:
    """MLPerf-style lifecycle event logger.

    log_start/log_end/log_event mirror mlperf_logger.py:21-60; constants
    like 'init_start', 'run_start', 'epoch_start', 'eval_start' follow the
    mlperf_logging key names used by the reference
    (dlrm_s_pytorch.py:1312-1316,1785-1805,1823-1836,1999-2006)."""

    def __init__(self, benchmark: str = "dlrm", path: Optional[str] = None,
                 stdout: bool = True):
        self.benchmark = benchmark
        self.path = path
        self.stdout = stdout
        self._f = open(path, "a") if path else None

    def _emit(self, event_type: str, key: str, value: Any = None,
              metadata: Optional[Dict] = None) -> None:
        if not is_rank0():
            return
        rec = {
            "namespace": self.benchmark,
            "time_ms": int(time.time() * 1000),
            "event_type": event_type,
            "key": key,
            "value": value,
            "metadata": metadata or {},
        }
        line = ":::MLLOG " + json.dumps(rec)
        if self.stdout:
            print(line)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()

    def log_start(self, key: str, metadata: Optional[Dict] = None):
        self._emit("INTERVAL_START", key, None, metadata)

    def log_end(self, key: str, metadata: Optional[Dict] = None):
        self._emit("INTERVAL_END", key, None, metadata)

    def log_event(self, key: str, value: Any = None,
                  metadata: Optional[Dict] = None):
        self._emit("POINT_IN_TIME", key, value, metadata)

    def submission_block(self, platform: str = "tpu-v5e",
                         org: str = "dlrm_yx_tpu"):
        """The mlperf submission metadata block
        (mlperf_logger.py:63-118)."""
        for key, value in (
            ("submission_benchmark", self.benchmark),
            ("submission_division", "closed"),
            ("submission_org", org),
            ("submission_platform", platform),
            ("submission_status", "onprem"),
        ):
            self.log_event(key, value)


class ScalarWriter:
    """TensorBoard scalars when torch is available, JSONL otherwise
    (Train/Loss, Test/Acc etc., dlrm_s_pytorch.py:1991-1994)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._f.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step)}) + "\n")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:
            self._f.close()
