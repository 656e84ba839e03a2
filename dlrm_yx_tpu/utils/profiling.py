"""Profiling / tracing hooks.

Capability parity with the reference's observability (SURVEY.md §5):
  * kineto profiler wrap + Chrome traces (--enable-profiling,
    dlrm_s_pytorch.py:1817-1819,2120-2135) → ``jax.profiler`` traces
    (XPlane/perfetto, viewable in TensorBoard/XProf);
  * record_function phase annotations ('## Forward ##',
    module::forward_pass::embedding_lookup, ...) → jax named scopes with the
    same phase names so traces are comparable;
  * per-iteration wall timing with warmup-excluded averages
    (dlrm_s_pytorch.py:1966-1988).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax

PHASES = (
    "forward",
    "embedding_lookup",
    "bottom_mlp",
    "interaction",
    "top_mlp",
    "loss_compute",
    "backward",
    "optimizer",
    "alltoall_fwd",
    "alltoall_bwd",
    "get_batch_data",
)


@contextlib.contextmanager
def phase_scope(name: str) -> Iterator[None]:
    """Named scope visible in jax.profiler traces (the reference's
    record_function tags)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed steps (--enable-profiling)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-iteration timing with warmup exclusion.

    Mirrors the reference's time bookkeeping: per-iteration ms, plus an
    epoch average that excludes the first iterations (CUDA-event timing at
    dlrm_s_pytorch.py:1845-1846,1966-1988)."""

    def __init__(self, warmup_iters: int = 2):
        self.warmup = warmup_iters
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def mean_ms(self) -> float:
        eff = self.times[self.warmup :] or self.times
        return 1000.0 * sum(eff) / max(len(eff), 1)

    def total_s(self) -> float:
        return sum(self.times)
