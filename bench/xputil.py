"""Shared XPlane accounting for the bench scripts.

The tunneled relay makes wall-clock timings drift ~2x run to run, so all
step times come from jax.profiler traces. The ONLY reliable line is
"XLA Ops" on the TPU plane — other lines double-count nested events
(see memory/MEASUREMENTS methodology notes).
"""
import collections
import glob
import tempfile


def xla_ops_ns(trace_dir):
    """Sum of XLA-op device time (ns) across the trace, per op name."""
    import jax

    pd = jax.profiler.ProfileData.from_file(
        glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)[-1]
    )
    tot = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
    return tot


def trace_steps(run_steps, steps):
    """Run `run_steps(steps)` under a profiler trace; return (total_us_per
    _step, per-op Counter in ns)."""
    import jax

    td = tempfile.mkdtemp(prefix="xp_")
    jax.profiler.start_trace(td)
    run_steps(steps)
    jax.profiler.stop_trace()
    tot = xla_ops_ns(td)
    return sum(tot.values()) / steps / 1e3, tot
