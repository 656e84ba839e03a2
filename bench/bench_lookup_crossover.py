import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Lookup timing across L x D (forward only, 8 tables x 1M rows, mb 2048,
XPlane-timed).

HISTORICAL NOTE: this script produced the round-3 crossover table
(MEASUREMENTS.md) comparing the fused-DMA pallas lookup kernel against the
XLA gather; the kernel LOST 9/10 configs and was deleted (commit
"Remove the fused DMA lookup kernel after the measured crossover" — check
it out to reproduce the two-column table). On current code lookup_group
always takes the XLA path, so this measures the shipped lookup only."""
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from dlrm_yx_tpu.ops.embedding import build_table_groups, init_emb_group, lookup_group

B, T, ROWS, REPS = 2048, 8, 1_000_000, 10


def timed(fn, args):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    pd = jax.profiler.ProfileData.from_file(
        glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
    )
    tot = sum(
        ev.duration_ns
        for pl_ in pd.planes if "TPU" in pl_.name
        for ln in pl_.lines if ln.name == "XLA Ops"
        for ev in ln.events
    )
    return tot / REPS / 1e6


def main():
    for d in (64, 128):
        groups = build_table_groups((ROWS,) * T, (d,) * T, small_threshold=None)
        g = groups[0]
        key = jr.PRNGKey(0)
        store = jr.normal(key, g.store_shape, jnp.float32)
        for l in (1, 4, 16, 64, 100):
            idx = jr.randint(jr.PRNGKey(1), (T, B, l), 0, ROWS, jnp.int32)
            w = jnp.ones((T, B, l), jnp.float32)
            ms = timed(
                lambda s, i, ww: lookup_group(s, g, i, ww, None),
                (store, idx, w),
            )
            print(f"D={d:4d} L={l:4d}  xla {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
