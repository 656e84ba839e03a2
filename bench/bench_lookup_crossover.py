import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""fused_lookup (ops/pallas_embedding.py) vs XLA gather across L x D —
the crossover table VERDICT r2 item 2 asked for. Forward lookup only,
8 tables x 1M rows, mb 2048, XPlane-timed."""
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
            res = {}
            for impl in ("xla", "pallas"):
                try:
                    res[impl] = timed(
                        lambda s, i, ww, im=impl: lookup_group(
                            s, g, i, ww, None, impl=im
                        ),
                        (store, idx, w),
                    )
                except Exception as e:
                    res[impl] = float("nan")
                    print(f"D={d} L={l} {impl} FAILED {str(e)[:90]}",
                          flush=True)
            print(
                f"D={d:4d} L={l:4d}  xla {res['xla']:8.3f} ms   "
                f"pallas {res['pallas']:8.3f} ms   "
                f"winner={'pallas' if res['pallas'] < res['xla'] else 'xla'}",
                flush=True,
            )


if __name__ == "__main__":
    main()
