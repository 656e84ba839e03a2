import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Time sorted_stream_add vs XLA scatter-add at the L=100 bench shapes:
K=1.64M sorted updates into a [4.19M,128] f32 store (2 GB)."""
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from dlrm_yx_tpu.ops.pallas_stream_update import sorted_stream_add

RP = 4_194_304
K = 1_638_400
REPS = 10


def timed(fn, args, label, donate=()):
    fn = jax.jit(fn, donate_argnums=donate)
    out = fn(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="bsu_")
    jax.profiler.start_trace(td)
    for _ in range(REPS):
        out = fn(*args) if not donate else fn(out, *args[1:])
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    pd = jax.profiler.ProfileData.from_file(
        glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
    )
    tot = 0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                tot += ev.duration_ns
    print(f"{label:46s} {tot/REPS/1e6:8.3f} ms  ({tot/REPS/K:5.2f} ns/row)",
          flush=True)


def main():
    pos = jnp.sort(jr.randint(jr.PRNGKey(1), (K,), 0, RP, jnp.int32))
    upd = jr.normal(jr.PRNGKey(2), (K, 128), jnp.float32)

    def fresh():
        return jr.normal(jr.PRNGKey(0), (RP, 128), jnp.float32)

    timed(lambda s, p, u: s.at[p].add(u), (fresh(), pos, upd),
          "XLA scatter-add into store (donated)", donate=(0,))
    timed(lambda s, p, u: sorted_stream_add(s, p, u), (fresh(), pos, upd),
          "sorted_stream_add (donated)", donate=(0,))
    # sanity: same result on a small prefix
    a = jax.jit(lambda p, u: jnp.zeros((RP, 128), jnp.float32).at[p].add(u))(pos, upd)
    b = jax.jit(lambda p, u: sorted_stream_add(
        jnp.zeros((RP, 128), jnp.float32), p, u))(pos, upd)
    diff = float(jnp.max(jnp.abs(a - b)))
    print("max |xla - kernel| =", diff)


if __name__ == "__main__":
    main()
