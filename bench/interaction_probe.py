"""Probe: interaction fwd+bwd cost variants at bench shapes (B=2048, F=27,
D=128, bf16) — hunting the ~0.7 ms of layout copies XLA inserts around the
batched matmul (bench_roofline.py finding)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from dlrm_yx_tpu.ops.interaction import interact_features, tril_flat_indices

B, F, D = 2048, 27, 128
STEPS = 30
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, D).astype(np.float32))
ly = jnp.asarray(rng.randn(B, F - 1, D).astype(np.float32))
g = jnp.asarray(rng.randn(B, D + 351).astype(np.float32))


def variant_current(x, ly):
    return interact_features(x, ly, "dot", False, jnp.bfloat16)


def variant_padF(x, ly):
    # pad slot count to 32 (sublane multiple) before the bmm
    t = jnp.concatenate([x[:, None, :], ly], axis=1).astype(jnp.bfloat16)
    t32 = jnp.pad(t, ((0, 0), (0, 32 - F), (0, 0)))
    z = jnp.einsum("bfd,bgd->bfg", t32, t32,
                   preferred_element_type=jnp.float32)
    flat = tril_flat_indices(F, -1)
    li, lj = flat // F, flat % F
    zflat = z[:, li, lj]
    return jnp.concatenate([x, zflat], axis=1)


def variant_mm_all(x, ly):
    # one [B*F, D] x [D, ?] reformulation is impossible; instead do the
    # pairwise dots via gather+mul+sum (VPU, no bmm layouts)
    t = jnp.concatenate([x[:, None, :], ly], axis=1).astype(jnp.bfloat16)
    flat = tril_flat_indices(F, -1)
    li, lj = flat // F, flat % F
    zflat = jnp.sum(
        t[:, li, :].astype(jnp.float32) * t[:, lj, :].astype(jnp.float32),
        axis=-1,
    )
    return jnp.concatenate([x, zflat], axis=1)


def bench(name, fn):
    def loss(x, ly):
        return jnp.vdot(fn(x, ly), g)

    step = jax.jit(jax.grad(loss, argnums=(0, 1)))
    out = step(x, ly)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="ip_")
    jax.profiler.start_trace(td)
    for _ in range(STEPS):
        out = step(x, ly)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    pd = jax.profiler.ProfileData.from_file(
        glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
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
    ms = sum(tot.values()) / STEPS / 1e6
    copies = sum(ns for n, ns in tot.items()
                 if n.startswith(("%copy", "%transpose", "%reshape",
                                  "%bitcast"))) / STEPS / 1e6
    print(f"{name}: {ms:.3f} ms fwd+bwd  (copies/transposes {copies:.3f} ms)",
          flush=True)


for name, fn in [("current einsum", variant_current),
                 ("pad F->32", variant_padF),
                 ("gather+VPU dots", variant_mm_all)]:
    bench(name, fn)
