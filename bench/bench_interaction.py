"""XPlane micro-bench: XLA vs fused-pallas dot interaction at headline
shapes (B=2048, S=26, D=128), forward-only and forward+backward.

Run on the real chip: python bench/bench_interaction.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 30
B, S, D = 2048, 26, 128


def _time(fn, *args):
    import jax

    from xputil import trace_steps

    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)

    def run(steps):
        o = None
        for _ in range(steps):
            o = fn(*args)
        jax.block_until_ready(o)

    us, _ = trace_steps(run, STEPS)
    return us  # us/step


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.ops.interaction import interact_features
    from dlrm_yx_tpu.ops.pallas_interaction import fused_interaction

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, D).astype(np.float32))
    ly = jnp.asarray(r.randn(B, S, D).astype(np.float32))
    co = jnp.asarray(
        r.randn(B, D + S * (S + 1) // 2).astype(np.float32)
    )

    def fwd_xla(x, ly):
        return interact_features(x, ly, "dot", False, jnp.bfloat16)

    def fwd_pl(x, ly):
        return fused_interaction(x, ly, False, jnp.bfloat16, 128, False)

    def fb(fwd):
        def loss(x, ly):
            return jnp.vdot(fwd(x, ly), co)

        def run(x, ly):
            return jax.grad(loss, argnums=(0, 1))(x, ly)

        return run

    for name, fn, args in (
        ("fwd  xla", fwd_xla, (x, ly)),
        ("fwd  pallas", fwd_pl, (x, ly)),
        ("fwd+bwd xla", fb(fwd_xla), (x, ly)),
        ("fwd+bwd pallas", fb(fwd_pl), (x, ly)),
    ):
        try:
            us = _time(fn, *args)
            print(f"{name:16s} {us:8.1f} us/step")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
