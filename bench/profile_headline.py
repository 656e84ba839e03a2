"""Per-op XPlane breakdown of the headline train step (top-N ops by total
device time). Diagnostic companion to bench_roofline.py."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 30
BATCH, L = 2048, 1


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas",
        interaction_impl=(
            "pallas"
            if ("--interaction-impl=pallas" in sys.argv
                or "pallas" in sys.argv)
            else "xla"
        ),
    )
    params = init_dlrm_on_device(cfg, seed=123)
    groups = model_groups(cfg)
    opt = OptConfig("rwsadagrad", 0.01)
    state = init_opt_state(opt, params, groups)
    step = make_train_step(cfg, opt)
    t = cfg.num_tables
    r = np.random.RandomState(0)
    bs = [
        Batch(
            dense=jnp.asarray(r.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(np.stack(
                [r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
            ).astype(np.int32)),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]
    params, state, loss = step(params, state, bs[0], 0)
    _ = float(loss)

    from xputil import trace_steps

    def run(steps):
        nonlocal params, state
        loss = None
        for i in range(steps):
            params, state, loss = step(params, state, bs[i % 4], i + 1)
        _ = float(loss)

    us, tot = trace_steps(run, STEPS)
    total = us / 1e3
    print(f"step total: {total:.3f} ms; top ops (us/step):")
    for name, ns in tot.most_common(40):
        print(f"  {ns/STEPS/1e3:9.1f}  {name}")


if __name__ == "__main__":
    main()
