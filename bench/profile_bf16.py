"""XPlane breakdown of the bf16-store capacity-demo step (VERDICT round-3
weak item 2: bf16 training at ~485k ex/s vs 923k-1.02M fp32 — where do the
~1.9 ms go?).

Same config as bench/capacity_demo.py (Terabyte 10M-ind-range, 54M rows,
bf16 stores, rwsadagrad, pallas updates). Prints per-op device times.

Run: python bench/profile_bf16.py [ind_range]
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xputil import trace_steps  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    ind_range = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    BATCH, L, STEPS = 2048, 1, 30
    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=ind_range)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas",
        emb_dtype="bfloat16",
    )
    # measured duplicate density — see capacity_demo note (round 5)
    from dlrm_yx_tpu.optim.optimizer import uniform_stream_density

    cfg = dataclasses.replace(cfg, dup_density_hint=uniform_stream_density(
        cfg.emb_rows, cfg.emb_split_threshold, BATCH * L
    ))
    params = init_dlrm_on_device(cfg, seed=123)
    opt = OptConfig("rwsadagrad", 0.01)
    st = init_opt_state(opt, params, model_groups(cfg))
    step = make_train_step(cfg, opt)
    t = cfg.num_tables
    rr = np.random.RandomState(0)
    bs = [
        Batch(
            dense=jnp.asarray(rr.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(
                np.stack(
                    [rr.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
                ).astype(np.int32)
            ),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((rr.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]
    params, st, loss = step(params, st, bs[0], 0)
    print("loss0", float(loss), flush=True)

    def run(steps):
        nonlocal params, st
        loss = None
        for i in range(steps):
            params, st, loss = step(params, st, bs[i % 4], 1 + i)
        _ = float(loss)

    us, tot = trace_steps(run, STEPS)
    print(f"bf16 capacity step: {us/1e3:.3f} ms "
          f"({BATCH/(us/1e6):,.0f} ex/s)")
    for name, ns in tot.most_common(int(os.environ.get("TOPK", "14"))):
        print(f"{ns/STEPS/1e6:8.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
