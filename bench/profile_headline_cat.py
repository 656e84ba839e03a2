"""Categorized XPlane breakdown of the headline train step: buckets every
device op into a phase-level category so the remaining budget is readable
at a glance (companion to profile_headline.py's raw top-op list)."""
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 30
BATCH, L = 2048, 1

CATS = [
    ("update-kernel", r"sparse_rows_overwrite|sparse_rows_add|tpu_custom_call"),
    ("lookup-gather", r"fusion\.1 ="),
    ("sort-dup", r"sort"),
    ("mlp-interaction", r"convolution|dot|custom-call\.\d"),
    ("copies", r"%copy"),
    ("async-slices", r"slice-done|slice-start|copy-done|copy-start"),
]


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
    print(f"step total: {us/1e3:.3f} ms")
    cat_ns = {}
    for name, ns in tot.items():
        for cat, pat in CATS:
            if re.search(pat, name):
                cat_ns[cat] = cat_ns.get(cat, 0) + ns
                break
        else:
            cat_ns.setdefault("other", 0)
            cat_ns["other"] += ns
    for cat, ns in sorted(cat_ns.items(), key=lambda kv: -kv[1]):
        print(f"  {ns/STEPS/1e3:9.1f} us  {cat}")
    print("top 80 ops (us/step):")
    for name, ns in tot.most_common(80):
        print(f"  {ns/STEPS/1e3:9.1f}  {name[:180]}")


if __name__ == "__main__":
    main()
