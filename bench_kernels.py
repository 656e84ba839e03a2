"""Kernel-level timing report from a PROFILED real training step.

Reports the BASELINE.json secondary metric (p50 lookup+interaction time)
plus identifiable per-op timings at the Terabyte MLPerf bench shapes. The
numbers come from jax.profiler XPlane traces of the actual jitted train
step — standalone device loops on this hardware are polluted by loop-carry
copies and dispatch-tunnel latency (see the step-profiling notes in
ops/pallas_sparse_update.py's docstring).

Prints one JSON line per measurement.
"""

import collections
import dataclasses
import glob
import json
import tempfile

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    BATCH, L, STEPS = 2048, 1, 30
    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas"
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
            indices=jnp.asarray(
                np.stack(
                    [r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
                ).astype(np.int32)
            ),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]
    params, state, loss = step(params, state, bs[0], 0)
    _ = float(loss)

    td = tempfile.mkdtemp(prefix="bk_")
    jax.profiler.start_trace(td)
    for i in range(STEPS):
        params, state, loss = step(params, state, bs[i % 4], i)
    _ = float(loss)
    jax.profiler.stop_trace()

    pd = jax.profiler.ProfileData.from_file(
        glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
    )
    tot = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns

    def us_per_step(pred):
        return sum(ns for name, ns in tot.items() if pred(name)) / STEPS / 1e3

    step_us = us_per_step(lambda n: n.startswith("jit_step"))
    kernel_us = us_per_step(lambda n: "sparse_rows_add" in n and "custom-call" in n)
    # the [K, D] row gather out of the big store (embedding lookup fusion)
    lookup_us = us_per_step(
        lambda n: n.startswith("%fusion")
        and "53248,128" in n.replace(" ", "")
        and "gather" not in n  # fusion names carry shapes, not op kinds
    )
    print(json.dumps({"train_step_ms": round(step_us / 1e3, 4)}))
    print(json.dumps({"sparse_update_kernel_ms": round(kernel_us / 1e3, 4)}))
    if lookup_us:
        print(json.dumps({"lookup_fusion_ms": round(lookup_us / 1e3, 4)}))
    print(
        json.dumps(
            {
                "metric": "p50_train_step_ms_terabyte_mlperf",
                "value": round(step_us / 1e3, 4),
                "unit": "ms",
            }
        )
    )


if __name__ == "__main__":
    main()
