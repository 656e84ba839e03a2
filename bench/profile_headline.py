"""Per-op XPlane breakdown of the headline train step (top-N ops by total
device time). Diagnostic companion to bench_roofline.py."""
import collections
import dataclasses
import glob
import os
import sys
import tempfile

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
    td = tempfile.mkdtemp(prefix="hl_")
    jax.profiler.start_trace(td)
    for i in range(STEPS):
        params, state, loss = step(params, state, bs[i % 4], i + 1)
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
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
    total = sum(tot.values()) / STEPS / 1e6
    print(f"step total: {total:.3f} ms; top ops (us/step):")
    for name, ns in tot.most_common(40):
        print(f"  {ns/STEPS/1e3:9.1f}  {name}")


if __name__ == "__main__":
    main()
