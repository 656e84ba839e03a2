import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Hybrid-parallel 1x1-mesh step time on the real chip (big/small split
validation): Terabyte-MLPerf arch, 1M-cap tables, mb 2048, rwsadagrad,
bf16 compute, pallas updates. XPlane-timed."""
import collections
import dataclasses
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.optim.optimizer import OptConfig
from dlrm_yx_tpu.parallel.hybrid import (
    init_hybrid_opt_state,
    make_hybrid_train_step,
    shard_batch,
    shard_params,
)
from dlrm_yx_tpu.parallel.mesh import make_mesh
from dlrm_yx_tpu.parallel.plan import arrange_sparse_inputs, make_plan

BATCH, L, STEPS = 2048, 1, 30
cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
cfg = dataclasses.replace(
    cfg, compute_dtype="bfloat16", sparse_update_impl="pallas"
)
# measured duplicate density of the uniform synthetic stream (the CLI
# measures the same statistic from the first real batch; per-occurrence
# momentum stays on via optimizer.MOMENTUM_EXACT_DENSITY)
from dlrm_yx_tpu.optim.optimizer import uniform_stream_density

cfg = dataclasses.replace(cfg, dup_density_hint=uniform_stream_density(
    cfg.emb_rows, cfg.emb_split_threshold, BATCH * L
))
mesh = make_mesh(1, 1)
plan = make_plan(cfg, 1, "greedy")
print("plan: r_big", plan.r_big, "r_small", plan.r_small,
      "n_big_slots", plan.n_big_slots, flush=True)

# device-side init (host init of 13GB-class tables is tunnel-prohibitive)
rng = np.random.RandomState(0)
from dlrm_yx_tpu.ops.mlp import init_mlp

from functools import partial


@partial(jax.jit, static_argnames=("shape",))
def draw(key, shape):
    return jax.random.uniform(key, shape, jnp.float32, -0.001, 0.001)

params = {
    "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, cfg.ln_bot)],
    "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, cfg.ln_top)],
    "emb": draw(jax.random.PRNGKey(0), (1, plan.r_big_pad, plan.dim)),
    "emb_small": draw(jax.random.PRNGKey(1), (1, plan.r_small_pad, plan.dim)),
    "vw": None,
}
opt = OptConfig("rwsadagrad", 0.01)
state = init_hybrid_opt_state(opt, params, plan)
params, state = shard_params(mesh, params, opt, state)
step = make_hybrid_train_step(cfg, plan, opt, mesh)

t = cfg.num_tables
bs = []
for _ in range(4):
    idx = np.stack([rng.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]).astype(np.int32)
    w = np.ones((t, BATCH, L), np.float32)
    ai, aw = arrange_sparse_inputs(plan, idx, w)
    bs.append(shard_batch(mesh, Batch(
        rng.rand(BATCH, cfg.ln_bot[0]).astype(np.float32), ai, aw,
        (rng.rand(BATCH, 1) > 0.5).astype(np.float32))))

params, state, loss = step(params, state, bs[0], 0)
print("loss0", float(loss), flush=True)
td = tempfile.mkdtemp(prefix="hyb_")
jax.profiler.start_trace(td)
for i in range(STEPS):
    params, state, loss = step(params, state, bs[i % 4], i)
_ = float(loss)
jax.profiler.stop_trace()
pd = jax.profiler.ProfileData.from_file(
    glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1])
tot = collections.Counter()
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            tot[ev.name] += ev.duration_ns
total_ms = sum(tot.values()) / STEPS / 1e6
print(f"hybrid 1x1 step: {total_ms:.3f} ms ({BATCH/total_ms*1000:.0f} ex/s)")
for name, ns in tot.most_common(8):
    print(f"{ns/STEPS/1e6:8.3f} ms  {name[:110]}")
