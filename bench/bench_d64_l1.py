import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""D=64, L=1 kernel-path check (the Terabyte-0.875 accuracy config's dims):
8 x 1M-row 64-dim tables, mb 2048, rwsadagrad, pallas updates.
Before packed-dim support these updates fell back to the XLA full-store
rewrite; now they route through the row-RMW kernel on the packed store.
Reports step time from an XPlane trace."""
import collections
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device
from dlrm_yx_tpu.ops.embedding import build_table_groups
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.train_step import make_train_step

BATCH, L, STEPS = 2048, 1, 30
cfg = DLRMConfig(
    emb_rows=(1_000_000,) * 8,
    ln_bot=(13, 512, 256, 64),
    ln_top=(8 * 9 // 2 + 64, 512, 512, 256, 1),
    compute_dtype="bfloat16",
    sparse_update_impl="pallas",
)
groups = build_table_groups(cfg.emb_rows, cfg.emb_dims,
                            small_threshold=cfg.emb_split_threshold or None)
assert groups[0].pack == 2, groups
params = init_dlrm_on_device(cfg, seed=123)
opt = OptConfig("rwsadagrad", 0.01)
state = init_opt_state(opt, params, groups)
step = make_train_step(cfg, opt)
t = cfg.num_tables
r = np.random.RandomState(0)
bs = [
    Batch(
        dense=jnp.asarray(r.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
        indices=jnp.asarray(
            np.stack([r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]).astype(np.int32)
        ),
        weights=jnp.ones((t, BATCH, L), jnp.float32),
        labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
    )
    for _ in range(4)
]
params, state, loss = step(params, state, bs[0], 0)
print("loss0", float(loss), flush=True)

td = tempfile.mkdtemp(prefix="d64l1_")
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
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            tot[ev.name] += ev.duration_ns
total_ms = sum(tot.values()) / STEPS / 1e6
kern_ms = sum(ns for n, ns in tot.items() if "custom-call" in n) / STEPS / 1e6
print(f"step: {total_ms:.3f} ms  (examples/s: {BATCH/total_ms*1000:.0f})")
print(f"pallas custom-calls: {kern_ms:.3f} ms")
for name, ns in tot.most_common(8):
    print(f"{ns/STEPS/1e6:8.3f} ms  {name[:120]}")
