import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Profile the L=100 d=64 reference-bench config: top TPU ops by time."""
import collections
import dataclasses
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

BATCH, L, STEPS = 2048, 100, 10
cfg = DLRMConfig(
    emb_rows=(1_000_000,) * 8,
    ln_bot=(13, 512, 512, 64),
    ln_top=(8 * 9 // 2 + 64, 1024, 1024, 1024, 1),
    compute_dtype="bfloat16",
    sparse_update_impl="pallas",
)
params = init_dlrm_on_device(cfg, seed=123)
groups = build_table_groups(cfg.emb_rows, cfg.emb_dims,
                            small_threshold=cfg.emb_split_threshold or None)
opt = OptConfig("sgd", 0.1)
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
    for _ in range(2)
]
params, state, loss = step(params, state, bs[0], 0)
print("loss0", float(loss), flush=True)

td = tempfile.mkdtemp(prefix="l100_")
jax.profiler.start_trace(td)
for i in range(STEPS):
    params, state, loss = step(params, state, bs[i % 2], i)
_ = float(loss)
jax.profiler.stop_trace()

pd = jax.profiler.ProfileData.from_file(
    glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
)
by_line = {}
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        tot = by_line.setdefault(line.name, collections.Counter())
        for ev in line.events:
            tot[ev.name] += ev.duration_ns

for lname, tot in by_line.items():
    total_ms = sum(tot.values()) / STEPS / 1e6
    print(f"== line {lname!r}: {total_ms:.2f} ms/step total ==", flush=True)
    for name, ns in tot.most_common(14):
        print(f"{ns/STEPS/1e6:9.3f} ms  {name[:130]}")
