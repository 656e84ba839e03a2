"""Dump optimized HLO for the L=100 d=64 sgd step; find the dim-major buffer."""
import dataclasses
import re
import numpy as np
import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device
from dlrm_yx_tpu.ops.embedding import build_table_groups
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.train_step import make_train_step

BATCH, L = 2048, 100
cfg = DLRMConfig(
    emb_rows=(1_000_000,) * 8,
    ln_bot=(13, 512, 512, 64),
    ln_top=(8 * 9 // 2 + 64, 1024, 1024, 1024, 1),
    compute_dtype="bfloat16",
    sparse_update_impl="pallas",
)
groups = build_table_groups(cfg.emb_rows, cfg.emb_dims,
                            small_threshold=cfg.emb_split_threshold or None)
opt = OptConfig("sgd", 0.1)
step = make_train_step(cfg, opt)
t = cfg.num_tables
params = init_dlrm_on_device(cfg, seed=123)
state = init_opt_state(opt, params, groups)
b = Batch(
    dense=jnp.zeros((BATCH, cfg.ln_bot[0]), jnp.float32),
    indices=jnp.zeros((t, BATCH, L), jnp.int32),
    weights=jnp.ones((t, BATCH, L), jnp.float32),
    labels=jnp.zeros((BATCH, 1), jnp.float32),
)
txt = step.lower(params, state, b, 0).compile().as_text()
lines = txt.splitlines()
hits = [i for i, ln in enumerate(lines)
        if "1,64,1638400" in ln or ("scatter" in ln and "4000008" in ln)]
seen = set()
for i in hits:
    for j in range(max(0, i - 1), min(len(lines), i + 2)):
        if j not in seen:
            seen.add(j)
            print(lines[j][:240])
    print("---")
print("TOTAL scatter ops:", len(re.findall(r" scatter\(", txt)))
