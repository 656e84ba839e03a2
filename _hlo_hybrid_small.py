"""Small-scale hybrid HLO: count full-store copies around the sparse update."""
import dataclasses
import re
import numpy as np
import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.optim.optimizer import OptConfig
from dlrm_yx_tpu.parallel.hybrid import (
    init_hybrid_opt_state, init_hybrid_params, make_hybrid_train_step,
    shard_batch, shard_params,
)
from dlrm_yx_tpu.parallel.mesh import make_mesh
from dlrm_yx_tpu.parallel.plan import arrange_sparse_inputs, make_plan
import dlrm_yx_tpu.optim.optimizer as om

om.PALLAS_MIN_STORE_BYTES = 1 << 20  # let the 1<<17-row store use the kernel

B, L = 256, 1
cfg = DLRMConfig(
    emb_rows=(1 << 17, (1 << 17) + 8, 300, 40),
    ln_bot=(4, 8, 128),
    ln_top=(5 * 4 // 2 + 128, 8, 1),
    sparse_update_impl="pallas",
)
mesh = make_mesh(1, 1)
plan = make_plan(cfg, 1, "greedy")
print("r_big", plan.r_big, "r_small", plan.r_small, "nb", plan.n_big_slots)
opt = OptConfig("rwsadagrad", 0.01)
params = init_hybrid_params(cfg, plan, seed=1)
state = init_hybrid_opt_state(opt, params)
params, state = shard_params(mesh, params, opt, state)
step = make_hybrid_train_step(cfg, plan, opt, mesh)
rng = np.random.RandomState(0)
idx = np.stack([rng.randint(0, n, size=(B, L)) for n in cfg.emb_rows]).astype(np.int32)
w = np.ones((cfg.num_tables, B, L), np.float32)
ai, aw = arrange_sparse_inputs(plan, idx, w)
batch = shard_batch(mesh, Batch(
    rng.rand(B, cfg.ln_bot[0]).astype(np.float32), ai, aw,
    (rng.rand(B, 1) > 0.5).astype(np.float32)))
txt = step.lower(params, state, batch, 0).compile().as_text()
R = plan.r_big_pad
pat = f"{R},128"
n_copy = len(re.findall(rf"copy\(f32\[(1,)?{R},128\]", txt))
n_cond = len(re.findall(r"conditional\(", txt))
print(f"full-big-store copies: {n_copy}; conditionals: {n_cond}")
for ln in txt.splitlines():
    if (f"[{R},128]" in ln or f"[1,{R},128]" in ln) and ("copy" in ln or "conditional" in ln):
        print(ln.strip()[:180])
