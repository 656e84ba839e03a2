"""Observability wiring: the reference's record_function phase names
(dlrm_s_pytorch.py:692,744-745,918) must survive into compiled programs as
jax.named_scope metadata, and StepTimer must do warmup-excluded averaging
(CUDA-event bookkeeping, dlrm_s_pytorch.py:1966-1988)."""

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.train_step import make_train_step
from dlrm_yx_tpu.utils.profiling import PHASES, StepTimer


def test_phase_scopes_in_compiled_step():
    cfg = DLRMConfig(emb_rows=(30, 40, 50), ln_bot=(4, 8, 4), ln_top=(10, 8, 1))
    params = init_dlrm(cfg, seed=0)
    opt = OptConfig("rwsadagrad", 0.1)
    state = init_opt_state(opt, params, model_groups(cfg))
    step = make_train_step(cfg, opt)
    b = Batch(
        jnp.zeros((8, 4)),
        jnp.zeros((3, 8, 2), jnp.int32),
        jnp.ones((3, 8, 2)),
        jnp.zeros((8, 1)),
    )
    txt = step.lower(params, state, b, 0).compile().as_text()
    for name in (
        "embedding_lookup",
        "bottom_mlp",
        "interaction",
        "top_mlp",
        "loss_compute",
        "optimizer",
    ):
        assert name in PHASES
        assert name in txt, f"phase scope {name!r} missing from compiled HLO"


def test_phase_scope_alltoall_in_hybrid_step():
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    cfg = DLRMConfig(emb_rows=(30, 40, 50, 60), ln_bot=(4, 8, 4), ln_top=(14, 8, 1))
    r = HybridRunner(cfg, OptConfig("sgd", 0.1), data=2, model=2, seed=0)
    b = Batch(
        np.zeros((8, 4), np.float32),
        np.zeros((4, 8, 2), np.int32),
        np.ones((4, 8, 2), np.float32),
        np.zeros((8, 1), np.float32),
    )
    sb = r.prepare_batch(b)
    txt = r.train_step.lower(r.params, r.opt_state, sb, 0).compile().as_text()
    assert "alltoall_fwd" in txt
    assert "bottom_mlp" in txt


def test_step_timer_warmup_excluded_mean():
    t = StepTimer(warmup_iters=2)
    t.times.extend([10.0, 10.0, 1.0, 1.0])
    assert abs(t.mean_ms() - 1000.0) < 1e-6  # mean of the last two, in ms
    assert t.total_s() == 22.0
    t2 = StepTimer(warmup_iters=10)
    t2.times.extend([2.0])
    assert t2.mean_ms() == 2000.0  # falls back to all when all are warmup
