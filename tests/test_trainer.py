"""Metrics, checkpoint/resume, LR-policy-in-trainer, early-stop tests."""

import os

import numpy as np
import pytest

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
from dlrm_yx_tpu.optim.lr_policy import LRPolicy
from dlrm_yx_tpu.optim.optimizer import OptConfig
from dlrm_yx_tpu.train.checkpoint import load_checkpoint, save_checkpoint, skip_position
from dlrm_yx_tpu.train.metrics import (
    StreamingAUC,
    average_precision,
    binary_metrics,
    roc_auc_exact,
)
from dlrm_yx_tpu.train.trainer import Trainer, TrainerConfig


# ------------------------------ metrics --------------------------------------

def test_roc_auc_exact_vs_sklearn_or_bruteforce():
    rng = np.random.RandomState(0)
    s = rng.rand(500)
    t = (rng.rand(500) < 0.3).astype(int)
    got = roc_auc_exact(s, t)
    try:
        from sklearn.metrics import roc_auc_score

        want = roc_auc_score(t, s)
    except ImportError:
        pos, neg = s[t == 1], s[t == 0]
        cmp = pos[:, None] - neg[None, :]
        want = ((cmp > 0).sum() + 0.5 * (cmp == 0).sum()) / (len(pos) * len(neg))
    assert abs(got - want) < 1e-10


def test_roc_auc_with_ties():
    s = np.array([0.5, 0.5, 0.5, 0.5])
    t = np.array([1, 0, 1, 0])
    assert roc_auc_exact(s, t) == pytest.approx(0.5)


def test_streaming_auc_approximates_exact():
    rng = np.random.RandomState(1)
    t = (rng.rand(20000) < 0.25).astype(int)
    s = np.clip(0.3 * rng.randn(20000) + 0.4 + 0.2 * t, 0, 1)
    exact = roc_auc_exact(s, t)
    sauc = StreamingAUC(bins=1 << 14)
    for i in range(0, len(s), 4096):  # streamed in chunks
        sauc.add(s[i : i + 4096], t[i : i + 4096])
    assert abs(sauc.auc() - exact) < 2e-3
    # mergeable across shards
    a, b = StreamingAUC(bins=1 << 14), StreamingAUC(bins=1 << 14)
    a.add(s[:10000], t[:10000])
    b.add(s[10000:], t[10000:])
    a.merge(b)
    assert abs(a.auc() - sauc.auc()) < 1e-12


def test_average_precision_vs_sklearn_or_small_case():
    try:
        from sklearn.metrics import average_precision_score

        rng = np.random.RandomState(2)
        s = rng.rand(300)
        t = (rng.rand(300) < 0.4).astype(int)
        assert abs(average_precision(s, t) - average_precision_score(t, s)) < 1e-10
    except ImportError:
        # hand-computed: scores .9(+) .8(-) .7(+) => AP = .5*1 + .5*(2/3)
        s = np.array([0.9, 0.8, 0.7])
        t = np.array([1, 0, 1])
        assert average_precision(s, t) == pytest.approx(0.5 * 1 + 0.5 * (2 / 3))


def test_binary_metrics_block():
    s = np.array([0.9, 0.2, 0.7, 0.4])
    t = np.array([1, 0, 0, 1])
    m = binary_metrics(s, t)
    assert m["accuracy"] == pytest.approx(0.5)  # TP=1 TN=1 FP=1 FN=1
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(0.5)
    assert m["f1"] == pytest.approx(0.5)
    assert 0 <= m["roc_auc"] <= 1 and 0 <= m["ap"] <= 1


# --------------------------- checkpoint / resume ------------------------------

def _tiny_trainer(tmp_path, **tkw):
    cfg = DLRMConfig.tiny()
    opt = OptConfig("rwsadagrad", lr=0.1)
    tcfg = TrainerConfig(print_freq=0, seed=3, **tkw)
    return Trainer(cfg, opt, tcfg), cfg


def _batches(cfg, n, seed=4, b=4):
    dc = RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0], mini_batch_size=b,
        num_batches=n, num_indices_per_lookup=2,
        num_indices_per_lookup_fixed=False, round_targets=True, seed=seed,
    )
    return make_random_batches(dc)


def test_checkpoint_roundtrip_and_skip(tmp_path):
    trainer, cfg = _tiny_trainer(tmp_path)
    batches = _batches(cfg, 5)
    trainer.fit(batches)
    assert trainer.iteration == 5
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, trainer.params, trainer.opt_state,
                    epoch=0, iteration=5, metrics={"accuracy": 0.75})
    p2, s2, meta = load_checkpoint(path, trainer.params, trainer.opt_state)
    for a, b in zip(
        np.asarray(trainer.params["emb"][0]).ravel(),
        np.asarray(p2["emb"][0]).ravel(),
    ):
        assert a == b
    assert meta["metrics"]["accuracy"] == 0.75
    assert skip_position(meta, nbatches=5) == (1, 0)
    assert skip_position({"epoch": 0, "iteration": 3}, nbatches=5) == (0, 3)


def test_resume_continues_identically(tmp_path):
    """Train 6 its straight vs train 3, checkpoint, resume, train 3 —
    final params must match (the reference's skip-upto resume contract)."""
    trainer_a, cfg = _tiny_trainer(tmp_path)
    batches = _batches(cfg, 6)
    trainer_a.fit(batches)

    trainer_b, _ = _tiny_trainer(tmp_path)
    trainer_b.fit(batches[:3])
    ck = str(tmp_path / "resume_ck")
    save_checkpoint(ck, trainer_b.params, trainer_b.opt_state,
                    epoch=0, iteration=3)
    trainer_c, _ = _tiny_trainer(tmp_path, load_path=ck)
    assert trainer_c.iteration == 3
    trainer_c.fit(batches)  # skips first 3 via skip_position
    np.testing.assert_allclose(
        np.asarray(trainer_a.params["emb"][0]),
        np.asarray(trainer_c.params["emb"][0]),
        rtol=1e-6,
    )


def test_resume_equivalence_composed(tmp_path):
    """VERDICT round-3 item 10: train N steps -> trainer-saved checkpoint ->
    resume M steps vs train N+M straight, through the REAL Trainer with
    LR policy + gradient accumulation + periodic eval counters composed —
    final params and metrics must match (the reference's skip-upto resume
    contract, dlrm_s_pytorch.py:1698-1755,1838-1855)."""
    cfg = DLRMConfig.tiny()
    opt = OptConfig("rwsadagrad", lr=0.2)

    def make(load=None, save=None):
        pol = LRPolicy(base_lr=0.2, num_warmup_steps=2, decay_start_step=3,
                       num_decay_steps=4)
        tcfg = TrainerConfig(
            print_freq=0, seed=3, test_freq=2, grad_accum_iter=2,
            load_path=load or "", save_path=save or "",
        )
        return Trainer(cfg, opt, tcfg, lr_policy=pol)

    batches = _batches(cfg, 12, seed=8)  # 6 accumulation steps of 2 micros
    test_fn = lambda: _batches(cfg, 2, seed=9)  # noqa: E731

    straight = make()
    s_summary = straight.fit(batches, test_batches=test_fn)
    assert straight.iteration == 6

    ck = str(tmp_path / "best")
    part = make(save=ck)
    part.fit(batches, test_batches=test_fn)
    assert os.path.exists(os.path.join(ck, "meta.json"))
    import json

    with open(os.path.join(ck, "meta.json")) as f:
        saved_it = json.load(f)["iteration"]
    assert 0 < saved_it <= 6  # trainer saved at a best-eval boundary

    resumed = make(load=ck)
    assert resumed.iteration == saved_it
    r_summary = resumed.fit(batches, test_batches=test_fn)
    assert resumed.iteration == 6
    for k in ("emb", "bot", "top"):
        np.testing.assert_allclose(
            np.asarray(straight.params[k][0]
                       if k == "emb" else straight.params[k][0][0]),
            np.asarray(resumed.params[k][0]
                       if k == "emb" else resumed.params[k][0][0]),
            rtol=1e-6, atol=1e-7, err_msg=f"params[{k}] after resume",
        )
    # optimizer state continues identically too (momentum restored)
    np.testing.assert_allclose(
        np.asarray(straight.opt_state["emb"][0]),
        np.asarray(resumed.opt_state["emb"][0]),
        rtol=1e-6, atol=1e-7,
    )
    assert s_summary["accuracy"] == pytest.approx(
        r_summary["accuracy"], abs=1e-9
    )


def test_multistep_dispatch_parity(tmp_path):
    """steps_per_dispatch=M scans M full optimizer steps in one dispatch —
    final params and iteration count must match the M=1 loop exactly
    (including a non-multiple tail and an LR schedule that varies across
    the scanned window)."""
    cfg = DLRMConfig.tiny()
    batches = _batches(cfg, 11)  # 2 groups of 4 + 3 tail singles

    def run(m, depth):
        pol = LRPolicy(base_lr=0.2, num_warmup_steps=3, decay_start_step=5,
                       num_decay_steps=4)
        tcfg = TrainerConfig(print_freq=4, seed=3, steps_per_dispatch=m,
                             prefetch_depth=depth)
        tr = Trainer(cfg, OptConfig("rwsadagrad", lr=0.2), tcfg,
                     lr_policy=pol)
        tr.fit(batches)
        return tr

    a = run(1, 0)
    b = run(4, 2)
    assert b.msteps == 4 and b.multi_step is not None
    assert a.iteration == b.iteration == 11
    import jax

    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7
        )
    for sa, sb in zip(
        jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)
    ):
        np.testing.assert_allclose(
            np.asarray(sa), np.asarray(sb), rtol=1e-6, atol=1e-7
        )


@pytest.mark.parametrize("mode", ["table", "row", "col"])
def test_multistep_dispatch_parity_mesh_runners(mode):
    """The scanned multi-step dispatch on the mesh runners: final params
    and losses must match the per-step loop exactly (the mesh analog of
    test_multistep_dispatch_parity)."""
    from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner
    from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner

    cls = {"table": HybridRunner, "row": RowShardedRunner,
           "col": ColShardedRunner}[mode]
    cfg = DLRMConfig.tiny()
    batches = _batches(cfg, 10)  # 2 groups of 4 + 2 tail singles

    def run(m):
        tcfg = TrainerConfig(print_freq=4, seed=3, steps_per_dispatch=m,
                             prefetch_depth=2 if m > 1 else 0)
        runner = cls(cfg, OptConfig("rwsadagrad", lr=0.1),
                     data=2, model=2, seed=5)
        tr = Trainer(cfg, OptConfig("rwsadagrad", lr=0.1), tcfg,
                     runner=runner)
        tr.fit(batches)
        return tr

    a = run(1)
    b = run(4)
    assert b.msteps == 4 and b.multi_step is not None
    assert a.iteration == b.iteration == 10
    import jax

    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7
        )


def test_uniform_stream_density_helper():
    from dlrm_yx_tpu.optim.optimizer import uniform_stream_density

    # huge tables, few draws -> ~all unique
    assert uniform_stream_density((10**6, 10**6), 65536, 2048) > 0.99
    # tiny table, many draws -> heavy duplication
    assert uniform_stream_density((100,), 0, 2048) < 0.1
    # no kernel-eligible tables -> 1.0 (routing stays on the exact path
    # for the small group anyway)
    assert uniform_stream_density((100, 200), 65536, 2048) == 1.0


def test_runner_multi_step_rejects_accum():
    """make_multi_step composes with accumulation only at the trainer
    level — a runner built with n_accum > 1 must refuse."""
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner

    cfg = DLRMConfig.tiny()
    runner = HybridRunner(cfg, OptConfig("sgd", lr=0.1), data=2, model=2,
                          seed=5, n_accum=2)
    with pytest.raises(ValueError, match="accum"):
        runner.make_multi_step(4)


def test_prefetch_thread_exits_on_early_stop():
    """An early stop (eval threshold) breaks out of the batch stream with
    the staging queue full — the producer thread must terminate instead
    of blocking forever on its final END put (it would pin every staged
    device batch for the life of the process)."""
    import threading
    import time as _t

    cfg = DLRMConfig.tiny()
    tcfg = TrainerConfig(
        print_freq=0, seed=3, test_freq=2, prefetch_depth=2,
        steps_per_dispatch=1, mlperf_acc_threshold=1e-9,  # stop at 1st eval
    )
    tr = Trainer(cfg, OptConfig("sgd", lr=0.1), tcfg)
    before = {t.ident for t in threading.enumerate()}
    batches = _batches(cfg, 40)
    tr.fit(batches, test_batches=lambda: iter(batches[:2]))
    assert tr.iteration < 40  # early stop fired mid-stream
    deadline = _t.time() + 10.0
    while _t.time() < deadline:
        leftover = [
            t for t in threading.enumerate()
            if t.ident not in before and t.daemon and t.is_alive()
        ]
        if not leftover:
            break
        _t.sleep(0.2)
    assert not leftover, f"prefetch worker still alive: {leftover}"


def test_auto_steps_per_dispatch_policy():
    from dlrm_yx_tpu.train.trainer import _auto_steps_per_dispatch

    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=64, test_freq=0)) == 16
    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=64, test_freq=128)) == 16
    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=4, test_freq=0)) == 4
    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=3, test_freq=0)) == 1
    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=64, test_freq=24)) == 8
    # explicit value wins
    assert _auto_steps_per_dispatch(
        TrainerConfig(print_freq=3, steps_per_dispatch=7)) == 7


def test_eval_and_early_stop(tmp_path):
    trainer, cfg = _tiny_trainer(
        tmp_path,
        test_freq=2,
        mlperf_logging=True,
        mlperf_acc_threshold=0.0001,  # trip immediately at first eval
        save_path=str(tmp_path / "best"),
    )
    batches = _batches(cfg, 6)
    summary = trainer.fit(batches, test_batches=lambda: _batches(cfg, 2, seed=9))
    assert trainer.iteration == 2  # stopped at first eval
    assert "roc_auc" in summary
    assert os.path.exists(str(tmp_path / "best" / "meta.json"))


def test_trainer_with_lr_policy(tmp_path):
    cfg = DLRMConfig.tiny()
    opt = OptConfig("sgd", lr=0.5)
    pol = LRPolicy(base_lr=0.5, num_warmup_steps=2, decay_start_step=4,
                   num_decay_steps=2)
    trainer = Trainer(cfg, opt, TrainerConfig(print_freq=0, seed=3), lr_policy=pol)
    batches = _batches(cfg, 6)
    trainer.fit(batches)
    assert trainer.iteration == 6  # just runs through warmup+decay


# ------------------------- hybrid CLI + export/quant CLI ----------------------

def test_cli_hybrid_mesh(tmp_path):
    """--mesh-data/--mesh-model drive the hybrid-parallel runner from the
    CLI (the reference's multi-GPU run modes, dlrm_s_pytorch.py:675-684)."""
    from dlrm_yx_tpu.cli import main

    s = main([
        "--arch-embedding-size=300-40-500-120", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=17-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=16", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--optimizer=rwsadagrad", "--test-freq=4",
        "--mesh-data=2", "--mesh-model=4", "--sharder=greedy",
    ])
    assert 0.0 <= s["accuracy"] <= 1.0


def test_cli_save_onnx_and_quantized_inference(tmp_path):
    from dlrm_yx_tpu.cli import main

    sm = str(tmp_path / "ckpt")
    main([
        "--arch-embedding-size=300-40-500", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=11-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--test-freq=4", f"--save-model={sm}",
        "--save-onnx",
    ])
    import os

    assert os.path.getsize(os.path.join(sm, "dlrm_tpu.stablehlo")) > 0
    m = main([
        "--arch-embedding-size=300-40-500", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=11-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--inference-only", f"--load-model={sm}",
        "--quantize-emb-with-bit=8", "--quantize-mlp-with-bit=8",
    ])
    assert m.get("quantized") is True


def test_orbax_checkpoint_roundtrip_sharded(tmp_path):
    """Orbax backend preserves mesh shardings end to end (SURVEY §5's
    'orbax-style sharded checkpoint')."""
    import numpy as np

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.optim.optimizer import OptConfig
    from dlrm_yx_tpu.parallel.hybrid import HybridRunner
    from dlrm_yx_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    cfg = DLRMConfig(
        emb_rows=(300, 40, 500, 120), ln_bot=(4, 8, 2), ln_top=(5 * 4 // 2 + 2, 8, 1)
    )
    opt = OptConfig("rwsadagrad", 0.1)
    r = HybridRunner(cfg, opt, data=2, model=2, seed=3)
    save_checkpoint_orbax(str(tmp_path / "ck"), r.params, r.opt_state,
                          epoch=1, iteration=7)
    r2 = HybridRunner(cfg, opt, data=2, model=2, seed=99)
    p, s, meta = load_checkpoint_orbax(str(tmp_path / "ck"), r2.params, r2.opt_state)
    np.testing.assert_allclose(np.asarray(p["emb"]), np.asarray(r.params["emb"]))
    assert meta["iteration"] == 7
    assert "model" in str(p["emb"].sharding)


def test_cli_orbax_backend(tmp_path):
    from dlrm_yx_tpu.cli import main

    sm = str(tmp_path / "ock")
    main([
        "--arch-embedding-size=300-40", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=5-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--test-freq=4", f"--save-model={sm}",
        "--ckpt-backend=orbax",
    ])
    m = main([
        "--arch-embedding-size=300-40", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=5-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--inference-only", f"--load-model={sm}",
        "--ckpt-backend=orbax",
    ])
    assert 0.0 <= m["accuracy"] <= 1.0


def test_cli_save_onnx_and_quantized_inference_mesh(tmp_path):
    """--save-onnx and quantized --inference-only work under mesh runners:
    params are gathered from the runner's CURRENT (non-donated) pytree and
    re-assembled in the single-device group layout (ADVICE round-1 items)."""
    from dlrm_yx_tpu.cli import main

    arch = [
        "--arch-embedding-size=300-40-500-120", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=17-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=16", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--test-freq=4",
    ]
    for mode, mesh in [("table", ["--mesh-data=2", "--mesh-model=2"]),
                       ("row", ["--mesh-data=2", "--mesh-model=2"])]:
        sm = str(tmp_path / f"ck_{mode}")
        main(arch + mesh + [f"--shard-mode={mode}", f"--save-model={sm}",
                            "--save-onnx"])
        import os

        assert os.path.getsize(os.path.join(sm, "dlrm_tpu.stablehlo")) > 0
    # quantized inference under a mesh runner gathers canonical params
    m = main(arch + ["--mesh-data=2", "--mesh-model=2", "--inference-only",
                     "--quantize-emb-with-bit=8"])
    assert m.get("quantized") is True
    assert 0.0 <= m["accuracy"] <= 1.0


@pytest.mark.parametrize("mode", ["row", "col"])
def test_shard_mode_rejects_unsupported_variants(mode):
    """row/col-sharded modes must not silently train a different model than
    requested (QR/MD/weighted pooling are hybrid/single-device features)."""
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.parallel.col_sharded import make_col_plan
    from dlrm_yx_tpu.parallel.row_sharded import make_row_plan

    make = make_row_plan if mode == "row" else make_col_plan
    base = dict(emb_rows=(300, 400), ln_bot=(4, 8, 8), ln_top=(11, 8, 1))
    with pytest.raises(NotImplementedError, match="qr-flag"):
        make(DLRMConfig(**base, qr_flag=True, qr_threshold=100), 2)
    # weighted pooling IS supported on row/col since round 2
    make(DLRMConfig(**base, weighted_pooling="fixed"), 2)


@pytest.mark.parametrize("mode", ["row", "col"])
def test_cli_shard_modes(mode):
    """--shard-mode=row|col drives the row/col-sharded runners from the
    CLI; all three modes must produce identical losses for the same seeds
    (cross-checked in __graft_entry__.dryrun_multichip)."""
    from dlrm_yx_tpu.cli import main

    s = main([
        "--arch-embedding-size=300-40-500-120", "--arch-mlp-bot=4-8-8",
        "--arch-mlp-top=18-8-1", "--arch-sparse-feature-size=8",
        "--mini-batch-size=16", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--optimizer=rwsadagrad", "--test-freq=4",
        "--mesh-data=2", "--mesh-model=2", f"--shard-mode={mode}",
    ])
    assert 0.0 <= s["accuracy"] <= 1.0
