"""End-to-end real-data-path dress rehearsal at CI scale (VERDICT round-3
item 3): synthesized Kaggle-format TSV -> the actual CLI pipeline
(7-day split -> preprocess -> dictionaries -> train -> periodic eval ->
--mlperf-acc-threshold early stop -> checkpoint -> resume -> inference).
The committed 2M-row run lives in bench/results/dress_rehearsal_2M.json;
this keeps the same phases green in CI at 24k rows."""

import json
import os

import numpy as np


def test_dress_rehearsal_small(tmp_path):
    import importlib.util
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dress_rehearsal", os.path.join(root, "bench", "dress_rehearsal.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dress_rehearsal"] = mod
    spec.loader.exec_module(mod)
    run = mod.run

    out = run(
        rows=40_000, workdir=str(tmp_path), mb=64, force_cpu=0,
        nepochs=3, test_freq=150, acc_margin=0.005,
        auc_check_samples=2_000_000,
    )
    # streaming-vs-exact AUC agreement at millions of samples (phase 0)
    assert out["streaming_auc_check"]["gap"] < 1e-3, out
    # the synthetic stream is learnable: the model must beat always-majority
    assert out["learned_better_than_base"], out
    assert out["train"]["accuracy"] > out["base_rate"], out
    # early stop fired on the accuracy threshold
    assert out["train"]["early_stopped"], out
    # checkpoint artifacts from the trainer's best-eval saves
    assert os.path.exists(tmp_path / "ckpt" / "meta.json")
    with open(tmp_path / "ckpt" / "meta.json") as f:
        meta = json.load(f)
    assert meta["metrics"]["accuracy"] > out["base_rate"]
    # preprocessing artifacts are the reference's file set
    for f in (
        "kaggleAdDisplayChallenge_processed_day_count.npz",
        "kaggleAdDisplayChallenge_processed_fea_count.npz",
        "kaggleAdDisplayChallenge_processed_day_6_reordered.npz",
    ):
        assert os.path.exists(tmp_path / f), f
    with np.load(
        tmp_path / "kaggleAdDisplayChallenge_processed_fea_count.npz"
    ) as d:
        counts = d["counts"]
    assert len(counts) == 26 and counts.min() >= 2


def test_dress_rehearsal_auc_threshold(tmp_path):
    """AUC-threshold early-stop semantics (--mlperf-auc-threshold): a
    strongly learnable stream (signal_scale 1.8) must cross a meaningful
    AUC target and stop on it."""
    import importlib.util
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dress_rehearsal2", os.path.join(root, "bench", "dress_rehearsal.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["dress_rehearsal2"] = mod
    spec.loader.exec_module(mod)

    out = mod.run(
        rows=40_000, workdir=str(tmp_path), mb=64, force_cpu=0,
        nepochs=3, test_freq=150, auc_threshold=0.70, signal_scale=1.8,
        auc_check_samples=0,
    )
    assert out["train"]["auc_threshold"] == 0.70
    assert out["train"]["early_stopped"], out
    assert out["train"]["auc"] > 0.70, out
