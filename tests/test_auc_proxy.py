"""Accuracy-proxy regression (bench/auc_proxy.py): trace-driven synthetic
training must IMPROVE held-out AUC and the fast path (bf16 + pallas) must
match fp32 + XLA — the standing proxy for the reference's untestable Criteo
thresholds (0.789 / 0.8107 / 0.8025; PARITY.md)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench")
)


def test_auc_improves_and_fast_path_matches():
    from auc_proxy import run_proxy

    results = run_proxy(steps=320, n_eval=6)
    for tag, curve in results.items():
        start, final = curve[0][1], curve[-1][1]
        assert final > 0.60, (tag, curve)         # genuinely learned
        assert final > start + 0.05, (tag, curve)  # improved from init
    gap = abs(results["fp32_xla"][-1][1] - results["bf16_pallas"][-1][1])
    assert gap < 0.02, (gap, results)


def test_scaled_proxy_checkpoints_and_resumes(tmp_path):
    """The scaled guard's per-config checkpointing (the round-4 failure
    mode was a cut device window losing the whole run): a second
    invocation must resume every completed config instead of re-running,
    and the summary must be re-derivable from the checkpoint alone."""
    import importlib.util
    import json
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "auc_proxy_t", os.path.join(root, "bench", "auc_proxy.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["auc_proxy_t"] = mod
    spec.loader.exec_module(mod)

    kw = dict(steps=6, n_eval=2, ind_cap=500, batch=32, uniform=True,
              out_dir=str(tmp_path))
    mod.run_proxy_scaled(**kw)
    ck = tmp_path / "auc_scaled_6_uniform_cap500.json"
    assert ck.exists()
    with open(ck) as f:
        d = json.load(f)
    assert set(d["curves"]) == {"exact", "fast_approx"}
    assert "summary" in d
    # resume: curves must be byte-identical (loaded, not re-trained)
    mtime = ck.stat().st_mtime
    mod.run_proxy_scaled(**kw)
    with open(ck) as f:
        d2 = json.load(f)
    assert d2["curves"] == d["curves"]


def test_mesh_paths_converge_to_single_device_auc():
    """The held-out-AUC proxy through the sharded runners (8-virtual-device
    mesh) must match the single-device curve — convergence evidence for the
    mesh paths beyond 1-step loss equality (VERDICT r2 item 4; the
    reference validates its distributed mode with full training runs,
    README.md:340-348 there)."""
    from auc_proxy import run_proxy, run_proxy_mesh

    steps, n_eval = 200, 6
    base = run_proxy(
        steps=steps, n_eval=n_eval, configs=(("fp32_xla", "float32", "xla"),)
    )["fp32_xla"][-1][1]
    for mode in ("table", "row", "col"):
        final = run_proxy_mesh(mode, steps=steps, n_eval=n_eval)[-1][1]
        assert abs(final - base) < 0.02, (mode, final, base)
        assert final > 0.60, (mode, final)
