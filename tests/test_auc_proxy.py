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
