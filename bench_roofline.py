"""Per-phase step-time breakdown vs v5e rooflines for the headline bench
config (Terabyte-MLPerf arch, 1M-cap tables, mb 2048, L=1, bf16 compute,
pallas sparse update, rwsadagrad).

Phases are attributed from an XPlane trace of the real jitted step by HLO
pattern; each phase gets an ANALYTIC lower bound from bytes-moved /
flops against v5e peaks (bf16 MXU ~197 TF/s, HBM ~819 GB/s), so the table
states which phase is bound by what and how far from speed-of-light it
runs (VERDICT round-1 item 4; the reference's per-phase timing intent,
yx_modfs/dlrm.py:268-273).

Prints a markdown table + one JSON line.
"""

import collections
import dataclasses
import glob
import json
import re
import tempfile

import numpy as np

HBM_GBPS = 819.0       # v5e HBM bandwidth
MXU_TFLOPS_BF16 = 197  # v5e bf16 peak
STEPS = 30
BATCH, L = 2048, 1


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas"
    )
    params = init_dlrm_on_device(cfg, seed=123)
    groups = model_groups(cfg)
    opt = OptConfig("rwsadagrad", 0.01)
    state = init_opt_state(opt, params, groups)
    step = make_train_step(cfg, opt)
    t = cfg.num_tables
    r = np.random.RandomState(0)
    bs = [
        Batch(
            dense=jnp.asarray(r.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(np.stack(
                [r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
            ).astype(np.int32)),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]
    params, state, loss = step(params, state, bs[0], 0)
    _ = float(loss)

    td = tempfile.mkdtemp(prefix="roofline_")
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

    big_rows = sum(
        g.total_rows for g in groups if g.size_class == 1
    )
    store_pat = re.compile(rf"\[{big_rows}(?:,|\*)")

    def classify(name: str) -> str:
        if "sparse_rows_add" in name:
            return "sparse update kernel"
        if "convolution" in name or "dot" in name:
            return "MLPs + interaction (MXU)"
        if store_pat.search(name) or f"[{big_rows}," in name:
            # touches the big store: lookup gather or momentum scatter
            if "fusion" in name and f"{BATCH * t}," in name:
                return "embedding lookup gather"
            return "big-store aux (momentum/updates)"
        if re.search(r"\bwhile", name):
            return "1-D momentum scatter (while)"
        if "copy" in name or "bitcast" in name or "reshape" in name:
            return "layout/copies"
        if "custom-call" in name:
            return "MLPs + interaction (MXU)"
        return "other"

    phases = collections.Counter()
    for name, ns in tot.items():
        phases[classify(name)] += ns
    step_ms = sum(tot.values()) / STEPS / 1e6

    # analytic lower bounds
    k = BATCH * t * L
    d = cfg.base_dim
    lookup_bytes = k * d * 4  # one row read per occurrence (f32 store)
    update_bytes = 2 * k * d * 4  # read+write each touched row
    mlp_flops = 0
    dims = list(zip(cfg.ln_bot[:-1], cfg.ln_bot[1:])) + list(
        zip(cfg.ln_top[:-1], cfg.ln_top[1:])
    )
    for m, n in dims:
        mlp_flops += 2 * BATCH * m * n
    mlp_flops *= 3  # fwd + 2x bwd
    f = cfg.num_features
    inter_flops = 2 * BATCH * f * f * d * 3

    bounds = {
        "embedding lookup gather": lookup_bytes / HBM_GBPS / 1e9 * 1e3,
        "sparse update kernel": update_bytes / HBM_GBPS / 1e9 * 1e3,
        "MLPs + interaction (MXU)": (mlp_flops + inter_flops)
        / (MXU_TFLOPS_BF16 * 1e12) * 1e3,
    }

    print("| phase | measured ms | roofline ms | x off | bound |")
    print("|---|---|---|---|---|")
    rows = []
    for phase, ns in phases.most_common():
        ms = ns / STEPS / 1e6
        lb = bounds.get(phase)
        row = {
            "phase": phase,
            "measured_ms": round(ms, 4),
            "roofline_ms": round(lb, 4) if lb else None,
            "x_off": round(ms / lb, 1) if lb else None,
        }
        rows.append(row)
        bound_kind = (
            "HBM BW" if phase in ("embedding lookup gather",
                                  "sparse update kernel")
            else ("MXU bf16" if "MXU" in phase else "-")
        )
        lb_s = f"{lb:.3f}" if lb else "-"
        xoff = f"{row['x_off']}" if lb else "-"
        print(f"| {phase} | {ms:.3f} | {lb_s} | {xoff} | {bound_kind} |")
    # cross-check the analytic bounds against XLA's own cost model for the
    # whole compiled step (export.cost_analysis)
    from dlrm_yx_tpu.export import cost_analysis

    try:
        ca = cost_analysis(step, (params, state, bs[0], 0))
    except Exception as e:  # cost model availability varies by backend
        ca = {"error": str(e)}
    else:
        fl = ca.get("flops", 0.0)
        by = next((v for k, v in ca.items() if "bytes accessed" == k), 0.0)
        print(
            f"XLA cost model (whole step): {fl/1e9:.2f} GFLOP, "
            f"{by/1e6:.1f} MB accessed -> HBM-roofline "
            f"{by / (HBM_GBPS * 1e9) * 1e3:.3f} ms, MXU-roofline "
            f"{fl / (MXU_TFLOPS_BF16 * 1e12) * 1e3:.3f} ms"
        )
    print(json.dumps({
        "metric": "roofline_step_ms",
        "value": round(step_ms, 4),
        "phases": rows,
        "peaks": {"hbm_gbps": HBM_GBPS, "mxu_tflops_bf16": MXU_TFLOPS_BF16},
        "xla_cost_model": ca,
    }))


if __name__ == "__main__":
    main()
