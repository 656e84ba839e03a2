"""Inference/serving throughput: fp32 vs bf16 vs int8/int4 quantized tables
(+ int8 dynamic MLP) at the Terabyte-MLPerf shapes on the real chip.

The reference's quantized inference is CPU-only ATen ops
(dlrm_s_pytorch.py:549-576,1757-1781); here the row-wise dequant fuses into
the gather's consumer on the VPU, so the quantized variants buy HBM
footprint (4x/8x) AND gather bandwidth. XPlane-timed (the relay's
wall-clock drifts; see bench/xputil.py).

Store contents are synthetic (random uint8 + fixed scales) — built directly
on device: quantization ACCURACY is covered by tests/test_variants.py; this
measures throughput and footprint only.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 30
L = 1


def main():
    import jax
    import jax.numpy as jnp

    BATCH = 2048  # serving-latency sweeps: pass --batch N
    if "--batch" in sys.argv:
        BATCH = int(sys.argv[sys.argv.index("--batch") + 1])

    from xputil import trace_steps
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.ops.quantized import (
        QuantizedStore,
        make_fully_quantized_eval_step,
        make_quantized_eval_step,
        quantize_mlp,
    )
    from dlrm_yx_tpu.train.train_step import make_eval_step

    if "--small" in sys.argv:  # CPU smoke mode
        import jax as _j

        _j.config.update("jax_platforms", "cpu")
        cfg = DLRMConfig.terabyte_mlperf(max_ind_range=2000)
    else:
        cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
    groups = model_groups(cfg)
    params = init_dlrm_on_device(cfg, seed=123)
    t = cfg.num_tables
    r = np.random.RandomState(0)
    batches = [
        Batch(
            dense=jnp.asarray(r.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(
                np.stack(
                    [r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
                ).astype(np.int32)
            ),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]

    def synth_qstores(bits):
        """Random quantized group stores, built on device (no 4 GB host
        round-trip through quantize_model_embeddings)."""
        out = []
        for i, g in enumerate(groups):
            key = jax.random.PRNGKey(i)
            cols = g.dim if bits == 8 else g.dim // 2
            data = jax.random.randint(
                key, (g.total_rows, cols), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8)
            out.append(
                QuantizedStore(
                    data=data,
                    scale=jnp.full((g.total_rows, 1), 1e-3, jnp.float32),
                    bias=jnp.zeros((g.total_rows, 1), jnp.float32),
                    bits=bits,
                    dim=g.dim,
                )
            )
        return out

    def store_gb(stores):
        return sum(
            s.data.size + s.scale.size * 4 + s.bias.size * 4 for s in stores
        ) / 1e9

    dense_params = {k: params[k] for k in ("bot", "top")}
    dense_params["vw"] = None

    # Lazy constructors: excluded variants must not pay device work
    # (synth_qstores allocates GBs of HBM; quantize_mlp round-trips the
    # dense params through host).
    q_cache = {}

    def qstores(bits):
        if bits not in q_cache:
            q_cache[bits] = synth_qstores(bits)
        return q_cache[bits]

    def _fully_quantized():
        qbot = quantize_mlp(jax.tree.map(np.asarray, params["bot"]), "int8")
        qtop = quantize_mlp(jax.tree.map(np.asarray, params["top"]), "int8")
        return (
            make_fully_quantized_eval_step(cfg, groups, qstores(8), qbot, qtop),
            dense_params,
        )

    fp32_gb = sum(p.size * p.dtype.itemsize for p in params["emb"]) / 1e9
    cfg_bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    variant_makers = {
        "fp32": lambda: (make_eval_step(cfg), params),
        "bf16_compute": lambda: (make_eval_step(cfg_bf16), params),
        "int8_emb": lambda: (
            make_quantized_eval_step(cfg, groups, qstores(8)), dense_params),
        "int4_emb": lambda: (
            make_quantized_eval_step(cfg, groups, qstores(4)), dense_params),
        "int8_emb_int8_mlp": _fully_quantized,
    }

    def footprint_gb(name):
        if name in ("fp32", "bf16_compute"):
            return fp32_gb
        return store_gb(qstores(8 if "int8" in name else 4))

    names = list(variant_makers)
    if "--only" in sys.argv:  # e.g. --only int8_emb,int4_emb (XPlane tracing
        # per variant is minutes through the tunneled relay; this lets a cut
        # run resume at the missing rows)
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            sys.exit(f"--only needs a value; valid: {','.join(names)}")
        keep = sys.argv[i + 1].split(",")
        unknown = [k for k in keep if k not in variant_makers]
        if unknown:
            sys.exit(f"--only: unknown variant(s) {unknown}; "
                     f"valid: {','.join(names)}")
        names = [n for n in names if n in keep]

    results_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "serving_table.json",
    )
    rows = {}
    if not ("--small" in sys.argv) and os.path.exists(results_path):
        import json

        with open(results_path) as f:
            rows = json.load(f)

    print(f"# inference bench: {t} tables x <=1M rows, dim {cfg.emb_dims[0]}, "
          f"mb {BATCH}, L={L} (v5e, XPlane-timed)")
    for name in names:
        step, p = variant_makers[name]()
        out = step(p, batches[0])  # compile
        jax.block_until_ready(out)

        def run(steps, step=step, p=p):
            o = None
            for i in range(steps):
                o = step(p, batches[i % len(batches)])
            jax.block_until_ready(o)

        run(3)
        if "--small" in sys.argv:  # CPU smoke: no TPU XPlane; wall clock
            import time

            t0 = time.perf_counter()
            run(STEPS)
            us = (time.perf_counter() - t0) / STEPS * 1e6
        else:
            us, _ = trace_steps(run, STEPS)
        gb = footprint_gb(name)
        print(
            f"{name:20s} {us:8.1f} us/step  "
            f"{BATCH / (us / 1e6):12,.0f} examples/s  "
            f"tables {gb:.2f} GB", flush=True,
        )
        if "--small" not in sys.argv:
            # checkpoint each row as it lands — a cut window keeps it
            import json

            rows[name] = {
                "us_per_step": round(us, 1), "batch": BATCH,
                "examples_per_s": round(BATCH / (us / 1e6)),
                "tables_gb": round(gb, 3),
            }
            tmp = results_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rows, f, indent=1)
            os.replace(tmp, results_path)


if __name__ == "__main__":
    main()
