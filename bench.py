"""Headline benchmark: DLRM training throughput on one TPU chip.

Config: Criteo Terabyte MLPerf architecture (128-dim embeddings, 26 tables,
bot 13-512-256-128, top 1024-1024-512-256-1, dot interaction), mini-batch
2048, L=1 (Criteo pooling), rows capped at 1M so the model fits one chip
(--max-ind-range style hashing; the reference applies the same hashing at
10M/40M). Measures the full jitted training step (forward + backward +
RWSAdagrad sparse row updates), reports examples/sec.

Methodology: the headline is the XPlane-measured device time per step
(jax.profiler TPU-plane "XLA Ops" sum over a 60-step chain) — the chip's
own clock, immune to the tunneled relay's wall-clock drift. A wall-clock
chain-pair slope ((t2-t1)/(N2-N1) over N1/N2-step chains, which cancels
the fixed ~30 ms dispatch round trip) is printed as a cross-check and is
the fallback when the profiler is unavailable. Parameters are initialized ON DEVICE
(init_dlrm_on_device) — the ~13 GB of tables never cross the host link —
and the step donates its state, so peak HBM is one copy of the model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to BASELINE_EXAMPLES_PER_SEC — this framework's
first recorded round-1 number (the reference repo commits no throughput
numbers, SURVEY.md §6) — so >1.0 means faster than round 1.
"""

import json
import time

import numpy as np

# round-1 recorded value, one TPU v5e chip (fp32 compute, XLA lookup path)
BASELINE_EXAMPLES_PER_SEC = 248_000.0

MAX_IND_RANGE = 1_000_000
BATCH = 2048
L = 1
N1, N2 = 20, 120


def main():
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    import dataclasses

    # bf16 MLP/interaction compute (fp32 master weights + fp32 accumulation):
    # +15% examples/s over fp32 on v5e, same convergence contract as the
    # reference's reduced-precision fbgemm path (SURVEY.md §2.3).
    # sparse_update_impl='pallas': row-RMW kernel instead of XLA's
    # full-store-rewrite scatter (ops/pallas_sparse_update.py) — 2.6x the
    # step throughput; small tables stay on the exact XLA dense-accumulate
    # path (emb_split_threshold).
    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=MAX_IND_RANGE)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas"
    )
    # whole-step A/B hooks (VERDICT round-4 item 3): the same headline
    # measurement with the fused interaction kernel or the RMW-vs-
    # write-only update ablation
    import sys

    def _flag_value(name, allowed=None):
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            raise SystemExit(f"{name} needs a value")
        v = sys.argv[i + 1]
        if allowed and v not in allowed:
            raise SystemExit(f"{name}: {v!r} not in {sorted(allowed)}")
        return v

    if "--interaction-impl" in sys.argv:
        cfg = dataclasses.replace(
            cfg,
            interaction_impl=_flag_value(
                "--interaction-impl", {"xla", "pallas"}
            ),
        )
    if "--no-write-only-update" in sys.argv:
        cfg = dataclasses.replace(cfg, write_only_update=False)
    if "--exact-row-momentum" in sys.argv:
        cfg = dataclasses.replace(cfg, exact_row_momentum=True)
    if "--emb-split-threshold" in sys.argv:
        cfg = dataclasses.replace(
            cfg,
            emb_split_threshold=int(_flag_value("--emb-split-threshold")),
        )
    # measured duplicate density of the synthetic stream (the CLI measures
    # the same statistic from the first real batch): uniform draws from
    # the 1M-cap tables are ~99.7% unique, which keeps the cheaper
    # per-occurrence momentum via the density routing; a dup-heavy stream
    # would flip the same config to coalesce-exact
    from dlrm_yx_tpu.optim.optimizer import uniform_stream_density

    cfg = dataclasses.replace(cfg, dup_density_hint=uniform_stream_density(
        cfg.emb_rows, cfg.emb_split_threshold, BATCH * L
    ))

    params = init_dlrm_on_device(cfg, seed=123)
    groups = model_groups(cfg)  # must match the stores init_dlrm built
    opt = OptConfig(name="rwsadagrad", lr=0.01)
    opt_state = init_opt_state(opt, params, groups)
    step = make_train_step(cfg, opt)

    t = cfg.num_tables

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return Batch(
            dense=jnp.asarray(r.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(
                np.stack(
                    [r.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
                ).astype(np.int32)
            ),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((r.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )

    batches = [make_batch(i) for i in range(4)]

    # warm-up / compile (blocking)
    params, opt_state, loss = step(params, opt_state, batches[0], 0)
    _ = float(loss)

    def run_chain(n, it0):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, loss = step(
                params, opt_state, batches[i % len(batches)], it0 + i
            )
        _ = float(loss)  # blocking fetch drains the chain
        return time.perf_counter() - t0

    # Primary number: XPlane device time per step. Wall-clock through the
    # tunneled relay drifts ~2x run to run in BOTH directions (recorded
    # 517k-1.02M on identical code; the min-of-5 slope is biased by relay
    # hiccups landing in the short chain), while the profiler's TPU-plane
    # op times measure the chip itself. Scoreboard reconciliation
    # (MEASUREMENTS.md round-5): the chip's honest step has been 2.268 ms
    # = ~903k ex/s since round 3; round 3's recorded 1.023M was the slope
    # estimator flattered by the relay.
    per_step_xplane = None
    try:
        import os
        import sys as _s

        # bench.py the FILE shadows bench/ the package; import by path
        _s.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench"
        ))
        from xputil import trace_steps

        us, _ = trace_steps(lambda n: run_chain(n, 1), 60)
        per_step_xplane = us / 1e6
    except Exception as e:  # profiler unavailable -> wall-slope fallback
        print(f"# xplane trace failed ({type(e).__name__}); "
              "falling back to wall slope", flush=True)

    # wall-slope cross-check (and fallback): best-of-5 chain-pair slope,
    # like the reference extracting MIN ms/it from its logs
    # (bench/dlrm_s_benchmark.sh:78,126)
    per_step_slope = float("inf")
    it0 = 61
    for _ in range(3 if per_step_xplane else 5):
        t1 = run_chain(N1, it0)
        t2 = run_chain(N2, it0 + N1)
        it0 += N1 + N2
        per_step_slope = min(per_step_slope, (t2 - t1) / (N2 - N1))

    if per_step_xplane is not None:
        per_step = per_step_xplane
        print(f"# xplane step {per_step_xplane*1e3:.3f} ms "
              f"(headline), wall-slope {per_step_slope*1e3:.3f} ms "
              "(cross-check)", flush=True)
    else:
        per_step = per_step_slope
    examples_per_sec = BATCH / per_step
    vs = (
        examples_per_sec / BASELINE_EXAMPLES_PER_SEC
        if BASELINE_EXAMPLES_PER_SEC
        else 1.0
    )
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


_TRANSIENT_MARKERS = (
    "ABORTED",
    "FAILED_PRECONDITION",
    "FailedPrecondition",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Socket closed",
)


def main_with_retry(fn=None, attempts=3, backoff_s=20):
    # the tunneled relay occasionally drops a dispatch (ABORTED /
    # FailedPrecondition); a retry reconnects and the compile cache makes
    # the rerun cheap. Deterministic failures (shape/config errors) are
    # NOT retried — they re-raise immediately.
    fn = fn or main
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            transient = any(m in repr(e) for m in _TRANSIENT_MARKERS)
            if attempt == attempts - 1 or not transient:
                raise
            time.sleep(backoff_s)


if __name__ == "__main__":
    main_with_retry()
