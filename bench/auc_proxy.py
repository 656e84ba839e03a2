"""Longer-horizon accuracy proxy: trace-driven synthetic training with a
held-out eval split and AUC thresholds.

The reference's accuracy baselines (Kaggle 0.789 acc, Terabyte-0.875
0.8107 acc, MLPerf 0.8025 AUC) need the Criteo datasets, which are not in
this environment. This is the standing proxy (VERDICT round-1 item 9):
categorical streams come from the repo's stack-distance trace
distributions (data/trace.py — temporal locality like real CTR logs), the
click signal is a hidden per-category factor model, so held-out AUC
genuinely measures learning; and the fast path (bf16 compute + pallas
sparse update) must reach the same AUC as fp32+XLA.

Run: python bench/auc_proxy.py [train_steps] [eval_batches]
Prints JSON lines; the last line is the verdict summary.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_proxy_batches(
    rows=(4_000, 1_200, 300),  # 3 tables = the repo's dist_emb_{0,1,2};
    # small enough that 64 x 256 training samples cover the row space, so
    # held-out AUC measures learning rather than unseen-row noise

    batch=256,
    n_train=64,
    n_eval=16,
    l=1,
    seed=0,
    dist_file=None,
):
    """(cfg, train_batches, eval_batches): trace-driven indices + hidden
    factor-model labels. Train and eval come from ONE trace stream split
    train-head / eval-tail — same categorical row population, disjoint
    samples — exactly what a train/test split of a real log gives (a
    different RNG stream would map the trace's uniques onto a DISJOINT set
    of rows, making eval unlearnable by construction)."""
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.data.trace import make_trace_batches

    t = len(rows)
    # 'cat' interaction: the top MLP sees the embeddings directly, so the
    # additive per-category signal is structurally learnable (with 'dot'
    # only pairwise products reach the top tower and the proxy stalls)
    cfg = DLRMConfig(
        emb_rows=rows,
        ln_bot=(13, 64, 32),
        ln_top=((t + 1) * 32, 64, 1),
        interaction="cat",
        loss="bce",
    )
    if dist_file is None:
        dist_file = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "input", "dist_emb_j.log",
        )
    r = np.random.RandomState(seed)
    # scale 1.0: signal sigma ~ sqrt(3) -> Bayes AUC ~0.82, comfortably
    # above the 0.75 pass threshold once the factors are learned
    factors = [r.randn(n).astype(np.float32) for n in rows]

    def label(idx2d, rr):
        signal = sum(factors[k][idx2d[k]] for k in range(t))
        p = 1.0 / (1.0 + np.exp(-signal))
        return (rr.rand(len(p)) < p).astype(np.float32)[:, None]

    raw = make_trace_batches(
        dist_file, rows, cfg.ln_bot[0], batch, n_train + n_eval, l,
        True, seed=1000,
    )
    rr = np.random.RandomState(1001)
    batches = []
    for b in raw:
        idx = np.asarray(b.indices)
        batches.append(Batch(
            dense=np.asarray(b.dense),
            indices=idx,
            weights=np.asarray(b.weights),
            labels=label(idx[:, :, 0], rr),
        ))
    return cfg, batches[:n_train], batches[n_train:]


def run_proxy(steps=2000, n_eval=16, configs=(("fp32_xla", "float32", "xla"),
                                              ("bf16_pallas", "bfloat16", "pallas"))):
    import jax.numpy as jnp

    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.metrics import roc_auc_exact
    from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step

    cfg0, train_b, eval_b = build_proxy_batches(n_eval=n_eval)
    results = {}
    for tag, cd, impl in configs:
        cfg = dataclasses.replace(
            cfg0, compute_dtype=cd, sparse_update_impl=impl
        )
        params = init_dlrm(cfg, seed=7)
        opt = OptConfig("rwsadagrad", 0.05)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        ev = make_eval_step(cfg)

        def eval_auc(params):
            scores, targets = [], []
            for b in eval_b:
                preds, _ = ev(params, Batch(*map(jnp.asarray, b)))
                scores.append(np.asarray(preds).ravel())
                targets.append(np.asarray(b.labels).ravel())
            return float(
                roc_auc_exact(
                    np.concatenate(scores), np.concatenate(targets)
                )
            )

        auc0 = eval_auc(params)
        curve = [(0, auc0)]
        for i in range(steps):
            params, st, loss = step(
                params, st, Batch(*map(jnp.asarray, train_b[i % len(train_b)])), i
            )
            if (i + 1) % max(1, steps // 8) == 0:
                curve.append((i + 1, eval_auc(params)))
        results[tag] = curve
        print(json.dumps({"config": tag, "auc_curve": curve}), flush=True)
    return results


def run_proxy_mesh(
    shard_mode="table", steps=400, n_eval=16, data=2, model=4, seed=7,
):
    """The same held-out-AUC proxy through a sharded runner on a (virtual)
    mesh — convergence evidence for the hybrid/row/col paths, not just
    1-step loss equality (VERDICT r2 item 4). Returns the AUC curve."""
    import jax.numpy as jnp

    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.optim.optimizer import OptConfig
    from dlrm_yx_tpu.train.metrics import roc_auc_exact

    cfg, train_b, eval_b = build_proxy_batches(n_eval=n_eval)
    opt = OptConfig("rwsadagrad", 0.05)
    if shard_mode == "table":
        from dlrm_yx_tpu.parallel.hybrid import HybridRunner

        runner = HybridRunner(cfg, opt, data=data, model=model, seed=seed)
    elif shard_mode == "row":
        from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner

        runner = RowShardedRunner(cfg, opt, data=data, model=model, seed=seed)
    elif shard_mode == "col":
        from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner

        runner = ColShardedRunner(cfg, opt, data=data, model=model, seed=seed)
    else:
        raise ValueError(shard_mode)

    def eval_auc(params):
        scores, targets = [], []
        for b in eval_b:
            preds, _ = runner.eval_step(params, runner.prepare_batch(b))
            scores.append(np.asarray(preds).ravel())
            targets.append(np.asarray(b.labels).ravel())
        return float(
            roc_auc_exact(np.concatenate(scores), np.concatenate(targets))
        )

    p, s = runner.params, runner.opt_state
    curve = [(0, eval_auc(p))]
    for i in range(steps):
        p, s, _ = runner.train_step(
            p, s, runner.prepare_batch(train_b[i % len(train_b)]), i
        )
        if (i + 1) % max(1, steps // 8) == 0:
            curve.append((i + 1, eval_auc(p)))
    print(json.dumps(
        {"config": f"mesh_{shard_mode}_{data}x{model}", "auc_curve": curve}
    ), flush=True)
    return curve


def run_proxy_compression(steps=800, n_eval=16):
    """Held-out-AUC with QR- and MD-compressed tables vs plain tables:
    the compression tricks must preserve learnability (the claim of the
    reference's tricks/, arXiv:1909.02107 / 1909.11810). Prints one AUC
    curve per variant; returns {variant: final_auc}."""
    import jax.numpy as jnp

    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.metrics import roc_auc_exact
    from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step

    cfg0, train_b, eval_b = build_proxy_batches(n_eval=n_eval)
    variants = {
        "plain": cfg0,
        # tables 4000/1200 -> quotient ~1000/300 + remainder 4 (16x fewer
        # embedding params on the compressed tables)
        "qr_mult": dataclasses.replace(
            cfg0, qr_flag=True, qr_threshold=1000, qr_collisions=4,
            qr_operation="mult",
        ),
        # md: the two big tables store dim 16 with an up-projection to 32
        "md": dataclasses.replace(
            cfg0, md_flag=True, md_threshold=1000,
            emb_dims=(16, 16, 32),
        ),
    }
    finals = {}
    for tag, cfg in variants.items():
        params = init_dlrm(cfg, seed=7)
        opt = OptConfig("rwsadagrad", 0.05)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        ev = make_eval_step(cfg)

        def eval_auc(params, ev=ev):
            scores, targets = [], []
            for b in eval_b:
                preds, _ = ev(params, Batch(*map(jnp.asarray, b)))
                scores.append(np.asarray(preds).ravel())
                targets.append(np.asarray(b.labels).ravel())
            return float(
                roc_auc_exact(np.concatenate(scores), np.concatenate(targets))
            )

        curve = [(0, eval_auc(params))]
        for i in range(steps):
            params, st, _ = step(
                params, st,
                Batch(*map(jnp.asarray, train_b[i % len(train_b)])), i,
            )
            if (i + 1) % max(1, steps // 8) == 0:
                curve.append((i + 1, eval_auc(params)))
        finals[tag] = curve[-1][1]
        print(json.dumps({"config": tag, "auc_curve": curve}), flush=True)
    return finals


def run_proxy_scaled(steps=5000, n_eval=12, ind_cap=200_000, batch=2048,
                     ablate=False, uniform=False, out_dir=None):
    """VERDICT round-3 item 9: guard the approximation semantics at scale.

    The FLAGSHIP 26-table Terabyte-MLPerf arch (row counts capped at
    ind_cap so the run fits everywhere), trace-driven categorical streams,
    hidden factor-model labels, held-out AUC — comparing:
      * exact:        f32 stores, XLA updates (coalesce-exact momentum);
      * fast:         f32 stores, pallas updates (write-only + kernel-path
                      per-occurrence momentum — the shipped default);
      * fast_bf16_sr: bf16 stores + stochastic rounding + pallas (the
                      capacity config).
    Prints one AUC curve per config and the final gap summary. The
    defaults-stay-defaults criterion: |fast - exact| <= 0.002 final AUC.

    Each config's finished curve is checkpointed to
    bench/results/auc_scaled_<steps>.json as it completes, and completed
    configs are skipped on re-run — a cut relay window keeps its rows
    (the round-3/4 failure mode was losing the whole run to the cut).
    """
    import dataclasses as _dc

    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.data.trace import make_trace_batches
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.metrics import roc_auc_exact
    from dlrm_yx_tpu.train.train_step import make_eval_step, make_train_step

    base = DLRMConfig.terabyte_mlperf(max_ind_range=ind_cap)
    rows = base.emb_rows
    t = len(rows)
    dist_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "input", "dist_emb_j.log",
    )
    r = np.random.RandomState(0)
    # per-category factors scaled so the summed signal has usable sigma
    # across 26 tables (1/sqrt(t) keeps Bayes AUC ~0.8)
    factors = [
        (r.randn(n) * (3.0 / np.sqrt(t))).astype(np.float32) for n in rows
    ]

    n_train = min(steps, 1000)  # distinct batches; cycled if steps exceed
    # the trace-driven generation takes ~1 s/batch on this host (~16 min
    # for the full run) and is deterministic — cache the stacked arrays so
    # ablation re-runs skip straight to the device phase
    tag_u = "_uniform" if uniform else ""
    cache = os.path.join(
        out_dir or "/tmp",
        f"auc_scaled_cache_{n_train}_{n_eval}_{batch}_{ind_cap}"
        f"{tag_u}.npz",
    )
    if os.path.exists(cache):
        with np.load(cache) as d:
            stk = {k: d[k] for k in ("dense", "indices", "weights", "labels")}
        batches = [
            Batch(*(stk[f][i] for f in ("dense", "indices", "weights",
                                        "labels")))
            for i in range(stk["dense"].shape[0])
        ]
        print(json.dumps({"batch_cache": "hit", "path": cache}), flush=True)
    else:
        if uniform:
            # dup-LIGHT stream: uniform draws (the hashed-id regime the
            # density routing keeps on per-occurrence momentum) — same
            # hidden factor model, same eval protocol
            ru = np.random.RandomState(1000)
            rr = np.random.RandomState(1001)
            batches = []
            for _ in range(n_train + n_eval):
                idx = np.stack([
                    ru.randint(0, n, size=(batch, 1)) for n in rows
                ]).astype(np.int32)
                signal = sum(factors[k][idx[k, :, 0]] for k in range(t))
                p = 1.0 / (1.0 + np.exp(-signal))
                batches.append(Batch(
                    dense=ru.rand(batch, base.ln_bot[0]).astype(np.float32),
                    indices=idx,
                    weights=np.ones((t, batch, 1), np.float32),
                    labels=(rr.rand(len(p)) < p).astype(np.float32)[:, None],
                ))
        else:
            raw = make_trace_batches(
                dist_file, rows, base.ln_bot[0], batch, n_train + n_eval, 1,
                True, seed=1000,
            )
            rr = np.random.RandomState(1001)
            batches = []
            for b in raw:
                idx = np.asarray(b.indices)
                signal = sum(factors[k][idx[k, :, 0]] for k in range(t))
                p = 1.0 / (1.0 + np.exp(-signal))
                batches.append(Batch(
                    dense=np.asarray(b.dense), indices=idx,
                    weights=np.asarray(b.weights),
                    labels=(rr.rand(len(p)) < p).astype(np.float32)[:, None],
                ))
        np.savez(cache, **{
            f: np.stack([np.asarray(getattr(b, f)) for b in batches])
            for f in ("dense", "indices", "weights", "labels")
        })
    train_b, eval_b = batches[:n_train], batches[n_train:]

    configs = (
        ("exact", dict(emb_dtype="float32", sparse_update_impl="xla")),
        ("fast", dict(emb_dtype="float32", sparse_update_impl="pallas")),
        ("fast_bf16_sr", dict(
            emb_dtype="bfloat16", sparse_update_impl="pallas",
            stochastic_rounding=True,
        )),
    )
    if uniform:
        # the question on a dup-light stream is whether PER-OCCURRENCE
        # momentum (what the density routing keeps there) matches exact —
        # force it via a measured-density-style hint
        configs = (
            ("exact", dict(emb_dtype="float32", sparse_update_impl="xla")),
            ("fast_approx", dict(
                emb_dtype="float32", sparse_update_impl="pallas",
                dup_density_hint=1.0,
            )),
        )
    if ablate:
        # isolate the two approximations the 'fast' config stacks
        # (first run: fast trailed exact by 0.006 AUC — which one is it?)
        configs = configs + (
            ("fast_exact_mom", dict(
                emb_dtype="float32", sparse_update_impl="pallas",
                exact_row_momentum=True,   # also disables write-only
            )),
            ("fast_rmw", dict(
                emb_dtype="float32", sparse_update_impl="pallas",
                write_only_update=False,   # per-occurrence momentum kept
            )),
        )
    cap_tag = "" if ind_cap == 200_000 else f"_cap{ind_cap}"
    ckpt_path = os.path.join(
        out_dir or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results"
        ),
        f"auc_scaled_{steps}{tag_u}{cap_tag}.json",
    )
    done = {}
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            done = json.load(f).get("curves", {})
        print(json.dumps({"resumed_configs": sorted(done)}), flush=True)

    def checkpoint(curves, summary=None):
        payload = {"steps": steps, "batch": batch, "ind_cap": ind_cap,
                   "curves": curves}
        if summary is not None:
            payload["summary"] = summary
        tmp = ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, ckpt_path)

    finals = {tag: c[-1][1] for tag, c in done.items()}
    for tag, kw in configs:
        if tag in done:
            continue
        cfg = _dc.replace(base, compute_dtype="bfloat16", **kw)
        params = init_dlrm(cfg, seed=7)
        opt = OptConfig("rwsadagrad", 0.05)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        ev = make_eval_step(cfg)

        def eval_auc(params):
            scores, targets = [], []
            for b in eval_b:
                preds, _ = ev(params, Batch(*map(jnp.asarray, b)))
                scores.append(np.asarray(preds).ravel())
                targets.append(np.asarray(b.labels).ravel())
            return float(roc_auc_exact(
                np.concatenate(scores), np.concatenate(targets)
            ))

        curve = [(0, eval_auc(params))]
        for i in range(steps):
            params, st, _ = step(
                params, st,
                Batch(*map(jnp.asarray, train_b[i % n_train])), i,
            )
            if (i + 1) % max(1, steps // 8) == 0:
                curve.append((i + 1, eval_auc(params)))
        finals[tag] = curve[-1][1]
        done[tag] = curve
        checkpoint(done)
        print(json.dumps({"config": tag, "auc_curve": curve}), flush=True)
        del params, st
    if uniform:
        # Uniform-stream AUC curves oscillate (~±0.03 between eval points
        # at these under-trained-row shapes), so compare last-3-point
        # means against the curves' own oscillation instead of single
        # final points: the claim under test is "per-occurrence momentum
        # is indistinguishable from exact when duplicates are rare", i.e.
        # |gap| within noise — not a tight sub-noise bound.
        def last3(tag):
            return float(np.mean([v for _, v in done[tag][-3:]]))

        def osc(tag):
            return float(np.std([v for _, v in done[tag][-5:]]))

        gap3 = abs(last3("fast_approx") - last3("exact"))
        noise = max(osc("exact"), osc("fast_approx"))
        ok = gap3 <= max(0.004, noise) and last3("exact") > 0.65
        summary = {
            "verdict": "ok" if ok else "FAIL",
            "stream": "uniform (dup-light)",
            "final_auc": finals,
            "last3_mean": {
                "exact": round(last3("exact"), 5),
                "fast_approx": round(last3("fast_approx"), 5),
            },
            "gap_last3": round(gap3, 5),
            "curve_oscillation": round(noise, 5),
            "criteria": "|last3 gap| <= max(0.004, oscillation) — "
                        "per-occurrence indistinguishable on dup-light "
                        "streams",
        }
        checkpoint(done, summary)
        print(json.dumps(summary))
        return 0 if ok else 1
    # Round-5 note: the shipped default is now density-driven exact
    # momentum (optimizer.MOMENTUM_EXACT_DENSITY) — with no measured hint,
    # 'fast' coalesces exactly, i.e. it computes what the round-5 ablation
    # ran as 'fast_exact_mom'. A checkpoint carrying the PRE-round-5
    # per-occurrence 'fast' (gap 0.006 — the measurement that drove the
    # default change) is evaluated via its 'fast_exact_mom' entry.
    gap_fast = abs(finals["fast"] - finals["exact"])
    shipped = finals.get("fast_exact_mom", finals["fast"])
    gap_shipped = abs(shipped - finals["exact"])
    gap_bf16 = abs(finals["fast_bf16_sr"] - finals["exact"])
    ok = (
        gap_shipped <= 0.002 and gap_bf16 <= 0.004 and finals["exact"] > 0.7
    )
    summary = {
        "verdict": "ok" if ok else "FAIL",
        "final_auc": finals,
        "gap_shipped_vs_exact": round(gap_shipped, 5),
        "gap_fast_vs_exact": round(gap_fast, 5),
        "gap_bf16_sr_vs_exact": round(gap_bf16, 5),
        "criteria": "shipped<=0.002, bf16_sr<=0.004, exact>0.7",
    }
    checkpoint(done, summary)
    print(json.dumps(summary))
    return 0 if ok else 1


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    steps = int(argv[0]) if argv else 2000
    n_eval = int(argv[1]) if len(argv) > 1 else 16
    shard_modes = [
        f.split("=", 1)[1] for f in flags if f.startswith("--shard-mode=")
    ]
    if "--scaled" in flags:
        ind_cap = [
            int(f.split("=", 1)[1]) for f in flags
            if f.startswith("--ind-cap=")
        ]
        return run_proxy_scaled(
            steps if argv else 5000, n_eval, ablate="--ablate" in flags,
            uniform="--uniform" in flags,
            **({"ind_cap": ind_cap[0]} if ind_cap else {}),
        )
    if "--compression" in flags:
        # accuracy-only evidence: run on the CPU backend so it works
        # while the TPU tunnel is down (and in CI)
        import jax

        jax.config.update("jax_platforms", "cpu")
        finals = run_proxy_compression(steps, n_eval)
        ok = all(v > 0.7 for v in finals.values())
        print(json.dumps({
            "verdict": "ok" if ok else "FAIL",
            "final_auc": finals, "threshold": 0.7,
        }))
        return 0 if ok else 1
    if shard_modes:
        # mesh-mode proxy: run each requested sharding on an 8-virtual-CPU
        # mesh and compare against the single-device fp32 curve
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        base = run_proxy(steps, n_eval, configs=(("fp32_xla", "float32", "xla"),))
        base_final = base["fp32_xla"][-1][1]
        finals = {"single_device": base_final}
        for m in shard_modes:
            curve = run_proxy_mesh(m, steps=steps, n_eval=n_eval)
            finals[m] = curve[-1][1]
        gaps = {m: abs(v - base_final) for m, v in finals.items()}
        ok = all(v > 0.75 for v in finals.values()) and all(
            g < 0.02 for g in gaps.values()
        )
        print(json.dumps({
            "verdict": "ok" if ok else "FAIL",
            "final_auc": finals, "gap_vs_single_device": gaps,
            "threshold": 0.75, "gap_threshold": 0.02,
        }))
        return 0 if ok else 1
    results = run_proxy(steps, n_eval)
    finals = {tag: curve[-1][1] for tag, curve in results.items()}
    starts = {tag: curve[0][1] for tag, curve in results.items()}
    gap = abs(finals["fp32_xla"] - finals["bf16_pallas"])
    ok = all(f > 0.75 for f in finals.values()) and gap < 0.02
    print(json.dumps({
        "verdict": "ok" if ok else "FAIL",
        "initial_auc": starts,
        "final_auc": finals,
        "fp32_vs_bf16_pallas_auc_gap": round(gap, 5),
        "threshold": 0.75, "gap_threshold": 0.02,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
