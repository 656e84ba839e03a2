"""Convergence equivalence check: fp32+XLA-scatter vs bf16+Pallas-kernel.

The 3.1x training-throughput path (bfloat16 compute + the row-RMW sparse
update) must not change convergence. This script trains the same synthetic
model with both configurations for N steps on learnable structure (labels
generated from a hidden embedding signal, so the loss genuinely decreases)
and reports the loss trajectories and their divergence.

Run: python bench/convergence_check.py [steps]
Prints JSON lines; the last line is the verdict summary.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps=400):
    import jax
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    B, L = 512, 1
    rows = (200_000, 150_000, 120_000, 3000, 500, 60)
    cfg0 = DLRMConfig(
        emb_rows=rows,
        ln_bot=(13, 64, 128),
        ln_top=(7 * 6 // 2 + 128, 64, 1),
        loss="bce",
    )
    t = len(rows)
    r = np.random.RandomState(0)
    # hidden signal: a random projection of true per-category factors makes
    # the click probability learnable from the sparse ids
    factors = [r.randn(n).astype(np.float32) * 0.5 for n in rows]

    def make_batch(seed):
        rr = np.random.RandomState(seed)
        idx = np.stack([rr.randint(0, n, (B, L)) for n in rows]).astype(np.int32)
        signal = sum(factors[k][idx[k, :, 0]] for k in range(t))
        p = 1.0 / (1.0 + np.exp(-signal))
        y = (rr.rand(B) < p).astype(np.float32)[:, None]
        return Batch(
            dense=rr.rand(B, 13).astype(np.float32),
            indices=idx,
            weights=np.ones((t, B, L), np.float32),
            labels=y,
        )

    batches = [make_batch(1000 + i) for i in range(64)]
    curves = {}
    for tag, cd, impl in (
        ("fp32_xla", "float32", "xla"),
        ("bf16_pallas", "bfloat16", "pallas"),
    ):
        cfg = dataclasses.replace(cfg0, compute_dtype=cd, sparse_update_impl=impl)
        params = init_dlrm(cfg, seed=7)
        opt = OptConfig("rwsadagrad", 0.02)
        st = init_opt_state(opt, params, model_groups(cfg))
        step = make_train_step(cfg, opt)
        losses = []
        for i in range(steps):
            params, st, loss = step(
                params, st, Batch(*map(jnp.asarray, batches[i % 64])), i
            )
            losses.append(float(loss))
        curves[tag] = losses
        k = max(1, steps // 10)
        print(json.dumps({
            "config": tag,
            "loss_first10": round(float(np.mean(losses[:k])), 5),
            "loss_last10": round(float(np.mean(losses[-k:])), 5),
        }))
    a = np.array(curves["fp32_xla"])
    b = np.array(curves["bf16_pallas"])
    w = max(1, steps // 10)
    tail_gap = abs(a[-w:].mean() - b[-w:].mean())
    improved = a[: w].mean() - a[-w:].mean()
    print(json.dumps({
        "metric": "convergence_equivalence",
        "steps": steps,
        "mean_abs_gap": round(float(np.abs(a - b).mean()), 5),
        "tail_gap": round(float(tail_gap), 5),
        "fp32_improvement": round(float(improved), 5),
        "equivalent": bool(tail_gap < 0.1 * max(improved, 1e-9)),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
