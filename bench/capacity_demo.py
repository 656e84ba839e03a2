"""Capacity demo: Criteo Terabyte 10M-ind-range on ONE 16 GB v5e chip.

The 10M-ind-range Terabyte config (bench/dlrm_s_criteo_terabyte.sh) needs
27.7 GB of fp32 tables — impossible on a single 16 GB chip and the reason
the reference shards tables across GPUs. With bfloat16 table storage
(emb_dtype, fbgemm fp16-weights parity) the same 54M rows fit in 13.8 GB
and train at ~749k examples/s on one chip (measured 2026-08-20, v5e;
round 4 routed the 216 MB momentum scatter through the row-RMW kernel
and taught the dense-finish kernel bf16 stores — was 485-506k).

Run: python bench/capacity_demo.py   (prints one JSON line)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.train_step import make_train_step

    BATCH, L, N1, N2 = 2048, 1, 10, 60
    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=10_000_000)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas",
        emb_dtype="bfloat16",
    )
    # measured duplicate density (uniform draws over huge tables are
    # ~unique): keeps per-occurrence momentum via the density routing,
    # matching how the CLI-measured hint behaves on real streams
    from dlrm_yx_tpu.optim.optimizer import uniform_stream_density

    cfg = dataclasses.replace(cfg, dup_density_hint=uniform_stream_density(
        cfg.emb_rows, cfg.emb_split_threshold, BATCH * L
    ))
    params = init_dlrm_on_device(cfg, seed=123)
    opt = OptConfig("rwsadagrad", 0.01)
    st = init_opt_state(opt, params, model_groups(cfg))
    step = make_train_step(cfg, opt)
    t = cfg.num_tables
    rr = np.random.RandomState(0)
    bs = [
        Batch(
            dense=jnp.asarray(rr.rand(BATCH, cfg.ln_bot[0]).astype(np.float32)),
            indices=jnp.asarray(
                np.stack(
                    [rr.randint(0, n, size=(BATCH, L)) for n in cfg.emb_rows]
                ).astype(np.int32)
            ),
            weights=jnp.ones((t, BATCH, L), jnp.float32),
            labels=jnp.asarray((rr.rand(BATCH, 1) > 0.5).astype(np.float32)),
        )
        for _ in range(4)
    ]
    params, st, loss = step(params, st, bs[0], 0)
    l0 = float(loss)

    def chain(n, i0):
        nonlocal params, st
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, st, loss = step(params, st, bs[i % 4], i0 + i)
        _ = float(loss)
        return time.perf_counter() - t0

    t1 = chain(N1, 1)
    t2 = chain(N2, 11)
    ms = (t2 - t1) / (N2 - N1) * 1e3
    print(
        json.dumps(
            {
                "demo": "terabyte_10M_ind_range_on_one_chip_bf16",
                "rows": sum(cfg.emb_rows),
                "table_gb_bf16": round(sum(cfg.emb_rows) * 128 * 2 / 1e9, 1),
                "table_gb_fp32_equivalent": round(
                    sum(cfg.emb_rows) * 128 * 4 / 1e9, 1
                ),
                "first_loss": round(l0, 5),
                "ms_per_step": round(ms, 3),
                "examples_per_sec": round(BATCH / ms * 1e3),
            }
        )
    )


if __name__ == "__main__":
    main()
