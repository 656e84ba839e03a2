"""Full-loop throughput: trainer.fit with a REAL host-side loader in the
loop (VERDICT round-3 item 4). The reference's ms/it wraps batch fetch +
H2D + step (``/root/reference/dlrm_s_pytorch.py:1845-1876,1966-1988``);
every prior recorded number here timed the jitted step on device-resident
data. This bench reports:

  1. loader-only throughput — can the host side (bin-file pread + int32
     transform + [T,B,L] relayout) produce batches faster than the 2.27 ms
     device step consumes them?
  2. wall ms/it of ``Trainer.fit`` end-to-end with ``CriteoBinLoader``
     feeding the headline config (Terabyte-MLPerf arch, 1M-cap tables,
     mb 2048, rwsadagrad, pallas updates, bf16 compute), vs the
     device-step time from the same run's epoch timer.

Environment caveat (MEASUREMENTS.md): this TPU sits behind a tunneled
relay (H2D ~60 MB/s, ~30 ms/dispatch). A 2048x40-int32 batch is 320 KB =
~5 ms of relay H2D — the wall ms/it on THIS link is relay-bound, not
host- or chip-bound; the loader-rate line is the host-side evidence, and
the same harness on directly-attached TPU measures the true full loop.

Run: python bench/fullloop_bench.py [n_batches] [--loader-only]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_bin(path: str, n_rows: int, emb_rows, seed: int = 0) -> None:
    """Synthesize a Criteo-format flat binary (40 int32/record)."""
    rng = np.random.RandomState(seed)
    chunk = 1 << 18
    with open(path, "wb") as f:
        for lo in range(0, n_rows, chunk):
            m = min(chunk, n_rows - lo)
            rec = np.empty((m, 40), np.int32)
            rec[:, 0] = rng.randint(0, 2, m)
            rec[:, 1:14] = rng.poisson(3.0, (m, 13))
            for j, n in enumerate(emb_rows):
                rec[:, 14 + j] = rng.randint(0, n, m)
            f.write(rec.tobytes())


def main():
    import dataclasses

    loader_only = "--loader-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 400

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.criteo_bin import CriteoBinLoader

    BATCH = 2048
    cfg = DLRMConfig.terabyte_mlperf(max_ind_range=1_000_000)
    cfg = dataclasses.replace(
        cfg, compute_dtype="bfloat16", sparse_update_impl="pallas"
    )
    path = "/tmp/fullloop_train.bin"
    need = n_batches * BATCH
    if not (
        os.path.exists(path) and os.path.getsize(path) >= need * 160
    ):
        print(f"synthesizing {need} records ...", flush=True)
        make_bin(path, need, cfg.emb_rows)

    out = {"batch": BATCH, "n_batches": n_batches}

    # --- 1. loader-only rate (pure host: pread + transform + relayout) ---
    loader = CriteoBinLoader(path, batch_size=BATCH)
    for b in [loader[0], loader[1]]:  # warm page cache + code paths
        pass
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        n += 1
        if n >= n_batches:
            break
    dt = time.perf_counter() - t0
    out["loader_ms_per_batch"] = round(dt / n * 1e3, 3)
    out["loader_examples_per_sec"] = round(n * BATCH / dt)
    print(json.dumps({"phase": "loader_only", **out}), flush=True)
    if loader_only:
        return out

    # --- 2. trainer.fit wall time with the loader in the loop ----------
    from dlrm_yx_tpu.models.dlrm import init_dlrm_on_device, model_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.train.trainer import Trainer, TrainerConfig

    opt = OptConfig("rwsadagrad", 0.01)
    # print_freq 64 lets the auto dispatch policy pick 16 steps/dispatch
    # (the K-deep staged pipeline that hides the relay's ~30 ms round trip)
    tcfg = TrainerConfig(nepochs=1, print_freq=64, test_freq=0, seed=123)
    trainer = Trainer(cfg, opt, tcfg)
    # replace host-init params with on-device draws (13 GB of tables)
    trainer.params = init_dlrm_on_device(cfg, seed=123)
    trainer.opt_state = init_opt_state(opt, trainer.params, trainer.groups)

    t0 = time.perf_counter()
    trainer.fit(loader)
    wall = time.perf_counter() - t0
    n_steps = trainer.iteration
    out["wall_ms_per_it"] = round(wall / max(n_steps, 1) * 1e3, 3)
    out["wall_examples_per_sec"] = round(n_steps * BATCH / wall)
    # the steady-state number: wall/n over a 400-it run is dominated by
    # the one-off compile; the trainer's warmup-excluded epoch mean is
    # the ms/it the pipeline actually sustains
    ms = getattr(trainer, "last_epoch_ms_per_it", None)
    if ms is not None:
        out["steady_ms_per_it"] = round(ms, 3)
        out["steady_examples_per_sec"] = round(BATCH / ms * 1e3)
    print(json.dumps({"phase": "full_loop", **out}), flush=True)
    return out


if __name__ == "__main__":
    main()
