"""Preprocessing throughput: C++ fastparse vs numpy on a generated multi-GB
raw Criteo-format TSV, plus constant-memory split verification.

The reference needed Cython + 24-way multiprocessing for Terabyte
preprocessing (dlrm_s_pytorch.py:1243-1251); this records the single-process
rows/s of both paths here (SURVEY.md §7 "preprocessing throughput").

Usage: python bench/preproc_bench.py [n_rows] (default 2M ~= 0.5 GB)
"""
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_tsv(path: str, n: int, seed: int = 0, chunk: int = 100_000) -> None:
    rng = np.random.RandomState(seed)
    hexv = np.array([format(x, "08x") for x in rng.randint(0, 1 << 31, 4096)])
    with open(path, "w") as f:
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            y = rng.randint(0, 2, m).astype(str)
            dense = rng.randint(-2, 1000, (m, 13)).astype(str)
            dense[rng.rand(m, 13) < 0.1] = ""  # missing fields
            cat = hexv[rng.randint(0, 4096, (m, 26))]
            cat[rng.rand(m, 26) < 0.05] = ""
            rows = np.concatenate([y[:, None], dense, cat], axis=1)
            f.write("\n".join("\t".join(r) for r in rows) + "\n")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    path = "/tmp/preproc_bench.txt"
    if not (os.path.exists(path) and os.path.getsize(path) > n * 100):
        print(f"generating {n} rows ...", flush=True)
        gen_tsv(path, n)
    size_gb = os.path.getsize(path) / 2**30
    print(f"TSV: {size_gb:.2f} GiB, {n} rows", flush=True)

    from dlrm_yx_tpu.data import fastparse
    from dlrm_yx_tpu.data.criteo import parse_raw_tsv, split_kaggle_train_txt

    if fastparse.available():
        t0 = time.perf_counter()
        y, xi, xc = fastparse.parse_raw_tsv(path, -1, 0.0, 0)
        dt = time.perf_counter() - t0
        print(f"C++ fastparse: {len(y)/dt/1e6:.2f} M rows/s "
              f"({size_gb/dt:.2f} GiB/s, {dt:.1f} s)", flush=True)

    t0 = time.perf_counter()
    y, xi, xc = parse_raw_tsv(path)
    dt = time.perf_counter() - t0
    print(f"numpy parse:   {len(y)/dt/1e6:.2f} M rows/s ({dt:.1f} s)",
          flush=True)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    day_files = split_kaggle_train_txt(path, days=7)
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    tot = sum(os.path.getsize(p) for p in day_files)
    assert tot == os.path.getsize(path), (tot, os.path.getsize(path))
    print(f"streaming split: {n/dt/1e6:.2f} M rows/s ({dt:.1f} s), "
          f"maxRSS delta {max(0, rss1-rss0)/1024:.0f} MiB "
          f"(constant-memory: file is {size_gb*1024:.0f} MiB)", flush=True)

    # full offline pipeline (the dress rehearsal's preprocess phase):
    # per-stage wall budget -> bench/results/preproc_stages.json
    # (VERDICT round-4 item 6: the 21.5k rows/s had no committed budget)
    import glob
    import json
    import shutil

    from dlrm_yx_tpu.data.criteo import preprocess_criteo

    results = {}
    for tag, kw in (("fast", dict(compress=False)),
                    ("compressed", dict(compress=True))):
        workdir = f"/tmp/preproc_full_{tag}"
        shutil.rmtree(workdir, ignore_errors=True)
        os.makedirs(workdir)
        prefix = os.path.join(workdir, "kaggle")
        t0 = time.perf_counter()
        info = preprocess_criteo(
            day_files, prefix, randomize="day", seed=7, **kw
        )
        dt = time.perf_counter() - t0
        out_gb = sum(
            os.path.getsize(p) for p in glob.glob(prefix + "*")
        ) / 2**30
        results[tag] = {
            "rows_per_sec": round(n / dt),
            "total_s": round(dt, 1),
            "stage_seconds": info["stage_seconds"],
            "artifacts_gib": round(out_gb, 2),
        }
        print(f"full pipeline [{tag}]: {n/dt/1e3:.1f}k rows/s ({dt:.1f} s) "
              f"stages={info['stage_seconds']} artifacts={out_gb:.2f} GiB",
              flush=True)
        shutil.rmtree(workdir, ignore_errors=True)
    outp = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "preproc_stages.json",
    )
    with open(outp, "w") as f:
        json.dump({"n_rows": n, **results}, f, indent=1)
    for p in day_files:
        os.remove(p)


if __name__ == "__main__":
    main()
