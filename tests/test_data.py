"""Data-layer tests: Criteo preprocessing artifacts, bin roundtrip
(the reference's _test_bin equivalence strategy,
data_loader_terabyte.py:315-376), trace-driven generation, processed
dataset, CSR conversion."""

import json
import os

import numpy as np
import pytest

from dlrm_yx_tpu.data.batch import Batch, csr_to_padded, padded_to_csr
from dlrm_yx_tpu.data.criteo import (
    CriteoNpzLoader,
    parse_raw_tsv,
    preprocess_criteo,
    split_kaggle_train_txt,
    transform_dense,
)
from dlrm_yx_tpu.data.criteo_bin import TOT, CriteoBinLoader, npz_to_binary
from dlrm_yx_tpu.data.processed import (
    gen_table_configs,
    generate_processed_data,
    load_processed,
    save_processed,
)
from dlrm_yx_tpu.data import trace as tr
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches


# --------------------------- raw TSV fixtures --------------------------------

def write_raw_tsv(path, n, rng, n_uniq=50):
    """Criteo-format TSV: label \\t 13 ints (some empty) \\t 26 hex."""
    with open(path, "w") as f:
        for _ in range(n):
            label = rng.randint(0, 2)
            dense = [
                "" if rng.rand() < 0.1 else str(rng.randint(-2, 1000))
                for _ in range(13)
            ]
            cat = [
                "" if rng.rand() < 0.05 else format(rng.randint(0, n_uniq), "x")
                for _ in range(26)
            ]
            f.write("\t".join([str(label)] + dense + cat) + "\n")


def test_parse_raw_tsv_python_vs_native(tmp_path):
    rng = np.random.RandomState(0)
    p = str(tmp_path / "day.txt")
    write_raw_tsv(p, 64, rng)
    y, xi, xc = parse_raw_tsv(p)  # may use native
    # force python fallback for comparison
    from dlrm_yx_tpu.data import criteo as c
    import dlrm_yx_tpu.data.fastparse as fp

    if fp.available():
        ys, xis, xcs = fp.parse_raw_tsv(p)
        np.testing.assert_array_equal(y, ys)
        np.testing.assert_array_equal(xi, xis)
        np.testing.assert_array_equal(xc, xcs)
    assert y.shape == (64,) and xi.shape == (64, 13) and xc.shape == (64, 26)
    # hex parse check: regenerate first line by hand
    with open(p) as f:
        parts = f.readline().rstrip("\n").split("\t")
    assert y[0] == int(parts[0])
    want_cat = [int(v, 16) if v else 0 for v in parts[14:]]
    np.testing.assert_array_equal(xc[0], want_cat)

    # full-32-bit hex ids (>= 2^31, the 40M-ind-range hashing edge):
    # python and native must agree bit-for-bit, with and without the mod
    big = str(tmp_path / "big.txt")
    ids = [0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 0xDEADBEEF, 0x9A0F1E2D]
    with open(big, "w") as f:
        for i, v in enumerate(ids):
            row = [str(i % 2)] + ["1"] * 13 + [format(v, "x")] * 26
            f.write("\t".join(row) + "\n")
    for mir in (-1, 40_000_000):
        yp, xip, xcp = c.parse_raw_tsv(big, max_ind_range=mir)
        if fp.available():
            yn, xin, xcn = fp.parse_raw_tsv(big, max_ind_range=mir)
            np.testing.assert_array_equal(xcp, xcn)
        if mir > 0:
            want = np.asarray([v % mir for v in ids], np.int32)
            np.testing.assert_array_equal(xcp[:, 0], want)


def test_parse_raw_tsv_sub_sampling_seeded(tmp_path, monkeypatch):
    """--data-sub-sample-rate: each parse path is deterministic for a
    given run seed, seeds change the kept set, positives are never
    dropped, and native/numpy keep zero-target rows at the same expected
    rate (reference semantics: data_utils.py:1027-1032)."""
    from dlrm_yx_tpu.data import criteo as c
    import dlrm_yx_tpu.data.fastparse as fp

    n, rate = 4000, 0.5
    p = str(tmp_path / "sub.txt")
    rng = np.random.RandomState(7)
    labels = (np.arange(n) % 10 == 0).astype(int)  # 10% positives
    with open(p, "w") as f:
        for i in range(n):
            row = [str(labels[i])] + [str(i)] * 13 + [format(i, "x")] * 26
            f.write("\t".join(row) + "\n")
    n_pos = int(labels.sum())
    exp_keep = n_pos + (n - n_pos) * (1 - rate)
    tol = 4 * np.sqrt((n - n_pos) * rate * (1 - rate))  # 4 sigma

    paths = [("numpy", False)]
    if fp.available():
        paths.append(("native", True))
    kept = {}
    for name, use_native in paths:
        monkeypatch.setattr(fp, "available", lambda un=use_native: un)
        y1, xi1, _ = c.parse_raw_tsv(p, sub_sample_rate=rate, seed=123)
        y2, xi2, _ = c.parse_raw_tsv(p, sub_sample_rate=rate, seed=123)
        y3, xi3, _ = c.parse_raw_tsv(p, sub_sample_rate=rate, seed=999)
        # deterministic per (path, seed)
        np.testing.assert_array_equal(xi1, xi2)
        np.testing.assert_array_equal(y1, y2)
        # seed actually reaches the sampler
        assert len(y3) != len(y1) or not np.array_equal(xi3, xi1)
        # positives all survive; keep-rate statistically right
        assert int((y1 == 1).sum()) == n_pos
        assert abs(len(y1) - exp_keep) < tol, (name, len(y1), exp_keep)
        kept[name] = len(y1)
    monkeypatch.undo()


def test_dict_builder_matches_numpy_first_appearance():
    """The native insertion-order hash dict must reproduce the numpy
    fallback's first-appearance dictionaries and remap ids exactly."""
    from dlrm_yx_tpu.data import fastparse

    if not fastparse.available():
        import pytest

        pytest.skip("no native library")
    r = np.random.RandomState(0)
    days = [r.randint(-50, 60, 5000).astype(np.int32) for _ in range(3)]
    db = fastparse.DictBuilder(1)
    for d in days:
        db.update(0, d)
    got_u = db.uniques(0)
    # numpy reference: first appearance across the concatenated stream
    allv = np.concatenate(days)
    _, first = np.unique(allv, return_index=True)
    want_u = allv[np.sort(first)]
    np.testing.assert_array_equal(got_u, want_u)
    # remap: position in the first-appearance list
    lut = {int(v): i for i, v in enumerate(want_u)}
    got = db.remap(0, days[1])
    want = np.array([lut[int(v)] for v in days[1]], np.int32)
    np.testing.assert_array_equal(got, want)
    db.free()


def test_preprocess_pipeline_and_loader(tmp_path):
    rng = np.random.RandomState(1)
    days = 3
    day_files = []
    for i in range(days):
        p = str(tmp_path / f"raw_{i}.txt")
        write_raw_tsv(p, 40 + 8 * i, rng)
        day_files.append(p)
    prefix = str(tmp_path / "crit")
    info = preprocess_criteo(day_files, prefix, randomize="day", seed=7)
    assert len(info["counts"]) == 26
    assert list(info["total_per_file"]) == [40, 48, 56]

    # artifacts exist with the reference's key names
    with np.load(f"{prefix}_day_0.npz") as d:
        assert set(d.files) >= {"X_int", "X_cat_t", "y"}
        assert d["X_cat_t"].shape[0] == 26
    with np.load(f"{prefix}_fea_dict_3.npz") as d:
        uniq = d["unique"]
    with np.load(f"{prefix}_day_1_processed.npz") as d:
        assert d["X_cat"].shape == (48, 26)
        assert d["X_cat"].max() < info["counts"].max()
        assert d["X_int"].min() >= 0  # negatives clamped
    # dense-id remap consistency: id k must map back to unique[k]
    with np.load(f"{prefix}_day_0.npz") as raw, np.load(
        f"{prefix}_day_0_processed.npz"
    ) as proc:
        raw_col = raw["X_cat_t"][3]
        ids = proc["X_cat"][:, 3]
        np.testing.assert_array_equal(uniq[ids], raw_col)

    # loader: train batches from days 0..1, test/val split halves of day 2
    train = CriteoNpzLoader(prefix, days, batch_size=16, split="train")
    batches = list(train)
    assert len(batches) == (40 + 48) // 16
    b = batches[0]
    assert b.indices.shape == (26, 16, 1) and b.dense.shape == (16, 13)
    test = list(CriteoNpzLoader(prefix, days, batch_size=4, split="test", drop_last=False))
    val = list(CriteoNpzLoader(prefix, days, batch_size=4, split="val", drop_last=False))
    n_test = sum(len(x.labels) for x in test)
    n_val = sum(len(x.labels) for x in val)
    assert n_test == 28 and n_val == 28  # halves of day 2 (56)


def test_bin_roundtrip_matches_npz_loader(tmp_path):
    """npz -> bin -> loader must yield identical batches to the npz loader
    (the reference's _test_bin)."""
    rng = np.random.RandomState(2)
    days = 2
    day_files = []
    for i in range(days):
        p = str(tmp_path / f"raw_{i}.txt")
        write_raw_tsv(p, 32, rng)
        day_files.append(p)
    prefix = str(tmp_path / "crit")
    preprocess_criteo(day_files, prefix, randomize="none", seed=7)

    bin_path = str(tmp_path / "train.bin")
    npz_to_binary([f"{prefix}_day_0_reordered.npz"], bin_path, split="train")
    counts_file = f"{prefix}_fea_count.npz"

    bin_ld = CriteoBinLoader(bin_path, counts_file, batch_size=8)
    npz_ld = CriteoNpzLoader(prefix, days, batch_size=8, split="train")
    n = 0
    for bb, nb in zip(bin_ld, npz_ld):
        np.testing.assert_allclose(bb.dense, nb.dense, rtol=1e-6)
        np.testing.assert_array_equal(bb.indices, nb.indices)
        np.testing.assert_array_equal(bb.labels, nb.labels)
        n += 1
    assert n == 4

    # --mlperf-bin-shuffle semantics: a seeded permutation of BATCH order
    # covering every batch exactly once, re-permuted per epoch
    sh = CriteoBinLoader(bin_path, counts_file, batch_size=8, shuffle_seed=5)
    base = CriteoBinLoader(bin_path, counts_file, batch_size=8)
    key = lambda b: (b.labels.tobytes(), np.asarray(b.indices).tobytes())
    plain = sorted(key(b) for b in base)
    shuffled = [key(b) for b in sh]
    assert sorted(shuffled) == plain  # same multiset of batches
    sh2 = CriteoBinLoader(bin_path, counts_file, batch_size=8, shuffle_seed=5)
    assert [key(b) for b in sh2] == shuffled  # deterministic per seed
    sh.reshuffle(1)
    epoch1 = [key(b) for b in sh]
    assert sorted(epoch1) == plain

    # native vs numpy reader agreement
    from dlrm_yx_tpu.data import fastparse as fp

    if fp.available():
        ld_np = CriteoBinLoader(bin_path, counts_file, batch_size=8, use_native=False)
        ld_nat = CriteoBinLoader(bin_path, counts_file, batch_size=8, use_native=True)
        assert ld_nat._native is not None
        for i in range(4):
            a, b = ld_np[i], ld_nat[i]
            np.testing.assert_allclose(a.dense, b.dense, rtol=1e-6)
            np.testing.assert_array_equal(a.indices, b.indices)
            np.testing.assert_array_equal(a.labels, b.labels)


def test_bin_test_val_split(tmp_path):
    rng = np.random.RandomState(3)
    n = 30
    y = rng.randint(0, 2, n)
    xi = rng.randint(0, 100, (n, 13))
    xc = rng.randint(0, 50, (n, 26))
    npz = str(tmp_path / "day.npz")
    np.savez_compressed(npz, y=y, X_int=xi, X_cat=xc)
    for split, sl in (("test", slice(0, 15)), ("val", slice(15, None))):
        out = str(tmp_path / f"{split}.bin")
        npz_to_binary([npz], out, split=split)
        arr = np.fromfile(out, dtype=np.int32).reshape(-1, TOT)
        np.testing.assert_array_equal(arr[:, 0], y[sl])


def test_kaggle_day_split(tmp_path):
    rng = np.random.RandomState(4)
    p = str(tmp_path / "train.txt")
    write_raw_tsv(p, 23, rng)
    files = split_kaggle_train_txt(p, days=7)
    sizes = [sum(1 for _ in open(f)) for f in files]
    assert sum(sizes) == 23 and max(sizes) - min(sizes) <= 1


# --------------------------- trace-driven synthetic ---------------------------

def test_trace_profile_and_regenerate():
    # simple trace with known stack distances
    trace = [1, 2, 3, 1, 2, 3, 4, 4]
    stack, dists, lines = tr.trace_profile(trace)
    # appendleft => reversed order: last access first
    assert dists[::-1] == [0, 0, 0, 3, 3, 3, 0, 1]
    assert sorted(lines) == [1, 2, 3, 4]
    vals, cum = tr.dist_from_distances(dists)
    assert vals[0] == 0 and abs(cum[-1] - 1.0) < 1e-9
    rng = np.random.RandomState(0)
    regen = tr.trace_generate_lru(list(lines), vals, cum, 20, rng)
    assert len(regen) == 20
    assert set(regen) <= set(lines)


def test_dist_file_roundtrip(tmp_path):
    p = str(tmp_path / "dist.log")
    tr.write_dist_file(p, [1, 2, 3], [0, 1, 3], [0.5, 0.8, 1.0])
    u, sd, cum = tr.read_dist_file(p)
    assert u == [1, 2, 3] and sd == [0, 1, 3] and cum == [0.5, 0.8, 1.0]


def test_reference_fixture_dist_files():
    """Our reader must parse the reference's shipped fixtures."""
    fixture = "/root/reference/input/dist_emb_0.log"
    if not os.path.exists(fixture):
        pytest.skip("reference fixtures unavailable")
    u, sd, cum = tr.read_dist_file(fixture)
    assert len(sd) == len(cum) and abs(cum[-1] - 1.0) < 1e-9


def test_trace_file_roundtrip(tmp_path):
    p = str(tmp_path / "trace.log")
    tr.write_trace_file(p, [5, 6, 7])
    assert tr.read_trace_file(p) == [5, 6, 7]
    tr.write_trace_file(p, [5, 6, 7], binary=True)
    assert tr.read_trace_file(p, binary=True) == [5, 6, 7]


def test_make_trace_batches(tmp_path):
    pattern = str(tmp_path / "dist_emb_j.log")
    rng = np.random.RandomState(5)
    for j in range(2):
        trace = rng.randint(0, 20, 200).tolist()
        _, dists, lines = tr.trace_profile(trace)
        vals, cum = tr.dist_from_distances(dists)
        tr.write_dist_file(pattern.replace("j", str(j)), lines, vals, cum)
    batches = tr.make_trace_batches(
        pattern, emb_rows=(20, 20), m_den=4, mini_batch_size=3,
        num_batches=2, num_indices_per_lookup=4, seed=5,
    )
    assert len(batches) == 2
    b = batches[0]
    assert b.indices.shape == (2, 3, 4)
    assert b.indices.max() < 20
    assert (b.weights.sum(-1) >= 1).all()  # at least one index per lookup


# --------------------------- processed dataset --------------------------------

def test_processed_dataset_roundtrip(tmp_path):
    rng = np.random.RandomState(6)
    tc = gen_table_configs(4, row_range=(10, 50), dim_choices=(8, 16),
                           pooling_range=(1, 4), rng=rng)
    assert len(tc["tables"]) == 4
    batches = generate_processed_data(tc, m_den=13, num_batches=3,
                                      mini_batch_size=4, seed=6)
    d = str(tmp_path / "proc")
    save_processed(d, tc, batches)
    tc2, batches2 = load_processed(d)
    assert tc2 == json.loads(json.dumps(tc))
    for a, b in zip(batches, batches2):
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.dense, b.dense)
    # pooling_factor honored exactly (unique indices per lookup)
    for k, t in enumerate(tc["tables"]):
        pf = min(t["pooling_factor"], t["row"])
        assert (batches[0].weights[k].sum(-1) == pf).all()


# --------------------------- CSR conversion -----------------------------------

def test_csr_padded_roundtrip():
    rng = np.random.RandomState(7)
    cfg = RandomDataConfig(
        emb_rows=(30, 40), m_den=4, mini_batch_size=5, num_batches=1,
        num_indices_per_lookup=4, num_indices_per_lookup_fixed=False, seed=8,
    )
    b = make_random_batches(cfg)[0]
    ls_i, ls_o = padded_to_csr(b.indices, b.weights)
    idx2, w2 = csr_to_padded(ls_i, ls_o, 5, 4)
    np.testing.assert_array_equal(idx2 * (w2 > 0), b.indices * (b.weights > 0))
    np.testing.assert_array_equal(w2, b.weights)


def test_transform_dense_log():
    x = np.array([[0, 1, 9]], dtype=np.int32)
    np.testing.assert_allclose(transform_dense(x), np.log(x + 1.0), rtol=1e-6)


# ---------------------- generator CLIs + fixtures ---------------------------

def test_trace_cli_roundtrip(tmp_path):
    """python -m dlrm_yx_tpu.data.trace profiles a trace and regenerates a
    synthetic one (dlrm_data_pytorch.py:1487-1552 CLI parity)."""
    import numpy as np

    from dlrm_yx_tpu.data.trace import main as trace_main
    from dlrm_yx_tpu.data.trace import read_dist_file, read_trace_file, write_trace_file

    rng = np.random.RandomState(3)
    trace = (rng.zipf(1.5, 500) % 40).tolist()
    tf = str(tmp_path / "trace.log")
    write_trace_file(tf, trace)
    df = str(tmp_path / "dist.log")
    sf = str(tmp_path / "synth.log")
    trace_main(["--trace-file", tf, "--dist-file", df, "--synthetic-file", sf])
    uniques, sd, cum = read_dist_file(df)
    assert len(uniques) == len(set(trace))
    assert abs(cum[-1] - 1.0) < 1e-6
    synth = read_trace_file(sf)
    assert len(synth) == len(trace)
    assert set(synth) <= set(range(max(trace) + 1))


def test_processed_cli(tmp_path):
    """python -m dlrm_yx_tpu.data.processed == gen_synthetic_data.py CLI."""
    from dlrm_yx_tpu.data.processed import load_processed, main as proc_main

    out = str(tmp_path / "ds")
    proc_main([
        "--T", "3", "--m-den", "8", "--num-batches", "2",
        "--mini-batch-size", "4", "--row-range", "50,100",
        "--dim-range", "8", "--pooling-factor-range", "2,5",
        "--out-dir", out,
    ])
    cfgs, batches = load_processed(out)
    assert len(batches) == 2
    assert batches[0].dense.shape == (4, 8)
    assert batches[0].indices.shape[0] == 3


def test_repo_fixtures_usable():
    """input/dist_emb_j.log fixtures drive the synthetic data path (the
    reference ships equivalent fixtures, SURVEY.md §4)."""
    import os

    from dlrm_yx_tpu.data.trace import make_trace_batches

    if not os.path.exists("input/dist_emb_0.log"):
        import pytest

        pytest.skip("fixtures not present")
    batches = make_trace_batches(
        "input/dist_emb_j.log", [50, 79, 89], 4, 4, 2, 3
    )
    assert len(batches) == 2


def test_device_random_batches():
    """On-device synthetic generator: shapes, determinism, mask validity."""
    import jax

    from dlrm_yx_tpu.data.synthetic import make_device_random_batches

    rows = (50, 200, 1000)
    ds = make_device_random_batches(rows, 4, 8, 3, 5, False, True, seed=9)
    assert len(ds) == 3
    b0a, b0b = ds[0], ds[0]
    import numpy as np

    np.testing.assert_array_equal(np.asarray(b0a.indices), np.asarray(b0b.indices))
    assert b0a.indices.shape == (3, 8, 5)
    idx = np.asarray(b0a.indices)
    for t, n in enumerate(rows):
        assert idx[t].max() < n and idx[t].min() >= 0
    w = np.asarray(b0a.weights)
    # masks are prefixes of length >= 1
    assert ((w == 0) | (w == 1)).all()
    assert (w[:, :, 0] == 1).all()
    lbl = np.asarray(b0a.labels)
    assert set(np.unique(lbl)) <= {0.0, 1.0}
    # different batch -> different draw
    b1 = ds[1]
    assert not np.array_equal(np.asarray(b1.indices), idx)


def test_memory_map_loader_matches_npz(tmp_path):
    """--memory-map: memmapped .npy day files yield identical batches to
    the npz loader (the reference's memmap Criteo flow)."""
    import numpy as np

    from dlrm_yx_tpu.data.criteo import CriteoNpzLoader, convert_days_to_memmap

    rng = np.random.RandomState(0)
    prefix = str(tmp_path / "toy")
    days, per = 3, [40, 50, 30]
    for i, n in enumerate(per):
        np.savez_compressed(
            f"{prefix}_day_{i}_reordered.npz",
            X_cat=rng.randint(0, 100, (n, 26)).astype(np.int32),
            X_int=rng.randint(0, 50, (n, 13)).astype(np.int32),
            y=rng.randint(0, 2, n).astype(np.float32),
        )
    np.savez_compressed(f"{prefix}_day_count.npz",
                        total_per_file=np.array(per))
    convert_days_to_memmap(prefix, days)
    a = list(CriteoNpzLoader(prefix, days, 16, split="train"))
    b = list(CriteoNpzLoader(prefix, days, 16, split="train", memory_map=True))
    assert len(a) == len(b) > 0
    for x, yb in zip(a, b):
        np.testing.assert_array_equal(x.indices, yb.indices)
        np.testing.assert_array_equal(x.dense, yb.dense)
        np.testing.assert_array_equal(x.labels, yb.labels)


def test_hdf5_batch_persistence(tmp_path):
    """Per-batch HDF5 persistence of generated data (#18 sub-feature)."""
    import numpy as np

    from dlrm_yx_tpu.data.synthetic import (
        RandomDataConfig,
        load_batches_hdf5,
        make_random_batches,
        save_batches_hdf5,
    )

    cfg = RandomDataConfig(
        emb_rows=(50, 80), m_den=4, mini_batch_size=8, num_batches=3,
        num_indices_per_lookup=3, num_indices_per_lookup_fixed=False,
        round_targets=True, seed=2,
    )
    batches = make_random_batches(cfg)
    p = str(tmp_path / "synth.hdf5")
    save_batches_hdf5(p, batches)
    back = load_batches_hdf5(p)
    assert len(back) == 3
    for x, y in zip(batches, back):
        np.testing.assert_array_equal(np.asarray(x.indices), y.indices)
        np.testing.assert_array_equal(np.asarray(x.weights), y.weights)


def test_cli_preprocess_on_miss(tmp_path):
    """--data-generation=dataset with a raw TSV and no preprocessed files
    triggers the full preprocessing pipeline (reference: preprocess on
    first touch, SURVEY.md §3.6), honoring --data-randomize."""
    import numpy as np

    import jax

    from dlrm_yx_tpu.cli import main

    rng = np.random.RandomState(0)
    raw = tmp_path / "train.txt"
    lines = []
    for _ in range(210):
        label = rng.randint(0, 2)
        ints = [str(rng.randint(0, 50)) for _ in range(13)]
        cats = [format(rng.randint(0, 1 << 32), "x") for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
    raw.write_text("\n".join(lines) + "\n")
    prefix = str(tmp_path / "proc")
    s = main([
        "--arch-embedding-size=" + "-".join(["64"] * 26),
        "--arch-mlp-bot=13-8-4", "--arch-mlp-top=355-8-1",
        "--arch-sparse-feature-size=4", "--data-generation=dataset",
        "--data-set=kaggle", f"--raw-data-file={raw}",
        f"--processed-data-file={prefix}", "--max-ind-range=64",
        "--data-randomize=day", "--mini-batch-size=8",
        "--loss-function=bce", "--round-targets=True", "--print-freq=10",
    ])
    assert 0.0 <= s["accuracy"] <= 1.0
    import os

    assert os.path.exists(f"{prefix}_day_count.npz")
    assert os.path.exists(f"{prefix}_day_0_reordered.npz")


def test_visualize_tables_pca(tmp_path):
    """Embedding visualization writes PNG + npz artifacts (SURVEY §2 #24)."""
    import numpy as np

    from dlrm_yx_tpu.tools.visualize import index_frequencies, visualize_tables

    rng = np.random.RandomState(0)
    tables = [rng.randn(80, 8).astype(np.float32) for _ in range(2)]
    freqs = [index_frequencies(rng.randint(0, 80, 500), 80) for _ in range(2)]
    out = visualize_tables(
        tables, str(tmp_path), max_rows=50, methods=("pca",),
        do_cluster=True, freqs=freqs,
    )
    import os

    assert any(k.endswith("_pca") for k in out)
    for path in out.values():
        assert os.path.getsize(path) > 0


def test_visualize_e2e_loader_frequencies_and_per_feature(tmp_path):
    """End-to-end CLI: train + checkpoint, then visualize with categorical
    frequencies driven from ACTUAL loader batches plus the reference's
    per-feature counts+norms figures (tools/visualize.py:259-316)."""
    import os

    from dlrm_yx_tpu.cli import main as cli_main
    from dlrm_yx_tpu.tools.visualize import main as viz_main

    sm = str(tmp_path / "ck")
    cli_main([
        "--arch-embedding-size=300-40-500", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=11-8-1", "--arch-sparse-feature-size=2",
        "--mini-batch-size=8", "--num-batches=4", "--loss-function=bce",
        "--round-targets=True", "--test-freq=4", f"--save-model={sm}",
    ])
    viz_dir = str(tmp_path / "viz")
    viz_main([
        f"--load-model={sm}", "--arch-embedding-size=300-40-500",
        "--arch-sparse-feature-size=2", "--arch-mlp-bot=4-8-2",
        "--arch-mlp-top=11-8-1", f"--output-dir={viz_dir}",
        "--freq-source=random", "--freq-batches=4", "--per-feature",
    ])
    files = os.listdir(viz_dir)
    assert any(f.startswith("cat_counts-") for f in files)
    assert any(f.endswith("_freq.png") for f in files)


def test_cli_load_processed_arch_from_table_configs(tmp_path):
    """--load-processed builds the model arch (rows + heterogeneous k*D
    dims + L_max) from table_configs.json with NO --arch-embedding-size,
    like the reference (dlrm_s_pytorch.py:1405-1441)."""
    from dlrm_yx_tpu.cli import main as cli_main
    from dlrm_yx_tpu.data.processed import main as proc_main

    out = str(tmp_path / "ds")
    # heterogeneous dims: 4 and 8 with base dim 4 -> k in {1, 2}
    proc_main([
        "--T", "3", "--m-den", "8", "--num-batches", "4",
        "--mini-batch-size", "8", "--row-range", "40,80",
        "--dim-range", "4,8", "--pooling-factor-range", "2,5",
        "--out-dir", out, "--seed", "3",
    ])
    cfgs, _ = load_processed(out)
    dims = [tc["dim"] for tc in cfgs["tables"]]
    assert len(set(dims)) > 1, "fixture should exercise heterogeneous dims"
    s = cli_main([
        f"--load-processed={out}",
        "--arch-mlp-bot=8-8-4", "--arch-mlp-top=8-1",
        "--arch-sparse-feature-size=4",
        "--mini-batch-size=8", "--print-freq=2", "--loss-function=bce",
        "--round-targets=True",
    ])
    assert 0.0 <= s["accuracy"] <= 1.0

    # arch really came from the json: rows and per-table dims
    from dlrm_yx_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        f"--load-processed={out}", "--arch-mlp-bot=8-8-4",
        "--arch-mlp-top=8-1", "--arch-sparse-feature-size=4",
    ])
    cfg = config_from_args(args)
    assert list(cfg.emb_rows) == [tc["row"] for tc in cfgs["tables"]]
    assert list(cfg.emb_dims) == dims

    # mismatched data.npz vs table_configs.json -> clean error
    import json

    with open(os.path.join(out, "table_configs.json")) as f:
        tc = json.load(f)
    tc["tables"] = tc["tables"][:2]
    for i, t in enumerate(tc["tables"]):
        t["index"] = i
    with open(os.path.join(out, "table_configs.json"), "w") as f:
        json.dump(tc, f)
    with pytest.raises(SystemExit):
        cli_main([
            f"--load-processed={out}",
            "--arch-mlp-bot=8-8-4", "--arch-mlp-top=8-1",
            "--arch-sparse-feature-size=4",
            "--mini-batch-size=8", "--loss-function=bce",
        ])


def test_cli_dataset_arch_from_counts(tmp_path):
    """Dataset mode derives table rows from the preprocessed feature counts
    clamped by --max-ind-range — no --arch-embedding-size needed, like the
    reference (dlrm_s_pytorch.py:1388-1400)."""
    import numpy as np

    from dlrm_yx_tpu.cli import build_parser, config_from_args, main

    rng = np.random.RandomState(1)
    raw = tmp_path / "train.txt"
    lines = []
    for _ in range(210):
        label = rng.randint(0, 2)
        ints = [str(rng.randint(0, 50)) for _ in range(13)]
        cats = [format(rng.randint(0, 300), "x") for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
    raw.write_text("\n".join(lines) + "\n")
    prefix = str(tmp_path / "proc")
    common = [
        "--arch-mlp-bot=13-4", "--arch-sparse-feature-size=4",
        "--arch-mlp-top=8-1", "--data-generation=dataset",
        "--data-set=kaggle", f"--raw-data-file={raw}",
        f"--processed-data-file={prefix}", "--max-ind-range=100",
        "--mini-batch-size=8", "--round-targets=True", "--print-freq=10",
    ]
    s = main(common)  # no --arch-embedding-size anywhere
    assert 0.0 <= s["accuracy"] <= 1.0
    cfg = config_from_args(build_parser().parse_args(common))
    assert len(cfg.emb_rows) == 26
    assert max(cfg.emb_rows) <= 100  # clamped
    assert min(cfg.emb_rows) > 1     # real counts, not the flag default
