"""Command-line entry point.

Flag-for-flag capability parity with the reference CLI
(``/root/reference/dlrm_s_pytorch.py:1166-1299``, ~90 argparse flags): the
same names and semantics, mapped onto this framework's config dataclasses.
GPU/device flags translate to TPU equivalents (--use-tpu, mesh shape);
flags tied to torch internals (e.g. --sync-dense-params) are accepted and
noted as no-ops where XLA subsumes them.

Usage examples (mirror README.md of the reference):
  python -m dlrm_yx_tpu.cli --mini-batch-size=2 --data-size=6 --debug-mode
  python -m dlrm_yx_tpu.cli --arch-embedding-size=4-3-2 --arch-mlp-bot=4-3-2 \
      --arch-mlp-top=4-2-1 --data-generation=random --mini-batch-size=2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from dlrm_yx_tpu.config import DLRMConfig, parse_int_list
from dlrm_yx_tpu.optim.lr_policy import LRPolicy
from dlrm_yx_tpu.optim.optimizer import OptConfig
from dlrm_yx_tpu.train.trainer import Trainer, TrainerConfig
from dlrm_yx_tpu.utils.logging import rank0_print


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train a Deep Learning Recommendation Model (DLRM) on TPU"
    )
    # model arch
    p.add_argument("--arch-sparse-feature-size", type=int, default=2)
    p.add_argument("--arch-embedding-size", type=str, default="4-3-2")
    p.add_argument("--arch-mlp-bot", type=str, default="4-3-2")
    p.add_argument("--arch-mlp-top", type=str, default="4-2-1")
    p.add_argument("--arch-interaction-op", type=str, choices=["dot", "cat"], default="dot")
    p.add_argument("--arch-interaction-itself", action="store_true", default=False)
    p.add_argument("--weighted-pooling", type=str, default=None)
    # embedding compression
    p.add_argument("--md-flag", action="store_true", default=False)
    p.add_argument("--md-threshold", type=int, default=200)
    p.add_argument("--md-temperature", type=float, default=0.3)
    p.add_argument("--md-round-dims", action="store_true", default=False)
    p.add_argument("--qr-flag", action="store_true", default=False)
    p.add_argument("--qr-threshold", type=int, default=200)
    p.add_argument("--qr-operation", type=str, default="mult")
    p.add_argument("--qr-collisions", type=int, default=4)
    # activations and loss
    p.add_argument("--activation-function", type=str, default="relu")
    p.add_argument("--loss-function", type=str, default="mse")  # or bce or wbce
    p.add_argument("--loss-weights", type=str, default="1.0-1.0")  # for wbce
    p.add_argument("--loss-threshold", type=float, default=0.0)  # 1.0e-7
    p.add_argument("--round-targets", type=bool, default=False)
    # data
    p.add_argument("--data-size", type=int, default=1)
    p.add_argument("--num-batches", type=int, default=0)
    p.add_argument(
        "--data-generation", type=str, default="random",
        help="random | random-device | synthetic | dataset | processed "
             "(random-device samples batches in HBM with jax.random — no "
             "host link traffic; use for synthetic benchmarks)",
    )
    p.add_argument("--rand-data-dist", type=str, default="uniform")  # uniform or gaussian
    p.add_argument("--rand-data-min", type=float, default=0)
    p.add_argument("--rand-data-max", type=float, default=1)
    p.add_argument("--rand-data-mu", type=float, default=-1)
    p.add_argument("--rand-data-sigma", type=float, default=1)
    p.add_argument("--data-trace-file", type=str, default="./input/dist_emb_j.log")
    p.add_argument("--data-set", type=str, default="kaggle")  # or terabyte
    p.add_argument("--raw-data-file", type=str, default="")
    p.add_argument("--processed-data-file", type=str, default="")
    p.add_argument("--load-processed", type=str, default="")
    p.add_argument("--data-randomize", type=str, default="total")  # none, day or total
    p.add_argument("--data-trace-enable-padding", type=bool, default=False)
    p.add_argument("--max-ind-range", type=int, default=-1)
    p.add_argument("--data-sub-sample-rate", type=float, default=0.0)
    p.add_argument("--num-indices-per-lookup", type=int, default=10)
    p.add_argument("--num-indices-per-lookup-fixed", type=bool, default=False)
    p.add_argument("--num-workers", type=int, default=0)
    p.add_argument("--memory-map", action="store_true", default=False)
    p.add_argument("--mlperf-bin-loader", action="store_true", default=False)
    p.add_argument("--mlperf-bin-shuffle", action="store_true", default=False)
    # training
    p.add_argument("--mini-batch-size", type=int, default=1)
    p.add_argument("--nepochs", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--print-precision", type=int, default=5)
    p.add_argument("--numpy-rand-seed", type=int, default=123)
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adagrad", "rwsadagrad"])
    p.add_argument(
        "--dataset-multiprocessing", action="store_true", default=False,
        help="Criteo preprocessing parallelization (vectorized here)",
    )
    # parallelism (TPU mesh replaces GPU flags)
    p.add_argument("--use-tpu", action="store_true", default=False)
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="simulate N virtual CPU devices (mesh dry-runs on "
                        "hosts without a pod; must be set before any jax "
                        "use, so it only works via the CLI entry)")
    p.add_argument("--use-gpu", action="store_true", default=False,
                   help="accepted for compat; implies --use-tpu semantics")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="join a multi-process world via jax.distributed "
                        "before building the mesh (reads COORDINATOR_ADDRESS/"
                        "NUM_PROCESSES/PROCESS_ID or torchrun-style RANK/"
                        "WORLD_SIZE envs; auto-enabled when "
                        "COORDINATOR_ADDRESS is set — the launcher story of "
                        "the reference's torchrun/mpirun recipe, "
                        "README.md:340-348 there)")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel mesh axis size")
    p.add_argument("--mesh-model", type=int, default=0,
                   help="model-parallel (table-sharding) axis size; 0 = all devices")
    p.add_argument("--shard-mode", type=str, default="table",
                   choices=["table", "row", "col"],
                   help="embedding sharding over 'model': whole tables "
                        "(reference parity), row slices, or column slices")
    p.add_argument("--sharder", type=str, default="naive",
                   help="naive | naive_chunk | greedy | hardcode | input")
    p.add_argument("--allocation", type=str, default="",
                   help="comma/dash-separated table->device ids for --sharder=input")
    p.add_argument("--lookup-impl", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="accepted for compat; the fused DMA lookup kernel "
                        "was removed after losing to the XLA gather at "
                        "every measured (L, D) — both values use XLA "
                        "(MEASUREMENTS.md crossover table)")
    p.add_argument("--sparse-update-impl", type=str, default="xla",
                   choices=["xla", "pallas", "stream"],
                   help="pallas = row-RMW kernel for big-table updates "
                        "(ops/pallas_sparse_update.py); stream = pallas "
                        "plus the sorted-run streaming kernel in the "
                        "dense/high-L regime (ops/pallas_stream_update.py: "
                        "in-place, wins on duplicate-heavy index streams)")
    p.add_argument("--interaction-impl", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="pallas = fused dot-interaction kernel "
                        "(ops/pallas_interaction.py): bmm + tril extract "
                        "+ dense concat in one streamed pass, no "
                        "transposed operand copies (D%%128==0 only)")
    p.add_argument("--exact-row-momentum", action="store_true", default=False,
                   help="pre-coalesce duplicate rows before the pallas "
                        "kernel so adagrad-family momentum matches the "
                        "reference's grad.coalesce() exactly (costs a sort)")
    p.add_argument("--no-write-only-update", action="store_true",
                   default=False,
                   help="force the row-RMW kernel instead of the write-only "
                        "sparse update (ablation/debug)")
    p.add_argument("--emb-split-threshold", type=int, default=65536,
                   help="tables with more rows get their own group stores "
                        "(kernel-updated); 0 disables splitting")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--stochastic-rounding", action="store_true", default=False)
    p.add_argument("--emb-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="table storage dtype; bfloat16 halves HBM (fbgemm "
                        "fp16-weights parity)")
    # debugging and profiling
    p.add_argument("--debug-mode", action="store_true", default=False)
    p.add_argument("--enable-profiling", action="store_true", default=False)
    p.add_argument("--profile-out-dir", type=str, default="/tmp/dlrm_tpu_trace")
    p.add_argument("--plot-compute-graph", action="store_true", default=False)
    p.add_argument("--tensor-board-filename", type=str, default="")
    # store/load model
    p.add_argument("--save-model", type=str, default="")
    p.add_argument("--load-model", type=str, default="")
    p.add_argument("--ckpt-backend", type=str, default="npz",
                   choices=["npz", "orbax"],
                   help="npz: portable single-file; orbax: sharded, "
                        "multi-host-correct")
    # mlperf
    p.add_argument("--inference-only", action="store_true", default=False)
    p.add_argument("--save-onnx", action="store_true", default=False)
    p.add_argument("--mlperf-logging", action="store_true", default=False)
    p.add_argument("--mlperf-acc-threshold", type=float, default=0.0)
    p.add_argument("--mlperf-auc-threshold", type=float, default=0.0)
    p.add_argument("--mlperf-grad-accum-iter", type=int, default=1)
    # quantize
    p.add_argument("--quantize-mlp-with-bit", type=int, default=32)
    p.add_argument("--quantize-emb-with-bit", type=int, default=32)
    # lr policy
    p.add_argument("--lr-num-warmup-steps", type=int, default=0)
    p.add_argument("--lr-decay-start-step", type=int, default=0)
    p.add_argument("--lr-num-decay-steps", type=int, default=0)
    # reference-compat flags accepted as no-ops: the TPU runtime/XLA subsumes
    # them (backend pick, DDP buckets, pinned memory, loader workers) or the
    # storage is always table-batched here (--batched-emb/--fbgemm-emb)
    p.add_argument("--batched-emb", action="store_true", default=False)
    p.add_argument("--fbgemm-emb", action="store_true", default=False)
    p.add_argument("--sync-dense-params", type=bool, default=True)
    p.add_argument("--bucket-size-mb", type=int, default=25)
    p.add_argument("--dist-backend", type=str, default="")
    p.add_argument("--local-rank", type=int, default=-1)
    p.add_argument("--pin-memory", action="store_true", default=False)
    p.add_argument("--early-barrier", action="store_true", default=False)
    p.add_argument("--aggregated-allreduce", action="store_true", default=False)
    p.add_argument("--test-num-workers", type=int, default=-1)
    # the reference's execution-graph flag (ExecutionGraphObserver,
    # dlrm_s_pytorch.py:1810-1814) = our compute-graph dump
    p.add_argument("--collect-execution-graph", action="store_true",
                   default=False)
    # gating / reporting
    p.add_argument("--print-freq", type=int, default=1)
    p.add_argument("--test-freq", type=int, default=-1)
    # dispatch-latency hiding (no reference analog: torch streams hide it)
    p.add_argument(
        "--steps-per-dispatch", type=int, default=0,
        help="full optimizer steps fused into one device dispatch via "
        "lax.scan (0 = auto: largest of 16/8/4/2 dividing print/test freq)",
    )
    p.add_argument(
        "--prefetch-depth", type=int, default=2,
        help="host->device staging queue depth (0 = synchronous)",
    )
    p.add_argument("--test-mini-batch-size", type=int, default=-1)
    p.add_argument("--print-time", action="store_true", default=False)
    p.add_argument("--print-wall-time", action="store_true", default=False)
    return p


def config_from_args(args) -> DLRMConfig:
    if args.load_processed:
        # --load-processed drives the model arch from the dataset's
        # table_configs.json — rows AND per-table heterogeneous dims (k*D
        # mixes through the split trick; sub-D dims through the MD
        # up-projection when --md-flag is on), so the user never
        # hand-duplicates the arch in --arch-embedding-size (the reference
        # builds ln_emb/m_spa the same way, dlrm_s_pytorch.py:1405-1441).
        from dlrm_yx_tpu.data.processed import load_table_configs

        tcs = load_table_configs(args.load_processed)["tables"]
        rows = [int(tc["row"]) for tc in tcs]
        dims = tuple(int(tc["dim"]) for tc in tcs)
        return DLRMConfig.build(
            emb_rows=rows,
            emb_dims=dims,
            ln_bot=parse_int_list(args.arch_mlp_bot),
            ln_top=parse_int_list(args.arch_mlp_top),
            qr_flag=args.qr_flag,
            qr_threshold=args.qr_threshold,
            qr_collisions=args.qr_collisions,
            qr_operation=args.qr_operation,
            md_flag=args.md_flag,
            md_threshold=args.md_threshold,
            interaction=args.arch_interaction_op,
            interact_itself=args.arch_interaction_itself,
            loss=args.loss_function,
            loss_threshold=args.loss_threshold,
            wbce_weights=tuple(float(x) for x in args.loss_weights.split("-")),
            weighted_pooling=args.weighted_pooling,
            compute_dtype=args.compute_dtype,
            emb_dtype=args.emb_dtype,
            stochastic_rounding=args.stochastic_rounding,
            lookup_impl=args.lookup_impl,
            sparse_update_impl=args.sparse_update_impl,
            interaction_impl=args.interaction_impl,
            exact_row_momentum=args.exact_row_momentum,
            emb_split_threshold=args.emb_split_threshold,
        )
    rows = parse_int_list(args.arch_embedding_size)
    if args.data_generation == "dataset":
        # dataset mode derives table sizes from the preprocessed feature
        # counts, clamped to --max-ind-range — NOT from
        # --arch-embedding-size (dlrm_s_pytorch.py:1388-1400). Preprocesses
        # raw data on first touch so the counts exist; falls back to the
        # arch flag only when no dataset files are reachable.
        if not args.mlperf_bin_loader:
            # (bin runs point --raw-data-file at train.bin; their counts
            # npz, when present, sits at the same day-file prefix)
            ensure_preprocessed(args)
        prefix = args.processed_data_file or args.raw_data_file
        cf = f"{prefix}_fea_count.npz" if prefix else ""
        if cf and os.path.exists(cf):
            flag_rows = rows
            with np.load(cf) as d:
                rows = [int(n) for n in d["counts"]]
            if args.max_ind_range > 0:
                rows = [min(n, args.max_ind_range) for n in rows]
            if flag_rows not in ([], rows) and "--arch-embedding-size" in (
                sys.argv
            ):
                rank0_print(
                    f"note: dataset feature counts override "
                    f"--arch-embedding-size ({len(rows)} tables from {cf})"
                )
    emb_dims = (args.arch_sparse_feature_size,) * len(rows)
    if args.md_flag:
        from dlrm_yx_tpu.ops.md_embedding import md_solver

        md_dims = md_solver(
            np.array(rows), args.md_temperature,
            d0=args.arch_sparse_feature_size,
            round_dim=args.md_round_dims,
        ).tolist()
        # MD dims apply only above the threshold; smaller tables keep the
        # base dim (dlrm_s_pytorch.py:291-293)
        emb_dims = tuple(
            int(md_dims[i]) if rows[i] > args.md_threshold
            else args.arch_sparse_feature_size
            for i in range(len(rows))
        )
    return DLRMConfig.build(
        emb_rows=rows,
        emb_dims=() if not args.md_flag else emb_dims,
        ln_bot=parse_int_list(args.arch_mlp_bot),
        ln_top=parse_int_list(args.arch_mlp_top),
        qr_flag=args.qr_flag,
        qr_threshold=args.qr_threshold,
        qr_collisions=args.qr_collisions,
        qr_operation=args.qr_operation,
        md_flag=args.md_flag,
        md_threshold=args.md_threshold,
        interaction=args.arch_interaction_op,
        interact_itself=args.arch_interaction_itself,
        loss=args.loss_function,
        loss_threshold=args.loss_threshold,
        wbce_weights=tuple(float(x) for x in args.loss_weights.split("-")),
        weighted_pooling=args.weighted_pooling,
        compute_dtype=args.compute_dtype,
        emb_dtype=args.emb_dtype,
        stochastic_rounding=args.stochastic_rounding,
        lookup_impl=args.lookup_impl,
        sparse_update_impl=args.sparse_update_impl,
        interaction_impl=args.interaction_impl,
        exact_row_momentum=args.exact_row_momentum,
        write_only_update=not args.no_write_only_update,
        emb_split_threshold=args.emb_split_threshold,
    )


def ensure_preprocessed(args) -> None:
    """Preprocess raw Criteo TSV on first touch, like the reference
    (CriteoDataset.__init__ -> getCriteoAdData, SURVEY.md §3.6).
    Idempotent; called before the model arch is built so the feature
    counts exist for config_from_args' dataset-mode row derivation."""
    prefix = args.processed_data_file or args.raw_data_file
    if not prefix or os.path.exists(f"{prefix}_day_count.npz"):
        return
    if not args.raw_data_file or not os.path.exists(args.raw_data_file):
        return
    from dlrm_yx_tpu.data.criteo import (
        preprocess_criteo,
        split_kaggle_train_txt,
    )

    days = 7 if args.data_set == "kaggle" else 24
    rank0_print(f"preprocessing {args.raw_data_file} -> {prefix} ...")
    day_files = split_kaggle_train_txt(args.raw_data_file, days)
    info = preprocess_criteo(
        day_files, prefix,
        max_ind_range=args.max_ind_range,
        sub_sample_rate=args.data_sub_sample_rate,
        randomize=args.data_randomize,
        seed=args.numpy_rand_seed,
        nprocs=(os.cpu_count() or 1) if args.dataset_multiprocessing else 1,
    )
    rank0_print(f"preprocess stage seconds: {info['stage_seconds']}")


def make_data(args, cfg):
    from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches

    if args.data_generation == "processed" or args.load_processed:
        # --load-processed overrides --data-generation (which defaults to
        # "random"): the pre-generated batches ARE the dataset, like the
        # reference's make_processed_data_and_loader dispatch
        # (dlrm_s_pytorch.py:1405-1414)
        from dlrm_yx_tpu.data.processed import load_processed

        tc, batches = load_processed(args.load_processed)
        if batches and batches[0].indices.shape[0] != cfg.num_tables:
            sys.exit(
                f"ERROR: processed data has {batches[0].indices.shape[0]} "
                f"tables but the model was built with {cfg.num_tables} "
                "(table_configs.json and data.npz disagree)"
            )
        tc_rows = tuple(int(t["row"]) for t in tc["tables"])
        if tuple(cfg.emb_rows) != tc_rows:
            sys.exit(
                f"ERROR: model table rows {tuple(cfg.emb_rows)} != "
                f"table_configs.json rows {tc_rows} — a stale or "
                "hand-specified --arch-embedding-size would silently clamp "
                "out-of-range indices; rebuild the arch from the dataset "
                "(omit --arch-embedding-size with --load-processed)"
            )
        return batches, (lambda: batches)
    if args.data_generation == "random":
        nb = args.num_batches or int(np.ceil(args.data_size / args.mini_batch_size))
        dc = RandomDataConfig(
            emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0],
            mini_batch_size=args.mini_batch_size, num_batches=nb,
            num_indices_per_lookup=args.num_indices_per_lookup,
            num_indices_per_lookup_fixed=args.num_indices_per_lookup_fixed,
            dist=args.rand_data_dist,
            rand_data_min=args.rand_data_min, rand_data_max=args.rand_data_max,
            rand_data_mu=args.rand_data_mu, rand_data_sigma=args.rand_data_sigma,
            round_targets=bool(args.round_targets), seed=args.numpy_rand_seed,
        )
        train = make_random_batches(dc)
        test = make_random_batches(dc, seed=args.numpy_rand_seed + 1)
        return train, (lambda: test)
    if args.data_generation == "random-device":
        from dlrm_yx_tpu.data.synthetic import make_device_random_batches

        nb = args.num_batches or int(np.ceil(args.data_size / args.mini_batch_size))
        train = make_device_random_batches(
            cfg.emb_rows, cfg.ln_bot[0], args.mini_batch_size, nb,
            args.num_indices_per_lookup, args.num_indices_per_lookup_fixed,
            bool(args.round_targets), args.numpy_rand_seed,
        )
        test = make_device_random_batches(
            cfg.emb_rows, cfg.ln_bot[0], args.mini_batch_size, nb,
            args.num_indices_per_lookup, args.num_indices_per_lookup_fixed,
            bool(args.round_targets), args.numpy_rand_seed + 1,
        )
        return train, (lambda: test)
    if args.data_generation == "synthetic":
        from dlrm_yx_tpu.data.trace import make_trace_batches

        nb = args.num_batches or int(np.ceil(args.data_size / args.mini_batch_size))
        train = make_trace_batches(
            args.data_trace_file, cfg.emb_rows, cfg.ln_bot[0],
            args.mini_batch_size, nb, args.num_indices_per_lookup,
            args.num_indices_per_lookup_fixed, seed=args.numpy_rand_seed,
            enable_padding=args.data_trace_enable_padding,
        )
        return train, (lambda: train)
    if args.data_generation == "dataset":
        if args.mlperf_bin_loader:
            from dlrm_yx_tpu.data.criteo_bin import CriteoBinLoader

            train = CriteoBinLoader(
                args.raw_data_file, args.processed_data_file or None,
                batch_size=args.mini_batch_size,
                max_ind_range=args.max_ind_range,
                shuffle_seed=(
                    args.numpy_rand_seed if args.mlperf_bin_shuffle else None
                ),
            )
            return train, (lambda: train)
        from dlrm_yx_tpu.data.criteo import CriteoNpzLoader

        days = 7 if args.data_set == "kaggle" else 24
        prefix = args.processed_data_file or args.raw_data_file
        ensure_preprocessed(args)
        train = CriteoNpzLoader(
            prefix, days, args.mini_batch_size, split="train",
            max_ind_range=args.max_ind_range, memory_map=args.memory_map,
        )
        tb = args.test_mini_batch_size if args.test_mini_batch_size > 0 else args.mini_batch_size
        test = CriteoNpzLoader(
            prefix, days, tb, split="test", max_ind_range=args.max_ind_range,
            memory_map=args.memory_map,
        )
        return train, (lambda: test)
    sys.exit(f"ERROR: --data-generation={args.data_generation} is not supported")


def _measure_dup_density(cfg, train):
    """Unique-rows-per-occurrence of the big (kernel-eligible) tables on
    the FIRST batch — the measured statistic that drives the
    dense-vs-kernel update routing (config.dup_density_hint). Returns None
    when unmeasurable (no host-side first batch, no big tables)."""
    try:
        b0 = train[0] if hasattr(train, "__getitem__") else next(iter(train))
    except Exception:
        return None
    idx = np.asarray(b0.indices)  # [T, B, L]
    thr = cfg.emb_split_threshold or 0
    big = [t for t, n in enumerate(cfg.emb_rows) if not thr or n > thr]
    if not big:
        return None
    uniq = sum(len(np.unique(idx[t])) for t in big)
    total = len(big) * idx.shape[1] * idx.shape[2]
    return max(1e-3, min(1.0, uniq / max(total, 1)))


def debug_print_model(cfg, params, precision=5):
    """--debug-mode: print arch and initial params (the reference's golden
    printout, dlrm_s_pytorch.py:1519-1571)."""
    np.set_printoptions(precision=precision)
    print("model arch:")
    print(
        f"mlp top arch {len(cfg.ln_top)-1} layers, with input to output "
        f"dimensions: {np.array(cfg.ln_top)}"
    )
    print(f"# of interactions: {cfg.num_interactions}")
    print(
        f"mlp bot arch {len(cfg.ln_bot)-1} layers, with input to output "
        f"dimensions: {np.array(cfg.ln_bot)}"
    )
    print(f"# of features (sparse and dense): {cfg.num_features}")
    print(f"dense feature size: {cfg.ln_bot[0]}")
    print(f"sparse feature size: {cfg.base_dim}")
    print(
        f"# of embeddings (= # of sparse features) {cfg.num_tables}, with "
        f"dimensions {cfg.base_dim}x: {np.array(cfg.emb_rows)}"
    )
    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.ops.embedding import unpack_store

    groups = model_groups(cfg)
    print("initial parameters (weights and bias):")
    for k in ("emb", "bot", "top"):
        for i, item in enumerate(params[k]):
            if k == "emb":
                print(np.asarray(unpack_store(item, groups[i])))
            else:
                print(np.asarray(item[0]).T)
                print(np.asarray(item[1]))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.force_cpu_devices:
        # env vars are overridden by this environment's TPU plugin
        # registration; jax.config works when applied before first use
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.force_cpu_devices)
        except RuntimeError:
            # backends already initialized (an in-process driver invoked
            # main() more than once): accept iff the world already matches
            if (
                jax.default_backend() != "cpu"
                or jax.device_count() < args.force_cpu_devices
            ):
                raise
    if args.distributed or os.environ.get("COORDINATOR_ADDRESS"):
        from dlrm_yx_tpu.parallel.multihost import init_multihost

        pid, num = init_multihost()
        if num > 1:
            import jax

            rank0_print(
                f"multihost: process {pid}/{num}, "
                f"{jax.device_count()} global devices"
            )
    np.random.seed(args.numpy_rand_seed)
    cfg = config_from_args(args)
    opt = OptConfig(name=args.optimizer, lr=args.learning_rate)
    lr_policy = None
    if args.lr_num_warmup_steps or args.lr_num_decay_steps:
        lr_policy = LRPolicy(
            base_lr=args.learning_rate,
            num_warmup_steps=args.lr_num_warmup_steps,
            decay_start_step=args.lr_decay_start_step,
            num_decay_steps=args.lr_num_decay_steps,
        )
    tcfg = TrainerConfig(
        nepochs=args.nepochs,
        print_freq=args.print_freq,
        test_freq=max(args.test_freq, 0),
        mlperf_logging=args.mlperf_logging,
        mlperf_acc_threshold=args.mlperf_acc_threshold,
        mlperf_auc_threshold=args.mlperf_auc_threshold,
        save_path=args.save_model,
        load_path=args.load_model,
        ckpt_backend=args.ckpt_backend,
        grad_accum_iter=args.mlperf_grad_accum_iter,
        steps_per_dispatch=args.steps_per_dispatch,
        prefetch_depth=args.prefetch_depth,
        tb_logdir=args.tensor_board_filename,
        seed=args.numpy_rand_seed,
    )
    train, test = make_data(args, cfg)
    if (
        cfg.sparse_update_impl in ("pallas", "stream")
        and cfg.dup_density_hint <= 0
    ):
        hint = _measure_dup_density(cfg, train)
        if hint is not None:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, dup_density_hint=hint)
            rank0_print(
                f"duplicate-density hint from first batch: {hint:.3f} "
                "unique rows per occurrence (drives the dense-vs-kernel "
                "update crossover)"
            )

    runner = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        if args.shard_mode == "row":
            from dlrm_yx_tpu.parallel.row_sharded import RowShardedRunner

            runner = RowShardedRunner(
                cfg, opt, data=args.mesh_data,
                model=args.mesh_model or None, lr_fn=lr_policy,
                seed=args.numpy_rand_seed,
                n_accum=max(1, args.mlperf_grad_accum_iter),
            )
        elif args.shard_mode == "col":
            from dlrm_yx_tpu.parallel.col_sharded import ColShardedRunner

            runner = ColShardedRunner(
                cfg, opt, data=args.mesh_data,
                model=args.mesh_model or None, lr_fn=lr_policy,
                seed=args.numpy_rand_seed,
                n_accum=max(1, args.mlperf_grad_accum_iter),
            )
        else:
            from dlrm_yx_tpu.parallel.hybrid import HybridRunner

            allocation = (
                [int(x) for x in args.allocation.replace(",", "-").split("-")]
                if args.allocation
                else None
            )
            runner = HybridRunner(
                cfg, opt,
                data=args.mesh_data,
                model=args.mesh_model or None,
                sharder=args.sharder,
                allocation=allocation,
                lr_fn=lr_policy,
                seed=args.numpy_rand_seed,
                n_accum=max(1, args.mlperf_grad_accum_iter),
            )
        rank0_print(
            f"{args.shard_mode}-sharded mesh {dict(runner.mesh.shape)}"
            + (f", sharder={args.sharder}" if args.shard_mode == "table" else "")
        )
    trainer = Trainer(cfg, opt, tcfg, lr_policy, runner=runner)

    if args.debug_mode:
        debug_print_model(cfg, trainer.params, args.print_precision)

    if args.inference_only:
        if args.quantize_emb_with_bit in (4, 8) or args.quantize_mlp_with_bit in (8, 16):
            metrics = _quantized_inference(args, cfg, trainer, test())
        else:
            metrics = trainer.evaluate(test())
        rank0_print("inference metrics:", metrics)
        return metrics

    if args.plot_compute_graph or args.collect_execution_graph:
        from dlrm_yx_tpu.export import collect_execution_graph
        from dlrm_yx_tpu.train.train_step import make_train_step as _mts

        b0 = trainer._prepare(train[0] if hasattr(train, "__getitem__") else next(iter(train)))
        if runner is None:
            arts = collect_execution_graph(
                _mts(cfg, opt, jit=False),
                (trainer.params, trainer.opt_state, b0, 0),
                args.profile_out_dir, "train_step",
            )
        else:
            # sharded step: dump the lowered (pre-SPMD-partitioning) module
            import os as _os

            _os.makedirs(args.profile_out_dir, exist_ok=True)
            lowered = trainer.train_step.lower(
                trainer.params, trainer.opt_state, b0, 0
            )
            path = _os.path.join(args.profile_out_dir, "hybrid_step.stablehlo.txt")
            with open(path, "w") as f:
                f.write(lowered.as_text())
            arts = {"stablehlo": path}
        rank0_print(f"execution graph artifacts: {arts}")

    t0 = time.time()
    if args.enable_profiling:
        from dlrm_yx_tpu.utils.profiling import trace

        with trace(args.profile_out_dir):
            summary = trainer.fit(train, test)
        rank0_print(f"profiler trace written to {args.profile_out_dir}")
    else:
        summary = trainer.fit(train, test)
    if args.print_wall_time:
        rank0_print(f"Total wall time: {time.time()-t0:.2f} s")

    if args.debug_mode:
        print("updated parameters (weights and bias):")
        debug_print_model(cfg, trainer.params, args.print_precision)

    if args.save_onnx:
        # TPU-native analog of the reference's ONNX export
        # (dlrm_s_pytorch.py:2137-2248): serialize the inference forward as
        # a portable StableHLO artifact next to the checkpoint
        from dlrm_yx_tpu.data.batch import Batch as _B
        from dlrm_yx_tpu.export import export_inference

        if runner is not None:
            rank0_print("--save-onnx: export uses the single-device forward")
        b0 = train[0] if hasattr(train, "__getitem__") else next(iter(train))
        out = (args.save_model or ".") + "/dlrm_tpu.stablehlo"
        import os as _os

        _os.makedirs(args.save_model or ".", exist_ok=True)
        export_inference(
            trainer.params if runner is None else _gather_params(cfg, trainer),
            cfg, _B(*map(np.asarray, b0)), out,
        )
        rank0_print(f"saved StableHLO model to {out}")
    return summary


def _gather_params(cfg, trainer):
    """Canonical (unsharded, single-device-layout) params from a mesh
    runner, for export / quantized inference.

    Uses ``trainer.params`` — the CURRENT pytree (the runner's initial
    buffers were donated to the first train step) — and dispatches table
    extraction per runner type. Stores are re-assembled with
    ``model_groups(cfg)`` so the group layout (emb_split_threshold,
    QR-excluded tables) matches the single-device forward exactly."""
    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.parallel.col_sharded import (
        ColShardPlan,
        extract_col_sharded_tables,
    )
    from dlrm_yx_tpu.parallel.row_sharded import (
        RowShardPlan,
        extract_row_sharded_tables,
    )

    if cfg.qr_table_ids or cfg.md_table_ids or cfg.weighted_pooling:
        raise NotImplementedError(
            "canonical export from a mesh runner supports plain tables only "
            "(QR/MD/weighted-pooling variants: train single-device or "
            "export from a checkpoint)"
        )
    import jax

    runner = trainer.runner
    plan = runner.plan
    emb = np.asarray(trainer.params["emb"])
    if isinstance(plan, RowShardPlan):
        es = trainer.params.get("emb_small")
        tables = extract_row_sharded_tables(
            plan, emb, np.asarray(es) if es is not None else None
        )
    elif isinstance(plan, ColShardPlan):
        es = trainer.params.get("emb_small")
        tables = extract_col_sharded_tables(
            plan, emb, np.asarray(es) if es is not None else None
        )
    else:
        from dlrm_yx_tpu.parallel.plan import extract_tables

        tables = extract_tables(
            plan, cfg, emb, np.asarray(trainer.params["emb_small"])
        )
    import jax.numpy as _jnp

    params = {
        "bot": jax.tree.map(np.asarray, trainer.params["bot"]),
        "top": jax.tree.map(np.asarray, trainer.params["top"]),
        "emb": [],
        "vw": None,
    }
    from dlrm_yx_tpu.ops.embedding import pack_store

    for g in model_groups(cfg):
        store = np.zeros((g.total_rows, g.dim), np.float32)
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            store[off : off + n] = tables[tid][:n]
        params["emb"].append(_jnp.asarray(pack_store(store, g)))
    return params


def _quantized_inference(args, cfg, trainer, test_batches):
    """--inference-only with --quantize-emb-with-bit / --quantize-mlp-with-bit
    (dlrm_s_pytorch.py:549-576,1757-1781)."""
    from dlrm_yx_tpu.models.dlrm import model_groups
    from dlrm_yx_tpu.ops.quantized import (
        make_fully_quantized_eval_step,
        quantize_mlp,
        quantize_model_embeddings,
    )

    groups = model_groups(cfg)
    # mesh runners hold SHARDED stores ([n_model, r_pad, dim] etc.) — gather
    # the canonical single-device layout before quantizing; treating the
    # sharded array as a per-group store list would index garbage
    params = (
        trainer.params if trainer.runner is None else _gather_params(cfg, trainer)
    )
    qstores = quantize_model_embeddings(
        params, groups,
        args.quantize_emb_with_bit if args.quantize_emb_with_bit in (4, 8) else 8,
    )
    qbot = qtop = None
    if args.quantize_mlp_with_bit in (8, 16):
        mode = "int8" if args.quantize_mlp_with_bit == 8 else "fp16"
        qbot = quantize_mlp(params["bot"], mode)
        qtop = quantize_mlp(params["top"], mode)
    ev = make_fully_quantized_eval_step(cfg, groups, qstores, qbot, qtop)
    import jax.numpy as _jnp

    from dlrm_yx_tpu.data.batch import Batch as _B

    n_correct = n_total = 0
    for b in test_batches:
        preds = np.asarray(ev(params, _B(*map(_jnp.asarray, b)))).ravel()
        t = np.asarray(b.labels).ravel()
        n_correct += int(((preds >= 0.5) == (t > 0.5)).sum())
        n_total += len(t)
    return {"accuracy": n_correct / max(n_total, 1), "quantized": True}


if __name__ == "__main__":
    main()
