"""The training driver: epoch/batch loop, eval, checkpointing, early stop.

Capability parity with the reference's ``run()`` hot loop and ``inference()``
(``/root/reference/dlrm_s_pytorch.py:1674-2117,1018-1162``):
  * per-iteration loss/ms-at-print-freq console output, TensorBoard scalars;
  * periodic eval with accuracy (+ full mlperf metric set when requested);
  * best-accuracy checkpoint save, load + skip-upto resume;
  * MLPerf early stopping on accuracy/AUC thresholds
    (--mlperf-acc-threshold / --mlperf-auc-threshold,
    dlrm_s_pytorch.py:2053-2083);
  * LR policy scheduling; warmup-excluded timing.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import init_dlrm, model_groups
from dlrm_yx_tpu.optim.lr_policy import LRPolicy
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.train.checkpoint import (
    load_checkpoint,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
    skip_position,
)
from dlrm_yx_tpu.train.metrics import StreamingAUC, binary_metrics
from dlrm_yx_tpu.train.train_step import (
    make_accum_train_step,
    make_eval_step,
    make_multistep_train_step,
    make_train_step,
)
from dlrm_yx_tpu.utils.logging import EventLogger, ScalarWriter, rank0_print
from dlrm_yx_tpu.utils.profiling import StepTimer


@dataclasses.dataclass
class TrainerConfig:
    nepochs: int = 1
    print_freq: int = 64
    test_freq: int = 0               # 0 = eval at epoch end only
    mlperf_logging: bool = False     # full metric set + mllog events
    mlperf_acc_threshold: float = 0.0
    mlperf_auc_threshold: float = 0.0
    save_path: str = ""              # checkpoint dir ("" = no saving)
    load_path: str = ""              # resume checkpoint dir
    tb_logdir: str = ""              # TensorBoard/JSONL scalars
    seed: int = 123
    ckpt_backend: str = "npz"        # npz (portable, host-gathered) |
                                     # orbax (sharded, multi-host-correct)
    grad_accum_iter: int = 1         # micro-batches per optimizer step
                                     # (--mlperf-grad-accum-iter)
    steps_per_dispatch: int = 0      # full optimizer steps per device
                                     # dispatch (lax.scan); 0 = auto-pick
                                     # the largest of 16/8/4/2/1 dividing
                                     # print_freq and test_freq. Hides
                                     # per-call dispatch latency; loss
                                     # sequence is identical to 1.
    prefetch_depth: int = 2          # host->device staging queue depth
                                     # (background-thread device_put);
                                     # 0 = prepare inline (debug)


def _auto_steps_per_dispatch(tcfg: "TrainerConfig") -> int:
    """Largest M in {16,8,4,2} that keeps print/eval boundaries exact
    (M divides print_freq and test_freq when they are set), else 1.
    An EXPLICIT steps_per_dispatch is honored, but crossing multiple
    print/eval boundaries inside one dispatch collapses them into one
    (eval/early-stop checks run less often) — warn loudly."""
    if tcfg.steps_per_dispatch > 0:
        m = tcfg.steps_per_dispatch
        for name, freq in (("print_freq", tcfg.print_freq),
                           ("test_freq", tcfg.test_freq)):
            if freq and freq % m:
                rank0_print(
                    f"WARNING: --steps-per-dispatch {m} does not divide "
                    f"{name} {freq}: boundaries inside one dispatch "
                    "collapse (eval/print/early-stop fire at most once "
                    "per dispatch)"
                )
        return m
    for m in (16, 8, 4, 2):
        if tcfg.print_freq and tcfg.print_freq % m:
            continue
        if tcfg.test_freq and tcfg.test_freq % m:
            continue
        return m
    return 1


def _prefetch_thread(gen, depth: int):
    """Run ``gen`` on a background thread into a bounded queue: the
    host-side batch stacking and the (blocking, round-trip-priced)
    device_put overlap the main thread's step dispatches — wall clock
    becomes max(device step, transfer) instead of their sum."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    stop = threading.Event()
    END = object()
    err: List[BaseException] = []

    def worker():
        try:
            for x in gen:
                while not stop.is_set():
                    try:
                        q.put(x, timeout=0.5)
                        break
                    except _queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the main thread
            err.append(e)
        finally:
            # the consumer may have stopped early (break / early stop /
            # exception) with the queue full — a blocking put would pin
            # this thread (and every staged device batch) forever
            while not stop.is_set():
                try:
                    q.put(END, timeout=0.5)
                    break
                except _queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is END:
                if err:
                    raise err[0]
                return
            yield x
    finally:
        stop.set()


def _group_microbatches(it, n):
    """Stack n consecutive Batches along a new leading axis (feeds
    make_accum_train_step); a trailing incomplete group is dropped, like
    the reference only stepping on every n-th mini-batch."""
    while True:
        group = []
        try:
            for _ in range(n):
                group.append(next(it))
        except StopIteration:
            return
        yield Batch(
            *[np.stack([np.asarray(getattr(b, f)) for b in group])
              for f in Batch._fields]
        )


class Trainer:
    def __init__(
        self,
        config: DLRMConfig,
        opt: OptConfig,
        tcfg: TrainerConfig,
        lr_policy: Optional[LRPolicy] = None,
        runner=None,
    ):
        """runner: optional parallel execution backend (e.g.
        parallel.hybrid.HybridRunner) providing params/opt_state,
        train_step/eval_step, prepare_batch and reshard; None = the
        single-device jitted path."""
        self.config = config
        self.opt = opt
        self.tcfg = tcfg
        self.groups = model_groups(config)
        lr_fn = lr_policy if lr_policy is not None else None
        self.runner = runner
        self.accum = max(1, tcfg.grad_accum_iter)
        if runner is not None and self.accum > 1:
            if getattr(runner, "n_accum", 1) != self.accum:
                raise ValueError(
                    f"runner was built with n_accum={getattr(runner, 'n_accum', 1)} "
                    f"but --mlperf-grad-accum-iter={self.accum}; pass n_accum "
                    "to the runner"
                )
        self.msteps = 1
        self.multi_step = None
        if runner is None:
            if self.accum > 1:
                self.train_step = make_accum_train_step(
                    config, opt, self.accum, lr_fn
                )
            else:
                self.train_step = make_train_step(config, opt, lr_fn)
                self.msteps = _auto_steps_per_dispatch(tcfg)
                if self.msteps > 1:
                    self.multi_step = make_multistep_train_step(
                        config, opt, self.msteps, lr_fn
                    )
            self.eval_step = make_eval_step(config)
            self.params = init_dlrm(config, seed=tcfg.seed)
            self.opt_state = init_opt_state(opt, self.params, self.groups)
            self._prepare = lambda b: Batch(*map(jnp.asarray, b))
        else:
            self.train_step = runner.train_step
            self.eval_step = runner.eval_step
            self.params = runner.params
            self.opt_state = runner.opt_state
            self._prepare = runner.prepare_batch
            if self.accum == 1 and hasattr(runner, "make_multi_step"):
                # mesh runners get the same scanned multi-step dispatch
                # (runner.prepare_batch already handles stacked batches
                # for the accumulation path — same sharded layout)
                self.msteps = _auto_steps_per_dispatch(tcfg)
                if self.msteps > 1:
                    self.multi_step = runner.make_multi_step(self.msteps)
        self.events = EventLogger() if tcfg.mlperf_logging else None
        self.writer = ScalarWriter(tcfg.tb_logdir) if tcfg.tb_logdir else None
        self.best_acc = 0.0
        self.best_auc = 0.0
        self.iteration = 0
        self.start_epoch = 0
        self.skip_batches = 0
        if tcfg.load_path:
            # validate the optimizer BEFORE unflattening: a cross-optimizer
            # resume would otherwise fail as an opaque leaf-count error, or
            # worse, succeed with misread accumulators
            meta_path = os.path.join(tcfg.load_path, "meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    ck_opt = json.load(f).get("optimizer")
                if ck_opt is not None and ck_opt != opt.name:
                    raise ValueError(
                        f"checkpoint {tcfg.load_path!r} carries {ck_opt} "
                        f"optimizer state but the run is configured with "
                        f"--optimizer {opt.name} — pass --optimizer {ck_opt} "
                        "(resuming across optimizers would silently misread "
                        "the accumulators)"
                    )
            if tcfg.ckpt_backend == "orbax":
                # restores each host's shards in place — no reshard needed
                self.params, self.opt_state, meta = load_checkpoint_orbax(
                    tcfg.load_path, self.params, self.opt_state
                )
            else:
                self.params, self.opt_state, meta = load_checkpoint(
                    tcfg.load_path, self.params, self.opt_state
                )
                if runner is not None:
                    self.params, self.opt_state = runner.reshard(
                        self.params, self.opt_state
                    )
            self.best_acc = meta["metrics"].get("accuracy", 0.0)
            self.iteration = meta["iteration"]
            self._resume_meta = meta
            rank0_print(
                f"Resumed checkpoint at epoch {meta['epoch']} "
                f"iteration {meta['iteration']}"
            )

    # ------------------------------------------------------------------ eval

    @staticmethod
    def _fetch(arr):
        """Host value of a possibly cross-process jax.Array: eval preds come
        back sharded over the whole ("data","model") mesh, which spans
        processes under jax.distributed — gather the global value on every
        host (the reference's ext_dist.all_gather of eval outputs,
        dlrm_s_pytorch.py:1067-1069)."""
        if getattr(arr, "is_fully_addressable", True):
            return arr
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(arr, tiled=True)

    def evaluate(self, test_batches: Iterable[Batch]) -> dict:
        """inference() equivalent: streams eval batches, returns metric dict.
        With mlperf_logging: full recall/precision/f1/ap/roc_auc/accuracy
        (dlrm_s_pytorch.py:1088-1118); else rounded-prediction accuracy."""
        if self.events:
            self.events.log_start("eval_start")
        scores: List[np.ndarray] = []
        targets: List[np.ndarray] = []
        sauc = StreamingAUC()
        n_correct = 0
        n_total = 0
        for b in test_batches:
            preds, _ = self.eval_step(self.params, self._prepare(b))
            p = np.asarray(self._fetch(preds)).ravel()
            t = np.asarray(b.labels).ravel()
            n_correct += int(((p >= 0.5) == (t > 0.5)).sum())
            n_total += len(t)
            sauc.add(p, t)
            if self.tcfg.mlperf_logging:
                scores.append(p)
                targets.append(t)
        if self.tcfg.mlperf_logging and scores:
            metrics = binary_metrics(np.concatenate(scores), np.concatenate(targets))
        else:
            metrics = {"accuracy": n_correct / max(n_total, 1)}
        metrics["streaming_auc"] = sauc.auc()
        if self.events:
            self.events.log_event("eval_accuracy", metrics.get("accuracy"))
            if "roc_auc" in metrics:
                self.events.log_event("eval_auc", metrics["roc_auc"])
            self.events.log_end("eval_stop")
        return metrics

    # ----------------------------------------------------------------- train

    def fit(
        self,
        train_batches,
        test_batches: Optional[Callable[[], Iterable[Batch]]] = None,
    ) -> dict:
        """train_batches: a sequence (or factory of iterables) of Batch.
        test_batches: zero-arg callable returning an eval iterable.
        Returns final metric summary. Early-stops when mlperf thresholds are
        hit (dlrm_s_pytorch.py:2053-2083)."""
        tcfg = self.tcfg
        if self.events:
            self.events.log_start("init_start")
            self.events.log_event("seed", tcfg.seed)
            self.events.log_end("init_stop")
            self.events.log_start("run_start")
        nbatches = len(train_batches) if hasattr(train_batches, "__len__") else 0
        if tcfg.load_path and nbatches:
            self.start_epoch, self.skip_batches = skip_position(
                self._resume_meta, nbatches
            )
        import time as _time

        pending: List = []  # device losses; fetched only at print boundaries
        pending_n = 0       # iterations the pending losses cover
        stop = False
        summary = {}
        for epoch in range(self.start_epoch, tcfg.nepochs):
            epoch_timer = StepTimer(warmup_iters=max(1, tcfg.print_freq))
            if self.events:
                self.events.log_start("epoch_start", {"epoch_num": epoch})
            if epoch > 0 and hasattr(train_batches, "reshuffle"):
                # --mlperf-bin-shuffle: new batch-order permutation per
                # epoch (dlrm_data_pytorch.py:383-398)
                train_batches.reshuffle(epoch)
            it_source = iter(
                train_batches() if callable(train_batches) else train_batches
            )
            if self.accum > 1:
                it_source = _group_microbatches(it_source, self.accum)

            def drain():
                """Fetch pending device losses and record their span in the
                epoch timer — called at EVERY chain boundary (print, eval,
                epoch end) so tail/partial blocks count in the average."""
                nonlocal pending, pending_n
                if not pending:
                    return []
                losses = [
                    float(v) for x in pending for v in np.ravel(np.asarray(x))
                ]
                span = _time.perf_counter() - span_t0
                for _ in range(pending_n):
                    epoch_timer.times.append(span / pending_n)
                pending = []
                pending_n = 0
                return losses

            def host_stream():
                j = -1
                for nb in it_source:
                    j += 1
                    if epoch == self.start_epoch and j < self.skip_batches:
                        continue
                    yield nb

            def dispatch_stream():
                """Yields (device_batch, n_iters, use_multi). With a
                multi-step: M host batches stack into ONE H2D transfer and
                one scanned dispatch; the tail (<M) runs single steps."""
                src = host_stream()
                if self.multi_step is not None:
                    group = []
                    for nb in src:
                        group.append(nb)
                        if len(group) == self.msteps:
                            stacked = Batch(*[
                                np.stack([
                                    np.asarray(getattr(b, f)) for b in group
                                ])
                                for f in Batch._fields
                            ])
                            yield self._prepare(stacked), self.msteps, True
                            group = []
                    for nb in group:
                        yield self._prepare(nb), 1, False
                else:
                    for nb in src:
                        yield self._prepare(nb), 1, False

            # the dispatch stream (host batch assembly + the blocking H2D
            # device_put) runs on a background thread so transfers overlap
            # step dispatches (the reference relies on DataLoader worker
            # prefetch + non-blocking H2D, dlrm_s_pytorch.py:1845-1876;
            # per-step blocking would serialize the ~30 ms relay round
            # trip with compute)
            stream = dispatch_stream()
            if tcfg.prefetch_depth > 0:
                stream = _prefetch_thread(stream, tcfg.prefetch_depth)
            for dev_b, n_it, use_multi in stream:
                if not pending:
                    span_t0 = _time.perf_counter()
                step_fn = self.multi_step if use_multi else self.train_step
                self.params, self.opt_state, loss = step_fn(
                    self.params, self.opt_state, dev_b, self.iteration
                )
                pending.append(loss)
                pending_n += n_it
                prev_it = self.iteration
                self.iteration += n_it

                if tcfg.print_freq and (
                    self.iteration // tcfg.print_freq
                    > prev_it // tcfg.print_freq
                ):
                    # warmup-excluded per-iter bookkeeping (the reference's
                    # CUDA-event epoch average, dlrm_s_pytorch.py:1966-1988)
                    losses = drain()
                    ms = epoch_timer.times[-1] * 1e3
                    avg_loss = sum(losses) / max(len(losses), 1)
                    rank0_print(
                        f"Finished training it {self.iteration} of epoch "
                        f"{epoch}, {ms:.2f} ms/it, loss {avg_loss:.6f}"
                    )
                    if self.writer:
                        self.writer.add_scalar("Train/Loss", avg_loss, self.iteration)

                if (
                    test_batches is not None
                    and tcfg.test_freq
                    and (
                        self.iteration // tcfg.test_freq
                        > prev_it // tcfg.test_freq
                    )
                ):
                    drain()
                    stop, summary = self._run_eval(test_batches, epoch)
                    if stop:
                        break
            drain()
            if epoch_timer.times:
                # exposed for harnesses (e.g. bench/fullloop_bench.py):
                # the steady-state ms/it, compile/warmup excluded — wall /
                # n_steps over a short run is dominated by the one-off
                # compile and misleads
                self.last_epoch_ms_per_it = epoch_timer.mean_ms()
                rank0_print(
                    f"Epoch {epoch} average: {epoch_timer.mean_ms():.2f} "
                    "ms/it (warmup excluded)"
                )
            if self.events:
                self.events.log_end("epoch_stop", {"epoch_num": epoch})
            if stop:
                break
            if test_batches is not None and not tcfg.test_freq:
                stop, summary = self._run_eval(test_batches, epoch)
                if stop:
                    break
        if self.events:
            self.events.log_end("run_stop")
        return summary

    def _run_eval(self, test_batches, epoch: int):
        metrics = self.evaluate(test_batches())
        acc = metrics.get("accuracy", 0.0)
        auc = metrics.get("roc_auc", metrics.get("streaming_auc", 0.0))
        is_best = acc > self.best_acc
        if is_best:
            self.best_acc = acc
        self.best_auc = max(self.best_auc, auc if np.isfinite(auc) else 0.0)
        rank0_print(
            f"Testing at it {self.iteration} of epoch {epoch}: "
            f"accuracy {100*acc:.3f}%, best {100*self.best_acc:.3f}%"
        )
        if self.writer:
            self.writer.add_scalar("Test/Acc", acc, self.iteration)
            for k, v in metrics.items():
                if k != "accuracy" and np.isfinite(v):
                    self.writer.add_scalar(f"mlperf-metrics-test/{k}", v, self.iteration)
        if is_best and self.tcfg.save_path:
            save_fn = (
                save_checkpoint_orbax
                if self.tcfg.ckpt_backend == "orbax"
                else save_checkpoint
            )
            save_fn(
                self.tcfg.save_path, self.params, self.opt_state,
                epoch=epoch, iteration=self.iteration, metrics=metrics,
                optimizer=self.opt.name,
            )
            rank0_print(f"Saved best checkpoint to {self.tcfg.save_path}")
        stop = False
        if (
            self.tcfg.mlperf_acc_threshold > 0
            and self.best_acc > self.tcfg.mlperf_acc_threshold
        ):
            rank0_print(
                f"MLPerf testing accuracy threshold "
                f"{self.tcfg.mlperf_acc_threshold} reached, stop training"
            )
            stop = True
        if (
            self.tcfg.mlperf_auc_threshold > 0
            and self.best_auc > self.tcfg.mlperf_auc_threshold
        ):
            rank0_print(
                f"MLPerf testing AUC threshold "
                f"{self.tcfg.mlperf_auc_threshold} reached, stop training"
            )
            stop = True
        return stop, metrics
