"""Bidirectional converter for the reference's PyTorch checkpoints.

The reference publishes pretrained models and saves training checkpoints as
one ``torch.save`` dict (``/root/reference/dlrm_s_pytorch.py:1123-1129,
2025-2038``): counters + metrics + ``state_dict`` (+ ``opt_state_dict``),
restored by ``--load-model`` (``:1698-1755``). A user migrating from the
reference needs to carry trained models across — both ways:

- **import**: reference ``.pt`` -> this framework's checkpoint directory
  (``train/checkpoint.py`` npz format), directly loadable with
  ``--load-model <dir>`` — params, optimizer accumulators (adagrad /
  rwsadagrad), and the epoch/iteration/metric counters (so skip-upto
  resume semantics carry over).
- **export**: a checkpoint directory (or in-memory params) -> a reference-
  compatible ``.pt`` whose ``state_dict`` the reference's ``DLRM_Net``
  loads verbatim (inference or continued training there).

State-dict key map (reference module registration order,
``dlrm_s_pytorch.py:469-480,495-496``):

    emb_l.{t}.weight                     regular EmbeddingBag [n, d]
    emb_l.{t}.weight_q / .weight_r       QREmbeddingBag (tricks/qr_embedding_bag.py:139-140)
    emb_l.{t}.embs.weight [, .proj.weight]  PrEmbeddingBag (tricks/md_embedding_bag.py:63-77)
    v_W_l.{t}                            learned per-sample weights [n]
    bot_l.{2j}.weight / .bias            torch Linear [out, in] — TRANSPOSED
    top_l.{2j}.weight / .bias            to/from this framework's [in, out]

Embedding rows are re-laid into the flat per-dim-group stores (packed
[R/pack, 128] for sub-128 dims) that the TPU kernels run on; the converter
is the only place the two layouts meet.
"""

from __future__ import annotations

import argparse
from typing import Dict, List, Optional, Tuple

import numpy as np

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.models.dlrm import model_groups, qr_specs
from dlrm_yx_tpu.ops.embedding import pack_store, unpack_store
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state


def _np(x) -> np.ndarray:
    """torch tensor / array -> float32-preserving numpy (no torch import
    needed at call sites; duck-typed via .detach or asarray)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _emb_table_from_sd(sd: Dict, t: int) -> np.ndarray:
    """One regular table's [n, d] rows, whichever module form saved them.

    With --md-flag the reference wraps every table with rows >
    md_threshold in PrEmbeddingBag even when its solved dim equals the
    base dim (proj = Identity, dlrm_s_pytorch.py:291-299) — such tables
    are plain tables here, so accept ``embs.weight`` too.
    """
    for key in (f"emb_l.{t}.weight", f"emb_l.{t}.embs.weight"):
        if key in sd:
            return _np(sd[key]).astype(np.float32)
    raise KeyError(
        f"table {t}: neither emb_l.{t}.weight nor emb_l.{t}.embs.weight "
        "in state_dict — arch flags do not match the checkpoint"
    )


def _layer_indices(sd: Dict, prefix: str) -> List[int]:
    """Sorted nn.Sequential indices of the Linear layers under a prefix
    (Linears sit at even slots, interleaved with ReLU/Sigmoid)."""
    return sorted(
        int(k.split(".")[1])
        for k in sd
        if k.startswith(prefix + ".") and k.endswith(".weight")
    )


def _md_wrapped_ids(config: DLRMConfig) -> set:
    """Tables the reference wraps in PrEmbeddingBag (key emb_l.{t}.embs.*):
    md_flag and rows > md_threshold — INCLUDING tables whose solved dim
    equals the base dim (proj = Identity) — unless QR wrapped them first
    (QR takes precedence, dlrm_s_pytorch.py:282-299)."""
    if not config.md_flag:
        return set()
    qr = set(config.qr_table_ids)
    return {
        t
        for t, n in enumerate(config.emb_rows)
        if n > config.md_threshold and t not in qr
    }


def _mlp_from_sd(sd: Dict, prefix: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    out = []
    for i in _layer_indices(sd, prefix):
        w = _np(sd[f"{prefix}.{i}.weight"]).astype(np.float32)
        b = _np(sd[f"{prefix}.{i}.bias"]).astype(np.float32)
        out.append((w.T.copy(), b))  # [out,in] -> [in,out] (MXU layout)
    return out


def params_from_state_dict(sd: Dict, config: DLRMConfig) -> Dict:
    """Reference ``state_dict`` -> this framework's params pytree
    (same structure as ``models.dlrm.init_dlrm``)."""
    import jax.numpy as jnp

    groups = model_groups(config)
    specs = qr_specs(config)
    emb = []
    for g in groups:
        store = np.zeros((g.total_rows, g.dim), dtype=np.float32)
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            tbl = _emb_table_from_sd(sd, tid)
            if tbl.shape != (n, g.dim):
                raise ValueError(
                    f"table {tid}: checkpoint shape {tbl.shape} != "
                    f"config shape {(n, g.dim)}"
                )
            store[off : off + n] = tbl
        emb.append(
            jnp.asarray(pack_store(store, g)).astype(jnp.dtype(config.emb_dtype))
        )
    params: Dict = {
        "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in _mlp_from_sd(sd, "bot_l")],
        "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in _mlp_from_sd(sd, "top_l")],
        "emb": emb,
        "vw": None,
    }
    exp_bot = len(config.ln_bot) - 1
    exp_top = len(config.ln_top) - 1
    if len(params["bot"]) != exp_bot or len(params["top"]) != exp_top:
        raise ValueError(
            f"MLP depth mismatch: checkpoint bot/top "
            f"{len(params['bot'])}/{len(params['top'])} vs config {exp_bot}/{exp_top}"
        )
    if config.weighted_pooling is not None:
        vw = []
        for g in groups:
            v = np.zeros((g.total_rows,), dtype=np.float32)
            for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
                key = f"v_W_l.{tid}"
                # learned weights are saved Parameters; fixed mode keeps
                # plain (unregistered) ones-tensors -> re-init to ones
                v[off : off + n] = (
                    _np(sd[key]).astype(np.float32) if key in sd else 1.0
                )
            vw.append(jnp.asarray(v))
        params["vw"] = vw
    if specs:
        params["qr"] = [
            (
                jnp.asarray(_np(sd[f"emb_l.{s.table_id}.weight_q"]).astype(np.float32)),
                jnp.asarray(_np(sd[f"emb_l.{s.table_id}.weight_r"]).astype(np.float32)),
            )
            for s in specs
        ]
    if config.md_table_ids:
        params["md_proj"] = [
            jnp.asarray(
                _np(sd[f"emb_l.{t}.proj.weight"]).astype(np.float32).T.copy()
            )
            for t in config.md_table_ids
        ]
    return params


def state_dict_from_params(params: Dict, config: DLRMConfig) -> Dict[str, np.ndarray]:
    """This framework's params -> a reference-compatible ``state_dict``
    (numpy values; pass through ``torch.tensor`` at save time)."""
    groups = model_groups(config)
    specs = qr_specs(config)
    sd: Dict[str, np.ndarray] = {}
    md_ids = _md_wrapped_ids(config)
    for g, store in zip(groups, params["emb"]):
        rows = np.asarray(unpack_store(store, g), dtype=np.float32)
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            key = (
                f"emb_l.{tid}.embs.weight" if tid in md_ids else f"emb_l.{tid}.weight"
            )
            sd[key] = rows[off : off + n]
    for s, (q, r) in zip(specs, params.get("qr", [])):
        sd[f"emb_l.{s.table_id}.weight_q"] = np.asarray(q, dtype=np.float32)
        sd[f"emb_l.{s.table_id}.weight_r"] = np.asarray(r, dtype=np.float32)
    for t, w in zip(config.md_table_ids, params.get("md_proj", [])):
        sd[f"emb_l.{t}.proj.weight"] = np.asarray(w, dtype=np.float32).T.copy()
    if config.weighted_pooling == "learned" and params.get("vw") is not None:
        for g, v in zip(groups, params["vw"]):
            flat = np.asarray(v, dtype=np.float32)
            for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
                sd[f"v_W_l.{tid}"] = flat[off : off + n]
    for name, key in (("bot", "bot_l"), ("top", "top_l")):
        for j, (w, b) in enumerate(params[name]):
            sd[f"{key}.{2 * j}.weight"] = np.asarray(w, dtype=np.float32).T.copy()
            sd[f"{key}.{2 * j}.bias"] = np.asarray(b, dtype=np.float32)
    return sd


# --------------------------------------------------------------- optimizer


def _torch_param_order(sd: Dict, config: DLRMConfig) -> List[str]:
    """state_dict keys in the reference's ``dlrm.parameters()`` order
    (module registration order: emb_l, v_W_l [learned], bot_l, top_l —
    dlrm_s_pytorch.py:469-480,495-496). torch's ``Optimizer.state_dict``
    indexes params by this order."""
    order: List[str] = []
    for t in range(len(config.emb_rows)):
        for suffix in ("weight", "weight_q", "weight_r", "embs.weight", "proj.weight"):
            key = f"emb_l.{t}.{suffix}"
            if key in sd:
                order.append(key)
    if config.weighted_pooling == "learned":
        order.extend(k for k in (f"v_W_l.{t}" for t in range(len(config.emb_rows))) if k in sd)
    for prefix in ("bot_l", "top_l"):
        for i in _layer_indices(sd, prefix):
            order.append(f"{prefix}.{i}.weight")
            order.append(f"{prefix}.{i}.bias")
    return order


def opt_state_from_torch(
    opt_sd: Optional[Dict],
    sd: Dict,
    config: DLRMConfig,
    opt: OptConfig,
    params: Dict,
) -> Dict:
    """Map a torch optimizer ``state_dict`` onto this framework's
    accumulator pytree. adagrad: per-element ``sum``; rwsadagrad: per-row
    ``momentum`` for sparse tables + ``sum`` for dense
    (optim/rwsadagrad.py:74-86 there). Missing/sgd state -> fresh zeros."""
    import jax.numpy as jnp

    groups = model_groups(config)
    state = init_opt_state(opt, params, groups)
    if not opt_sd or opt.name == "sgd":
        return state
    order = _torch_param_order(sd, config)
    # torch: param ids are consecutive across param_groups in order
    ids: List[int] = []
    for pg in opt_sd.get("param_groups", []):
        ids.extend(pg["params"])
    by_key: Dict[str, Dict] = {}
    for idx, key in zip(ids, order):
        if idx in opt_sd.get("state", {}):
            by_key[key] = opt_sd["state"][idx]
    if len(ids) != len(order):
        raise ValueError(
            f"optimizer state has {len(ids)} params but the arch expects "
            f"{len(order)} — checkpoint/arch mismatch"
        )
    # Guard the silent-zero trap: a rwsadagrad-trained checkpoint stores
    # row 'momentum' (no 'sum') for sparse tables — importing it as adagrad
    # would quietly restart every embedding denominator at zero.
    if opt.name == "adagrad":
        mom_only = [
            k
            for k in by_key
            if k.startswith("emb_l.")
            and "momentum" in by_key[k]
            and "sum" not in by_key[k]
        ]
        if mom_only:
            raise ValueError(
                f"{len(mom_only)} embedding tables carry row-wise "
                "'momentum' (a rwsadagrad checkpoint) but --optimizer "
                "adagrad was requested; import with --optimizer rwsadagrad "
                "(the row momenta cannot reconstruct per-element sums)"
            )

    def acc_of(key: str, want_row_wise: bool) -> Optional[np.ndarray]:
        st = by_key.get(key)
        if st is None:
            return None
        field = "momentum" if (want_row_wise and "momentum" in st) else "sum"
        if field not in st:
            return None
        return _np(st[field]).astype(np.float32)

    row_wise = opt.name == "rwsadagrad"
    # embedding stores
    from dlrm_yx_tpu.optim.optimizer import acc_len

    emb_acc = []
    for g, init_acc in zip(groups, state["emb"]):
        acc = np.zeros(
            (acc_len(g.total_rows),) if row_wise
            else (g.total_rows, g.dim), np.float32
        )
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            key = (
                f"emb_l.{tid}.embs.weight"
                if f"emb_l.{tid}.embs.weight" in sd
                else f"emb_l.{tid}.weight"
            )
            a = acc_of(key, row_wise)
            if a is None:
                continue
            if row_wise and a.ndim == 2:  # rwsadagrad saw only dense grads
                a = a.mean(axis=1)
            acc[off : off + n] = a
        emb_acc.append(
            jnp.asarray(acc if row_wise else pack_store(acc, g))
        )
    state["emb"] = emb_acc
    # dense towers ([out,in] -> [in,out])
    for name, prefix in (("bot", "bot_l"), ("top", "top_l")):
        tower = []
        for j, (zw, zb) in enumerate(state["dense"][name]):
            aw = acc_of(f"{prefix}.{2 * j}.weight", False)
            ab = acc_of(f"{prefix}.{2 * j}.bias", False)
            tower.append(
                (
                    jnp.asarray(aw.T.copy()) if aw is not None else zw,
                    jnp.asarray(ab) if ab is not None else zb,
                )
            )
        state["dense"][name] = tower
    if "qr" in state:
        qr_acc = []
        for s, (zq, zr) in zip(qr_specs(config), state["qr"]):
            aq = acc_of(f"emb_l.{s.table_id}.weight_q", row_wise)
            ar = acc_of(f"emb_l.{s.table_id}.weight_r", row_wise)
            if row_wise:
                if aq is not None and aq.ndim == 2:
                    aq = aq.mean(axis=1)
                if ar is not None and ar.ndim == 2:
                    ar = ar.mean(axis=1)
            qr_acc.append(
                (
                    jnp.asarray(aq) if aq is not None else zq,
                    jnp.asarray(ar) if ar is not None else zr,
                )
            )
        state["qr"] = qr_acc
    if "md_proj" in state:
        mp = []
        for t, z in zip(config.md_table_ids, state["md_proj"]):
            a = acc_of(f"emb_l.{t}.proj.weight", False)
            mp.append(jnp.asarray(a.T.copy()) if a is not None else z)
        state["md_proj"] = mp
    if "vw" in state and config.weighted_pooling == "learned":
        vw_acc = []
        for g, z in zip(groups, state["vw"]):
            acc = np.zeros((g.total_rows,), np.float32)
            hit = False
            for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
                a = acc_of(f"v_W_l.{tid}", False)
                if a is not None:
                    acc[off : off + n] = a
                    hit = True
            vw_acc.append(jnp.asarray(acc) if hit else z)
        state["vw"] = vw_acc
    return state


def torch_opt_state_from_ours(
    opt_state: Dict,
    sd: Dict,
    config: DLRMConfig,
    opt: OptConfig,
    step: int = 0,
) -> Dict:
    """This framework's accumulator pytree -> a torch ``Optimizer.state_dict``
    the reference's single-process run loads (one param group, like its
    single-device ``dlrm.parameters()`` construction,
    dlrm_s_pytorch.py:1645-1648). sgd/adagrad groups come from real torch
    optimizers over shape-matched dummies (version-proof hyperparameter
    keys); rwsadagrad groups mirror optim/rwsadagrad.py's defaults."""
    import torch

    order = _torch_param_order(sd, config)
    groups = model_groups(config)
    if opt.name in ("sgd", "adagrad"):
        dummies = [
            torch.zeros(tuple(np.asarray(sd[k]).shape), requires_grad=True)
            for k in order
        ]
        cls = torch.optim.SGD if opt.name == "sgd" else torch.optim.Adagrad
        osd = cls(dummies, lr=opt.lr).state_dict()
    else:  # rwsadagrad: group keys per the reference's RWSAdagrad.__init__
        osd = {
            "state": {},
            "param_groups": [
                {
                    "lr": opt.lr,
                    "lr_decay": 0.0,
                    "weight_decay": 0.0,
                    "eps": opt.eps,
                    "params": list(range(len(order))),
                }
            ],
        }
    if opt.name == "sgd":
        return osd  # plain SGD holds no per-param state

    row_wise = opt.name == "rwsadagrad"
    md_ids = _md_wrapped_ids(config)
    emb_key = {}
    for g, acc in zip(groups, opt_state["emb"]):
        acc_np = np.asarray(acc, dtype=np.float32)
        if not row_wise:
            acc_np = unpack_store(acc_np, g)
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            k = (
                f"emb_l.{tid}.embs.weight" if tid in md_ids else f"emb_l.{tid}.weight"
            )
            emb_key[k] = acc_np[off : off + n]
    for s, (aq, ar) in zip(qr_specs(config), opt_state.get("qr", [])):
        emb_key[f"emb_l.{s.table_id}.weight_q"] = np.asarray(aq, np.float32)
        emb_key[f"emb_l.{s.table_id}.weight_r"] = np.asarray(ar, np.float32)
    dense_key = {}
    for t, a in zip(config.md_table_ids, opt_state.get("md_proj", [])):
        dense_key[f"emb_l.{t}.proj.weight"] = np.asarray(a, np.float32).T.copy()
    if config.weighted_pooling == "learned" and opt_state.get("vw") is not None:
        for g, a in zip(groups, opt_state["vw"]):
            flat = np.asarray(a, np.float32)
            for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
                dense_key[f"v_W_l.{tid}"] = flat[off : off + n]
    for name, prefix in (("bot", "bot_l"), ("top", "top_l")):
        for j, (aw, ab) in enumerate(opt_state["dense"][name]):
            dense_key[f"{prefix}.{2 * j}.weight"] = np.asarray(aw, np.float32).T.copy()
            dense_key[f"{prefix}.{2 * j}.bias"] = np.asarray(ab, np.float32)
    state = {}
    for idx, key in enumerate(order):
        if key in emb_key:
            field = "momentum" if row_wise else "sum"
            state[idx] = {"step": int(step), field: torch.tensor(emb_key[key])}
        elif key in dense_key:
            state[idx] = {"step": int(step), "sum": torch.tensor(dense_key[key])}
        elif idx in osd["state"]:  # keep the dummy-optimizer zeros
            state[idx] = osd["state"][idx]
    osd["state"] = state
    return osd


# --------------------------------------------------------------- top level


def import_torch_checkpoint(
    pt_path: str,
    config: DLRMConfig,
    out_dir: str,
    opt: Optional[OptConfig] = None,
) -> Dict:
    """Reference ``.pt`` -> checkpoint directory loadable by
    ``--load-model`` here. Returns the meta dict written."""
    import torch

    from dlrm_yx_tpu.train.checkpoint import save_checkpoint

    ld = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = ld["state_dict"] if "state_dict" in ld else ld
    params = params_from_state_dict(sd, config)
    opt = opt or OptConfig(name="sgd")
    opt_state = opt_state_from_torch(ld.get("opt_state_dict"), sd, config, opt, params)
    metrics = {}
    if "test_acc" in ld:
        metrics["accuracy"] = float(ld["test_acc"])
    if "test_auc" in ld:
        metrics["roc_auc"] = float(ld["test_auc"])
    save_checkpoint(
        out_dir,
        params,
        opt_state,
        epoch=int(ld.get("epoch", 0)),
        iteration=int(ld.get("iter", 0)),
        train_loss=float(ld.get("train_loss", 0.0)),
        metrics=metrics,
        optimizer=opt.name,
    )
    return {
        "epoch": int(ld.get("epoch", 0)),
        "iteration": int(ld.get("iter", 0)),
        "metrics": metrics,
    }


def export_torch_checkpoint(
    out_path: str,
    config: DLRMConfig,
    params: Dict,
    *,
    opt_state: Optional[Dict] = None,
    opt: Optional[OptConfig] = None,
    meta: Optional[Dict] = None,
    nbatches: int = 0,
    nbatches_test: int = 0,
) -> None:
    """Params (+ optimizer state) -> a ``.pt`` the reference's
    ``--load-model`` accepts. Its loader reads ``opt_state_dict``
    unconditionally unless --inference-only (dlrm_s_pytorch.py:1729), so
    one is always written — carried accumulators when ``opt_state``/``opt``
    are given, a fresh zero-state otherwise. Targets the reference's
    single-process optimizer construction (one param group); its multi-rank
    mode builds 3 groups and needs a re-partitioned state_dict."""
    import torch

    meta = meta or {}
    np_sd = state_dict_from_params(params, config)
    sd = {k: torch.tensor(v) for k, v in np_sd.items()}
    opt = opt or OptConfig(name="sgd")
    osd = torch_opt_state_from_ours(
        opt_state if opt_state is not None else init_opt_state(
            opt, params, model_groups(config)
        ),
        np_sd,
        config,
        opt,
        step=int(meta.get("iteration", 0)),
    )
    torch.save(
        {
            "epoch": int(meta.get("epoch", 0)),
            "iter": int(meta.get("iteration", 0)),
            "nepochs": int(meta.get("nepochs", 1)),
            "nbatches": int(nbatches),
            "nbatches_test": int(nbatches_test),
            "state_dict": sd,
            "opt_state_dict": osd,
            "train_loss": float(meta.get("train_loss", 0.0)),
            "total_loss": float(meta.get("total_loss", 0.0)),
            "test_acc": float(meta.get("metrics", {}).get("accuracy", 0.0)),
            **(
                {"test_auc": float(meta["metrics"]["roc_auc"])}
                if meta.get("metrics", {}).get("roc_auc") is not None
                else {}
            ),
        },
        out_path,
    )


def main(argv=None):
    # Host-side tool: everything lands in npz/pt files on disk — run on the
    # CPU backend so conversion works without (or while waiting on) the TPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dlrm_yx_tpu.cli import build_parser, config_from_args

    p = argparse.ArgumentParser(
        prog="python -m dlrm_yx_tpu.tools.torch_ckpt",
        description="Convert checkpoints between the reference's torch .pt "
        "format and this framework's checkpoint directories. Arch flags "
        "(--arch-*, --qr-*, --md-*, --max-ind-range, --weighted-pooling) "
        "must match the model the checkpoint was trained with and pass "
        "through to the trainer's parser.",
        add_help=False,
    )
    p.add_argument("--import-pt", type=str, default="", metavar="FILE.pt",
                   help="reference .pt -> --ckpt-dir (loadable by --load-model here)")
    p.add_argument("--export-pt", type=str, default="", metavar="FILE.pt",
                   help="--ckpt-dir -> reference-compatible .pt")
    p.add_argument("--ckpt-dir", type=str, default="",
                   help="this framework's checkpoint directory (required)")
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adagrad", "rwsadagrad"],
                   help="optimizer whose accumulators to convert")
    p.add_argument("--learning-rate", type=float, default=0.1)
    argv_list = list(argv) if argv is not None else None
    import sys as _sys

    probe = argv_list if argv_list is not None else _sys.argv[1:]
    if "-h" in probe or "--help" in probe:
        print(p.format_help())
        print("All trainer arch/model flags are also accepted "
              "(python -m dlrm_yx_tpu.cli --help for the full list).")
        raise SystemExit(0)
    args, rest = p.parse_known_args(argv_list)
    if not args.ckpt_dir:
        raise SystemExit("--ckpt-dir is required")
    arch = build_parser().parse_args(rest + ["--data-generation", "random"])
    cfg = config_from_args(arch)
    if arch.max_ind_range > 0:
        # the reference clamps table rows to --max-ind-range
        # (dlrm_s_pytorch.py:1390-1398); the published Terabyte checkpoints
        # were trained with the clamped counts
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg,
            emb_rows=tuple(min(n, arch.max_ind_range) for n in cfg.emb_rows),
        )
    if bool(args.import_pt) == bool(args.export_pt):
        raise SystemExit("pass exactly one of --import-pt / --export-pt")
    if args.import_pt:
        meta = import_torch_checkpoint(
            args.import_pt, cfg, args.ckpt_dir,
            OptConfig(name=args.optimizer, lr=args.learning_rate),
        )
        print(f"imported {args.import_pt} -> {args.ckpt_dir} (meta {meta})")
    else:
        from dlrm_yx_tpu.models.dlrm import init_dlrm
        from dlrm_yx_tpu.train.checkpoint import load_checkpoint

        opt = OptConfig(name=args.optimizer, lr=args.learning_rate)
        like_p = init_dlrm(cfg, seed=0)
        like_s = init_opt_state(opt, like_p, model_groups(cfg))
        params, opt_state, meta = load_checkpoint(args.ckpt_dir, like_p, like_s)
        ck_opt = meta.get("optimizer")
        if ck_opt is not None and ck_opt != opt.name:
            raise SystemExit(
                f"checkpoint {args.ckpt_dir!r} carries {ck_opt} state; "
                f"pass --optimizer {ck_opt}"
            )
        export_torch_checkpoint(
            args.export_pt, cfg, params, opt_state=opt_state, opt=opt, meta=meta
        )
        print(f"exported {args.ckpt_dir} -> {args.export_pt}")


if __name__ == "__main__":
    main()
