"""Torch-checkpoint converter tests (tools/torch_ckpt.py).

Differential: a reference-shaped torch model (module names / tensor layouts
exactly as dlrm_s_pytorch.py saves them) is trained a few steps with a real
torch optimizer, saved with torch.save, imported — and the imported params
must produce the same forward output as the torch model, with optimizer
accumulators carried over. Plus a full round-trip back to a state_dict.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.models.dlrm import forward, init_dlrm, model_groups
from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
from dlrm_yx_tpu.tools.torch_ckpt import (
    import_torch_checkpoint,
    opt_state_from_torch,
    params_from_state_dict,
    state_dict_from_params,
)
from dlrm_yx_tpu.train.checkpoint import load_checkpoint

ROWS = [40, 25, 60]
DIM = 8
LN_BOT = "4-8"
LN_TOP = "14-6-1"
B, L = 6, 3


def tiny_cfg(**kw):
    return DLRMConfig.build(
        emb_rows=ROWS,
        emb_dims=(DIM,) * len(ROWS),
        ln_bot=[4, 8],
        ln_top=[14, 6, 1],
        **kw,
    )


class RefShapedDLRM(torch.nn.Module):
    """Module tree named exactly as the reference's DLRM_Net state_dict:
    emb_l.{t}.weight, bot_l.{2j}.weight/bias, top_l.{2j}.weight/bias."""

    def __init__(self, rows, dim, ln_bot, ln_top, seed=3):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.emb_l = torch.nn.ModuleList()
        for n in rows:
            e = torch.nn.EmbeddingBag(n, dim, mode="sum", sparse=True)
            with torch.no_grad():
                e.weight.uniform_(-0.05, 0.05, generator=g)
            self.emb_l.append(e)

        def mlp(ln, sigmoid_last):
            layers = []
            for i in range(len(ln) - 1):
                lin = torch.nn.Linear(ln[i], ln[i + 1])
                with torch.no_grad():
                    lin.weight.uniform_(-0.2, 0.2, generator=g)
                    lin.bias.uniform_(-0.1, 0.1, generator=g)
                layers.append(lin)
                layers.append(
                    torch.nn.Sigmoid()
                    if (sigmoid_last and i == len(ln) - 2)
                    else torch.nn.ReLU()
                )
            return torch.nn.Sequential(*layers)

        self.bot_l = mlp(ln_bot, False)
        self.top_l = mlp(ln_top, True)

    def forward(self, dense_x, indices):
        """dense_x [B, m]; indices [T, B, L] -> probability [B, 1]."""
        x = self.bot_l(dense_x)
        t, b, l = indices.shape
        offsets = torch.arange(b, dtype=torch.long) * l
        ly = [e(indices[k].reshape(-1), offsets) for k, e in enumerate(self.emb_l)]
        tc = torch.cat([x.unsqueeze(1)] + [y.unsqueeze(1) for y in ly], dim=1)
        z = torch.bmm(tc, tc.transpose(1, 2))
        f = tc.shape[1]
        li, lj = torch.tril_indices(f, f, offset=-1)
        return self.top_l(torch.cat([x, z[:, li, lj]], dim=1))


def make_batch(seed=11):
    rng = np.random.RandomState(seed)
    dense = rng.rand(B, 4).astype(np.float32)
    idx = np.stack(
        [rng.randint(0, n, size=(B, L)).astype(np.int32) for n in ROWS]
    )
    w = np.ones((len(ROWS), B, L), np.float32)
    return dense, idx, w


def save_ref_ckpt(model, path, opt=None, **meta):
    d = {
        "epoch": meta.get("epoch", 1),
        "iter": meta.get("iter", 7),
        "nepochs": 2,
        "nbatches": 10,
        "nbatches_test": 2,
        "state_dict": model.state_dict(),
        "train_loss": 0.42,
        "total_loss": 4.2,
        "test_acc": 0.77,
    }
    if opt is not None:
        d["opt_state_dict"] = opt.state_dict()
    torch.save(d, path)


def test_import_forward_parity_and_opt_state(tmp_path):
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1])
    dense, idx, w = make_batch()
    # a few REAL torch Adagrad steps so opt state is populated & nontrivial
    opt = torch.optim.Adagrad(model.parameters(), lr=0.05)
    for s in range(3):
        opt.zero_grad()
        p = model(torch.from_numpy(dense), torch.from_numpy(idx).long())
        loss = torch.nn.functional.binary_cross_entropy(
            p, torch.full_like(p, 0.5)
        )
        loss.backward()
        opt.step()
    pt = os.path.join(tmp_path, "ref.pt")
    save_ref_ckpt(model, pt, opt)

    cfg = tiny_cfg()
    out = os.path.join(tmp_path, "ckpt")
    meta_w = import_torch_checkpoint(
        pt, cfg, out, OptConfig(name="adagrad", lr=0.05)
    )
    assert meta_w["iteration"] == 7 and meta_w["epoch"] == 1

    like_p = init_dlrm(cfg, seed=0)
    like_s = init_opt_state(OptConfig(name="adagrad"), like_p, model_groups(cfg))
    params, opt_state, meta = load_checkpoint(out, like_p, like_s)
    assert meta["metrics"]["accuracy"] == pytest.approx(0.77)

    # forward parity against the torch model itself
    with torch.no_grad():
        want = model(torch.from_numpy(dense), torch.from_numpy(idx).long()).numpy()
    got = np.asarray(
        forward(
            params, cfg, model_groups(cfg),
            jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(w),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # adagrad accumulators carried over per table / per dense layer
    tsd = {k: v.numpy() for k, v in model.state_dict().items()}
    tstate = opt.state_dict()["state"]
    groups = model_groups(cfg)
    from dlrm_yx_tpu.ops.embedding import unpack_store

    for g, acc in zip(groups, opt_state["emb"]):
        flat = np.asarray(unpack_store(acc, g))
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            np.testing.assert_allclose(
                flat[off : off + n], tstate[tid]["sum"].numpy(), rtol=1e-6
            )
    aw0 = np.asarray(opt_state["dense"]["bot"][0][0])
    np.testing.assert_allclose(
        aw0, tstate[len(ROWS)]["sum"].numpy().T, rtol=1e-6
    )
    assert float(np.abs(aw0).max()) > 0  # really carried, not zeros


def test_state_dict_round_trip(tmp_path):
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=9)
    cfg = tiny_cfg()
    sd = model.state_dict()
    params = params_from_state_dict(sd, cfg)
    back = state_dict_from_params(params, cfg)
    assert set(back) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), rtol=1e-6, atol=0)


def test_rwsadagrad_row_momentum_mapping():
    cfg = tiny_cfg()
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=5)
    sd = model.state_dict()
    params = params_from_state_dict(sd, cfg)
    # synthesize a torch-format rwsadagrad state: row momenta for sparse
    # tables, elementwise sums for dense (optim/rwsadagrad.py:74-86 there)
    order_n = len(ROWS)
    state = {}
    rng = np.random.RandomState(0)
    for t, n in enumerate(ROWS):
        state[t] = {"step": 3, "momentum": torch.from_numpy(rng.rand(n).astype(np.float32))}
    pidx = order_n
    for seq in (model.bot_l, model.top_l):
        for m in seq:
            if isinstance(m, torch.nn.Linear):
                state[pidx] = {"step": 3, "sum": torch.rand(m.weight.shape)}
                state[pidx + 1] = {"step": 3, "sum": torch.rand(m.bias.shape)}
                pidx += 2
    opt_sd = {
        "state": state,
        "param_groups": [{"params": list(range(pidx))}],
    }
    got = opt_state_from_torch(
        opt_sd, sd, cfg, OptConfig(name="rwsadagrad"), params
    )
    from dlrm_yx_tpu.optim.optimizer import acc_len

    groups = model_groups(cfg)
    for g, acc in zip(groups, got["emb"]):
        acc = np.asarray(acc)
        assert acc.shape == (acc_len(g.total_rows),)  # init_opt_state parity
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            np.testing.assert_allclose(
                acc[off : off + n], state[tid]["momentum"].numpy(), rtol=1e-6
            )
    np.testing.assert_allclose(
        np.asarray(got["dense"]["top"][1][1]),
        state[order_n + 2 * 2 + 1]["sum"].numpy(),
        rtol=1e-6,
    )


def test_export_then_torch_load(tmp_path):
    cfg = tiny_cfg()
    params = init_dlrm(cfg, seed=21)
    from dlrm_yx_tpu.tools.torch_ckpt import export_torch_checkpoint

    out = os.path.join(tmp_path, "export.pt")
    export_torch_checkpoint(
        out, cfg, params,
        meta={"epoch": 0, "iteration": 5, "train_loss": 0.3,
              "metrics": {"accuracy": 0.8}},
        nbatches=10, nbatches_test=2,
    )
    ld = torch.load(out, map_location="cpu", weights_only=False)
    # every key the reference's loader reads unconditionally
    # (dlrm_s_pytorch.py:1717-1728)
    for k in ("epoch", "iter", "nepochs", "nbatches", "nbatches_test",
              "state_dict", "train_loss", "total_loss", "test_acc"):
        assert k in ld, k
    # the state_dict must load into a reference-shaped module verbatim
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=1)
    model.load_state_dict(ld["state_dict"])
    # and agree with the source params' forward
    dense, idx, w = make_batch(seed=33)
    with torch.no_grad():
        want = model(torch.from_numpy(dense), torch.from_numpy(idx).long()).numpy()
    got = np.asarray(
        forward(
            params, cfg, model_groups(cfg),
            jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(w),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_qr_md_state_dict_mapping():
    """QR + MD key mapping both directions (synthetic state_dict)."""
    rows = [120, 30, 200]
    cfg = DLRMConfig.build(
        emb_rows=rows,
        emb_dims=(4, 8, 8),  # table 0 is MD (dim 4 < base 8)
        ln_bot=[4, 8],
        ln_top=[14, 6, 1],
        qr_flag=True,
        qr_threshold=150,   # only table 2 (200 rows) -> QR
        qr_collisions=4,
        md_flag=True,
        md_threshold=100,
    )
    assert cfg.md_table_ids == (0,)
    assert cfg.qr_table_ids == (2,)
    rng = np.random.RandomState(7)
    sd = {
        "emb_l.0.embs.weight": torch.from_numpy(rng.rand(120, 4).astype(np.float32)),
        "emb_l.0.proj.weight": torch.from_numpy(rng.rand(8, 4).astype(np.float32)),
        "emb_l.1.weight": torch.from_numpy(rng.rand(30, 8).astype(np.float32)),
        "emb_l.2.weight_q": torch.from_numpy(rng.rand(50, 8).astype(np.float32)),
        "emb_l.2.weight_r": torch.from_numpy(rng.rand(4, 8).astype(np.float32)),
        "bot_l.0.weight": torch.from_numpy(rng.rand(8, 4).astype(np.float32)),
        "bot_l.0.bias": torch.from_numpy(rng.rand(8).astype(np.float32)),
        "top_l.0.weight": torch.from_numpy(rng.rand(6, 14).astype(np.float32)),
        "top_l.0.bias": torch.from_numpy(rng.rand(6).astype(np.float32)),
        "top_l.2.weight": torch.from_numpy(rng.rand(1, 6).astype(np.float32)),
        "top_l.2.bias": torch.from_numpy(rng.rand(1).astype(np.float32)),
    }
    params = params_from_state_dict(sd, cfg)
    assert len(params["qr"]) == 1 and params["qr"][0][0].shape == (50, 8)
    assert params["md_proj"][0].shape == (4, 8)
    back = state_dict_from_params(params, cfg)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), rtol=1e-6, atol=0)


def test_export_carries_torch_loadable_opt_state(tmp_path):
    """The reference loads ld['opt_state_dict'] unconditionally unless
    --inference-only (dlrm_s_pytorch.py:1729): the export must carry one a
    real torch optimizer accepts, with our accumulators in it."""
    cfg = tiny_cfg()
    params = init_dlrm(cfg, seed=2)
    opt = OptConfig(name="adagrad", lr=0.05)
    opt_state = init_opt_state(opt, params, model_groups(cfg))
    # make the accumulators nontrivial
    import jax

    opt_state = jax.tree.map(lambda x: x + 0.25, opt_state)
    from dlrm_yx_tpu.tools.torch_ckpt import export_torch_checkpoint

    out = os.path.join(tmp_path, "e.pt")
    export_torch_checkpoint(
        out, cfg, params, opt_state=opt_state, opt=opt,
        meta={"iteration": 9}, nbatches=10, nbatches_test=2,
    )
    ld = torch.load(out, map_location="cpu", weights_only=False)
    assert "opt_state_dict" in ld
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=4)
    model.load_state_dict(ld["state_dict"])
    topt = torch.optim.Adagrad(model.parameters(), lr=0.05)
    topt.load_state_dict(ld["opt_state_dict"])  # must not raise
    st = topt.state_dict()["state"]
    np.testing.assert_allclose(
        st[0]["sum"].numpy(), np.full((ROWS[0], DIM), 0.25, np.float32),
        rtol=1e-6,
    )
    # and the optimizer still steps afterwards
    p = model(torch.zeros(2, 4), torch.zeros(3, 2, 1).long())
    torch.nn.functional.binary_cross_entropy(p, torch.full_like(p, 0.5)).backward()
    topt.step()


def test_export_sgd_opt_state(tmp_path):
    cfg = tiny_cfg()
    params = init_dlrm(cfg, seed=2)
    from dlrm_yx_tpu.tools.torch_ckpt import export_torch_checkpoint

    out = os.path.join(tmp_path, "sgd.pt")
    export_torch_checkpoint(out, cfg, params)  # defaults: sgd, fresh state
    ld = torch.load(out, map_location="cpu", weights_only=False)
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=4)
    topt = torch.optim.SGD(model.parameters(), lr=0.1)
    topt.load_state_dict(ld["opt_state_dict"])  # empty state, groups match


def test_md_identity_wrap_export_keys():
    """md_flag tables above md_threshold are PrEmbeddingBag-wrapped by the
    reference even when their dim equals base_dim (Identity proj) — export
    must emit embs.weight for them (dlrm_s_pytorch.py:291-299)."""
    cfg = DLRMConfig.build(
        emb_rows=[300, 40],
        emb_dims=(8, 8),  # both at base dim; table 0 wrapped (rows > 200)
        ln_bot=[4, 8],
        ln_top=[11, 6, 1],
        md_flag=True,
        md_threshold=200,
    )
    params = init_dlrm(cfg, seed=1)
    sd = state_dict_from_params(params, cfg)
    assert "emb_l.0.embs.weight" in sd and "emb_l.0.weight" not in sd
    assert "emb_l.1.weight" in sd  # below threshold: plain EmbeddingBag
    # and import round-trips
    back = params_from_state_dict(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(back["emb"][0]), np.asarray(params["emb"][0]), rtol=1e-6
    )


def test_adagrad_import_of_rwsadagrad_ckpt_raises():
    cfg = tiny_cfg()
    model = RefShapedDLRM(ROWS, DIM, [4, 8], [14, 6, 1], seed=5)
    sd = model.state_dict()
    params = params_from_state_dict(sd, cfg)
    state = {
        t: {"step": 1, "momentum": torch.rand(n)} for t, n in enumerate(ROWS)
    }
    pidx = len(ROWS)
    for seq in (model.bot_l, model.top_l):
        for m in seq:
            if isinstance(m, torch.nn.Linear):
                state[pidx] = {"step": 1, "sum": torch.rand(m.weight.shape)}
                state[pidx + 1] = {"step": 1, "sum": torch.rand(m.bias.shape)}
                pidx += 2
    opt_sd = {"state": state, "param_groups": [{"params": list(range(pidx))}]}
    with pytest.raises(ValueError, match="rwsadagrad"):
        opt_state_from_torch(opt_sd, sd, cfg, OptConfig(name="adagrad"), params)


def test_trainer_rejects_cross_optimizer_resume(tmp_path):
    from dlrm_yx_tpu.train.checkpoint import save_checkpoint
    from dlrm_yx_tpu.train.trainer import Trainer, TrainerConfig

    cfg = tiny_cfg()
    params = init_dlrm(cfg, seed=2)
    opt = OptConfig(name="adagrad", lr=0.05)
    opt_state = init_opt_state(opt, params, model_groups(cfg))
    ck = os.path.join(tmp_path, "ck")
    save_checkpoint(ck, params, opt_state, optimizer="adagrad")
    with pytest.raises(ValueError, match="adagrad"):
        Trainer(
            cfg,
            OptConfig(name="sgd", lr=0.1),
            TrainerConfig(load_path=ck),
            None,
        )


def test_converter_cli_max_ind_range_clamp(tmp_path):
    """--max-ind-range clamps table rows like the reference
    (dlrm_s_pytorch.py:1390-1398) so published-checkpoint arch flags work."""
    clamp = 30
    rows = [min(n, clamp) for n in ROWS]
    cfg = DLRMConfig.build(
        emb_rows=rows, emb_dims=(DIM,) * 3, ln_bot=[4, 8], ln_top=[14, 6, 1]
    )
    model = RefShapedDLRM(rows, DIM, [4, 8], [14, 6, 1], seed=8)
    save_ref_ckpt(model, os.path.join(tmp_path, "r.pt"))
    from dlrm_yx_tpu.tools.torch_ckpt import main as ck_main

    out = os.path.join(tmp_path, "dir")
    ck_main([
        "--import-pt", os.path.join(tmp_path, "r.pt"),
        "--ckpt-dir", out,
        "--arch-embedding-size", "40-25-60",
        "--max-ind-range", str(clamp),
        "--arch-sparse-feature-size", str(DIM),
        "--arch-mlp-bot", "4-8",
        "--arch-mlp-top", "14-6-1",
    ])
    like_p = init_dlrm(cfg, seed=0)
    params, _, meta = load_checkpoint(out, like_p, {})
    assert meta["optimizer"] == "sgd"
    np.testing.assert_allclose(
        np.asarray(params["bot"][0][0]),
        model.state_dict()["bot_l.0.weight"].numpy().T,
        rtol=1e-6,
    )


def test_converter_cli_help():
    from dlrm_yx_tpu.tools.torch_ckpt import main as ck_main

    with pytest.raises(SystemExit) as e:
        ck_main(["--help"])
    assert e.value.code == 0
