"""Single-device jitted training / eval steps.

The reference's hot loop (``/root/reference/dlrm_s_pytorch.py:1848-1934``) is
forward → loss → backward → optimizer.step() with sparse embedding grads.
Here the whole iteration is ONE jitted function:

  * pooled embedding lookups run first (outside the dense autodiff),
  * ``jax.value_and_grad`` differentiates the dense graph (MLPs +
    interaction) w.r.t. dense params AND the pooled vectors,
  * the pooled cotangent is expanded to per-row gradients and applied as
    sparse scatter updates (optim/optimizer.py) — embedding tables never see
    a dense gradient, mirroring sparse=True EmbeddingBag + RWSAdagrad.

The multi-device hybrid-parallel step lives in parallel/hybrid.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.models.dlrm import (
    forward_from_pooled,
    group_indices,
    lookup_all_groups,
    model_groups,
    qr_lookup_all,
    qr_specs,
)
from dlrm_yx_tpu.ops.embedding import flat_row_grads, vw_row_grads
from dlrm_yx_tpu.ops.losses import loss_fn, predictions_from_logits
from dlrm_yx_tpu.ops.qr_embedding import qr_row_grads
from dlrm_yx_tpu.optim.optimizer import (
    DENSE_ACCUM_FACTOR,
    OptConfig,
    dense_update,
    sparse_update,
    sparse_update_1d,
    sparse_update_stream,
    stream_eligible,
)
from dlrm_yx_tpu.utils.profiling import phase_scope


def _interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CPU test meshes)."""
    return jax.default_backend() != "tpu"


def apply_gradients(
    config: DLRMConfig,
    opt: OptConfig,
    groups,
    params: Dict,
    opt_state: Dict,
    batch,
    g_dense: Dict,
    g_pooled,
    lr,
    g_qr_pooled=(),
    sr_seed=0,
    raw_rows=None,
):
    """Shared between the single-device and hybrid-parallel steps: dense
    updates + sparse per-group row updates from the pooled cotangent.
    raw_rows: optional per-group gathered store rows from the forward
    lookup (L=1 groups) — enables the write-only sparse update."""
    with phase_scope("optimizer"):
        return _apply_gradients(
            config, opt, groups, params, opt_state, batch, g_dense,
            g_pooled, lr, g_qr_pooled, sr_seed, raw_rows,
        )


def _apply_gradients(
    config,
    opt,
    groups,
    params,
    opt_state,
    batch,
    g_dense,
    g_pooled,
    lr,
    g_qr_pooled=(),
    sr_seed=0,
    raw_rows=None,
):
    new_params = dict(params)
    new_state = dict(opt_state)

    # dense (MLP) updates
    for k in ("bot", "top"):
        new_layers, new_acc = [], []
        for i, (w, b) in enumerate(params[k]):
            gw, gb = g_dense[k][i]
            acc_w, acc_b = (
                opt_state["dense"][k][i] if opt.name != "sgd" else (None, None)
            )
            w2, acc_w2 = dense_update(opt, w, gw, acc_w, lr)
            b2, acc_b2 = dense_update(opt, b, gb, acc_b, lr)
            new_layers.append((w2, b2))
            new_acc.append((acc_w2, acc_b2))
        new_params[k] = new_layers
        if opt.name != "sgd":
            new_state.setdefault("dense", {})
            new_state["dense"] = dict(new_state["dense"])
            new_state["dense"][k] = new_acc

    # MD projections are dense params too (PrEmbeddingBag's Linear)
    if "md_proj" in g_dense:
        new_proj, new_proj_acc = [], []
        for i, w in enumerate(params["md_proj"]):
            acc = opt_state["md_proj"][i] if opt.name != "sgd" else None
            w2, acc2 = dense_update(opt, w, g_dense["md_proj"][i], acc, lr)
            new_proj.append(w2)
            new_proj_acc.append(acc2)
        new_params["md_proj"] = new_proj
        if opt.name != "sgd":
            new_state["md_proj"] = new_proj_acc

    # QR sub-table sparse updates (chain rule through the combine)
    if g_qr_pooled:
        new_qr, new_qr_acc = [], []
        for i, spec in enumerate(qr_specs(config)):
            q, r = params["qr"][i]
            (qi, gq), (ri, gr) = qr_row_grads(
                q, r, spec,
                batch.indices[spec.table_id], batch.weights[spec.table_id],
                g_qr_pooled[i],
            )
            q_acc, r_acc = (
                opt_state["qr"][i] if opt.name != "sgd" else (None, None)
            )
            q2, q_acc2 = sparse_update(
                opt, q, q_acc, qi, gq, lr, spec.q_rows,
                impl=config.sparse_update_impl, interpret=_interpret(),
            )
            r2, r_acc2 = sparse_update(
                opt, r, r_acc, ri, gr, lr, spec.collisions,
                impl=config.sparse_update_impl, interpret=_interpret(),
            )
            new_qr.append((q2, r2))
            new_qr_acc.append((q_acc2, r_acc2))
        new_params["qr"] = new_qr
        if opt.name != "sgd":
            new_state["qr"] = new_qr_acc

    # sparse embedding updates
    new_emb, new_emb_acc = [], []
    new_vw = list(params["vw"]) if params.get("vw") is not None else None
    new_vw_acc = (
        list(opt_state["vw"]) if opt.name != "sgd" and "vw" in opt_state else None
    )
    for gi, g in enumerate(groups):
        idx_g = group_indices(g, batch.indices)
        w_g = group_indices(g, batch.weights)
        vw_g = params["vw"][gi] if params.get("vw") is not None else None
        acc = opt_state["emb"][gi] if opt.name != "sgd" else None
        t_g, b_g, l_g = idx_g.shape
        use_stream = (
            (
                config.sparse_update_impl == "stream"
                # SGD is exact on both the dense and the stream path, so
                # 'pallas' auto-routes its dense regime through the faster
                # streaming kernel (49.9 -> 46.2 ms at the L=100 bench);
                # adagrad-family keeps the exactly-coalescing dense path
                # unless 'stream' (per-occurrence momentum) is requested.
                or (
                    config.sparse_update_impl == "pallas"
                    and opt.name == "sgd"
                )
            )
            and stream_eligible(opt, params["emb"][gi], g)
            and not config.exact_row_momentum
            and not config.stochastic_rounding
            # streaming rewrites the whole store: only sensible in the
            # dense regime (the same K-vs-R crossover as the dense path)
            and t_g * b_g * l_g * DENSE_ACCUM_FACTOR
            >= params["emb"][gi].shape[0]
        )
        if use_stream:
            from dlrm_yx_tpu.ops.embedding import global_row_ids

            gidx = global_row_ids(g, idx_g)
            w_eff = w_g
            if vw_g is not None:
                w_eff = w_g * jnp.take(vw_g, gidx.reshape(-1)).reshape(
                    idx_g.shape
                )
            store2, acc2 = sparse_update_stream(
                opt, params["emb"][gi], acc, g, gidx, w_eff, g_pooled[gi],
                lr, interpret=_interpret(),
            )
        else:
            fidx, fg = flat_row_grads(g, idx_g, w_g, g_pooled[gi], vw_g)
            old_rows = None
            if raw_rows is not None and raw_rows[gi] is not None:
                t_r, b_r, d_r = raw_rows[gi].shape
                old_rows = jax.lax.stop_gradient(
                    raw_rows[gi].reshape(t_r * b_r, d_r)
                )
            store2, acc2 = sparse_update(
                opt, params["emb"][gi], acc, fidx, fg, lr, g.total_rows,
                impl=config.sparse_update_impl, interpret=_interpret(),
                stochastic_round=config.stochastic_rounding, sr_seed=sr_seed,
                size_class=g.size_class, dim=g.dim,
                exact_momentum=config.exact_row_momentum,
                old_rows=old_rows,
                density_hint=config.dup_density_hint,
            )
        new_emb.append(store2)
        new_emb_acc.append(acc2)
        if config.weighted_pooling == "learned":
            vidx, vg = vw_row_grads(g, params["emb"][gi], idx_g, w_g, g_pooled[gi])
            vacc = opt_state["vw"][gi] if opt.name != "sgd" else None
            vw2, vacc2 = sparse_update_1d(
                opt, params["vw"][gi], vacc, vidx, vg, lr, g.total_rows
            )
            new_vw[gi] = vw2
            if new_vw_acc is not None:
                new_vw_acc[gi] = vacc2
    new_params["emb"] = new_emb
    if new_vw is not None:
        new_params["vw"] = new_vw
    if opt.name != "sgd":
        new_state["emb"] = new_emb_acc
        if new_vw_acc is not None:
            new_state["vw"] = new_vw_acc
    return new_params, new_state


def make_train_step(
    config: DLRMConfig,
    opt: OptConfig,
    lr_fn: Optional[Callable] = None,
    jit: bool = True,
):
    """Returns step(params, opt_state, batch, iteration) ->
    (params, opt_state, loss)."""
    groups = model_groups(config)
    has_qr = bool(config.qr_table_ids)

    def step(params, opt_state, batch, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        if config.write_only_update:
            pooled, raw_rows = lookup_all_groups(
                params, groups, batch.indices, batch.weights,
                config.lookup_impl, want_rows=True,
            )
        else:
            pooled = lookup_all_groups(
                params, groups, batch.indices, batch.weights,
                config.lookup_impl,
            )
            raw_rows = None
        qr_pooled = (
            qr_lookup_all(params, config, batch.indices, batch.weights)
            if has_qr
            else []
        )

        def dense_loss(dense_params, pooled_in, qr_in):
            p2 = dict(params)
            p2.update(dense_params)
            logits = forward_from_pooled(
                p2, config, groups, batch.dense, pooled_in, qr_in
            )
            with phase_scope("loss_compute"):
                return loss_fn(
                    logits, batch.labels, config.loss, config.loss_threshold,
                    config.wbce_weights,
                )

        dense_params = {"bot": params["bot"], "top": params["top"]}
        if "md_proj" in params:
            dense_params["md_proj"] = params["md_proj"]
        with phase_scope("backward"):
            loss, (g_dense, g_pooled, g_qr) = jax.value_and_grad(
                dense_loss, argnums=(0, 1, 2)
            )(dense_params, pooled, qr_pooled)
        new_params, new_state = apply_gradients(
            config, opt, groups, params, opt_state, batch, g_dense, g_pooled,
            lr, g_qr, sr_seed=iteration, raw_rows=raw_rows,
        )
        return new_params, new_state, loss

    if jit:
        return jax.jit(step, donate_argnums=(0, 1))
    return step


def scan_multistep(inner, n_steps: int, jit_fn=None):
    """Wrap a raw step fn (params, opt_state, batch, iteration) ->
    (params, opt_state, loss) into a scanned ``n_steps``-iteration step —
    the ONE shared implementation behind the single-device and all three
    mesh-runner multi-step dispatch makers. ``batches`` leaves carry a
    leading [n_steps] axis; returns losses[n_steps]."""

    def step(params, opt_state, batches, iteration):
        def body(carry, xs):
            p, s = carry
            leaves, it = xs
            p, s, loss = inner(p, s, Batch(*leaves), it)
            return (p, s), loss

        its = jnp.asarray(iteration, jnp.int32) + jnp.arange(
            n_steps, dtype=jnp.int32
        )
        (p, s), losses = jax.lax.scan(
            body, (params, opt_state), (tuple(batches), its)
        )
        return p, s, losses

    return jit_fn(step) if jit_fn is not None else step


def make_multistep_train_step(
    config: DLRMConfig,
    opt: OptConfig,
    n_steps: int,
    lr_fn: Optional[Callable] = None,
    jit: bool = True,
):
    """``n_steps`` FULL optimizer steps under one ``lax.scan`` — ONE
    dispatch (and one stacked H2D transfer) per ``n_steps`` iterations.

    Semantics are identical to calling ``make_train_step``'s function
    ``n_steps`` times in sequence (each scan iteration is the same traced
    body: lookup → grad → sparse/dense update, with its own per-iteration
    lr and sr_seed). This exists purely to hide per-call dispatch latency:
    on a tunneled/remote device each Execute costs a host round-trip that
    a 2.3 ms step cannot amortize (the reference hides the same latency
    with DataLoader worker prefetch + CUDA stream queuing,
    /root/reference/dlrm_s_pytorch.py:1845-1876 — on TPU the equivalent is
    fewer, fatter dispatches).

    step(params, opt_state, stacked_batch, iteration): every Batch leaf
    has a leading [n_steps] axis; iteration is the index of the FIRST
    micro-iteration. Returns (params, opt_state, losses[n_steps]).
    """
    inner = make_train_step(config, opt, lr_fn, jit=False)
    return scan_multistep(
        inner, n_steps,
        (lambda f: jax.jit(f, donate_argnums=(0, 1))) if jit else None,
    )


def make_eval_step(config: DLRMConfig, jit: bool = True):
    """Returns eval(params, batch) -> (predictions [B,1], loss) — the
    inference path of dlrm_s_pytorch.py:1018-1162."""
    groups = model_groups(config)

    def eval_step(params, batch):
        pooled = lookup_all_groups(
            params, groups, batch.indices, batch.weights, config.lookup_impl
        )
        qr_pooled = (
            qr_lookup_all(params, config, batch.indices, batch.weights)
            if config.qr_table_ids
            else ()
        )
        logits = forward_from_pooled(
            params, config, groups, batch.dense, pooled, qr_pooled
        )
        preds = predictions_from_logits(logits, config.loss_threshold)
        loss = loss_fn(
            logits, batch.labels, config.loss, config.loss_threshold,
            config.wbce_weights,
        )
        return preds, loss

    return jax.jit(eval_step) if jit else eval_step


def make_accum_train_step(
    config: DLRMConfig,
    opt: OptConfig,
    n_accum: int,
    lr_fn: Optional[Callable] = None,
    jit: bool = True,
):
    """Gradient accumulation over ``n_accum`` micro-batches with ONE
    optimizer step (--mlperf-grad-accum-iter: the reference calls
    optimizer.step()/zero_grad() every N-th mini-batch so autograd sums
    grads across them, dlrm_s_pytorch.py:1925-1932).

    step(params, opt_state, stacked_batch, iteration): every Batch leaf has
    a leading [n_accum] axis. Dense grads are SUMMED over micro-batches
    (torch semantics — each backward adds dL_i/dw for the per-batch mean
    loss L_i); sparse row grads from all micro-batches are applied in one
    coalesced update, so Adagrad-family momenta see the accumulated
    gradient exactly once. Returns the mean micro-batch loss.
    """
    groups = model_groups(config)
    has_qr = bool(config.qr_table_ids)

    def step(params, opt_state, batches, iteration):
        lr = lr_fn(iteration) if lr_fn is not None else jnp.float32(opt.lr)
        dense_params = {"bot": params["bot"], "top": params["top"]}
        if "md_proj" in params:
            dense_params["md_proj"] = params["md_proj"]

        def micro(carry, b):
            g_dense_sum, loss_sum = carry
            batch = Batch(*b)
            pooled = lookup_all_groups(
                params, groups, batch.indices, batch.weights,
                config.lookup_impl,
            )
            qr_pooled = (
                qr_lookup_all(params, config, batch.indices, batch.weights)
                if has_qr
                else []
            )

            def dense_loss(dp, pooled_in, qr_in):
                p2 = dict(params)
                p2.update(dp)
                logits = forward_from_pooled(
                    p2, config, groups, batch.dense, pooled_in, qr_in
                )
                return loss_fn(
                    logits, batch.labels, config.loss, config.loss_threshold,
                    config.wbce_weights,
                )

            loss, (g_dense, g_pooled, g_qr) = jax.value_and_grad(
                dense_loss, argnums=(0, 1, 2)
            )(dense_params, pooled, qr_pooled)
            g_dense_sum = jax.tree.map(jnp.add, g_dense_sum, g_dense)
            return (g_dense_sum, loss_sum + loss), (g_pooled, g_qr)

        zero_gd = jax.tree.map(jnp.zeros_like, dense_params)
        (g_dense, loss_sum), (g_pooled_stack, g_qr_stack) = jax.lax.scan(
            micro, (zero_gd, jnp.float32(0.0)), tuple(batches)
        )

        new_params = dict(params)
        new_state = dict(opt_state)
        dp_new, ds_new = {}, {}
        for k in ("bot", "top"):
            layers, accs = [], []
            for i, (w, b) in enumerate(params[k]):
                gw, gb = g_dense[k][i]
                aw, ab = (
                    opt_state["dense"][k][i] if opt.name != "sgd" else (None, None)
                )
                w2, aw2 = dense_update(opt, w, gw, aw, lr)
                b2, ab2 = dense_update(opt, b, gb, ab, lr)
                layers.append((w2, b2))
                accs.append((aw2, ab2))
            new_params[k] = layers
            if opt.name != "sgd":
                new_state["dense"] = dict(new_state["dense"])
                new_state["dense"][k] = accs
        if "md_proj" in params:
            new_proj, new_acc = [], []
            for i, w in enumerate(params["md_proj"]):
                pa = opt_state["md_proj"][i] if opt.name != "sgd" else None
                w2, pa2 = dense_update(opt, w, g_dense["md_proj"][i], pa, lr)
                new_proj.append(w2)
                new_acc.append(pa2)
            new_params["md_proj"] = new_proj
            if opt.name != "sgd":
                new_state["md_proj"] = new_acc

        if has_qr:
            # QR sub-table updates: chain-rule row grads from every
            # micro-batch (against the PRE-update stores), concatenated
            # into ONE coalesced update per sub-table
            new_qr, new_qr_acc = [], []
            for i, spec in enumerate(qr_specs(config)):
                q, r = params["qr"][i]
                # qr_row_grads is batch-polymorphic: fold the micro axis
                # into the batch axis (one traced copy; occurrence order
                # is irrelevant to the coalesced update)
                idx_i = batches.indices[:, spec.table_id]
                w_i = batches.weights[:, spec.table_id]
                na, bsz, l = idx_i.shape
                (qi, gq), (ri, gr) = qr_row_grads(
                    q, r, spec,
                    idx_i.reshape(na * bsz, l),
                    w_i.reshape(na * bsz, l),
                    g_qr_stack[i].reshape(na * bsz, -1),
                )
                q_acc, r_acc = (
                    opt_state["qr"][i] if opt.name != "sgd" else (None, None)
                )
                q2, q_acc2 = sparse_update(
                    opt, q, q_acc, qi, gq, lr, spec.q_rows,
                    impl=config.sparse_update_impl, interpret=_interpret(),
                )
                r2, r_acc2 = sparse_update(
                    opt, r, r_acc, ri, gr, lr, spec.collisions,
                    impl=config.sparse_update_impl, interpret=_interpret(),
                )
                new_qr.append((q2, r2))
                new_qr_acc.append((q_acc2, r_acc2))
            new_params["qr"] = new_qr
            if opt.name != "sgd":
                new_state["qr"] = new_qr_acc

        # one coalesced sparse update over all micro-batches' contributions
        new_emb, new_emb_acc = [], []
        new_vw = list(params["vw"]) if params.get("vw") is not None else None
        new_vw_acc = (
            list(opt_state["vw"])
            if opt.name != "sgd" and "vw" in opt_state
            else None
        )
        for gi, g in enumerate(groups):
            vw_g = params["vw"][gi] if params.get("vw") is not None else None
            fidx_all, fg_all = [], []
            vidx_all, vg_all = [], []
            for m in range(n_accum):
                idx_g = group_indices(g, batches.indices[m])
                w_g = group_indices(g, batches.weights[m])
                # the row grad carries the v_W factor the forward applied
                fidx, fg = flat_row_grads(
                    g, idx_g, w_g, g_pooled_stack[gi][m], vw_g
                )
                fidx_all.append(fidx)
                fg_all.append(fg)
                if vw_g is not None and config.weighted_pooling == "learned":
                    vidx, vg = vw_row_grads(
                        g, params["emb"][gi], idx_g, w_g, g_pooled_stack[gi][m]
                    )
                    vidx_all.append(vidx)
                    vg_all.append(vg)
            acc = opt_state["emb"][gi] if opt.name != "sgd" else None
            store2, acc2 = sparse_update(
                opt, params["emb"][gi], acc,
                jnp.concatenate(fidx_all), jnp.concatenate(fg_all),
                lr, g.total_rows,
                impl=config.sparse_update_impl, interpret=_interpret(),
                stochastic_round=config.stochastic_rounding, sr_seed=iteration,
                size_class=g.size_class, dim=g.dim,
                exact_momentum=config.exact_row_momentum,
                density_hint=config.dup_density_hint,
            )
            new_emb.append(store2)
            new_emb_acc.append(acc2)
            if vidx_all:
                # all micro-batches' v_W contributions in ONE coalesced
                # 1-D update (momentum sees the accumulated grad once)
                vacc = opt_state["vw"][gi] if opt.name != "sgd" else None
                vw2, vacc2 = sparse_update_1d(
                    opt, vw_g, vacc,
                    jnp.concatenate(vidx_all), jnp.concatenate(vg_all),
                    lr, g.total_rows,
                )
                new_vw[gi] = vw2
                if new_vw_acc is not None:
                    new_vw_acc[gi] = vacc2
        new_params["emb"] = new_emb
        if new_vw is not None:
            new_params["vw"] = new_vw
        if opt.name != "sgd":
            new_state["emb"] = new_emb_acc
            if new_vw_acc is not None:
                new_state["vw"] = new_vw_acc
        return new_params, new_state, loss_sum / n_accum

    if jit:
        return jax.jit(step, donate_argnums=(0, 1))
    return step
