"""The DLRM model: bottom MLP + embedding lookups + interaction + top MLP.

Capability parity with ``DLRM_Net`` in
``/root/reference/dlrm_s_pytorch.py:226-989`` (sequential forward path;
the parallel/distributed paths live in ``dlrm_yx_tpu/parallel/``).

Pure functional: parameters are a pytree dict
    {"bot": [(W, b), ...], "top": [(W, b), ...],
     "emb": [store_per_group, ...], "vw": [per-group v_W or None]}
and all forwards are jit-compatible with the (hashable) config/table-group
metadata closed over statically.

The forward is split at the pooled-embedding boundary
(``forward_from_pooled``) so that training can take gradients w.r.t. the
pooled vectors and apply *sparse* row updates to the tables — and so the
distributed path can insert its all-to-all exactly where the reference does
(dlrm_s_pytorch.py:708).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_yx_tpu.config import DLRMConfig
from dlrm_yx_tpu.ops.embedding import (
    TableGroup,
    build_table_groups,
    init_emb_group,
    lookup_group,
    pack_store,
    unpack_store,
)
from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.losses import predictions_from_logits
from dlrm_yx_tpu.ops.md_embedding import init_md_projection
from dlrm_yx_tpu.ops.mlp import apply_mlp, init_mlp
from dlrm_yx_tpu.ops.qr_embedding import QRSpec, init_qr, qr_lookup
from dlrm_yx_tpu.utils.profiling import phase_scope


def model_groups(config: DLRMConfig) -> List[TableGroup]:
    """(dim, size-class)-groups over the regular (non-QR) tables."""
    return build_table_groups(
        config.emb_rows, config.emb_dims, config.regular_table_ids,
        small_threshold=config.emb_split_threshold or None,
    )


def qr_specs(config: DLRMConfig) -> List[QRSpec]:
    return [
        QRSpec(
            table_id=t,
            rows=config.emb_rows[t],
            dim=config.emb_dims[t],
            collisions=config.qr_collisions,
            operation=config.qr_operation,
        )
        for t in config.qr_table_ids
    ]


def init_dlrm(config: DLRMConfig, seed: int = 123) -> Dict:
    """Initialize all parameters with one numpy RandomState.

    Draw order (documented seeding scheme; see SURVEY.md §7 "hard parts"):
    embedding tables in canonical table order (QR tables draw quotient then
    remainder), then MD projections in table order, then bottom MLP, then
    top MLP. Distributions match the reference (emb U(-1/sqrt n, 1/sqrt n),
    MLP custom Xavier, MD projections Xavier-uniform;
    dlrm_s_pytorch.py:239-244,294-299).
    """
    if config.weighted_pooling == "learned" and config.qr_table_ids:
        raise NotImplementedError("learned weighted pooling with QR tables")
    rng = np.random.RandomState(seed)
    groups = model_groups(config)
    specs = qr_specs(config)
    qr_ids = set(config.qr_table_ids)
    spec_by_id = {s.table_id: s for s in specs}
    # draw per-table in canonical order, then place into group stores
    per_table = {}
    qr_params = {}
    for t, (n, d) in enumerate(zip(config.emb_rows, config.emb_dims)):
        if t in qr_ids:
            qr_params[t] = tuple(map(jnp.asarray, init_qr(rng, spec_by_id[t])))
        else:
            bound = np.sqrt(1.0 / n)
            per_table[t] = rng.uniform(-bound, bound, size=(n, d)).astype(np.float32)
    md_proj = None
    if config.md_table_ids:
        md_proj = [
            jnp.asarray(
                init_md_projection(rng, config.emb_dims[t], config.base_dim)
            )
            for t in config.md_table_ids
        ]
    emb = []
    edt = jnp.dtype(config.emb_dtype)
    for g in groups:
        store = np.zeros((g.total_rows, g.dim), dtype=np.float32)
        for tid, n, off in zip(g.table_ids, g.rows, g.row_offsets):
            store[off : off + n] = per_table[tid]
        emb.append(jnp.asarray(pack_store(store, g)).astype(edt))
    vw = None
    if config.weighted_pooling is not None:
        # v_W = ones(n) per table (dlrm_s_pytorch.py:313-316), stored flat per group
        vw = []
        for g in groups:
            v = np.zeros((g.total_rows,), dtype=np.float32)
            for n, off in zip(g.rows, g.row_offsets):
                v[off : off + n] = 1.0
            vw.append(jnp.asarray(v))
    params = {
        "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_bot)],
        "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_top)],
        "emb": emb,
        "vw": vw,
    }
    if specs:
        params["qr"] = [qr_params[s.table_id] for s in specs]
    if md_proj is not None:
        params["md_proj"] = md_proj
    return params


def init_dlrm_on_device(config: DLRMConfig, seed: int = 123) -> Dict:
    """Large-model initializer: embedding stores are drawn ON DEVICE with
    ``jax.random`` under jit, so multi-GB tables never exist on the host and
    never cross the host->device link (the Terabyte MLPerf tables are ~13 GB;
    host init + transfer takes minutes over a tunneled TPU, device init is
    milliseconds). Dense params use the same numpy draws as ``init_dlrm``.

    Note: embedding values differ from ``init_dlrm`` (different RNG); use
    ``init_dlrm`` for golden/differential tests, this for benchmarks and
    production-size runs. Distribution is identical: U(-1/sqrt n, 1/sqrt n)
    per table, zero padding rows (dlrm_s_pytorch.py:294-299).
    """
    if config.qr_table_ids or config.md_table_ids:
        raise NotImplementedError("device init supports plain tables only")
    rng = np.random.RandomState(seed)
    groups = model_groups(config)

    emb = []
    for gi, g in enumerate(groups):
        bound = np.zeros((g.total_rows,), np.float32)
        for n, off in zip(g.rows, g.row_offsets):
            bound[off : off + n] = np.sqrt(1.0 / n)

        @jax.jit
        def draw_g(key, bound, dim=g.dim, shape=g.store_shape):
            u = jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
            b = bound.reshape(shape[0], shape[1] // dim)
            # per-LOGICAL-row bound, broadcast over the dim lanes of each
            # packed block; cast inside the jit: XLA fuses draw*bound*cast
            # elementwise, so the f32 intermediate never materializes (a
            # 54M-row bf16 store would otherwise OOM on its own f32 ghost)
            scale = jnp.repeat(b, dim, axis=1)
            return (u * scale).astype(jnp.dtype(config.emb_dtype))

        emb.append(draw_g(jax.random.PRNGKey(seed + gi), jnp.asarray(bound)))
    vw = None
    if config.weighted_pooling is not None:
        vw = []
        for g in groups:
            v = np.zeros((g.total_rows,), dtype=np.float32)
            for n, off in zip(g.rows, g.row_offsets):
                v[off : off + n] = 1.0
            vw.append(jnp.asarray(v))
    return {
        "bot": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_bot)],
        "top": [(jnp.asarray(w), jnp.asarray(b)) for w, b in init_mlp(rng, config.ln_top)],
        "emb": emb,
        "vw": vw,
    }


def qr_lookup_all(
    params: Dict, config: DLRMConfig, indices: jax.Array, weights: jax.Array
) -> List[jax.Array]:
    """Pooled lookups for the QR tables. Returns [pooled [B, out_dim]] in
    qr_table_ids order."""
    out = []
    for i, spec in enumerate(qr_specs(config)):
        q, r = params["qr"][i]
        out.append(
            qr_lookup(q, r, spec, indices[spec.table_id], weights[spec.table_id])
        )
    return out


def group_indices(group: TableGroup, indices: jax.Array) -> jax.Array:
    """Select this group's tables from canonical [T, B, L] inputs."""
    ids = np.array(group.table_ids, dtype=np.int32)
    if len(ids) == indices.shape[0] and np.all(ids == np.arange(len(ids))):
        return indices
    return jnp.take(indices, jnp.asarray(ids), axis=0)


def lookup_all_groups(
    params: Dict,
    groups: Sequence[TableGroup],
    indices: jax.Array,
    weights: jax.Array,
    impl: str = "xla",
    want_rows: bool = False,
):
    """Pooled lookups for every dim-group. Returns [pooled_g [T_g, B, dim_g]];
    with want_rows also returns the raw gathered PHYSICAL rows per group
    (L=1 groups, packed or natural; else None) — the write-only sparse
    update reuses them to skip its DMA read phase."""
    vw = params.get("vw")
    out = []
    rows_out = []
    with phase_scope("embedding_lookup"):
        for gi, g in enumerate(groups):
            idx_g = group_indices(g, indices)
            rows_ok = want_rows and idx_g.shape[2] == 1
            res = lookup_group(
                params["emb"][gi],
                g,
                idx_g,
                group_indices(g, weights),
                vw[gi] if vw is not None else None,
                impl=impl,
                return_rows=rows_ok,
            )
            if rows_ok:
                pooled_g, rows_g = res
                out.append(pooled_g)
                rows_out.append(rows_g)
            else:
                out.append(res)
                rows_out.append(None)
    if want_rows:
        return out, rows_out
    return out


def assemble_slots(
    pooled_list: Sequence[jax.Array],
    groups: Sequence[TableGroup],
    config: DLRMConfig,
    qr_pooled: Sequence[jax.Array] = (),
    md_proj: Optional[Sequence[jax.Array]] = None,
) -> jax.Array:
    """Reassemble group/QR pooled outputs into [B, S, D] canonical slot
    order, applying the mixed-dim split trick (dim k*D -> k slots of D;
    dlrm_s_pytorch.py:579-585) and MD up-projections (PrEmbeddingBag)."""
    d = config.base_dim
    if (
        len(groups) == 1
        and groups[0].dim == d
        and not qr_pooled
        and groups[0].num_tables == config.num_tables
    ):
        return jnp.transpose(pooled_list[0], (1, 0, 2))  # [B, T, D]
    per_table = {}
    for g, pooled in zip(groups, pooled_list):
        for i, tid in enumerate(g.table_ids):
            per_table[tid] = pooled[i]  # [B, dim_g]
    for tid, pooled in zip(config.qr_table_ids, qr_pooled):
        per_table[tid] = pooled
    md_ids = {tid: i for i, tid in enumerate(config.md_table_ids)}
    slots = []
    for t in range(config.num_tables):
        y = per_table[t]
        if t in md_ids:
            y = jnp.dot(y, md_proj[md_ids[t]])  # up-project to base dim
            slots.append(y)
            continue
        k = config.slots_per_table[t]
        if k == 1:
            slots.append(y)
        else:
            slots.extend(jnp.split(y, k, axis=1))
    return jnp.stack(slots, axis=1)  # [B, S, D]


def forward_from_pooled(
    params: Dict,
    config: DLRMConfig,
    groups: Sequence[TableGroup],
    dense_x: jax.Array,
    pooled_list: Sequence[jax.Array],
    qr_pooled: Sequence[jax.Array] = (),
) -> jax.Array:
    """bottom MLP + interaction + top MLP from pooled embeddings -> logits.

    XLA is free to schedule the bottom MLP concurrently with whatever
    produced ``pooled_list`` (e.g. the distributed all-to-all — the overlap
    the reference hand-codes at dlrm_s_pytorch.py:708-713)."""
    cdt = jnp.dtype(config.compute_dtype)
    # phase scopes survive jit and name these ops in profiler traces, like
    # the reference's record_function tags (dlrm_s_pytorch.py:744-745,918)
    with phase_scope("bottom_mlp"):
        x = apply_mlp(dense_x, params["bot"], config.sigmoid_bot, cdt)
    ly = assemble_slots(
        pooled_list, groups, config, qr_pooled, params.get("md_proj")
    )
    with phase_scope("interaction"):
        z = interact_features(
            x, ly, config.interaction, config.interact_itself, cdt,
            impl=config.interaction_impl,
        )
    # the reference puts sigmoid at the last top layer (sigmoid_top); we
    # return logits and fold the sigmoid into loss/prediction for stability
    with phase_scope("top_mlp"):
        return apply_mlp(
            z, params["top"], config.sigmoid_top, cdt,
            skip_last_activation=True,
        )


def forward_logits(
    params: Dict,
    config: DLRMConfig,
    groups: Sequence[TableGroup],
    dense_x: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    pooled = lookup_all_groups(params, groups, indices, weights, config.lookup_impl)
    qr_pooled = (
        qr_lookup_all(params, config, indices, weights)
        if config.qr_table_ids
        else ()
    )
    return forward_from_pooled(params, config, groups, dense_x, pooled, qr_pooled)


def forward(
    params: Dict,
    config: DLRMConfig,
    groups: Sequence[TableGroup],
    dense_x: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Click probability [B, 1] (sigmoid + loss_threshold clamp), matching the
    reference forward output (dlrm_s_pytorch.py:722-728)."""
    z = forward_logits(params, config, groups, dense_x, indices, weights)
    return predictions_from_logits(z, config.loss_threshold)
