"""Prove the all-to-all / bottom-MLP overlap on the real TPU schedule.

The reference hand-codes the overlap: it launches an async all_to_all of
the pooled embeddings, computes the bottom MLP, then waits
(``/root/reference/dlrm_s_pytorch.py:708-713`` with the Req/Wait autograd
pair in ``extend_distributed.py:405-508``). Here the equivalent is a
compiler contract: the hybrid step's a2a and bottom MLP are data-independent
by construction, ``xla_tpu_enable_async_all_to_all`` (set by
``parallel.mesh.mesh_jit`` on TPU) splits the a2a into an async start/done
pair, and XLA's scheduler hoists independent compute between them.

This module verifies that contract on the ACTUAL v5e schedule without a
pod: the step is AOT-compiled against a multi-chip TPU topology
(``jax.experimental.topologies``), and the scheduled HLO (is_scheduled=true
— textual order IS the schedule) is checked for bottom_mlp dots between
all-to-all-start and all-to-all-done.
"""

from __future__ import annotations

import re
from typing import Dict, Optional


def aot_compile_hybrid_hlo(
    topology: str = "v5e:2x4",
    mesh_shape=(2, 4),
    async_a2a: bool = True,
) -> str:
    """AOT-compile the hybrid train step for a TPU topology; returns the
    optimized, scheduled HLO text. Raises if no TPU compiler is available
    (callers should skip in CPU-only environments)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.optim.optimizer import OptConfig
    from dlrm_yx_tpu.parallel import hybrid as hy
    from dlrm_yx_tpu.parallel.mesh import TPU_COMPILER_OPTIONS
    from dlrm_yx_tpu.parallel.plan import make_plan

    td = topologies.get_topology_desc(topology)
    data, model = mesh_shape
    mesh = Mesh(np.array(td.devices).reshape(data, model), ("data", "model"))

    cfg = DLRMConfig(
        emb_rows=(100_000,) * 8,
        ln_bot=(13, 512, 512, 64),
        ln_top=(8 * 9 // 2 + 64, 1024, 1024, 1024, 1),
        compute_dtype="bfloat16",
    )
    opt = OptConfig("rwsadagrad", 0.1)
    plan = make_plan(cfg, model, "naive")
    p_shapes = jax.eval_shape(lambda: hy.init_hybrid_params(cfg, plan, 0))
    s_shapes = jax.eval_shape(
        lambda: hy.init_hybrid_opt_state(
            opt,
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p_shapes),
            plan,
        )
    )

    def with_shard(shapes, model_keys):
        return {
            k: jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(
                    s.shape, s.dtype,
                    sharding=NamedSharding(
                        mesh, P("model") if k in model_keys else P()
                    ),
                ),
                v,
            )
            for k, v in shapes.items()
        }

    pa = with_shard(p_shapes, ("emb", "emb_small", "vw", "vw_small"))
    sa = with_shard(s_shapes, ("emb", "emb_small", "vw"))
    B, L = 2048, 8
    tt = model * plan.t_pad

    def sds(shape, dt, spec):
        return jax.ShapeDtypeStruct(
            shape, dt, sharding=NamedSharding(mesh, spec)
        )

    bshape = Batch(
        sds((B, 13), jnp.float32, P(("data", "model"))),
        sds((tt, B, L), jnp.int32, P("model", "data")),
        sds((tt, B, L), jnp.float32, P("model", "data")),
        sds((B, 1), jnp.float32, P(("data", "model"))),
    )
    step = hy.make_hybrid_train_step(cfg, plan, opt, mesh)
    opts = dict(TPU_COMPILER_OPTIONS) if async_a2a else {}
    return (
        step.lower(pa, sa, bshape, 0)
        .compile(compiler_options=opts)
        .as_text()
    )


def check_a2a_overlap(hlo: str) -> Dict[str, object]:
    """Analyze a scheduled HLO module for the async-a2a/compute overlap.

    Returns {async: bool, n_pairs: int, overlapped_ops: int,
    bottom_mlp_dots_inside: int} where *_inside counts ops scheduled
    between an all-to-all-start and its all-to-all-done."""
    lines = hlo.splitlines()
    starts, dones = [], []
    for i, ln in enumerate(lines):
        if re.search(r"= \S+ all-to-all-start", ln) or " all-to-all-start(" in ln:
            starts.append(i)
        if " all-to-all-done(" in ln:
            dones.append(i)
    n_pairs = min(len(starts), len(dones))
    overlapped = 0
    bot_dots = 0
    for s in starts:
        d = min((x for x in dones if x > s), default=None)
        if d is None:
            continue
        for ln in lines[s + 1 : d]:
            if "= " not in ln:
                continue
            overlapped += 1
            if "bottom_mlp" in ln and (
                "dot_general" in ln or "convolution" in ln or "dot(" in ln
            ):
                bot_dots += 1
    return {
        "async": n_pairs > 0,
        "n_pairs": n_pairs,
        "overlapped_ops": overlapped,
        "bottom_mlp_dots_inside": bot_dots,
        "sync_a2a": len(re.findall(r" all-to-all\(", hlo)),
    }
