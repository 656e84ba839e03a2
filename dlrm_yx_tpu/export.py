"""Model export and execution-graph capture.

Two capabilities of the reference rebuilt TPU-natively:

  * **Model export** — the reference exports the trained model to ONNX
    (``/root/reference/dlrm_s_pytorch.py:2137-2248``, --save-onnx). The JAX
    ecosystem's portable serialized form is StableHLO via ``jax.export``:
    the inference function is traced/lowered once and serialized with its
    in/out trees; it can be reloaded and executed (or AOT-compiled) without
    the Python model code.

  * **Execution-graph capture** — the reference records one iteration's full
    op graph with ``ExecutionGraphObserver`` to a JSON file
    (``dlrm_s_pytorch.py:1810-1814,1851-1852,1947-1949``,
    --collect-execution-graph). Here the equivalent artifacts are the
    jaxpr (framework-level op graph), the StableHLO module (compiler input),
    and the optimized HLO (what actually runs, post-fusion) — strictly more
    information than a kineto op list.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def export_inference(params, config, batch_like, path: str) -> None:
    """Serialize the jitted inference forward (click probabilities) to
    ``path`` as a StableHLO artifact (bytes) + a small sidecar JSON with
    shapes. batch_like provides example (dense, indices, weights) shapes."""
    from jax import export as jexport

    from dlrm_yx_tpu.models.dlrm import forward, model_groups

    groups = model_groups(config)

    def fn(params, dense, indices, weights):
        return forward(params, config, groups, dense, indices, weights)

    args = (
        params,
        jax.ShapeDtypeStruct(batch_like.dense.shape, np.float32),
        jax.ShapeDtypeStruct(batch_like.indices.shape, np.int32),
        jax.ShapeDtypeStruct(batch_like.weights.shape, np.float32),
    )
    exp = jexport.export(jax.jit(fn))(*args)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "dense": list(batch_like.dense.shape),
                "indices": list(batch_like.indices.shape),
                "weights": list(batch_like.weights.shape),
                "platforms": list(exp.platforms),
            },
            f,
        )


def load_exported(path: str):
    """Reload a serialized model; returns the Exported object — call it with
    ``exported.call(params, dense, indices, weights)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def collect_execution_graph(
    fn, args, out_dir: str, name: str = "train_step"
) -> Dict[str, str]:
    """Dump the full execution graph of one jitted iteration:
      {name}.jaxpr.txt    — framework-level op graph
      {name}.stablehlo.txt — lowered module (compiler input)
      {name}.hlo.txt      — optimized HLO (post-fusion, what runs)
    Returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)
    out: Dict[str, str] = {}

    jaxpr_path = os.path.join(out_dir, f"{name}.jaxpr.txt")
    with open(jaxpr_path, "w") as f:
        f.write(str(jax.make_jaxpr(fn)(*args)))
    out["jaxpr"] = jaxpr_path

    lowered = jax.jit(fn).lower(*args)
    shlo_path = os.path.join(out_dir, f"{name}.stablehlo.txt")
    with open(shlo_path, "w") as f:
        f.write(lowered.as_text())
    out["stablehlo"] = shlo_path

    try:
        compiled = lowered.compile()
        hlo_path = os.path.join(out_dir, f"{name}.hlo.txt")
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
        out["hlo"] = hlo_path
    except Exception as e:  # optimized HLO is best-effort (backend-dependent)
        out["hlo_error"] = str(e)[:500]
    return out


def cost_analysis(fn, args) -> Dict[str, Any]:
    """FLOPs / bytes-accessed estimate of one jitted call (the reference's
    per-phase profiling numbers, via XLA's own cost model).

    Pass an ALREADY-JITTED fn to reuse its compilation cache (a fresh
    jax.jit here would recompile the whole step — minutes at bench scale)."""
    lower = fn.lower if hasattr(fn, "lower") else jax.jit(fn).lower
    compiled = lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {
        k: float(v)
        for k, v in (ca or {}).items()
        if isinstance(v, (int, float))
        and k in ("flops", "bytes accessed", "optimal_seconds")
    }
