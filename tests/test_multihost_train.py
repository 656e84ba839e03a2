"""REAL 2-process hybrid training: the full shard_map train step (lookups,
all-to-all exchange, psum'd dense grads, sparse updates) executed across two
jax.distributed processes with one CPU device each, asserting loss parity
with the single-device step — the strongest multi-host evidence available
without a pod (the reference validates its distributed mode only by full
cluster runs, README.md:340-348 there; its local analog is N-process gloo,
test.py:23-48)."""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ["DLRM_REPO_ROOT"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dlrm_yx_tpu.parallel.multihost import init_multihost

    pid, num = init_multihost()
    assert num == 2 and jax.device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from dlrm_yx_tpu.config import DLRMConfig
    from dlrm_yx_tpu.data.batch import Batch
    from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
    from dlrm_yx_tpu.models.dlrm import init_dlrm
    from dlrm_yx_tpu.ops.embedding import build_table_groups
    from dlrm_yx_tpu.optim.optimizer import OptConfig, init_opt_state
    from dlrm_yx_tpu.parallel.hybrid import (
        init_hybrid_opt_state, init_hybrid_params, make_hybrid_train_step,
        shard_batch, shard_params,
    )
    from dlrm_yx_tpu.parallel.mesh import make_mesh
    from dlrm_yx_tpu.parallel.plan import arrange_sparse_inputs, make_plan
    from dlrm_yx_tpu.train.train_step import make_train_step

    cfg = DLRMConfig.build(
        emb_rows=[40, 50, 30, 60], emb_dims=(4,) * 4,
        ln_bot=[4, 4], ln_top=[4, 1],
    )
    opt = OptConfig(name="rwsadagrad", lr=0.1)
    seed = 77
    batches = make_random_batches(RandomDataConfig(
        emb_rows=cfg.emb_rows, m_den=cfg.ln_bot[0], mini_batch_size=8,
        num_batches=3, num_indices_per_lookup=2,
        num_indices_per_lookup_fixed=False, round_targets=True, seed=13,
    ))

    # single-device oracle (local arrays only)
    params1 = init_dlrm(cfg, seed=seed)
    groups = build_table_groups(cfg.emb_rows, cfg.emb_dims)
    step1 = make_train_step(cfg, opt)
    s1 = init_opt_state(opt, params1, groups)
    losses1, p1 = [], params1
    for it, b in enumerate(batches):
        p1, s1, loss = step1(p1, s1, Batch(*map(jnp.asarray, b)), it)
        losses1.append(float(loss))

    # 2-process hybrid: model axis spans the two processes, so the
    # all-to-all and the dense-grad psum cross the process boundary
    mesh = make_mesh(1, 2)
    plan = make_plan(cfg, n_model=2, alg="greedy")
    params2 = init_hybrid_params(cfg, plan, seed=seed)
    s2 = init_hybrid_opt_state(opt, params2, plan)
    params2, s2 = shard_params(mesh, params2, opt, s2)
    step2 = make_hybrid_train_step(cfg, plan, opt, mesh)
    losses2, p2 = [], params2
    for it, b in enumerate(batches):
        ai, aw = arrange_sparse_inputs(plan, b.indices, b.weights)
        sb = shard_batch(mesh, Batch(b.dense, ai, aw, b.labels))
        p2, s2, loss = step2(p2, s2, sb, it)
        losses2.append(float(loss))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5, atol=1e-6)

    # row-sharded path: tables span BOTH processes; psum_scatter completes
    # partial pooled sums across the process boundary
    from dlrm_yx_tpu.parallel.row_sharded import (
        init_row_sharded_opt_state, init_row_sharded_params, make_row_plan,
        make_row_sharded_train_step, shard_row_batch, shard_row_params,
    )

    rplan = make_row_plan(cfg, n_model=2)
    rp = init_row_sharded_params(cfg, rplan, seed=seed)
    rs = init_row_sharded_opt_state(opt, rp, rplan)
    rp, rs = shard_row_params(mesh, rp, opt, rs)
    rstep = make_row_sharded_train_step(cfg, rplan, opt, mesh)
    losses3 = []
    for it, b in enumerate(batches):
        sb = shard_row_batch(mesh, Batch(*map(jnp.asarray, b)))
        rp, rs, loss = rstep(rp, rs, sb, it)
        losses3.append(float(loss))
    np.testing.assert_allclose(losses1, losses3, rtol=1e-5, atol=1e-6)
    print(f"worker {pid} losses {losses2} ok", flush=True)
    """
)


def test_two_process_hybrid_training_loss_parity(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            DLRM_REPO_ROOT=root,
        )
        env.pop("PYTHONPATH", None)
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                cwd=root,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} losses" in out
