import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Probe the primitive rates that decide the high-L (L=100) kernel design.

The L=100 bench budget is dominated by XLA's per-row-issue-bound scatter
(~15 ns/row) and gather (~10 ns/row). Every sorted-run streaming design
reduces to one crux: how fast can a Pallas kernel do DYNAMIC row ops on a
VMEM-resident block? This measures:

  A. in-kernel fori_loop VMEM row accumulate   out[pos[j]] += upd[j]
  B. in-kernel vectorized dynamic gather        out = blk[pos]  (jnp.take)
  C. MXU one-hot placement                      out += onehot(pos) @ upd
  D. XLA gather / scatter-add baselines at the same shapes
"""
import collections
import functools
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096           # store block rows
CH = 2048          # updates per grid step
GRID = 64          # grid steps
N = CH * GRID      # total updates per call
REPS = 30


def timed(fn, args, label, per):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="probe_")
    jax.profiler.start_trace(td)
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    pd = jax.profiler.ProfileData.from_file(
        glob.glob(td + "/**/*.xplane.pb", recursive=True)[-1]
    )
    tot = 0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                tot += ev.duration_ns
    ns = tot / REPS
    print(f"{label:44s} {ns/1e6:8.3f} ms/call  {ns/per:8.2f} ns/{'row'}",
          flush=True)
    return ns


def probe_a(unroll):
    def kern(pos_ref, upd_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            p = pos_ref[j]
            out_ref[pl.ds(p, 1), :] = out_ref[pl.ds(p, 1), :] + upd_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, CH, body, 0, unroll=unroll)

    def run(pos, upd):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CH, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(pos, upd)

    return run


def probe_b_vec():
    def kern(pos_ref, blk_ref, out_ref):
        out_ref[:] = jnp.take(blk_ref[:], pos_ref[:], axis=0)

    def run(pos, blk):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(pos, blk)

    return run


def probe_b_loop(unroll):
    def kern(pos_ref, blk_ref, out_ref):
        def body(j, _):
            p = pos_ref[j]
            out_ref[pl.ds(j, 1), :] = blk_ref[pl.ds(p, 1), :]
            return 0

        jax.lax.fori_loop(0, CH, body, 0, unroll=unroll)

    def run(pos, blk):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(pos, blk)

    return run


def probe_c():
    CCH = 512  # one-hot chunk

    def kern(pos_ref, upd_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = out_ref[:]
        for c in range(CH // CCH):
            pos_c = pos_ref[pl.ds(c * CCH, CCH)]
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, CCH), 0)
            onehot = jnp.where(
                rows == pos_c[None, :], jnp.bfloat16(1), jnp.bfloat16(0)
            )
            acc = acc + jax.lax.dot_general(
                onehot, upd_ref[pl.ds(c * CCH, CCH), :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc

    def run(pos, upd):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((CH, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(pos, upd)

    return run


def main():
    r = np.random.RandomState(0)
    pos = jnp.asarray(r.randint(0, R, N).astype(np.int32))
    upd = jnp.asarray(r.randn(N, 128).astype(np.float32))
    blk = jnp.asarray(r.randn(R, 128).astype(np.float32))

    # D. XLA baselines at probe shapes
    timed(lambda p, b: jnp.take(b, p, axis=0), (pos, blk),
          "D1 XLA gather blk[pos] (VMEM-size table)", N)
    big = jnp.asarray(r.randn(1_000_000, 128).astype(np.float32))
    pos_big = jnp.asarray(r.randint(0, 1_000_000, N).astype(np.int32))
    timed(lambda p, b: jnp.take(b, p, axis=0), (pos_big, big),
          "D2 XLA gather big[pos] (512MB table)", N)
    timed(
        lambda p, u: jnp.zeros((R, 128), jnp.float32).at[p].add(u),
        (pos, upd), "D3 XLA scatter-add (VMEM-size out)", N)
    timed(
        lambda p, u: jnp.zeros((1_000_000, 128), jnp.float32).at[p].add(u),
        (pos_big, upd), "D4 XLA scatter-add (512MB out)", N)

    for unroll in (1, 8):
        try:
            timed(probe_a(unroll), (pos, upd),
                  f"A  pallas VMEM RMW loop unroll={unroll}", N)
        except Exception as e:
            print(f"A unroll={unroll} FAILED: {str(e)[:160]}")
    try:
        timed(probe_b_vec(), (pos, blk), "B1 pallas vectorized jnp.take", N)
    except Exception as e:
        print(f"B1 FAILED: {str(e)[:200]}")
    for unroll in (1, 8):
        try:
            timed(probe_b_loop(unroll), (pos, blk),
                  f"B2 pallas VMEM gather loop unroll={unroll}", N)
        except Exception as e:
            print(f"B2 unroll={unroll} FAILED: {str(e)[:160]}")
    try:
        timed(probe_c(), (pos, upd), "C  pallas one-hot MXU place", N)
    except Exception as e:
        print(f"C FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
