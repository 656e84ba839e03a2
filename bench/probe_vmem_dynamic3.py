import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-3 probes at REAL bench sizes (K=1.64M, store 4.19M phys rows).

  a. in-kernel tpu.dynamic_gather (take_along_axis) throughput
  b. XLA sort of K keys with payloads
  c. XLA gather [K] from the 8 MB g_pooled table (value expansion)
  d. region-sliced gather: 64 static 32 MB slices, sorted indices
  e. scalar indicator scatter + cumsum (rank precompute)
  f. XLA gather/scatter at K=1.64M for calibration
"""
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1_638_400
RPHYS = 4_194_304
REPS = 10


def timed(fn, args, label, per, reps=REPS):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="probe_")
    jax.profiler.start_trace(td)
    for _ in range(reps):
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
    ns = tot / reps
    print(f"{label:56s} {ns/1e6:8.3f} ms/call  {ns/per:8.2f} ns/item",
          flush=True)
    return ns


def main():
    # a. dynamic_gather in kernel: out[i,l] = blk[idx[i,l], l], block-shaped
    R, GRID = 4096, 256

    def kern_dg(idx_ref, blk_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(blk_ref[:], idx_ref[:], axis=0)

    def run_dg(idx, blk):
        return pl.pallas_call(
            kern_dg,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R * GRID, 128), jnp.float32),
        )(idx, blk)

    idx_dg = jr.randint(jr.PRNGKey(0), (R * GRID, 128), 0, R, jnp.int32)
    blk_dg = jr.normal(jr.PRNGKey(1), (R, 128), jnp.float32)
    try:
        timed(run_dg, (idx_dg, blk_dg),
              f"a  in-kernel dynamic_gather [{R},128] per block", R * GRID)
    except Exception as e:
        print(f"a FAILED: {str(e)[:200]}")

    # same-index-per-lane variant (broadcast from one lane)
    idx_b = jnp.broadcast_to(
        jr.randint(jr.PRNGKey(2), (R * GRID, 1), 0, R, jnp.int32),
        (R * GRID, 128)).astype(jnp.int32)
    try:
        timed(run_dg, (jnp.asarray(idx_b), blk_dg),
              "a2 dynamic_gather same idx per lane", R * GRID)
    except Exception as e:
        print(f"a2 FAILED: {str(e)[:200]}")

    # f. calibration at real K: gather / scatter big
    store = jr.normal(jr.PRNGKey(3), (RPHYS, 128), jnp.float32)
    gidx = jr.randint(jr.PRNGKey(4), (K,), 0, RPHYS, jnp.int32)
    timed(lambda p, t: jnp.take(t, p, axis=0), (gidx, store),
          "f1 XLA gather K from 2GB", K)
    upd = jr.normal(jr.PRNGKey(5), (K, 128), jnp.float32)
    timed(lambda p, u: jnp.zeros((RPHYS, 128), jnp.float32).at[p].add(u),
          (gidx, upd), "f2 XLA scatter-add K into 2GB zeros", K)

    # c. value expansion: gather K rows from the 8 MB pooled-grad table
    gp = jr.normal(jr.PRNGKey(6), (16384, 128), jnp.float32)
    seg = jr.randint(jr.PRNGKey(7), (K,), 0, 16384, jnp.int32)
    timed(lambda s, g: jnp.take(g, s, axis=0), (seg, gp),
          "c  XLA gather K from 8MB g_pooled", K)

    # b. sort K keys + 1 payload / 2 payloads
    keys = gidx
    pay1 = seg
    pay2 = jr.normal(jr.PRNGKey(8), (K,), jnp.float32)
    timed(lambda k: jnp.sort(k), (keys,), "b1 sort K keys only", K)
    timed(lambda k, p: jax.lax.sort((k, p), num_keys=1), (keys, pay1),
          "b2 sort K keys + 1 i32 payload", K)
    timed(lambda k, p, q: jax.lax.sort((k, p, q), num_keys=1),
          (keys, pay1, pay2), "b3 sort K keys + 2 payloads", K)

    # e. indicator scatter + cumsum over RPHYS
    rows_u = jnp.sort(jr.randint(jr.PRNGKey(9), (K,), 0, RPHYS, jnp.int32))
    timed(
        lambda r: jnp.cumsum(
            jnp.zeros((RPHYS,), jnp.int32).at[r].max(1)
        ),
        (rows_u,), "e  indicator scatter-max + cumsum [4.19M]", K)

    # d. region-sliced gather: 64 static 32MB slices, sorted idx, padded
    NREG = 64
    CAP = 28672  # per-region cap (uniform K/64 = 25.6k)
    sidx = jnp.sort(gidx)
    # build per-region padded index chunks on device (outside timing)
    reg = sidx // (RPHYS // NREG)
    starts = jnp.searchsorted(reg, jnp.arange(NREG, dtype=jnp.int32))

    def build(sidx, starts):
        outs = []
        for i in range(NREG):
            take_i = jax.lax.dynamic_slice(
                jnp.pad(sidx, (0, CAP)), (starts[i],), (CAP,)
            )
            n_i = (jnp.searchsorted(reg, i + 1) - starts[i]).astype(jnp.int32)
            valid = jnp.arange(CAP, dtype=jnp.int32) < n_i
            local = jnp.where(
                valid, take_i - i * (RPHYS // NREG), 0
            ).astype(jnp.int32)
            outs.append(local)
        return jnp.stack(outs)  # [NREG, CAP]

    local_idx = jax.jit(build)(sidx, starts)
    jax.block_until_ready(local_idx)

    def region_gather(lidx, st):
        outs = []
        rsz = RPHYS // NREG
        for i in range(NREG):
            sl = jax.lax.slice_in_dim(st, i * rsz, (i + 1) * rsz, axis=0)
            sl = jax.lax.optimization_barrier(sl)
            outs.append(jnp.take(sl, lidx[i], axis=0))
        return jnp.concatenate(outs, 0)

    timed(region_gather, (local_idx, store),
          f"d  region-sliced gather {NREG}x{CAP} (barrier)", NREG * CAP)

    def region_gather_nb(lidx, st):
        outs = []
        rsz = RPHYS // NREG
        for i in range(NREG):
            sl = jax.lax.slice_in_dim(st, i * rsz, (i + 1) * rsz, axis=0)
            outs.append(jnp.take(sl, lidx[i], axis=0))
        return jnp.concatenate(outs, 0)

    timed(region_gather_nb, (local_idx, store),
          f"d2 region-sliced gather {NREG}x{CAP} (fused)", NREG * CAP)


if __name__ == "__main__":
    main()
