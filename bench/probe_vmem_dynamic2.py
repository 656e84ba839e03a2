import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Round-2 probes: gather/scatter rate vs target size, sortedness, row
width; pallas loop full-unroll; vectorized in-kernel take variants."""
import glob
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20
N = 131072


def timed(fn, args, label, per=N, reps=REPS):
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
    print(f"{label:52s} {ns/1e6:8.3f} ms/call  {ns/per:8.2f} ns/row",
          flush=True)
    return ns


def main():
    r = np.random.RandomState(0)
    import jax.random as jr

    def dev_randn(shape, dtype=jnp.float32):
        return jr.normal(jr.PRNGKey(0), shape, dtype)

    def dev_randint(lo, hi, n):
        return jr.randint(jr.PRNGKey(1), (n,), lo, hi, jnp.int32)

    # 1. gather rate vs table size (rows of 128 f32 = 512 B)
    for rows in (4096, 16384, 65536, 262144, 1048576, 4194304):
        tbl = dev_randn((rows, 128))
        pos = dev_randint(0, rows, N)
        timed(lambda p, t: jnp.take(t, p, axis=0), (pos, tbl),
              f"gather [{N}] from [{rows},128] ({rows*512>>20} MB)")

    # 2. sorted vs unsorted indices, big table
    rows = 4194304
    tbl = dev_randn((rows, 128))
    pos_sorted = jnp.sort(dev_randint(0, rows, N))
    timed(lambda p, t: jnp.take(t, p, axis=0), (pos_sorted, tbl),
          "gather big, SORTED indices")

    # 3. row width: 64 vs 128 vs 256 lanes (256 B / 512 B / 1 KB rows)
    for w in (64, 256):
        rows_w = (4194304 * 128) // w
        tblw = dev_randn((rows_w, w))
        posw = dev_randint(0, rows_w, N)
        timed(lambda p, t: jnp.take(t, p, axis=0), (posw, tblw),
              f"gather big from [{rows_w},{w}] ({w*4} B rows)")

    # bf16 big
    tbl16 = tbl.astype(jnp.bfloat16)
    timed(lambda p, t: jnp.take(t, p, axis=0), (dev_randint(0, rows, N), tbl16),
          "gather big bf16 rows (256 B)")

    # 4. scatter-add vs target size
    upd = jnp.asarray(r.randn(N, 128).astype(np.float32))
    for rows_s in (4096, 16384, 65536, 262144, 1048576, 4194304):
        poss = dev_randint(0, rows_s, N)
        timed(
            lambda p, u, rs=rows_s: jnp.zeros((rs, 128), jnp.float32).at[p].add(u),
            (poss, upd),
            f"scatter-add into [{rows_s},128] ({rows_s*512>>20} MB)")
    # scatter-add big, sorted indices
    timed(
        lambda p, u: jnp.zeros((4194304, 128), jnp.float32).at[p].add(u),
        (jnp.sort(dev_randint(0, 4194304, N)), upd),
        "scatter-add big, SORTED indices")

    # 5. pallas loop FULL unroll (CH=512)
    CH, R, GRID = 512, 4096, 64
    pos5 = jnp.asarray(r.randint(0, R, CH * GRID).astype(np.int32))
    upd5 = jnp.asarray(r.randn(CH * GRID, 128).astype(np.float32))
    blk5 = jnp.asarray(r.randn(R, 128).astype(np.float32))

    def kern_rmw(pos_ref, upd_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            p = pos_ref[j]
            out_ref[pl.ds(p, 1), :] = (
                out_ref[pl.ds(p, 1), :] + upd_ref[pl.ds(j, 1), :]
            )
            return 0

        jax.lax.fori_loop(0, CH, body, 0, unroll=CH)

    try:
        timed(
            lambda p, u: pl.pallas_call(
                kern_rmw,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(p, u),
            (pos5, upd5), f"pallas RMW loop FULL unroll CH={CH}",
            per=CH * GRID)
    except Exception as e:
        print(f"full-unroll RMW FAILED: {str(e)[:160]}")

    def kern_gat(pos_ref, blk_ref, out_ref):
        def body(j, _):
            p = pos_ref[j]
            out_ref[pl.ds(j, 1), :] = blk_ref[pl.ds(p, 1), :]
            return 0

        jax.lax.fori_loop(0, CH, body, 0, unroll=CH)

    try:
        timed(
            lambda p, b: pl.pallas_call(
                kern_gat,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((R, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((CH * GRID, 128), jnp.float32),
            )(p, b),
            (pos5, blk5), f"pallas gather loop FULL unroll CH={CH}",
            per=CH * GRID)
    except Exception as e:
        print(f"full-unroll gather FAILED: {str(e)[:160]}")

    # 6. vectorized take variants inside the kernel
    def try_vec(label, kern):
        try:
            timed(
                lambda p, b: pl.pallas_call(
                    kern,
                    grid=(GRID,),
                    in_specs=[
                        pl.BlockSpec((CH,), lambda i: (i,),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((CH, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((CH * GRID, 128),
                                                   jnp.float32),
                )(p, b),
                (pos5, blk5), label, per=CH * GRID)
        except Exception as e:
            print(f"{label} FAILED: {str(e)[:200]}")

    def kern_v1(pos_ref, blk_ref, out_ref):
        out_ref[:] = jnp.take(blk_ref[:], pos_ref[:], axis=0)

    def kern_v2(pos_ref, blk_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            blk_ref[:], pos_ref[:][:, None].astype(jnp.int32) * jnp.ones(
                (1, 128), jnp.int32), axis=0)

    def kern_v3(pos_ref, blk_ref, out_ref):
        out_ref[:] = blk_ref[:][pos_ref[:]]

    try_vec("vec take(blk, pos, axis=0)", kern_v1)
    try_vec("vec take_along_axis broadcast", kern_v2)
    try_vec("vec fancy-index blk[pos]", kern_v3)


if __name__ == "__main__":
    main()
