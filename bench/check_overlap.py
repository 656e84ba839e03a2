import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Record the a2a/bottom-MLP overlap evidence (VERDICT r2 item 3).

AOT-compiles the hybrid step for a v5e 2x4 topology and reports whether
the scheduled module overlaps bottom-MLP dots inside the async a2a window,
with and without the mesh_jit compiler flag."""
import json

from dlrm_yx_tpu.parallel.overlap import aot_compile_hybrid_hlo, check_a2a_overlap


def main():
    for async_a2a in (False, True):
        txt = aot_compile_hybrid_hlo(async_a2a=async_a2a)
        res = check_a2a_overlap(txt)
        res["flag"] = async_a2a
        print(json.dumps(res))


if __name__ == "__main__":
    main()
