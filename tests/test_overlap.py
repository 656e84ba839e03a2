"""a2a/compute overlap: the scheduled TPU module must interleave
bottom-MLP compute between async all-to-all start/done (the overlap the
reference hand-codes, dlrm_s_pytorch.py:708-713). AOT-compiles against a
v5e topology — skipped where no TPU compiler is reachable (pure-CPU CI)."""

import pytest

from dlrm_yx_tpu.parallel.overlap import aot_compile_hybrid_hlo, check_a2a_overlap


def test_hybrid_a2a_overlaps_bottom_mlp():
    try:
        hlo = aot_compile_hybrid_hlo(async_a2a=True)
    except Exception as e:
        pytest.skip(f"no TPU AOT compiler here: {str(e)[:120]}")
    res = check_a2a_overlap(hlo)
    assert res["async"], "a2a not split into async start/done"
    assert res["sync_a2a"] == 0, "synchronous all-to-all remains"
    assert res["bottom_mlp_dots_inside"] >= 1, (
        "no bottom-MLP dot scheduled inside the a2a window: "
        f"{res}"
    )


def test_check_a2a_overlap_parser():
    """Parser sanity on a synthetic scheduled module."""
    fake = "\n".join([
        "HloModule m, is_scheduled=true",
        "ENTRY %e () -> f32[] {",
        '  %a = ((f32[8]), f32[8], u32[], u32[]) all-to-all-start(%x)',
        '  %d1 = f32[2,2] dot_general(%p, %q), metadata={op_name="x/bottom_mlp/dot_general"}',
        "  %done = f32[8] all-to-all-done(%a)",
        "}",
    ])
    res = check_a2a_overlap(fake)
    assert res["async"] and res["n_pairs"] == 1
    assert res["bottom_mlp_dots_inside"] == 1
