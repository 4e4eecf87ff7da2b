"""Unit tests for tools/profile_breakdown.py pure functions: the HLO
matmul-fusion classifier, the event-text byte parser, the async-start
exclusion base-name logic, and category mapping. The capture path needs a
chip; these keep the parsing honest from the fast tier."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "profile_breakdown",
    os.path.join(os.path.dirname(__file__), "..", "tools", "profile_breakdown.py"),
)
pb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pb)


HLO = """\
HloModule jit_step

%fused_computation.9 (param_0: bf16[128,768], param_1: bf16[768,3072]) -> bf16[128,3072] {
  %param_0 = bf16[128,768] parameter(0)
  %param_1 = bf16[768,3072] parameter(1)
  ROOT %dot.5 = bf16[128,3072] dot(%param_0, %param_1), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}

%fused_computation.10 (param_0.1: f32[128,3072]) -> f32[128] {
  %param_0.1 = f32[128,3072] parameter(0)
  %c = f32[] constant(0)
  ROOT %reduce.1 = f32[128] reduce(%param_0.1, %c), dimensions={1}, to_apply=%add
}

ENTRY %main (p0: bf16[128,768]) -> f32[128] {
  %p0 = bf16[128,768] parameter(0)
  %w = bf16[768,3072] constant({...})
  %fusion.9 = bf16[128,3072] fusion(%p0, %w), kind=kOutput, calls=%fused_computation.9
  %cv = f32[128,3072] convert(%fusion.9)
  ROOT %convert_reduce_fusion.2 = f32[128] fusion(%cv), kind=kLoop, calls=%fused_computation.10
}
"""


def test_classifier_finds_dot_bearing_fusions_only():
    mm = pb.classify_fusions_from_hlo(HLO)
    assert "fusion.9" in mm
    assert "convert_reduce_fusion.2" not in mm


def test_categorize_splits_matmul_from_bandwidth_with_sidecar():
    mm = {"fusion.9"}
    ev_mm = "%fusion.9 = bf16[128,3072]{1,0} fusion(bf16[128,768]{1,0} %p0)"
    ev_bw = "%convert_reduce_fusion.2 = f32[128]{0} fusion(f32[128,3072]{1,0} %cv)"
    assert pb.categorize(ev_mm, mm) == "fusion: matmul/conv"
    assert pb.categorize(ev_bw, mm) == "fusion: bandwidth (elementwise/reduce)"
    # without a sidecar every fusion stays in the merged bucket
    assert pb.categorize(ev_mm, None) == "matmul/fusion"
    assert pb.categorize(ev_bw, None) == "matmul/fusion"


def test_bytes_in_event_text():
    ev = "%f = (f32[128]{0}, bf16[4,8]{1,0}) fusion(s32[2,2]{1,0} %x)"
    # 128*4 + 32*2 + 4*4 = 512 + 64 + 16
    assert pb.bytes_in_event_text(ev) == 592
    assert pb.bytes_in_event_text("%x = pred[] constant(1)") == 1


def test_async_start_base_name_exclusion():
    # the event-loop logic: full-HLO-text names with .NNN ids must still be
    # recognized as async-start spans
    import re

    def is_start(name):
        base = name.lstrip("%").split(" ", 1)[0]
        return re.sub(r"\.\d+$", "", base).endswith("-start")

    assert is_start("%copy-start.1059 = (bf16[8]{0}) copy-start(bf16[8]{0} %a)")
    assert is_start("all-reduce-start.3")
    assert not is_start("%copy-done.4 = bf16[8]{0} copy-done(%cs)")
    assert not is_start("%fusion.9 = bf16[8]{0} fusion(%a)")
