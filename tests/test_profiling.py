"""Unit tests for utils/profiling.py on a synthetic Chrome-trace dump.

The summarizer's contract: sum ``ph == "X"`` durations on the device
(TPU-named) process track, divide by ``steps``, drop jit wrappers /
numeric step markers / host-executor rows, and map instruction names to
``op_name`` metadata parsed from compiled-HLO text.
"""

import gzip
import json
import os

import pytest

from rangeclip_tpu.utils.profiling import (
    format_rows,
    op_names_from_hlo,
    summarize_trace,
)

HLO = """
HloModule jit_fn
%fusion.1 = f32[8]{0} fusion(...), kind=kLoop, op_name="jit(fn)/model/conv"
%fusion.2 = f32[8]{0} fusion(...), calls=%x, op_name="jit(fn)/model/topk"
"""


def _write_trace(tmp_path, events):
    d = os.path.join(tmp_path, "plugins", "profile", "run1")
    os.makedirs(d)
    path = os.path.join(d, "host.trace.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_summarize_trace_sums_device_track_and_maps_ops(tmp_path):
    tmp_path = str(tmp_path)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/host:CPU"}},
        # two steps of fusion.1 on the device track
        {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1", "dur": 3000},
        {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1", "dur": 1000},
        {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.2", "dur": 500},
        # excluded rows: jit wrapper, step marker, host-pid event
        {"ph": "X", "pid": 1, "tid": 1, "name": "jit_fn", "dur": 9999},
        {"ph": "X", "pid": 1, "tid": 1, "name": "7", "dur": 9999},
        {"ph": "X", "pid": 2, "tid": 1, "name": "fusion.1", "dur": 9999},
    ]
    rows = summarize_trace(_write_trace(tmp_path, events), steps=2,
                           hlo_text=HLO)
    assert rows == [
        ("fusion.1", 2.0, "jit(fn)/model/conv"),
        ("fusion.2", 0.25, "jit(fn)/model/topk"),
    ]
    text = format_rows(rows, top=1)
    assert "device total: 2.25 ms/step" in text
    assert "fusion.1" in text and "fusion.2" not in text


def test_summarize_trace_cpu_backend_fallback(tmp_path):
    # No TPU-named process: fall back to XLA-named threads, skipping
    # ThunkExecutor bookkeeping rows.
    tmp_path = str(tmp_path)
    events = [
        {"ph": "M", "name": "process_name", "pid": 5,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 5, "tid": 10,
         "args": {"name": "tf_XLAEigen"}},
        {"ph": "M", "name": "thread_name", "pid": 5, "tid": 11,
         "args": {"name": "main"}},
        {"ph": "X", "pid": 5, "tid": 10, "name": "convolution.3",
         "dur": 2000},
        {"ph": "X", "pid": 5, "tid": 10, "name": "ThunkExecutor::Execute",
         "dur": 9999},
        {"ph": "X", "pid": 5, "tid": 11, "name": "convolution.3",
         "dur": 9999},
    ]
    rows = summarize_trace(_write_trace(tmp_path, events), steps=1)
    assert rows == [("convolution.3", 2.0, "")]


def test_op_names_from_hlo_first_definition_wins():
    mapping = op_names_from_hlo(HLO + HLO)  # duplicate defs
    assert mapping == {
        "fusion.1": "jit(fn)/model/conv",
        "fusion.2": "jit(fn)/model/topk",
    }


ROOFLINE_HLO = """
HloModule jit_step

%fused_computation.1 (p0: bf16[32,128,128,64], p1: bf16[3,3,64,64]) -> bf16[32,128,128,64] {
  %p0 = bf16[32,128,128,64]{3,2,1,0} parameter(0)
  %p1 = bf16[3,3,64,64]{3,2,1,0} parameter(1)
  %conv.1 = bf16[32,128,128,64]{3,2,1,0} convolution(bf16[32,128,128,64]{3,2,1,0} %p0, bf16[3,3,64,64]{3,2,1,0} %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  ROOT %r = bf16[32,128,128,64]{3,2,1,0} add(bf16[32,128,128,64]{3,2,1,0} %conv.1, bf16[32,128,128,64]{3,2,1,0} %p0)
}

ENTRY %main (a: bf16[32,128,128,64], k: bf16[3,3,64,64], x: f32[1024,512], y: f32[512,256]) -> f32[1024,256] {
  %a = bf16[32,128,128,64]{3,2,1,0} parameter(0)
  %k = bf16[3,3,64,64]{3,2,1,0} parameter(1)
  %fusion.9 = bf16[32,128,128,64]{3,2,1,0} fusion(bf16[32,128,128,64]{3,2,1,0} %a, bf16[3,3,64,64]{3,2,1,0} %k), kind=kOutput, calls=%fused_computation.1, metadata={op_name="jit(step)/model/conv"}
  %x = f32[1024,512]{1,0} parameter(2)
  %y = f32[512,256]{1,0} parameter(3)
  ROOT %dot.7 = f32[1024,256]{1,0} dot(f32[1024,512]{1,0} %x, f32[512,256]{1,0} %y), lhs_contracting_dims={1}, rhs_contracting_dims={0}, metadata={op_name="jit(step)/model/proj"}
}
"""


def test_parse_hlo_instructions_bytes_and_flops():
    from rangeclip_tpu.utils.roofline import parse_hlo_instructions

    instrs = parse_hlo_instructions(ROOFLINE_HLO)
    # fusion: bytes = result + 2 operands (bf16), flops = conv inside the
    # called computation: 2 * out_elems * Cin * 3*3
    fusion = instrs["fusion.9"]
    conv_flops = 2 * (32 * 128 * 128 * 64) * 64 * 9
    assert fusion["flops"] == conv_flops
    buf = 32 * 128 * 128 * 64 * 2
    assert fusion["bytes"] == 2 * buf + 3 * 3 * 64 * 64 * 2
    assert fusion["op"] == "jit(step)/model/conv"
    # plain dot: 2 * M*N*K
    dot = instrs["dot.7"]
    assert dot["flops"] == 2 * 1024 * 256 * 512
    assert dot["bytes"] == 4 * (1024 * 256 + 1024 * 512 + 512 * 256)


def test_roofline_rows_and_buckets():
    from rangeclip_tpu.utils.roofline import (
        bucket_rows,
        format_interval_table,
        parse_hlo_instructions,
        roofline_rows,
    )

    instrs = parse_hlo_instructions(ROOFLINE_HLO)
    trace = [("fusion.9", 2.0, "jit(step)/model/conv"),
             ("dot.7", 1.0, "jit(step)/model/proj"),
             ("custom-call.3", 5.0, "jit(step)/loss/ce")]
    rows = roofline_rows(trace, instrs, peak_flops=100e12, peak_bytes=800e9,
                         kernel_flops={"loss/ce": 3.0e12})
    by_name = {r["instr"]: r for r in rows}
    # the Pallas custom-call got its analytic FLOPs from the table
    ce = by_name["custom-call.3"]
    assert ce["gflop"] == 3000.0
    assert ce["bound"] == "flop"
    # 3e12 flops / 100e12 peak = 30 ms bound vs 5 ms measured -> >100%
    assert ce["attainment"] == pytest.approx(6.0)
    conv = by_name["fusion.9"]
    assert conv["bound"] == "flop"  # 12.9 GFLOP vs 0.13 GB at these peaks
    assert 0 < conv["attainment"] < 1.5

    buckets = bucket_rows(rows, [("convs", r"model/conv"),
                                 ("ce", r"loss/ce")])
    names = [b["interval"] for b in buckets]
    assert names == ["convs", "ce", "other"]
    table = format_interval_table(buckets, total_ms=8.0)
    assert "| convs |" in table and "| ce |" in table
