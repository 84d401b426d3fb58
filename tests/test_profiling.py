"""Unit tests for utils/profiling.py on a synthetic Chrome-trace dump.

The summarizer's contract: sum ``ph == "X"`` durations on the device
(TPU-named) process track, divide by ``steps``, drop jit wrappers /
numeric step markers / host-executor rows, and map instruction names to
``op_name`` metadata parsed from compiled-HLO text.
"""

import gzip
import json
import os

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
