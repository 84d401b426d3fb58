"""Per-instruction roofline attribution from compiled-HLO text + a device
trace.

The step-level ledger (cli/benchmark.py train mode) reports one FLOP count
and one byte count for the whole program — honest, but it cannot say WHICH
part of a 60 ms step is near ITS own bound.  This module closes that gap:

  * :func:`parse_hlo_instructions` statically parses the compiled HLO text
    into per-instruction records: result/operand buffer bytes (the
    analytic minimum HBM traffic of that instruction: every operand read
    once + result written once) and MXU FLOPs (convolution / dot
    sub-instructions inside each fusion's called computation; elementwise
    VPU flops are ignored — they never bind on TPU at these shapes).
  * :func:`roofline_rows` joins those records with
    ``profiling.summarize_trace`` durations and computes, per instruction:
    achieved GB/s, achieved TFLOP/s, and the binding-roofline attainment
    ``max(t_flop, t_byte) / t_actual`` where ``t_flop = flops/peak_flops``
    and ``t_byte = bytes/peak_bw``.
  * :func:`bucket_rows` groups instructions into model-level intervals
    (encoder, decoder, CE kernel, TV kernel, ... ) via op_name/instruction
    patterns, so the README table has ~8 rows instead of ~300.

Caveats (kept in the printed table footer): bytes are the analytic
minimum (fusions that re-read an operand, or spill, move more — attainment
can exceed 100% on nothing-to-move fusions and underestimate true
efficiency elsewhere); Pallas custom-call FLOPs are supplied by the caller
per kernel (the HLO text does not describe the kernel body).
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def _line_bytes(line: str) -> int:
    """Sum the buffer sizes of every shape mentioned on an instruction
    line: the result (or result tuple) + each typed operand reference.
    This is the instruction's analytic minimum HBM traffic."""
    return sum(_shape_bytes(d, s) for d, s in _SHAPE_RE.findall(line))


def _conv_flops(line: str) -> Optional[int]:
    """2 * out_elems * Cin_per_group * prod(window) for a convolution
    instruction line (dim_labels tells which operand dim is the input
    feature)."""
    shapes = _SHAPE_RE.findall(line)
    if not shapes:
        return None
    m = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", line)
    win = re.search(r"window={[^}]*size=([\dx]+)", line)
    if not m or not win or len(shapes) < 3:
        return None
    out_dims = [int(d) for d in shapes[0][1].split(",") if d]
    rhs_labels = m.group(2)
    rhs_dims = [int(d) for d in shapes[2][1].split(",") if d]
    try:
        cin = rhs_dims[rhs_labels.index("i")]
    except (ValueError, IndexError):
        return None
    groups = 1
    g = re.search(r"feature_group_count=(\d+)", line)
    if g:
        groups = int(g.group(1))
    window = math.prod(int(x) for x in win.group(1).split("x"))
    return 2 * math.prod(out_dims) * cin * window // max(groups, 1)


def _dot_flops(line: str) -> Optional[int]:
    """2 * out_elems * prod(lhs contracting dims) for a dot line."""
    shapes = _SHAPE_RE.findall(line)
    m = re.search(r"lhs_contracting_dims={([\d,]*)}", line)
    if not m or len(shapes) < 2:
        return None
    out_dims = [int(d) for d in shapes[0][1].split(",") if d]
    lhs_dims = [int(d) for d in shapes[1][1].split(",") if d]
    k = 1
    for i in m.group(1).split(","):
        if i:
            k *= lhs_dims[int(i)]
    return 2 * math.prod(out_dims) * k


_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = ")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->")


def parse_hlo_instructions(hlo_text: str) -> Dict[str, Dict[str, float]]:
    """Parse compiled-HLO text into {instr_name: {bytes, flops, op}}.

    ``bytes`` is the analytic operand+result traffic of the (top-level)
    instruction; ``flops`` sums convolution/dot FLOPs found on the line
    itself or inside the fusion's called computation.
    """
    # computation name -> summed dot/conv flops of its instruction lines
    comp_flops: Dict[str, int] = {}
    comp_of_line: List[Tuple[str, str]] = []  # (computation, line)
    current = ""
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm and ("{" in line or line.rstrip().endswith("->")):
            current = cm.group(1)
            continue
        if " = " in line:
            comp_of_line.append((current, line))
            if "convolution(" in line or " dot(" in line:
                fl = (_conv_flops(line) if "convolution(" in line
                      else _dot_flops(line))
                if fl:
                    comp_flops[current] = comp_flops.get(current, 0) + fl

    out: Dict[str, Dict[str, float]] = {}
    for comp, line in comp_of_line:
        im = _INSTR_RE.match(line)
        if not im:
            continue
        name = im.group(1)
        flops = 0
        if "convolution(" in line or " dot(" in line:
            flops = (_conv_flops(line) if "convolution(" in line
                     else _dot_flops(line)) or 0
        elif " fusion(" in line:
            cm2 = _CALLS_RE.search(line)
            if cm2:
                flops = comp_flops.get(cm2.group(1), 0)
        op = ""
        om = re.search(r"op_name=\"([^\"]+)\"", line)
        if om:
            op = om.group(1)
        out[name] = {"bytes": float(_line_bytes(line)),
                     "flops": float(flops), "op": op}
    return out


def roofline_rows(
    trace_rows: List[Tuple[str, float, str]],
    instrs: Dict[str, Dict[str, float]],
    peak_flops: float,
    peak_bytes: float,
    kernel_flops: Optional[Dict[str, float]] = None,
) -> List[Dict]:
    """Join trace durations with per-instruction bytes/flops.

    kernel_flops: {substring-of-instr-or-op-name: flops} — analytic FLOP
    counts for Pallas custom-calls (HLO text cannot describe them).
    """
    rows = []
    for name, ms, op in trace_rows:
        rec = instrs.get(name, {})
        byt = rec.get("bytes", 0.0)
        fl = rec.get("flops", 0.0)
        op = op or rec.get("op", "")
        if kernel_flops:
            for pat, kfl in kernel_flops.items():
                if pat in name or pat in op:
                    fl = max(fl, kfl)
                    break
        t = ms / 1e3
        t_fl = fl / peak_flops
        t_by = byt / peak_bytes
        bound = "flop" if t_fl >= t_by else "byte"
        attain = (max(t_fl, t_by) / t) if t > 0 else 0.0
        rows.append({
            "instr": name, "op": op, "ms": ms,
            "gb": byt / 1e9, "gflop": fl / 1e9,
            "gbps": byt / t / 1e9 if t > 0 else 0.0,
            "tflops": fl / t / 1e12 if t > 0 else 0.0,
            "bound": bound, "attainment": attain,
        })
    return rows


def bucket_rows(rows: List[Dict], buckets: List[Tuple[str, str]],
                ) -> List[Dict]:
    """Group rows into named intervals.  ``buckets`` is an ordered list of
    (bucket_name, regex) matched against ``op`` then ``instr``; first
    match wins; unmatched rows land in 'other'."""
    agg: Dict[str, Dict] = {}
    order = [b for b, _ in buckets] + ["other"]
    for r in rows:
        dest = "other"
        for bname, pat in buckets:
            if re.search(pat, r["op"]) or re.search(pat, r["instr"]):
                dest = bname
                break
        a = agg.setdefault(dest, {"interval": dest, "ms": 0.0, "gb": 0.0,
                                  "gflop": 0.0, "t_bound": 0.0,
                                  "n_instr": 0})
        a["ms"] += r["ms"]
        a["gb"] += r["gb"]
        a["gflop"] += r["gflop"]
        # binding time adds per instruction (each instruction binds on its
        # own better roofline: ms * attainment == max(t_flop, t_byte))
        a["t_bound"] += r["ms"] * r["attainment"]
        a["n_instr"] += 1
    out = []
    for name in order:
        if name not in agg:
            continue
        a = agg[name]
        t = a["ms"] / 1e3
        a["gbps"] = a["gb"] / t if t > 0 else 0.0
        a["tflops"] = a["gflop"] / 1e3 / t if t > 0 else 0.0
        a["attainment"] = a["t_bound"] / a["ms"] if a["ms"] > 0 else 0.0
        out.append(a)
    return out


def format_interval_table(buckets: List[Dict], total_ms: float) -> str:
    lines = [
        "| interval | ms/step | % step | GB | GB/s | GFLOP | TFLOP/s |"
        " % of own roofline |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for b in buckets:
        lines.append(
            f"| {b['interval']} | {b['ms']:.2f} | "
            f"{100 * b['ms'] / total_ms:.0f}% | {b['gb']:.2f} | "
            f"{b['gbps']:.0f} | {b['gflop']:.0f} | {b['tflops']:.1f} | "
            f"{100 * b['attainment']:.0f}% |"
        )
    return "\n".join(lines)
