"""Device-trace summarization: turn a ``jax.profiler.trace`` dump into a
per-op / per-subsystem cost table.

This is the workflow that found the round-2 hotspots (the conv-layout
relayout, the [N, k] id-remap gather, the lane-minor selection): run N
iterations under the profiler, sum the ``ph == "X"`` durations on the
device track of ``*.trace.json.gz``, and map XLA fusion names back to
model ops via the compiled HLO's ``op_name`` metadata.  The reference has
no equivalent (torch.profiler was never wired up; SURVEY L6) — here it is
a library + ``cli/benchmark.py profile``.

Typical use::

    with jax.profiler.trace(dir):
        for _ in range(steps): jax.block_until_ready(fn(*args))
    rows = summarize_trace(dir, steps=steps,
                           hlo_text=jitted.lower(*args).compile().as_text())
    print(format_rows(rows))
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


def _latest_trace_file(trace_dir: str) -> str:
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return files[-1]


def op_names_from_hlo(hlo_text: str) -> Dict[str, str]:
    """Map instruction names (fusion.N, ...) to their ``op_name`` metadata
    (the JAX-level op path) from compiled-HLO text."""
    out: Dict[str, str] = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"",
                         hlo_text):
        out.setdefault(m.group(1), m.group(2))
    return out


def summarize_trace(
    trace_dir: str,
    steps: int = 1,
    hlo_text: Optional[str] = None,
    track: str = "TPU",
) -> List[Tuple[str, float, str]]:
    """Sum per-op device time from the newest trace in ``trace_dir``.

    Returns [(instruction_name, ms_per_step, op_name)] sorted by cost,
    excluding the jit wrapper events (they double-count their children)
    and the profiler's numeric step markers.  ``track`` selects the
    device track by substring ("TPU"; falls back to every non-host track
    so CPU-backend traces summarize too).
    """
    with gzip.open(_latest_trace_file(trace_dir), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    wanted = {p for p, n in pids.items() if track in n}
    wanted_tids = None
    if not wanted:
        # CPU backend: XLA ops run on '/host:CPU' threads named
        # tf_XLAEigen/... — sum those (NB: thread-time, so parallel Eigen
        # workers over-count wall clock; fine for relative rankings).
        tid_names = {
            (e["pid"], e["tid"]): e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and "args" in e
        }
        wanted = set(pids)
        wanted_tids = {k for k, n in tid_names.items() if "XLA" in n}
    durs: collections.Counter = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in wanted
                and "dur" in e
                and (wanted_tids is None
                     or (e.get("pid"), e.get("tid")) in wanted_tids)):
            name = e.get("name", "?")
            if (name.startswith("jit_") or name.isdigit()
                    or name.startswith("ThunkExecutor")):
                continue
            durs[name] += e["dur"]
    name2op = op_names_from_hlo(hlo_text) if hlo_text else {}
    return [
        (name, dur / steps / 1000.0, name2op.get(name, ""))
        for name, dur in durs.most_common()
    ]


def format_rows(
    rows: List[Tuple[str, float, str]], top: int = 20, op_width: int = 90
) -> str:
    total = sum(ms for _, ms, _ in rows)
    lines = [f"device total: {total:.2f} ms/step"]
    for name, ms, op in rows[:top]:
        tail = op[-op_width:] if op else ""
        lines.append(f"{ms:9.3f} ms  {name:28s} {tail}")
    return "\n".join(lines)


# Peak dense bf16 FLOP/s by TPU generation (public cloud specs) — the
# denominator of every %-of-peak claim (bench.py keeps its own copy as a
# self-contained driver script; keep the figures in sync).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "TPU v7": 4614e12,
}


def chip_peak_flops(device) -> float:
    """Peak dense bf16 FLOP/s for ``device`` (the most generous plausible
    figure for unknown kinds, so %-of-peak claims err low)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(name):
            return peak
    return max(PEAK_BF16_FLOPS.values())


# Peak HBM bandwidth (bytes/s) by TPU generation (public cloud specs).
# Denominator of the bandwidth-roofline column in the train-step ledger:
# the train step is HBM-bound, so %-of-bandwidth is the honest "how close
# to the hardware ceiling" number where %-of-FLOP-peak would undersell.
PEAK_HBM_BYTES = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
    "TPU v7": 7400e9,
}


def chip_peak_hbm_bytes(device) -> float:
    """Peak HBM bytes/s for ``device`` (most generous for unknown kinds,
    so %-of-bandwidth claims err low)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_HBM_BYTES.items():
        if kind.startswith(name):
            return peak
    return max(PEAK_HBM_BYTES.values())
