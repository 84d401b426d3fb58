"""Trace-time compute-platform selection for kernel dispatch.

Pallas TPU kernels cannot lower for CPU/GPU, so the losses/model pick
between the fused kernels and the XLA formulation when they TRACE.  The
default backend is the right signal except when a TPU plugin is registered
but the computation targets CPU devices (e.g. a virtual-device CPU mesh for
sharding rehearsal on a TPU-attached machine) — set
``RANGECLIP_PLATFORM=cpu`` for those runs (``__graft_entry__.py`` does this
automatically when its mesh devices are CPU).
"""

from __future__ import annotations

import os

import jax


def use_tpu_kernels() -> bool:
    override = os.environ.get("RANGECLIP_PLATFORM")
    if override:
        return override not in ("cpu", "gpu")
    return jax.default_backend() not in ("cpu", "gpu")
