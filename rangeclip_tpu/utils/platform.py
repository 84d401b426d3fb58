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
        # case-insensitive, like JAX_PLATFORMS — 'CPU' must not silently
        # select the Pallas TPU path on a CPU backend
        return override.lower() not in ("cpu", "gpu")
    return jax.default_backend() not in ("cpu", "gpu")


def kernel_interpret() -> bool:
    """True under ``RANGECLIP_PLATFORM=interpret``: dispatch the PRODUCTION
    Pallas-kernel code path with ``interpret=True`` so it traces and
    executes on CPU devices — the sharding-rehearsal mode that runs the
    kernel path on the 8-virtual-device CPU mesh (tests/test_parallel.py,
    the multichip dryrun) without TPU hardware.  Same dispatch decisions,
    same shard_map partitioning (parallel/kernel_shard.py), same kernel
    tracing; only the Mosaic compile is replaced by the interpreter."""
    return os.environ.get("RANGECLIP_PLATFORM", "").lower() == "interpret"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache for every entry point.

    First compiles over a remote-tunnel TPU backend take minutes; cached
    executables load in seconds in a fresh process (measured: ~4 s vs
    minutes for the same program).  Cache dir resolution:
    ``cache_dir`` arg > ``RANGECLIP_XLA_CACHE`` env >
    ``~/.cache/rangeclip_tpu/xla``.  Set ``RANGECLIP_XLA_CACHE=off`` to
    disable.  Returns the directory used (None when disabled/unavailable).
    """
    env = os.environ.get("RANGECLIP_XLA_CACHE")
    if env == "off" and cache_dir is None:
        # documented precedence: an explicit cache_dir argument wins over
        # the env kill-switch (which targets the DEFAULT location)
        return None
    path = cache_dir or (env if env != "off" else None) or os.path.join(
        os.path.expanduser("~"), ".cache", "rangeclip_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
