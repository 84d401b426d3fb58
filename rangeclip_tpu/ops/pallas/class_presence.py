"""Present-classes reduction (Pallas TPU kernel).

``present[c] = any(labels == c & valid)`` over a flat [N] label vector —
the contrast-set builder's first step (reference model.py:236-247; XLA
lowers the equivalent ``zeros(C).at[labels].max(valid)`` scatter to a slow
serialized path, ~4 ms for N=180k on a v5e).  Here each grid step compares
a [1, TILE_N] label tile against the class iota [C, 1] on the VPU and
max-accumulates the [C] presence vector in the revisited output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _presence_kernel(labels_ref, valid_ref, out_ref, *, num_classes: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    labels = labels_ref[:]  # [1, TN] int32
    valid = valid_ref[:]  # [1, TN] float32
    class_ids = jax.lax.broadcasted_iota(
        jnp.int32, (num_classes, labels.shape[1]), dimension=0
    )
    hit = (labels == class_ids) & (valid > 0)  # [C, TN]
    out_ref[:] = jnp.maximum(
        out_ref[:], jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
    )


@functools.partial(jax.jit, static_argnames=("num_classes", "tile_n", "interpret"))
def fused_class_presence(
    labels: jax.Array,
    valid: jax.Array,
    num_classes: int,
    tile_n: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """[C] bool: class appears among the valid labels.

    Args:
      labels: [N] int labels (values outside [0, C) never match).
      valid: [N] float/bool validity weights.
      num_classes: C, static.
    """
    N = labels.shape[0]
    pad = (-N) % tile_n
    if pad:
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        valid = jnp.pad(valid, (0, pad))
    n_padded = labels.shape[0]

    out = pl.pallas_call(
        functools.partial(_presence_kernel, num_classes=num_classes),
        grid=(n_padded // tile_n,),
        in_specs=[
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_classes, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_classes, 1), jnp.float32),
        interpret=interpret,
    )(
        labels.astype(jnp.int32).reshape(1, n_padded),
        valid.astype(jnp.float32).reshape(1, n_padded),
    )
    return out[:, 0] > 0
