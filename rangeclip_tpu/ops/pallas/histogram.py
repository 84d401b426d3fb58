"""Exact batched histogram as an MXU one-hot matmul (Pallas TPU kernel).

``counts[b, p] = sum_j (idx[b, j] == p)`` — the per-pixel multiplicity
histogram behind the sampled-pixel InfoNCE weights (reference model.py:220
samples pixels with replacement; losses/infonce.py weights every pixel by
its draw count instead).  XLA lowers ``zeros(P).at[idx].add(1)`` to a
serialized scatter-add on TPU: ~9.8 ms/step for 32x45875 draws into
32x65536 bins at the canonical train config — 14% of the whole step.

The kernel brute-forces the histogram on the MXU instead.  Decompose each
bin index as ``p = hi * Q + lo`` (Q = 256 lanes); then

    counts[hi, lo] = sum_j onehot(hi_j)[hi] * onehot(lo_j)[lo]

is a plain matmul ``A[R, K] . B[K, Q]`` per image, accumulated over draw
chunks of size K.  Every product is 0/1 in bf16 (exact) and accumulation
is f32 (exact for integer sums < 2^24 >> max draws), so the result is
bit-identical to the scatter — proved in tests/test_pallas_kernels.py.
2 * N * P FLOPs sounds absurd for a histogram (192 GFLOP at the train
config) but measures ~4.8 ms standalone on a v5e vs ~13 ms for the
scatter (serialized-chain protocol, shared overhead in both numbers).

Layout note: both one-hots must be built from the SAME [1, K] row tile
(lane-major draws) because a [1, K] -> [K, 1] lane->sublane reshape is
illegal in Mosaic.  ``A[r, k] = (hi_k == r)`` wants hi on lanes — fine —
and instead of ``B[k, q]`` (lo on sublanes) we build ``Bt[q, k]`` and
contract both operands on their minor dim:
``dot_general(A, Bt, contract=(1, 1))`` is the rhs-transposed matmul the
MXU natively supports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q = 256  # lane-axis bins per sublane-axis bin


def _histogram_kernel(idx_ref, out_ref, *, rows: int, chunk: int):
    # The [1, N] row block is whole-array in the minor dim (a [1, K] tile
    # would need an 8-divisible sublane block — Mosaic rejects it); the
    # int32 row is small (~200 KB at the train config), so chunking happens
    # INSIDE the kernel over lane slices, with the accumulator in registers.
    n = idx_ref.shape[-1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (_Q, chunk), 0)

    def body(c, acc):
        idx = idx_ref[0, :, pl.ds(c * chunk, chunk)]  # [1, K]; padding = -1
        hi = jnp.where(idx >= 0, idx // _Q, -1)  # [1, K]
        lo = idx % _Q  # hi == -1 rows never match, lo value irrelevant
        a = (hi == row_ids).astype(jnp.bfloat16)  # [R, K]
        bt = (lo == lane_ids).astype(jnp.bfloat16)  # [Q, K]
        return acc + jax.lax.dot_general(
            a,
            bt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, n // chunk, body, jnp.zeros((rows, _Q), jnp.float32)
    )
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("n_bins", "chunk", "interpret")
)
def fused_histogram(
    idx: jax.Array,
    n_bins: int,
    chunk: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """Exact per-row histogram: ``out[b, p] = sum_j (idx[b, j] == p)``.

    Args:
      idx: [B, N] int32 draw indices in [0, n_bins); negative = ignored.
      n_bins: P, static.
      chunk: draws per in-kernel loop step (K); 8192 measured fastest
        (4.8 vs 6.0 ms at 4096 for 32x45875 draws into 65536 bins — fewer
        loop steps win); the two [*, K] bf16 one-hots are ~8 MB of VMEM.

    Returns: [B, n_bins] float32 exact integer counts.
    """
    B, N = idx.shape
    rows = -(-n_bins // _Q)
    rows_padded = max(-(-rows // 8) * 8, 8)
    # The two in-kernel bf16 one-hots are [rows, K] + [Q, K]: at the
    # canonical 65536 bins (rows=256) the default K=8192 costs ~8 MB and
    # is the measured-fastest, but rows scale with n_bins — 512^2 training
    # (262144 bins, rows=1024) would want 16 MB for the A one-hot alone
    # and Mosaic rejects the kernel (scoped vmem 18.4M > 16M).  Cap K so
    # the one-hots stay within ~10 MB; fewer-loop-steps still wins below
    # the cap.
    vmem_cap = (10 * 2**20) // ((rows_padded + _Q) * 2)
    chunk = min(chunk, max(vmem_cap // 128 * 128, 128))
    chunk = min(chunk, -(-N // 128) * 128)
    pad = (-N) % chunk
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)

    # [B, 1, N]: the block's last two dims (1, N) then EQUAL the array's —
    # a [1, K] tile of a [B, N] array would need an 8-divisible sublane
    # block, which Mosaic rejects.
    idx = idx[:, None, :]
    out = pl.pallas_call(
        functools.partial(_histogram_kernel, rows=rows_padded, chunk=chunk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, idx.shape[2]), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_padded, _Q), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, rows_padded, _Q), jnp.float32),
        interpret=interpret,
    )(idx)
    return out.reshape(B, rows_padded * _Q)[:, :n_bins]
