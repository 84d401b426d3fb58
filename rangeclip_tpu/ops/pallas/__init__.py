"""Pallas TPU kernels for the hot paths.

  * fused_pixel_text_topk — the fused pixel-embedding scoring epilogue
    (L2-normalize -> pixel x text matmul -> candidate masking -> top-k)
    that dominates the 256^2 inference north-star (reference predict,
    model.py:164-169).
  * fused_masked_pooling — segment sums/counts for masked-average-pooling
    (model.py:15-56) without materializing the [N, B*H*W] match matrix in
    HBM.
"""

from rangeclip_tpu.ops.pallas.masked_pooling import fused_masked_pooling
from rangeclip_tpu.ops.pallas.pixel_text_topk import fused_pixel_text_topk

__all__ = ["fused_masked_pooling", "fused_pixel_text_topk"]
