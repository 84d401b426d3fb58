"""Pallas TPU kernels for the hot paths.

Currently: the fused pixel-embedding scoring epilogue (L2-normalize ->
pixel x text matmul -> candidate masking -> top-k) that dominates the 256^2
inference north-star (reference predict, model.py:164-169).
"""

from rangeclip_tpu.ops.pallas.pixel_text_topk import fused_pixel_text_topk

__all__ = ["fused_pixel_text_topk"]
