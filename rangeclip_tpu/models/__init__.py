"""Network modules (L1) and model wrappers (L2)."""

from rangeclip_tpu.models.encoder import DepthEncoder
from rangeclip_tpu.models.decoder import DepthDecoder
from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig

__all__ = ["DepthEncoder", "DepthDecoder", "DepthUNet", "DepthUNetConfig"]
