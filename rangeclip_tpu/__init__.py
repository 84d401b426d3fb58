"""rangeclip_tpu — a TPU-native open-vocabulary depth segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the DepthCLIP
("RangeCLIP") research framework: a ResNet-UNet+ASPP maps single-channel depth
maps to per-pixel embeddings in CLIP's joint text/image embedding space,
trained with a hybrid InfoNCE (pixel-text + area-image) + total-variation loss
with curriculum-scheduled hard-negative distractors, and evaluated with
equivalence-aware top-k pixel accuracy and mIoU.

Design stance (TPU-first, not a port):
  * NHWC layout everywhere (XLA/TPU native), bfloat16 compute policy optional,
    fp32 parameters.
  * All randomness goes through explicit ``jax.random`` keys.
  * Every data-dependent shape in the reference (variable foreground pixels,
    variable contrast sets, variable candidate sets) is reformulated as a
    fixed-capacity masked computation so each step compiles exactly once.
  * Data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
    gradient reduction (replacing torch DDP/NCCL); the class axis of the
    contrastive head can additionally be sharded ("model" axis) for large
    open-vocabulary label tables.
  * Hot inference path (L2-normalize -> pixel x text matmul -> top-k) is
    available as a fused Pallas TPU kernel.

Reference behavior is documented per-module with ``file:line`` citations into
the upstream repo snapshot (see SURVEY.md).
"""

__version__ = "0.1.0"

__all__ = ["DepthUNet", "DepthUNetConfig", "__version__"]


def __getattr__(name):
    # Lazy re-exports so importing subpackages stays cheap.
    if name in ("DepthUNet", "DepthUNetConfig"):
        from rangeclip_tpu.models import depth_unet

        return getattr(depth_unet, name)
    raise AttributeError(f"module 'rangeclip_tpu' has no attribute {name!r}")
