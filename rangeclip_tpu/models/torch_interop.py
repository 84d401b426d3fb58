"""Reference (torch) checkpoint migration.

Converts DepthCLIP reference checkpoints — dicts of encoder/decoder torch
state dicts plus log-temperatures (reference model.py:368-393) — into this
framework's param/batch_stats trees, so users can carry trained weights
across.  Layout transforms: conv OIHW -> HWIO, conv-transpose IOHW ->
(k, k, I, O), linear [out, in] -> [in, out].

The same mapping drives the fp32 parity suite
(tests/test_reference_parity.py): the translated model reproduces the
reference's pixel-embedding field bit-for-bit at fp32.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

Collection = str  # "params" | "batch_stats"
Path = Tuple[str, ...]


def translate_encoder_key(key: str) -> Optional[List[Tuple[Collection, Path]]]:
    """Reference DepthEncoder state-dict key -> target tree paths."""
    parts = key.split(".")
    if parts[0] == "conv1":
        return _translate_convblock(("conv1",), parts[1:])
    if parts[0] == "blocks":
        group, block = int(parts[1]), int(parts[2])
        return _translate_convblock((f"group{group + 1}_block{block}",), parts[3:])
    if parts[0] == "projection_head":
        idx = int(parts[1])
        name = "projection_head_fc1" if idx == 0 else "projection_head_fc2"
        return [("params", (name, "kernel" if parts[2] == "weight" else "bias"))]
    if parts[0] == "aspp":
        return _translate_aspp(parts[1:])
    return None


def _translate_convblock(base: Path, rest: List[str]):
    if rest[0] in ("conv1", "conv2", "conv3", "projection"):
        return _translate_convblock(base + (rest[0],), rest[1:])
    if rest[0] == "conv" and rest[1] == "weight":
        return [("params", base + ("conv", "kernel"))]
    if rest[0] in ("conv_depthwise", "conv_pointwise") and rest[1] == "weight":
        return [("params", base + (rest[0], "kernel"))]
    if rest[0] == "batch_norm":
        field = rest[1]
        if field == "weight":
            return [("params", base + ("norm_act", "batch_norm", "scale"))]
        if field == "bias":
            return [("params", base + ("norm_act", "batch_norm", "bias"))]
        if field == "running_mean":
            return [("batch_stats", base + ("norm_act", "batch_norm", "mean"))]
        if field == "running_var":
            return [("batch_stats", base + ("norm_act", "batch_norm", "var"))]
        return []  # num_batches_tracked
    return None


def _translate_aspp(parts: List[str]):
    base: Path = ("aspp",)
    if parts[0] == "branches":
        k, idx = int(parts[1]), int(parts[2])
        name = f"branch{k}_conv" if idx == 0 else f"branch{k}_gn"
    elif parts[0] == "global_pool":
        idx = int(parts[1])
        name = "global_pool_conv" if idx == 1 else "global_pool_gn"
    elif parts[0] == "project":
        idx = int(parts[1])
        name = "project_conv" if idx == 0 else "project_gn"
    else:
        return None
    field = parts[-1]
    if name.endswith("_gn"):
        leaf = {"weight": "scale", "bias": "bias"}[field]
    else:
        leaf = "kernel"
    return [("params", base + (name, leaf))]


def translate_decoder_key(key: str) -> Optional[List[Tuple[Collection, Path]]]:
    parts = key.split(".")
    if parts[0] == "up_blocks":
        i = int(parts[1])
        base: Path = (f"up_block{i}",)
        if parts[2] == "upsample":
            leaf = "upsample_kernel" if parts[3] == "weight" else "upsample_bias"
            return [("params", base + (leaf,))]
        return _translate_convblock(base, parts[2:])
    if parts[0] == "output_conv":
        return _translate_convblock(("output_conv",), parts[1:])
    return None


def convert_tensor(key: str, value: np.ndarray) -> np.ndarray:
    v = np.asarray(value)
    if "upsample.weight" in key:
        return np.transpose(v, (2, 3, 0, 1))  # convT IOHW -> (k, k, I, O)
    if v.ndim == 4:
        return np.transpose(v, (2, 3, 1, 0))  # conv OIHW -> HWIO
    if v.ndim == 2:
        return v.T  # linear [out, in] -> [in, out]
    return v


def _is_dead_projection(key: str, encoder_state: Dict[str, np.ndarray]) -> bool:
    """True for encoder ``blocks.g.b.projection.*`` weights that the
    reference never applies (stride 1 and matching channels; see
    net_utils.py:658-662 — groups past the first downsample on block 0,
    encoder.py:72-90)."""
    parts = key.split(".")
    if parts[0] != "blocks" or "projection" not in parts:
        return False
    group, block = int(parts[1]), int(parts[2])
    stride2 = block == 0 and group >= 1
    w = encoder_state.get(f"blocks.{group}.{block}.projection.conv.weight")
    channels_change = w is not None and w.shape[0] != w.shape[1]
    return not (stride2 or channels_change)


def _set_path(tree: Dict, path: Path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_reference_checkpoint(
    encoder_state: Dict[str, np.ndarray],
    decoder_state: Dict[str, np.ndarray],
    log_temperature_text: Optional[np.ndarray] = None,
    log_temperature_image: Optional[np.ndarray] = None,
) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) trees for DepthUNet.

    Missing temperatures fall back to the reference defaults log(0.07)/
    log(0.1) (reference restore semantics, model.py:389-392).
    """
    params: Dict = {"depth_encoder": {}, "depth_decoder": {}}
    stats: Dict = {"depth_encoder": {}, "depth_decoder": {}}

    for key, value in encoder_state.items():
        if _is_dead_projection(key, encoder_state):
            # The reference instantiates a 1x1 projection conv in EVERY
            # ResNet block (net_utils.py:633-641) but only applies it when
            # stride/channels change (:658-662); identity blocks carry dead
            # weights in the state dict.  Our blocks only create the
            # projection when it is used, so drop the dead ones here.
            continue
        tr = translate_encoder_key(key)
        if tr is None:
            raise KeyError(f"unmapped encoder key: {key}")
        for coll, path in tr:
            target = params if coll == "params" else stats
            _set_path(target["depth_encoder"], path, convert_tensor(key, value))

    for key, value in decoder_state.items():
        tr = translate_decoder_key(key)
        if tr is None:
            raise KeyError(f"unmapped decoder key: {key}")
        for coll, path in tr:
            target = params if coll == "params" else stats
            _set_path(target["depth_decoder"], path, convert_tensor(key, value))

    params["log_temperature_text"] = np.asarray(
        log_temperature_text if log_temperature_text is not None
        else np.log(np.float32(0.07)), np.float32,
    )
    params["log_temperature_image"] = np.asarray(
        log_temperature_image if log_temperature_image is not None
        else np.log(np.float32(0.1)), np.float32,
    )
    return params, stats


def load_reference_checkpoint(path: str) -> Tuple[Dict, Dict, int]:
    """Load a reference ``.pth`` checkpoint file -> (params, batch_stats,
    train_step)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    to_np = lambda sd: {k: v.numpy() for k, v in sd.items()}
    params, stats = convert_reference_checkpoint(
        to_np(ckpt["encoder"]),
        to_np(ckpt["decoder"]),
        ckpt.get("log_temperature_text", None),
        ckpt.get("log_temperature_image", None),
    )
    return params, stats, int(ckpt.get("train_step", 0))
