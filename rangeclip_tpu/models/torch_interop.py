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


def _flatten(tree: Dict, prefix: Path = ()) -> Dict[Path, np.ndarray]:
    out: Dict[Path, np.ndarray] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _export_convblock_key(path: Path) -> Optional[str]:
    """Target convblock sub-path -> reference state-dict suffix."""
    if path[-2:] == ("conv", "kernel"):
        return ".".join(path[:-2] + ("conv", "weight"))
    if path[-1] == "kernel" and path[-2] in ("conv_depthwise", "conv_pointwise"):
        return ".".join(path[:-1] + ("weight",))
    if len(path) >= 3 and path[-3:-1] == ("norm_act", "batch_norm"):
        leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[path[-1]]
        return ".".join(path[:-3] + ("batch_norm", leaf))
    return None


def _export_module_name(name: str) -> str:
    """Target module name -> reference prefix (inverse of the translate_*
    naming)."""
    if name.startswith("group"):  # group{g}_block{b} -> blocks.{g-1}.{b}
        g, b = name.split("_")
        return f"blocks.{int(g[5:]) - 1}.{int(b[5:])}"
    if name.startswith("up_block"):
        return f"up_blocks.{int(name[8:])}"
    if name == "projection_head_fc1":
        return "projection_head.0"
    if name == "projection_head_fc2":
        return "projection_head.2"
    return name


_ASPP_EXPORT = {
    "global_pool_conv": ("global_pool.1", "kernel"),
    "global_pool_gn": ("global_pool.2", "gn"),
    "project_conv": ("project.0", "kernel"),
    "project_gn": ("project.1", "gn"),
}


def export_reference_checkpoint(
    params: Dict, batch_stats: Dict, train_step: int = 0
) -> Dict:
    """Inverse of :func:`convert_reference_checkpoint`: target trees -> a
    reference-format checkpoint dict (model.py:368-378) of numpy arrays.

    Dead identity-block projection weights and BN ``num_batches_tracked``
    buffers (present in torch state dicts but unused / untracked here) are
    synthesized so ``load_state_dict(strict=True)`` succeeds.
    """
    encoder: Dict[str, np.ndarray] = {}
    decoder: Dict[str, np.ndarray] = {}

    def invert_tensor(ref_key: str, v: np.ndarray) -> np.ndarray:
        if "upsample.weight" in ref_key:
            return np.transpose(v, (2, 3, 0, 1))  # (k,k,I,O) -> IOHW
        if v.ndim == 4:
            return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        if v.ndim == 2:
            return v.T
        return v

    for side, target in (("encoder", "depth_encoder"), ("decoder", "depth_decoder")):
        out = encoder if side == "encoder" else decoder
        flat = {}
        flat.update(_flatten(params.get(target, {})))
        flat.update(_flatten(batch_stats.get(target, {})))
        for path, v in flat.items():
            name = path[0]
            if name == "aspp":
                sub = path[1]
                if sub in _ASPP_EXPORT:
                    prefix, kind = _ASPP_EXPORT[sub]
                elif sub.startswith("branch"):
                    k = sub.split("_")[0][6:]
                    prefix = f"branches.{k}.0" if sub.endswith("_conv") else f"branches.{k}.1"
                    kind = "kernel" if sub.endswith("_conv") else "gn"
                else:
                    raise KeyError(f"unmapped aspp entry: {path}")
                if kind == "kernel":
                    ref_key = f"aspp.{prefix}.weight"
                else:
                    leaf = {"scale": "weight", "bias": "bias"}[path[-1]]
                    ref_key = f"aspp.{prefix}.{leaf}"
            elif path[-1] in ("upsample_kernel", "upsample_bias"):
                leaf = "weight" if path[-1] == "upsample_kernel" else "bias"
                ref_key = f"{_export_module_name(name)}.upsample.{leaf}"
            elif name.startswith("projection_head"):
                leaf = "weight" if path[-1] == "kernel" else "bias"
                ref_key = f"{_export_module_name(name)}.{leaf}"
            else:
                suffix = _export_convblock_key(path[1:])
                if suffix is None:
                    raise KeyError(f"unmapped {side} entry: {path}")
                ref_key = f"{_export_module_name(name)}.{suffix}"
            out[ref_key] = invert_tensor(ref_key, v)

    # Synthesize what torch state dicts carry but this framework does not:
    # num_batches_tracked per BN, and dead identity-block projections.
    for out in (encoder, decoder):
        for key in list(out):
            if key.endswith("batch_norm.running_mean"):
                out[key.replace("running_mean", "num_batches_tracked")] = (
                    np.asarray(train_step, np.int64)
                )
    block_channels: Dict[Tuple[int, int], int] = {}
    for key, v in encoder.items():
        parts = key.split(".")
        if parts[0] == "blocks" and parts[3] == "conv2" and parts[-1] == "weight":
            block_channels[(int(parts[1]), int(parts[2]))] = v.shape[0]
    for (g, b), ch in block_channels.items():
        proj = f"blocks.{g}.{b}.projection.conv.weight"
        if proj not in encoder:
            encoder[proj] = np.zeros((ch, ch, 1, 1), np.float32)

    return {
        "train_step": int(train_step),
        "encoder": encoder,
        "decoder": decoder,
        "log_temperature_text": np.asarray(params["log_temperature_text"]),
        "log_temperature_image": np.asarray(params["log_temperature_image"]),
    }


def save_reference_checkpoint(params, batch_stats, path: str,
                              train_step: int = 0) -> str:
    """Write a ``torch.save`` checkpoint loadable by the reference's
    ``DepthUNet.restore_model`` (model.py:380-393)."""
    import torch

    ckpt = export_reference_checkpoint(params, batch_stats, train_step)
    ckpt["encoder"] = {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in ckpt["encoder"].items()}
    ckpt["decoder"] = {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in ckpt["decoder"].items()}
    ckpt["log_temperature_text"] = torch.from_numpy(
        np.ascontiguousarray(ckpt["log_temperature_text"])
    )
    ckpt["log_temperature_image"] = torch.from_numpy(
        np.ascontiguousarray(ckpt["log_temperature_image"])
    )
    torch.save(ckpt, path)
    return path


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
