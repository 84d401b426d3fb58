"""Full-model fp32 parity against the reference implementation.

Imports the reference's torch modules (read-only, as a numerical oracle),
copies their weights into our flax DepthUNet, and requires the pixel
embedding fields to agree at fp32.  This is the bit-for-bit north-star
check: same math, same weights, NHWC vs NCHW only.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
if not os.path.isdir(REF_ROOT):
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, REF_ROOT)

from rangeclip_tpu.models.depth_unet import DepthUNet, DepthUNetConfig


def _translate_encoder_key(key):
    """Map reference encoder state-dict key -> (collection, path tuple)."""
    parts = key.split(".")
    if parts[0] == "conv1":
        base = ("conv1",)
        rest = parts[1:]
    elif parts[0] == "blocks":
        group, block = int(parts[1]), int(parts[2])
        base = (f"group{group + 1}_block{block}",)
        rest = parts[3:]
    elif parts[0] == "projection_head":
        idx = int(parts[1])
        name = "projection_head_fc1" if idx == 0 else "projection_head_fc2"
        return [("params", (name, "kernel" if parts[2] == "weight" else "bias"))]
    elif parts[0] == "aspp":
        return _translate_aspp(parts[1:])
    else:
        return None
    return _translate_convblock(base, rest)


def _translate_convblock(base, rest):
    """conv/batch_norm subkeys of a reference Conv2d-style block."""
    if rest[0] in ("conv1", "conv2", "projection"):
        inner = _translate_convblock(base + (rest[0],), rest[1:])
        return inner
    if rest[0] == "conv" and rest[1] == "weight":
        return [("params", base + ("conv", "kernel"))]
    if rest[0] == "batch_norm":
        if rest[1] == "weight":
            return [("params", base + ("norm_act", "batch_norm", "scale"))]
        if rest[1] == "bias":
            return [("params", base + ("norm_act", "batch_norm", "bias"))]
        if rest[1] == "running_mean":
            return [("batch_stats", base + ("norm_act", "batch_norm", "mean"))]
        if rest[1] == "running_var":
            return [("batch_stats", base + ("norm_act", "batch_norm", "var"))]
        return []  # num_batches_tracked
    return None


def _translate_aspp(parts):
    base = ("aspp",)
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
    leaf = {"weight": "scale", "bias": "bias"}[field] if name.endswith("_gn") else "kernel"
    return [("params", base + (name, leaf))]


def _translate_decoder_key(key):
    parts = key.split(".")
    if parts[0] == "up_blocks":
        i = int(parts[1])
        base = (f"up_block{i}",)
        if parts[2] == "upsample":
            leaf = "upsample_kernel" if parts[3] == "weight" else "upsample_bias"
            return [("params", base + (leaf,))]
        return _translate_convblock(base, parts[2:])
    if parts[0] == "output_conv":
        return _translate_convblock(("output_conv",), parts[1:])
    return None


def _convert_value(key, value):
    v = value.detach().numpy()
    if "upsample.weight" in key:
        return np.transpose(v, (2, 3, 0, 1))  # torch convT IOHW -> (k,k,I,O)
    if v.ndim == 4:
        return np.transpose(v, (2, 3, 1, 0))  # conv OIHW -> HWIO
    if v.ndim == 2:
        return v.T  # linear [out, in] -> [in, out]
    return v


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


@pytest.mark.slow
def test_depth_unet_matches_reference_fp32():
    from RangeCLIP.src.depth_segmentation_model.model import DepthUNet as RefDepthUNet

    torch.manual_seed(0)
    ref = RefDepthUNet(
        unet_type="resnet",
        device="cpu",
        n_layer=18,
        input_channels=1,
        encoder_filters=[32, 64, 128, 256, 512],
        embedding_dim=512,
        weight_initializer="kaiming_uniform",
        activation_func="relu",
        use_batch_norm=True,
        use_instance_norm=False,
    )
    ref.eval()

    cfg = DepthUNetConfig(use_batch_norm=True)
    model = DepthUNet(cfg)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 1)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    new_params = {"depth_encoder": {}, "depth_decoder": {}}
    new_stats = {"depth_encoder": {}, "depth_decoder": {}}

    for key, value in ref.depth_encoder.state_dict().items():
        tr = _translate_encoder_key(key)
        assert tr is not None, f"unmapped encoder key: {key}"
        for coll, path in tr:
            target = new_params if coll == "params" else new_stats
            _set_path(target["depth_encoder"], path, _convert_value(key, value))
    for key, value in ref.depth_decoder.state_dict().items():
        tr = _translate_decoder_key(key)
        assert tr is not None, f"unmapped decoder key: {key}"
        for coll, path in tr:
            target = new_params if coll == "params" else new_stats
            _set_path(target["depth_decoder"], path, _convert_value(key, value))

    new_params["log_temperature_text"] = jnp.asarray(
        ref.log_temperature_text.detach().numpy()
    )
    new_params["log_temperature_image"] = jnp.asarray(
        ref.log_temperature_image.detach().numpy()
    )

    # Structural completeness: every leaf of the flax tree must be covered.
    ref_paths = jax.tree_util.tree_structure(variables["params"])
    new_paths = jax.tree_util.tree_structure(new_params)
    assert ref_paths == new_paths, "converted param tree structure mismatch"

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want, want_tt, want_ti = ref(xt)
        want = want.numpy()

    got, got_tt, got_ti = model.apply(
        {"params": new_params, "batch_stats": new_stats}, jnp.asarray(x), train=False
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(got_tt), float(want_tt), rtol=1e-5)
    np.testing.assert_allclose(float(got_ti), float(want_ti), rtol=1e-5)
