"""Mesh construction + sharding placement helpers.

Design (scaling-book recipe): pick a mesh, annotate input/param shardings,
let XLA insert the collectives.

  * 'data': batch dimension of every batch array — DP.  XLA inserts the
    gradient all-reduce (DDP equivalent, train_util.py:174 + NCCL) and makes
    BatchNorm statistics global (sync-BN; documented divergence from the
    reference's per-replica BN — identical on one device).
  * 'model': class dimension of the text-embedding table, the [C, C]
    similarity/equivalence matrices, and therefore the [N, C] contrastive
    logits — TP for large label tables (NYUv2 transfer with hundreds to
    thousands of classes).  The softmax logsumexp and the scatter updates
    reduce over 'model' via ICI all-reduce, inserted by GSPMD.
  * 'spatial': the image-height dimension of the depth maps and every
    feature map under them — SP for resolutions whose activation footprint
    exceeds one chip (SURVEY section 5's "spatial sharding of feature maps
    if resolution grows").  GSPMD inserts the convolution halo exchanges
    (collective-permute of 1-row boundaries per conv) automatically; BN
    statistics already reduce over (B, H, W) so they simply include a
    'spatial' all-reduce.

Parameters and optimizer state are replicated (the model is a ~15M-param
CNN — replication is the right layout; its gradients ride the ICI once per
accumulation window).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_spatial)
    total = n_data * n_model * n_spatial
    assert 0 < total <= len(devices), (
        f"mesh data={n_data} x spatial={n_spatial} x model={n_model} does "
        f"not fit {len(devices)} devices (model*spatial alone may exceed "
        "the device count)"
    )
    grid = np.asarray(devices[:total]).reshape(n_data, n_spatial, n_model)
    return Mesh(grid, ("data", "spatial", "model"))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], batch_axis: int = 0
                ) -> Dict[str, Any]:
    """Place batch arrays with the batch dim sharded over 'data' and, when
    the mesh has a non-trivial 'spatial' axis, the image height sharded
    over 'spatial' (rank-4+ arrays only: depth [.., B, H, W, 1] and
    segmentation [.., B, H, W]).

    Works for both [B, ...] and accumulation-major [A, B, ...] layouts
    (pass batch_axis=1 for the latter).
    """
    n_spatial = dict(mesh.shape).get("spatial", 1)
    out = {}
    for k, v in batch.items():
        ndim = np.ndim(v)
        spec = [None] * ndim
        if ndim > batch_axis:
            spec[batch_axis] = "data"
        if n_spatial > 1 and ndim >= batch_axis + 3:
            spec[batch_axis + 1] = "spatial"  # the H dim of [B, H, W, ...]
        out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
    return out


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_state(mesh: Mesh, state):
    """Replicate the train state across the mesh (params/opt-state are small
    for this model family; replication is the chosen layout)."""
    return replicate(mesh, state)


def shard_class_tables(
    mesh: Mesh,
    text_table,
    medium_matrix,
    hard_matrix,
    shard_classes: bool = False,
):
    """Place the frozen class tables.

    With ``shard_classes`` the class axis is split over 'model' (column
    sharding of the [C, D] table and both [C, C] matrices' second axis);
    otherwise everything is replicated (the reference's broadcast,
    train_util.py:230-240, is exactly replicated sharding here).
    """
    if shard_classes and mesh.shape["model"] > 1:
        text = jax.device_put(text_table, NamedSharding(mesh, P("model", None)))
        med = jax.device_put(medium_matrix, NamedSharding(mesh, P(None, "model")))
        hard = jax.device_put(hard_matrix, NamedSharding(mesh, P(None, "model")))
    else:
        text = replicate(mesh, text_table)
        med = replicate(mesh, medium_matrix)
        hard = replicate(mesh, hard_matrix)
    return text, med, hard
