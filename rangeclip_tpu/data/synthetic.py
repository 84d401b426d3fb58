"""Synthetic depth-segmentation fixtures for tests and benchmarks.

Generates structured scenes (Voronoi regions of random seed points, one
label per region, per-label depth planes + noise) so the contrastive loss
has real signal, plus an optional on-disk writer that produces the exact
PNG/CSV layout the real SUN RGB-D pipeline consumes (metadata.csv,
candidate_labels.csv, label_similarity_sets.csv) — giving an end-to-end path
identical to training on real data.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from rangeclip_tpu.data.dataset import choose_random_object
from rangeclip_tpu.data.transforms import depth_transform


def _voronoi_segmentation(
    rng: np.random.Generator, shape: Tuple[int, int], n_regions: int, num_classes: int
) -> np.ndarray:
    H, W = shape
    pts = rng.uniform(0, 1, size=(n_regions, 2)) * np.array([H, W])
    labels = rng.integers(1, num_classes, size=n_regions)
    yy, xx = np.mgrid[0:H, 0:W]
    coords = np.stack([yy, xx], -1).reshape(-1, 2).astype(np.float32)
    d2 = ((coords[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    return labels[nearest].reshape(H, W).astype(np.int32)


class SyntheticDepthSegDataset:
    """In-memory dataset mimicking ImageDepthTextDataset's output contract."""

    def __init__(
        self,
        n_samples: int = 32,
        resize_shape: Tuple[int, int] = (64, 64),
        num_classes: int = 16,
        n_regions: int = 6,
        seed: int = 0,
        bbox_padding: int = 10,
    ):
        self.n_samples = n_samples
        self.resize_shape = resize_shape
        self.num_classes = num_classes
        self.n_regions = n_regions
        self.seed = seed
        self.bbox_padding = bbox_padding
        self.labels = ["unavailable"] + [f"object_{i}" for i in range(1, num_classes)]

    def __len__(self) -> int:
        return self.n_samples

    def get_candidate_labels(self):
        return self.labels

    def _generate(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        seg = _voronoi_segmentation(rng, self.resize_shape, self.n_regions,
                                    self.num_classes)
        # depth: per-label base distance + gradient + noise
        base = rng.uniform(500, 5000, size=self.num_classes).astype(np.float32)
        H, W = self.resize_shape
        grad = np.linspace(0, 200, W, dtype=np.float32)[None, :]
        depth = base[seg] + grad + rng.normal(0, 20, size=(H, W)).astype(np.float32)
        depth = np.maximum(depth, 1.0)
        # image: per-label color + noise
        colors = rng.uniform(0, 1, size=(self.num_classes, 3)).astype(np.float32)
        image = np.clip(
            colors[seg] + rng.normal(0, 0.05, size=(H, W, 3)).astype(np.float32), 0, 1
        )
        return depth, image, seg

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None
                    ) -> Dict[str, np.ndarray]:
        if rng is None:
            rng = np.random.default_rng((self.seed, idx, 7))
        depth, image, seg = self._generate(idx)
        depth_p = depth_transform(depth, self.resize_shape)
        bbox, label = choose_random_object(
            seg, self.num_classes, {0}, self.bbox_padding, rng
        )
        return {
            "depth": depth_p[..., None].astype(np.float32),
            "image": image,
            "segmentation": seg,
            "object_bbox": np.asarray(bbox, np.int32),
            "object_label": np.int32(label),
        }


def write_synthetic_dataset(
    root: str,
    n_samples: int = 16,
    shape: Tuple[int, int] = (64, 64),
    num_classes: int = 10,
    seed: int = 0,
) -> Dict[str, str]:
    """Write a tiny on-disk dataset in the reference's SUN RGB-D layout:
    PNG triplets + metadata.csv + candidate_labels.csv +
    label_similarity_sets.csv (with 'same'/'medium'/'hard' columns).

    Returns paths {metadata, labels, similarity}.
    """
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    ds = SyntheticDepthSegDataset(n_samples, shape, num_classes, seed=seed)
    rows = []
    for i in range(n_samples):
        depth, image, seg = ds._generate(i)
        img_path, dep_path, seg_path = (
            f"image_{i}.png", f"depth_{i}.png", f"label_{i}.png",
        )
        Image.fromarray((image * 255).astype(np.uint8)).save(os.path.join(root, img_path))
        Image.fromarray(depth.astype(np.int32), mode="I").save(os.path.join(root, dep_path))
        Image.fromarray(seg.astype(np.int32), mode="I").save(os.path.join(root, seg_path))
        rows.append((img_path, dep_path, seg_path))

    metadata = os.path.join(root, "metadata.csv")
    with open(metadata, "w") as f:
        f.write("image_path,depth_path,label_path\n")
        for r in rows:
            f.write(",".join(r) + "\n")

    labels_csv = os.path.join(root, "candidate_labels.csv")
    with open(labels_csv, "w") as f:
        f.write("label,index\n")
        for i in range(1, num_classes):
            f.write(f"object_{i},{i}\n")

    rng = np.random.default_rng(seed + 1)
    sim_csv = os.path.join(root, "label_similarity_sets.csv")
    with open(sim_csv, "w") as f:
        f.write("index,same,medium,hard\n")
        for i in range(num_classes):
            others = [j for j in range(1, num_classes) if j != i]
            med = sorted(rng.choice(others, size=min(3, len(others)),
                                    replace=False).tolist())
            hard = sorted(rng.choice(others, size=min(3, len(others)),
                                     replace=False).tolist())
            f.write(f'{i},"[]","{med}","{hard}"\n')

    return {"metadata": metadata, "labels": labels_csv, "similarity": sim_csv}
