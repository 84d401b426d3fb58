"""Label similarity-set generation from CLIP text self-similarity.

Reference: setup/depth_unet/generate_label_similarity_sets.py —
  * embed every candidate label with the CLIP text tower and compute the
    [C, C] cosine self-similarity (:17-25);
  * thresholds: same >= 0.9, hard in [0.8, 0.85), medium in [0.75, 0.8)
    (:27-32); at most 50 entries per set (:58-59);
  * writes label_similarity_sets.csv with columns
    [index, label, same, medium, hard] — the single source for both the
    equivalence sets and the curriculum distractors.

The embedding pass runs wherever the provider runs (TPU for the real CLIP
tower).  Similarity is one [C, D] x [D, C] matmul.
"""

from __future__ import annotations

import csv
from typing import List, Sequence

import numpy as np


def similarity_sets_from_matrix(
    sim: np.ndarray,
    same_threshold: float = 0.9,
    hard_range=(0.8, 0.85),
    medium_range=(0.75, 0.8),
    max_per_set: int = 50,
):
    """-> (same, medium, hard) lists per label index."""
    C = sim.shape[0]
    same: List[List[int]] = []
    medium: List[List[int]] = []
    hard: List[List[int]] = []
    for i in range(C):
        row = sim[i].copy()
        row[i] = -np.inf  # exclude self
        same.append([int(j) for j in np.where(row >= same_threshold)[0]][:max_per_set])
        hard.append(
            [int(j) for j in np.where((row >= hard_range[0]) & (row < hard_range[1]))[0]]
            [:max_per_set]
        )
        medium.append(
            [int(j) for j in
             np.where((row >= medium_range[0]) & (row < medium_range[1]))[0]]
            [:max_per_set]
        )
    return same, medium, hard


def generate_label_similarity_sets(
    labels: Sequence[str],
    text_provider,
    output_csv: str,
    same_threshold: float = 0.9,
    hard_range=(0.8, 0.85),
    medium_range=(0.75, 0.8),
    max_per_set: int = 50,
) -> str:
    """Embed labels, threshold the cosine self-similarity, write the CSV.

    ``labels`` should include the index-0 dummy so indices in the CSV align
    with the runtime label space.
    """
    emb = np.asarray(text_provider(list(labels)), np.float32)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sim = emb @ emb.T

    same, medium, hard = similarity_sets_from_matrix(
        sim, same_threshold, hard_range, medium_range, max_per_set
    )
    with open(output_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "label", "same", "medium", "hard"])
        for i, label in enumerate(labels):
            w.writerow([i, label, str(same[i]), str(medium[i]), str(hard[i])])
    return output_csv
