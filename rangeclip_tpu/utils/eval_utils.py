"""Numpy evaluation helpers.

Reference: utils/src/eval_utils.py — a numpy InfoNCE (used for offline
sanity checks) and classic depth-estimation error metrics: RMSE, MAE,
inverse-RMSE/MAE (computed on 1/depth in 1/km against depth in m, matching
the conventions of the depth-completion literature the shared utils come
from).
"""

from __future__ import annotations

import numpy as np


def info_nce_np(
    embeddings: np.ndarray, targets: np.ndarray, temperature: float = 0.07
) -> float:
    """Symmetric-free InfoNCE with diagonal labels on numpy arrays."""
    a = embeddings / np.maximum(np.linalg.norm(embeddings, axis=1, keepdims=True),
                                1e-12)
    b = targets / np.maximum(np.linalg.norm(targets, axis=1, keepdims=True), 1e-12)
    logits = a @ b.T / temperature
    logits -= logits.max(axis=1, keepdims=True)
    log_probs = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return float(-np.mean(np.diagonal(log_probs)))


def root_mean_sq_err(src: np.ndarray, tgt: np.ndarray) -> float:
    return float(np.sqrt(np.mean((tgt - src) ** 2)))


def mean_abs_err(src: np.ndarray, tgt: np.ndarray) -> float:
    return float(np.mean(np.abs(tgt - src)))


def inv_root_mean_sq_err(src: np.ndarray, tgt: np.ndarray) -> float:
    """iRMSE in 1/km for depth in m."""
    return float(np.sqrt(np.mean((1000.0 / tgt - 1000.0 / src) ** 2)))


def inv_mean_abs_err(src: np.ndarray, tgt: np.ndarray) -> float:
    """iMAE in 1/km for depth in m."""
    return float(np.mean(np.abs(1000.0 / tgt - 1000.0 / src)))
