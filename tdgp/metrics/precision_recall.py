"""Improved Precision & Recall (ref: src/metrics/precision_recall.py).

k-NN manifold estimation: a sample is covered if it lies within the
k-th-neighbor radius of some reference sample.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _kth_nn_radius(features: np.ndarray, k: int, batch: int = 1024) -> np.ndarray:
    n = features.shape[0]
    radii = np.empty(n, dtype=np.float64)
    for i in range(0, n, batch):
        d = np.linalg.norm(features[i:i + batch, None, :] - features[None, :, :], axis=-1)
        # k+1 because the distance to itself is 0
        radii[i:i + batch] = np.sort(d, axis=1)[:, k]
    return radii


def _fraction_covered(queries: np.ndarray, refs: np.ndarray, radii: np.ndarray,
                      batch: int = 1024) -> float:
    hits = 0
    for i in range(0, queries.shape[0], batch):
        d = np.linalg.norm(queries[i:i + batch, None, :] - refs[None, :, :], axis=-1)
        hits += int(np.any(d <= radii[None, :], axis=1).sum())
    return hits / queries.shape[0]


def compute_pr(real_features: np.ndarray, gen_features: np.ndarray,
               nhood_size: int = 3) -> Tuple[float, float]:
    """(precision, recall) (ref precision_recall.py:36-62)."""
    real_radii = _kth_nn_radius(real_features, nhood_size)
    gen_radii = _kth_nn_radius(gen_features, nhood_size)
    precision = _fraction_covered(gen_features, real_features, real_radii)
    recall = _fraction_covered(real_features, gen_features, gen_radii)
    return float(precision), float(recall)
