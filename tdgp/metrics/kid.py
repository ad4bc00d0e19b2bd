"""Kernel Inception Distance (ref: src/metrics/kernel_inception_distance.py)."""
from __future__ import annotations

import numpy as np


def compute_kid(real_features: np.ndarray, gen_features: np.ndarray,
                num_subsets: int = 100, max_subset_size: int = 1000,
                seed: int = 0) -> float:
    """Polynomial-kernel MMD over random subsets (ref kid:24-43)."""
    n = real_features.shape[1]
    m = min(min(real_features.shape[0], gen_features.shape[0]), max_subset_size)
    rs = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = gen_features[rs.choice(gen_features.shape[0], m, replace=False)]
        y = real_features[rs.choice(real_features.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)
