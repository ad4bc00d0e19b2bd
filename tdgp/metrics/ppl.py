"""Perceptual Path Length (ref: src/metrics/perceptual_path_length.py).

NOTE: the reference's PPL is dead code — it calls
metric_utils.iterate_random_labels which does not exist (ref ppl:101,
SURVEY.md §2.1). This is a working implementation of the same metric
(w-space endpoints, epsilon 1e-4, crop option), with the perceptual
detector injected (VGG16-LPIPS features in the reference).
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def compute_ppl(sample_pair_fn: Callable, detector: Callable, *,
                num_samples: int = 2048, batch_size: int = 16, epsilon: float = 1e-4,
                seed: int = 0) -> float:
    """sample_pair_fn(batch, seed) -> (img_t [N,H,W,3], img_t_eps [N,H,W,3]) uint8
    pairs rendered at interpolation t and t+epsilon with shared noise.
    detector(imgs) -> perceptual features.
    """
    dists = []
    n_done = 0
    s = seed
    while n_done < num_samples:
        img0, img1 = sample_pair_fn(batch_size, s)
        f0 = np.asarray(detector(img0))
        f1 = np.asarray(detector(img1))
        d = np.sum(np.square(f0 - f1), axis=1) / (epsilon ** 2)
        dists.append(d)
        n_done += batch_size
        s += 1
    dist = np.concatenate(dists)[:num_samples]
    # reject outliers below 1st / above 99th percentile (StyleGAN2 recipe)
    lo = np.percentile(dist, 1, method='lower')
    hi = np.percentile(dist, 99, method='higher')
    return float(np.extract(np.logical_and(dist >= lo, dist <= hi), dist).mean())
