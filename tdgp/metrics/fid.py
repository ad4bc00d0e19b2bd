"""Fréchet Inception Distance (ref: src/metrics/frechet_inception_distance.py)."""
from __future__ import annotations

import numpy as np
import scipy.linalg


def frechet_distance(mu_real: np.ndarray, sigma_real: np.ndarray,
                     mu_gen: np.ndarray, sigma_gen: np.ndarray) -> float:
    """ref frechet_inception_distance.py:36-39."""
    m = np.square(mu_gen - mu_real).sum()
    # disp= is deprecated (SciPy 1.18); like the reference we ignore the
    # error estimate — near-singular products are expected for small N
    s = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real))
    return float(np.real(m + np.trace(sigma_gen + sigma_real - s * 2)))


def compute_fid(real_stats, gen_stats) -> float:
    mu_r, sig_r = real_stats.get_mean_cov()
    mu_g, sig_g = gen_stats.get_mean_cov()
    return frechet_distance(mu_r, sig_r, mu_g, sig_g)
