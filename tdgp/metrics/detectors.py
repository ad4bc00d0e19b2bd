"""Feature detectors for the evaluators.

The reference downloads NVIDIA's TorchScript InceptionV3/VGG16 pickles at
runtime (ref frechet_inception_distance.py:22, metric_utils.py:45-55). This
framework has a pluggable detector interface instead:

  detector(images_uint8 [N,H,W,3]) -> features [N,D]

- InceptionV3Detector: jit-compiled flax InceptionV3 (tdgp.metrics.inception)
  with weights from a converted .npz (scripts/convert_inception.py converts
  torchvision / pytorch-fid weights offline).
- RandomProjectionDetector: deterministic fallback for tests and
  infrastructure runs without detector weights — NOT a perceptual metric,
  but exercises the identical pipeline end to end.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class RandomProjectionDetector:
    """Deterministic random conv features; pipeline stand-in for tests."""

    def __init__(self, feature_dim: int = 64, seed: int = 0, image_size: int = 32):
        self.feature_dim = feature_dim
        self.image_size = image_size
        key = jax.random.PRNGKey(seed)
        self._proj = jax.random.normal(key, (image_size * image_size * 3, feature_dim)) \
            / np.sqrt(image_size * image_size * 3)

        @jax.jit
        def _fwd(images):
            x = images.astype(jnp.float32) / 255.0
            n, h, w, c = x.shape
            # average-pool to a fixed grid so any input resolution works
            fh, fw = h // self.image_size, w // self.image_size
            if fh > 1 or fw > 1:
                x = x[:, :fh * self.image_size, :fw * self.image_size]
                x = x.reshape(n, self.image_size, fh, self.image_size, fw, c).mean(axis=(2, 4))
            return x.reshape(n, -1) @ self._proj

        self._fwd = _fwd

    def __call__(self, images):
        return self._fwd(images)


def load_inception_detector(weights_path: Optional[str] = None,
                            fid_pool: Optional[bool] = None) -> Callable:
    """The real FID detector; requires converted weights on disk.

    fid_pool (pytorch-fid's count_include_pad=False branch pools, needed for
    pt_inception-2015-12-05 weights) resolves in order: explicit argument →
    TDGP_INCEPTION_FID_POOL env var → the `__meta__/fid_pool` marker written
    into the .npz by scripts/convert_inception.py → False (torchvision)."""
    from tdgp.metrics.inception import load_weights, make_detector, npz_meta
    weights_path = weights_path or os.environ.get('TDGP_INCEPTION_WEIGHTS', '')
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            'InceptionV3 weights not found. Convert them once with '
            'scripts/convert_inception.py and set TDGP_INCEPTION_WEIGHTS.')
    if fid_pool is None:
        env = os.environ.get('TDGP_INCEPTION_FID_POOL')
        if env is not None:
            fid_pool = env not in ('', '0', 'false', 'False')
        else:
            fid_pool = bool(npz_meta(weights_path).get('fid_pool', False))
    params = load_weights(weights_path)
    return make_detector(params, fid_pool=fid_pool)
