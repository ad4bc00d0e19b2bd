"""Feature statistics + dataset/generator feature extraction.

Counterpart of ref src/metrics/metric_utils.py: FeatureStats (:103-227),
compute_feature_stats_for_dataset (:230-284), ..._for_generator (:288-319),
iterate_random_conditioning (:60-101). Detectors are injected callables
`detector(images_uint8 [N,H,W,3]) -> features [N,D]` so the same machinery
serves InceptionV3 (FID/KID/IS/PR), VGG (PPL) and tests (mock detectors).
Feature caching is md5-keyed on the options, like the reference's
gan-metrics cache dir.
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tdgp.config import Config, asdict
from tdgp.rendering.camera import sample_camera_params
from tdgp.utils.tensor_group import TensorGroup


class FeatureStats:
    """Accumulates raw features and/or (mean, cov) moments (ref :103-227)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features: Optional[int] = None
        self.all_features: Optional[list] = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int) -> None:
        if self.num_features is not None:
            assert num_features == self.num_features
            return
        self.num_features = num_features
        self.all_features = []
        self.raw_mean = np.zeros(num_features, dtype=np.float64)
        self.raw_cov = np.zeros((num_features, num_features), dtype=np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x) -> None:
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None and self.num_items + x.shape[0] > self.max_items:
            if self.num_items >= self.max_items:
                return
            x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path: str) -> None:
        with open(path, 'wb') as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(path: str) -> 'FeatureStats':
        with open(path, 'rb') as f:
            d = pickle.load(f)
        obj = FeatureStats.__new__(FeatureStats)
        obj.__dict__.update(d)
        return obj


def to_uint8_images(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float NHWC -> uint8 (ref metric_utils.py:314-316)."""
    return jnp.clip((img * 127.5 + 128), 0, 255).astype(jnp.uint8)


def cache_key(tag: str, opts: Dict[str, Any]) -> str:
    md5 = hashlib.md5(json.dumps(opts, sort_keys=True, default=str).encode()).hexdigest()
    return f'{tag}-{md5}'


def default_process_gather(feats: jnp.ndarray) -> np.ndarray:
    """Cross-host feature gather (ref metric_utils.py:145-155): every
    process contributes its batch; results are rank-interleaved
    deterministically. Uses multihost_utils.process_allgather over DCN/ICI."""
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(feats))  # [P, B, D]
    # transpose to [B, P, D] so the flattened order is round-robin across
    # ranks — matching the rank-strided item order i*num_shards+rank (so a
    # mid-batch max_items truncation keeps the same item subset as the ref)
    return gathered.transpose(1, 0, 2).reshape(-1, gathered.shape[-1])


def _process_info(rank, num_shards):
    if rank is None:
        rank = jax.process_index()
    if num_shards is None:
        num_shards = jax.process_count()
    return rank, num_shards


def compute_feature_stats_for_dataset(
    dataset, detector: Callable, *, detector_name: str = 'detector',
    batch_size: int = 64, data_loader_kwargs: Optional[Dict] = None,
    max_items: Optional[int] = None, cache_dir: Optional[str] = None,
    rank: Optional[int] = None, num_shards: Optional[int] = None,
    gather_fn: Optional[Callable] = None,
    **stats_kwargs,
) -> FeatureStats:
    """ref metric_utils.py:230-284. Multi-process: each process featurizes
    the rank-strided subset `(i * num_shards + rank) % N` (ref :269) and
    per-batch features are all-gathered so every process ends with the full
    statistics (ref :145-155)."""
    rank, num_shards = _process_info(rank, num_shards)
    if gather_fn is None and num_shards > 1:
        gather_fn = default_process_gather

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        key = cache_key('features', dict(dataset=getattr(dataset, 'name', ''),
                                         n=len(dataset), detector=detector_name,
                                         max_items=max_items, **stats_kwargs))
        cache_file = os.path.join(cache_dir, key + '.pkl')
        # all ranks act on rank-0's view of the cache (ref metric_utils.py:
        # 249-258 broadcasts the cache-exists flag) so a cold cache can't
        # make rank!=0 race ahead and recompute while rank 0 loads
        flag = os.path.exists(cache_file)
        if num_shards > 1:
            from jax.experimental import multihost_utils
            flag = bool(np.asarray(multihost_utils.broadcast_one_to_all(
                np.asarray(flag))))
        if flag:
            return FeatureStats.load(cache_file)

    num_items = len(dataset)
    if max_items is not None:
        num_items = min(num_items, max_items)
    stats = FeatureStats(max_items=num_items, **stats_kwargs)
    idx = 0
    while not stats.is_full():
        images = []
        for _ in range(batch_size):
            item = dataset[(idx * num_shards + rank) % len(dataset)]
            images.append(item['image'])
            idx += 1
        feats = detector(jnp.asarray(np.stack(images)))
        if gather_fn is not None:
            stats.append(np.asarray(gather_fn(feats)))
        else:
            stats.append(np.asarray(feats))
    if cache_dir:
        if rank == 0:
            stats.save(cache_file)
        if num_shards > 1:
            # barrier: no rank returns before the cache file is on disk
            # (ref metric_utils.py:49-55 rank-0-first download ordering)
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices('tdgp_feature_cache_saved')
    return stats


def iterate_random_conditioning(cfg: Config, dataset, batch_size: int,
                                seed: int = 0,
                                camera_adaptor_fn: Optional[Callable] = None
                                ) -> Iterator[Dict[str, Any]]:
    """Random (label, camera) conditioning stream for G sampling
    (ref metric_utils.py:60-101): labels from the dataset distribution,
    cameras from the prior (warped by the adaptor when present). For the
    'custom' angle distribution the origin angles are drawn from the dataset
    (ref metric_utils.py:85-90 samples generator cameras from the dataset)."""
    rs = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    custom_angles = cfg.camera.origin.angles.dist == 'custom'
    if custom_angles and dataset is None:
        raise ValueError("angles dist 'custom' needs a dataset to sample "
                         "origin angles from")
    while True:
        key, k_cam = jax.random.split(key)
        if dataset is not None and cfg.dataset.c_dim > 0:
            idx = rs.randint(len(dataset), size=batch_size)
            c = jnp.asarray(np.stack([dataset.get_label(i) for i in idx]))
        else:
            c = jnp.zeros((batch_size, cfg.dataset.c_dim))
        origin_angles = None
        if custom_angles:
            aidx = rs.randint(len(dataset), size=batch_size)
            origin_angles = jnp.asarray(np.stack(
                [dataset.get_camera_angles(i) for i in aidx]).astype(np.float32))
        cam = sample_camera_params(k_cam, asdict(cfg.camera), batch_size,
                                   origin_angles=origin_angles)
        yield {'c': c, 'camera_params': cam, 'key': key}


def compute_feature_stats_for_generator(
    sample_fn: Callable,  # (batch_size, seed) -> uint8 images [N,H,W,3]
    detector: Callable, *, batch_size: int = 16,
    max_items: int = 2048,
    rank: Optional[int] = None, num_shards: Optional[int] = None,
    gather_fn: Optional[Callable] = None,
    **stats_kwargs,
) -> FeatureStats:
    """ref metric_utils.py:288-319 — sample G, featurize, accumulate.
    Multi-process: disjoint per-rank seeds + per-batch all-gather."""
    rank, num_shards = _process_info(rank, num_shards)
    if gather_fn is None and num_shards > 1:
        gather_fn = default_process_gather
    stats = FeatureStats(max_items=max_items, **stats_kwargs)
    seed = 0
    while not stats.is_full():
        images = sample_fn(batch_size, seed * num_shards + rank)
        feats = detector(images)
        if gather_fn is not None:
            stats.append(np.asarray(gather_fn(feats)))
        else:
            stats.append(np.asarray(feats))
        seed += 1
    return stats
