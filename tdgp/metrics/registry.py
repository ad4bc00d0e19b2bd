"""Metric registry + G-sampling glue.

Counterpart of ref src/metrics/metric_main.py (registry, timing, jsonl
reporting) and the generator-side sampling in metric_utils. Registered
metrics mirror the reference list (:84-158): fid50k_full, fid2k_full,
fid5k_5k, kid50k(_full), pr50k3(_full), is50k, ppl2_wend, nfs256.

An EvalContext bundles everything a metric needs; detectors are injected so
the suite runs with the real InceptionV3 or a test stand-in.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tdgp.config import Config, asdict
from tdgp.metrics import fid as fid_mod
from tdgp.metrics import kid as kid_mod
from tdgp.metrics import inception_score as is_mod
from tdgp.metrics import nfs as nfs_mod
from tdgp.metrics import precision_recall as pr_mod
from tdgp.metrics.features import (FeatureStats, compute_feature_stats_for_dataset,
                                   compute_feature_stats_for_generator,
                                   iterate_random_conditioning, to_uint8_images)
from tdgp.rendering.camera import get_mean_camera_params
from tdgp.utils.tensor_group import TensorGroup

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    _metric_dict[fn.__name__] = fn
    return fn


def list_metrics():
    return list(_metric_dict.keys())


def is_valid_metric(name: str) -> bool:
    return name in _metric_dict


@dataclasses.dataclass
class EvalContext:
    cfg: Config
    G: Any                      # Generator module
    g_vars: Dict[str, Any]      # EMA generator variables
    dataset: Any = None
    detector: Optional[Callable] = None       # InceptionV3 for FID/KID/IS/PR
    ppl_detector: Optional[Callable] = None   # VGG16 for PPL (falls back to detector)
    cache_dir: Optional[str] = None
    batch_size: int = 16
    # Static per-compile G-render micro-batch. None = auto: full batch at
    # <=128 px, 4 at >=256 px — the full-batch 256² render program is what
    # crashes this rig's remote-compile service (HTTP 500, see
    # training/loop.py metric containment); a 4-image program compiles.
    batch_gpu: Optional[int] = None
    _sampler: Optional[Callable] = None

    def _resolve_batch_gpu(self) -> int:
        """Largest divisor of batch_size that is <= the requested/auto cap."""
        cap = self.batch_gpu
        if cap is None:
            cap = self.batch_size if self.cfg.generator.img_resolution < 256 else 4
        cap = max(1, min(cap, self.batch_size))
        while self.batch_size % cap:
            cap -= 1
        return cap

    def make_image_sampler(self) -> Callable:
        """(batch_size, seed) -> uint8 images [N,H,W,3] from G_ema
        (ref metric_utils.py:288-319)."""
        cfg = self.cfg
        G = self.G
        g_vars = self.g_vars

        @jax.jit
        def _render(z, c, cam_angles, cam_fov, cam_radius, cam_look_at):
            cam = TensorGroup(angles=cam_angles, fov=cam_fov, radius=cam_radius,
                              look_at=cam_look_at)

            mbr = cfg.generator.max_batch_res
            chunk = mbr * mbr if cfg.generator.img_resolution > mbr else None

            def fwd(g):
                ws = g.mapping(z, c, camera_angles=cam.angles, train=False)
                cam_post = (g.synthesis.apply_camera_adaptor(cam, z, c)
                            if cfg.generator.camera_adaptor.enabled else cam)
                return g.synthesis(ws, cam_post, train=False, noise_mode='const',
                                   ray_chunk=chunk)

            img = G.apply(g_vars, method=fwd)
            return to_uint8_images(img)

        cond_iter = iterate_random_conditioning(cfg, self.dataset, self.batch_size)
        bg = self._resolve_batch_gpu()

        def sample(batch_size: int, seed: int):
            assert batch_size == self.batch_size
            cond = next(cond_iter)
            z = jax.random.normal(jax.random.PRNGKey(seed), (batch_size, cfg.generator.z_dim))
            cam = cond['camera_params']
            # host-level micro-batching: one small static-shape render
            # program, reused across chunks (compile-service friendly)
            chunks = [_render(z[i:i + bg], cond['c'][i:i + bg], cam.angles[i:i + bg],
                              cam.fov[i:i + bg], cam.radius[i:i + bg],
                              cam.look_at[i:i + bg])
                      for i in range(0, batch_size, bg)]
            return chunks[0] if len(chunks) == 1 else np.concatenate(
                [np.asarray(x) for x in chunks], axis=0)

        return sample

    def make_depth_sampler(self, cut_quantile: float = 0.5) -> Callable:
        """Frontal-camera depth maps for NFS (ref metric_utils.py:323-350).

        Note: cut_quantile pools densities over the whole rendered tensor
        (ref tri_plane_renderer.py:366-368 — torch.quantile over batch
        incl. the batch dim), so with batch_gpu micro-batching the pool is
        the micro-batch, not the eval batch. The reference's NFS is itself
        eval-batch-size-dependent for the same reason; at cut_quantile=0
        micro-batching is exactly value-preserving."""
        cfg = self.cfg
        G = self.G
        g_vars = self.g_vars
        mean_cam = get_mean_camera_params(asdict(cfg.camera))

        @jax.jit
        def _render_depth(z, c):
            n = z.shape[0]
            cam = TensorGroup(
                angles=jnp.repeat(mean_cam.angles, n, axis=0),
                fov=jnp.repeat(mean_cam.fov, n, axis=0),
                radius=jnp.repeat(mean_cam.radius, n, axis=0),
                look_at=jnp.repeat(mean_cam.look_at, n, axis=0))

            mbr = cfg.generator.max_batch_res
            chunk = mbr * mbr if cfg.generator.img_resolution > mbr else None

            def fwd(g):
                ws = g.mapping(z, c, camera_angles=cam.angles, train=False)
                out = g.synthesis(ws, cam, train=False, noise_mode='const',
                                  return_depth=True, cut_quantile=cut_quantile,
                                  ray_chunk=chunk)
                return out.depth

            return G.apply(g_vars, method=fwd)

        cond_iter = iterate_random_conditioning(cfg, self.dataset, self.batch_size)
        bg = self._resolve_batch_gpu()

        def sample(batch_size: int, seed: int):
            cond = next(cond_iter)
            z = jax.random.normal(jax.random.PRNGKey(seed), (batch_size, cfg.generator.z_dim))
            chunks = [_render_depth(z[i:i + bg], cond['c'][i:i + bg])
                      for i in range(0, batch_size, bg)]
            return chunks[0] if len(chunks) == 1 else np.concatenate(
                [np.asarray(x) for x in chunks], axis=0)

        return sample


# ------------------------------------------------------------------ metrics

def _fid(ctx: EvalContext, max_real: Optional[int], num_gen: int) -> float:
    real = compute_feature_stats_for_dataset(
        ctx.dataset, ctx.detector, max_items=max_real, cache_dir=ctx.cache_dir,
        capture_mean_cov=True, batch_size=ctx.batch_size)
    gen = compute_feature_stats_for_generator(
        ctx.make_image_sampler(), ctx.detector, batch_size=ctx.batch_size,
        max_items=num_gen, capture_mean_cov=True)
    return fid_mod.compute_fid(real, gen)


def _kid(ctx: EvalContext, max_real: Optional[int], num_gen: int) -> float:
    real = compute_feature_stats_for_dataset(
        ctx.dataset, ctx.detector, max_items=max_real, cache_dir=ctx.cache_dir,
        capture_all=True, batch_size=ctx.batch_size)
    gen = compute_feature_stats_for_generator(
        ctx.make_image_sampler(), ctx.detector, batch_size=ctx.batch_size,
        max_items=num_gen, capture_all=True)
    return kid_mod.compute_kid(real.get_all(), gen.get_all())


def _pr(ctx: EvalContext, max_real: Optional[int], num_gen: int):
    real = compute_feature_stats_for_dataset(
        ctx.dataset, ctx.detector, max_items=max_real, cache_dir=ctx.cache_dir,
        capture_all=True, batch_size=ctx.batch_size)
    gen = compute_feature_stats_for_generator(
        ctx.make_image_sampler(), ctx.detector, batch_size=ctx.batch_size,
        max_items=num_gen, capture_all=True)
    return pr_mod.compute_pr(real.get_all(), gen.get_all())


@register_metric
def fid2k_full(ctx: EvalContext) -> Dict[str, float]:
    return {'fid2k_full': _fid(ctx, max_real=None, num_gen=2048)}


@register_metric
def fid5k_5k(ctx: EvalContext) -> Dict[str, float]:
    return {'fid5k_5k': _fid(ctx, max_real=5000, num_gen=5000)}


@register_metric
def fid50k_full(ctx: EvalContext) -> Dict[str, float]:
    return {'fid50k_full': _fid(ctx, max_real=None, num_gen=50000)}


@register_metric
def kid50k(ctx: EvalContext) -> Dict[str, float]:
    return {'kid50k': _kid(ctx, max_real=50000, num_gen=50000)}


@register_metric
def kid50k_full(ctx: EvalContext) -> Dict[str, float]:
    return {'kid50k_full': _kid(ctx, max_real=None, num_gen=50000)}


@register_metric
def pr50k3(ctx: EvalContext) -> Dict[str, float]:
    p, r = _pr(ctx, max_real=50000, num_gen=50000)
    return {'pr50k3_precision': p, 'pr50k3_recall': r}


@register_metric
def pr50k3_full(ctx: EvalContext) -> Dict[str, float]:
    p, r = _pr(ctx, max_real=None, num_gen=50000)
    return {'pr50k3_full_precision': p, 'pr50k3_full_recall': r}


@register_metric
def is50k(ctx: EvalContext) -> Dict[str, float]:
    gen = compute_feature_stats_for_generator(
        ctx.make_image_sampler(), ctx.detector, batch_size=ctx.batch_size,
        max_items=50000, capture_all=True)
    mean, std = is_mod.compute_is(gen.get_all())
    return {'is50k_mean': mean, 'is50k_std': std}


@register_metric
def ppl2_wend(ctx: EvalContext) -> Dict[str, float]:
    from tdgp.metrics.ppl import compute_ppl
    # w-space endpoint interpolation pairs with shared const noise
    cfg = ctx.cfg
    G, g_vars = ctx.G, ctx.g_vars
    cond_iter = iterate_random_conditioning(cfg, ctx.dataset, ctx.batch_size)
    epsilon = 1e-4

    @jax.jit
    def _pair(z0, z1, c, cam_angles, cam_fov, cam_radius, cam_look_at, t):
        cam = TensorGroup(angles=cam_angles, fov=cam_fov, radius=cam_radius,
                          look_at=cam_look_at)

        def fwd(g):
            ws0 = g.mapping(z0, c, camera_angles=cam.angles, train=False)
            ws1 = g.mapping(z1, c, camera_angles=cam.angles, train=False)
            wt0 = ws0 + (ws1 - ws0) * t[:, None, None]
            wt1 = ws0 + (ws1 - ws0) * (t + epsilon)[:, None, None]
            img0 = g.synthesis(wt0, cam, train=False, noise_mode='const')
            img1 = g.synthesis(wt1, cam, train=False, noise_mode='const')
            return to_uint8_images(img0), to_uint8_images(img1)

        return G.apply(g_vars, method=fwd)

    bg = ctx._resolve_batch_gpu()

    def sample_pair(batch_size, seed):
        cond = next(cond_iter)
        key = jax.random.PRNGKey(seed)
        k0, k1, kt = jax.random.split(key, 3)
        z0 = jax.random.normal(k0, (batch_size, cfg.generator.z_dim))
        z1 = jax.random.normal(k1, (batch_size, cfg.generator.z_dim))
        t = jax.random.uniform(kt, (batch_size,))
        cam = cond['camera_params']
        # micro-batch the pair render (2 synthesis calls per program —
        # the largest eval program; see EvalContext.batch_gpu)
        chunks = [_pair(z0[i:i + bg], z1[i:i + bg], cond['c'][i:i + bg],
                        cam.angles[i:i + bg], cam.fov[i:i + bg],
                        cam.radius[i:i + bg], cam.look_at[i:i + bg],
                        t[i:i + bg])
                  for i in range(0, batch_size, bg)]
        if len(chunks) == 1:
            return chunks[0]
        return (np.concatenate([np.asarray(a) for a, _ in chunks], axis=0),
                np.concatenate([np.asarray(b) for _, b in chunks], axis=0))

    detector = ctx.ppl_detector or ctx.detector
    value = compute_ppl(sample_pair, detector, num_samples=2048,
                        batch_size=ctx.batch_size, epsilon=epsilon)
    return {'ppl2_wend': value}


@register_metric
def nfs256(ctx: EvalContext) -> Dict[str, float]:
    sampler = ctx.make_depth_sampler(cut_quantile=0.5)
    maps = []
    n_done, seed = 0, 0
    while n_done < 256:
        d = np.asarray(sampler(ctx.batch_size, seed))[..., 0]
        maps.append(d)
        n_done += d.shape[0]
        seed += 1
    depth_maps = np.concatenate(maps)[:256]
    ray = ctx.cfg.camera.ray
    return {'nfs256': nfs_mod.compute_nfs_from_depth_maps(
        depth_maps, min_depth=ray.start, max_depth=ray.end, num_bins=64)}


# ------------------------------------------------------------------ driver

def calc_metric(metric: str, ctx: EvalContext) -> Dict[str, Any]:
    """ref metric_main.py:42-66."""
    assert is_valid_metric(metric), f'unknown metric {metric}; have {list_metrics()}'
    t0 = time.time()
    results = _metric_dict[metric](ctx)
    return dict(results=results, metric=metric, total_time=time.time() - t0,
                num_devices=jax.device_count())


def report_metric(result_dict: Dict[str, Any], run_dir: Optional[str] = None,
                  snapshot: Optional[str] = None) -> None:
    """Append to metric-<name>.jsonl (ref metric_main.py:70-79)."""
    metric = result_dict['metric']
    line = json.dumps({**result_dict, 'snapshot': snapshot, 'timestamp': time.time()})
    print(line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f'metric-{metric}.jsonl'), 'at') as f:
            f.write(line + '\n')
