"""Observability: TensorBoard sink + 3DGP progress/camera-posterior panel.

Counterpart of ref training_loop.py:509-574 — the reference logs (1) all
training stats, (2) a panel of 3DGP-specific progress scalars
(nerf_noise_std, patch schedule, kd weight, gpc_spoof_p, emd multiplier),
and (3) camera-posterior histograms/means/stds sampled from 1024 z's per
tick. TensorBoard writing uses torch.utils.tensorboard (torch is a host-side
dependency only); when unavailable everything still lands in stats.jsonl.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tdgp.config import Config, asdict


def host_np(x) -> np.ndarray:
    """np view of a possibly multi-host jax.Array.

    np.asarray on an array that spans non-addressable devices raises; for
    REPLICATED outputs (the posterior samples, all telemetry pulls) the
    local shard IS the full value, so read that."""
    if hasattr(x, 'is_fully_addressable') and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


class TBWriter:
    """Guarded TensorBoard writer: no-ops if torch/tensorboard is missing."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._w = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._w = None

    def scalars(self, values: Dict[str, float], step: int):
        if self._w is None:
            return
        for k, v in values.items():
            try:
                self._w.add_scalar(k, float(v), global_step=step)
            except (TypeError, ValueError):
                pass

    def histogram(self, name: str, values: np.ndarray, step: int):
        if self._w is None:
            return
        self._w.add_histogram(name, values, global_step=step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()


def progress_scalars(sched, ada_p: float) -> Dict[str, float]:
    """The 3DGP progress panel (ref training_loop.py:515-535)."""
    pull = lambda x: float(host_np(x))
    return {
        'Progress/nerf_noise_std': pull(sched.nerf_noise_std),
        'Progress/blur_sigma': pull(sched.blur_sigma),
        'Progress/patch/min_scale': pull(sched.patch_min_scale),
        'Progress/patch/beta': pull(sched.patch_beta),
        'Progress/kd_weight': pull(sched.kd_weight),
        'Progress/gpc_spoof_p': pull(sched.gpc_spoof_p),
        'Progress/emd_multiplier': pull(sched.emd_multiplier),
        'Progress/depth/progress': pull(sched.depth_progress),
        'Progress/augment_p': float(ada_p),
    }


def make_camera_posterior_fn(G, cfg: Config, num_samples: int = 1024):
    """Sampler for the camera-posterior panel (ref training_loop.py:536-574):
    1024 z's through the camera adaptor -> prior & posterior parameter
    samples. Returns None when the model has no camera adaptor."""
    gc = cfg.generator
    if cfg.model_name == 'stylegan2' or not gc.camera_adaptor.enabled:
        return None

    from tdgp.rendering.camera import sample_camera_params
    from tdgp.training.patch import sample_random_c

    cam_cfg = asdict(cfg.camera)
    custom_angles = cfg.camera.origin.angles.dist == 'custom'

    @jax.jit
    def _fn(g_vars, rng, origin_angles):
        kz, kc, kcam = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (num_samples, gc.z_dim))
        c = sample_random_c(kc, num_samples, gc.c_dim)
        prior = sample_camera_params(kcam, cam_cfg, num_samples,
                                     origin_angles=origin_angles)
        post = G.apply(g_vars, method=lambda g:
                       g.synthesis.apply_camera_adaptor(prior, z, c))
        return prior, post

    def fn(g_vars, rng, origin_angles=None):
        if custom_angles:
            # the 'custom' dist has no prior to draw from — the caller must
            # feed dataset camera angles (ref training_loop.py:305-312); the
            # loop tiles the current batch's angles up to num_samples
            if origin_angles is None:
                return None
            origin_angles = jnp.asarray(
                np.resize(host_np(origin_angles), (num_samples, 3)))
        else:
            origin_angles = None
        return _fn(g_vars, rng, origin_angles)

    return fn


def camera_posterior_report(posterior_fn, g_vars, rng,
                            tb: Optional[TBWriter] = None,
                            step: int = 0,
                            origin_angles=None) -> Dict[str, float]:
    """Scalars (means/stds) + TB histograms for the camera posterior.
    origin_angles: dataset camera angles for the 'custom' dist (any length;
    tiled up to the sample count)."""
    if posterior_fn is None:
        return {}
    res = posterior_fn(g_vars, rng, origin_angles=origin_angles)
    if res is None:  # 'custom' dist without dataset angles: nothing to report
        return {}
    prior, post = res
    out: Dict[str, float] = {}

    def series(group) -> Dict[str, np.ndarray]:
        angles = host_np(group.angles)
        look_at = host_np(group.look_at)
        return {
            'yaw': angles[:, 0],
            'pitch': angles[:, 1],
            'fov': host_np(group.fov),
            'radius': host_np(group.radius),
            'look_at_x': look_at[:, 0],
            'look_at_y': look_at[:, 1],
            'look_at_z': look_at[:, 2],
        }

    for tag, group in (('posterior', post), ('prior', prior)):
        for name, vals in series(group).items():
            out[f'Camera/{tag}/{name}/mean'] = float(vals.mean())
            out[f'Camera/{tag}/{name}/std'] = float(vals.std())
            if tb is not None and tag == 'posterior':
                tb.histogram(f'Camera/{tag}/{name}', vals, step)
    return out
