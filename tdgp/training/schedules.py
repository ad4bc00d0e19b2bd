"""Host-side progressive schedules, packed into one traced pytree.

The reference mutates python attributes per step (loss.progressive_update,
G.progressive_update, ref training_loop.py:378-379); here every schedule is
computed on host as a float and enters the ONE compiled train step as a
traced scalar — values change every step, the compiled graph never does.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from tdgp.config import Config
from tdgp.utils.misc import linear_schedule


@flax.struct.dataclass
class Schedules:
    blur_sigma: jnp.ndarray          # D input blur fade (loss.py:121)
    patch_min_scale: jnp.ndarray     # patch-scale anneal (loss.py:54-61)
    patch_beta: jnp.ndarray          # beta distribution anneal
    gpc_spoof_p: jnp.ndarray         # camera-conditioning spoof prob (loss.py:62)
    kd_weight: jnp.ndarray           # D knowledge-distillation weight (loss.py:63)
    emd_multiplier: jnp.ndarray      # camera-adaptor EMD ramp (loss.py:64-67)
    nerf_noise_std: jnp.ndarray      # density noise anneal (networks_epigraf.py:192)
    depth_progress: jnp.ndarray      # depth-adaptor selection anneal
    ema_beta: jnp.ndarray            # G EMA decay (training_loop.py:356-366)
    ada_p: jnp.ndarray               # ADA augment probability (controller state)


def compute_schedules(cfg: Config, cur_nimg: int, ada_p: float = 0.0) -> Schedules:
    kimg = cur_nimg / 1e3
    t = cfg.training
    l = cfg.loss
    g = cfg.generator

    blur_sigma = (max(1 - cur_nimg / (l.blur_fade_kimg * 1e3), 0) * l.blur_init_sigma
                  if l.blur_fade_kimg > 0 else 0.0)

    p = g.patch
    if p.distribution == 'beta':
        patch_beta = linear_schedule(kimg, p.beta_val_start, p.beta_val_end, p.anneal_kimg)
        patch_min_scale = p.min_scale_trg
    else:
        patch_beta = 1.0
        patch_min_scale = linear_schedule(kimg, p.max_scale, p.min_scale_trg, p.anneal_kimg)

    gpc_spoof_p = linear_schedule(kimg, 1.0, g.camera_cond_spoof_p, 1000)
    kd_weight = linear_schedule(kimg, l.kd.weight, 0.0, period=l.kd.anneal_kimg)
    emd_multiplier = (linear_schedule(kimg, 0.0, 1.0, period=g.camera_adaptor.emd.anneal_kimg)
                      if t.learn_camera_dist else 0.0)
    nerf_noise_std = linear_schedule(kimg, g.nerf_noise_std_init, 0.0, g.nerf_noise_kimg_growth)
    depth_progress = linear_schedule(kimg, 0.0, 1.0, g.depth_adaptor.anneal_kimg)

    ema_nimg = t.ema_kimg * 1000
    if t.ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * t.ema_rampup)
    ema_beta = 0.5 ** (t.batch_size / max(ema_nimg, 1e-8))
    if t.ema_start_kimg > kimg:
        ema_beta = 0.0

    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return Schedules(
        blur_sigma=f32(blur_sigma), patch_min_scale=f32(patch_min_scale),
        patch_beta=f32(patch_beta), gpc_spoof_p=f32(gpc_spoof_p),
        kd_weight=f32(kd_weight), emd_multiplier=f32(emd_multiplier),
        nerf_noise_std=f32(nerf_noise_std), depth_progress=f32(depth_progress),
        ema_beta=f32(ema_beta), ada_p=f32(ada_p))
