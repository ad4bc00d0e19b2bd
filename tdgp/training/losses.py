"""3DGP loss terms (ref: src/training/loss.py — StyleGAN2Loss).

Every term is a pure function of (params, batch, schedules, rng); gradients
come from jax.grad in train_step. Functional differences from the reference,
all jit-motivated:
  - blur kernels have static shapes with traced sigmas (tdgp.training.blur)
  - the camera-adaptor EMD regularizer computes exact 1-D optimal transport
    in closed form: for a convex cost, the optimal coupling between two
    equal-weight empirical measures is the sorted matching, so
    emd2 == mean((sort(x) - sort(y))^2) — replacing POT's LP solver
    (ref loss.py:195-197) exactly
  - the Lipschitz regularizer takes per-sample jacobian diagonals with
    vmap(jacfwd) instead of 8 create_graph autograd.grad calls (ref :156-158)
  - R1 is jax.grad-of-grad; torch's no_weight_gradients context is
    unnecessary (inner grad is w.r.t. the image only).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdgp.config import Config
from tdgp.models.camera_adaptor import roll_camera_params, unroll_camera_params
from tdgp.models.discriminator import Discriminator
from tdgp.models.epigraf import Generator
from tdgp.rendering.camera import get_mean_angles_values, sample_camera_params
from tdgp.training.blur import blur_depth_channel, maybe_blur
from tdgp.training.patch import extract_patches, sample_patch_params, sample_random_c
from tdgp.training.schedules import Schedules
from tdgp.utils.tensor_group import TensorGroup
from tdgp.config import asdict


# --------------------------------------------------------------- G forward

def g_forward(G: Generator, g_vars, z, c, camera_params: TensorGroup,
              camera_angles_cond, sched: Schedules, rng, cfg: Config,
              update_emas: bool = False):
    """ref loss.py:69-83 (run_G). Returns (out TensorGroup(img, depth, ws),
    patch_params, posterior camera_params, updated ema vars or None)."""
    k_patch, k_noise, k_render, k_depth, k_drop, k_mix = jax.random.split(rng, 6)
    patch_params = None
    if cfg.generator.patch.enabled:
        patch_params = sample_patch_params(k_patch, z.shape[0], cfg.generator.patch,
                                           min_scale=sched.patch_min_scale,
                                           beta=sched.patch_beta)

    def fwd(g: Generator):
        ws = g.mapping(z, c, camera_angles=camera_angles_cond,
                       update_emas=update_emas, train=True)
        if cfg.loss.style_mixing_prob > 0:
            # ref loss.py:71-75: with prob p, replace ws[cutoff:] by a second
            # latent's styles
            k_cut, k_p, k_z2 = jax.random.split(k_mix, 3)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(jax.random.uniform(k_p, ()) < cfg.loss.style_mixing_prob,
                               cutoff, num_ws)
            z2 = jax.random.normal(k_z2, z.shape, z.dtype)
            ws2 = g.mapping(z2, c, camera_angles=camera_angles_cond,
                            update_emas=False, train=True)
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx >= cutoff, ws2, ws)
        cam = camera_params
        if cfg.training.learn_camera_dist:
            cam = g.synthesis.apply_camera_adaptor(camera_params, z, c)
        out = g.synthesis(ws, cam, patch_params, train=True,
                          concat_depth=cfg.training.use_depth, return_depth=True,
                          nerf_noise_std=sched.nerf_noise_std,
                          depth_progress=sched.depth_progress)
        out.ws = ws
        return out, cam

    rngs = {'noise': k_noise, 'render': k_render, 'depth': k_depth, 'dropout': k_drop}
    if update_emas:
        (out, cam), new_vars = G.apply(g_vars, method=fwd, rngs=rngs, mutable=['ema'])
        return out, patch_params, cam, new_vars['ema']
    out, cam = G.apply(g_vars, method=fwd, rngs=rngs)
    return out, patch_params, cam, None


def apply_camera_adaptor(G: Generator, g_vars, camera_params, z, c):
    return G.apply(g_vars, method=lambda g: g.synthesis.apply_camera_adaptor(camera_params, z, c))


def g_forward_2d(G, g_vars, z, c, sched: Schedules, rng, cfg: Config,
                 update_emas: bool = False):
    """2D StyleGAN2 baseline forward: full-res synthesis, then patch
    extraction from the image (ref networks_stylegan2.py:332-333, the
    model=stylegan2 baseline). Returns (out TensorGroup(img, ws),
    patch_params, updated ema vars or None)."""
    k_patch, k_noise, k_mix = jax.random.split(rng, 3)
    patch_params = None

    def fwd(g):
        ws = g.mapping(z, c, update_emas=update_emas, train=True)
        if cfg.loss.style_mixing_prob > 0:
            k_cut, k_p, k_z2 = jax.random.split(k_mix, 3)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(jax.random.uniform(k_p, ()) < cfg.loss.style_mixing_prob,
                               cutoff, num_ws)
            ws2 = g.mapping(jax.random.normal(k_z2, z.shape, z.dtype), c,
                            update_emas=False, train=True)
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx >= cutoff, ws2, ws)
        img = g.synthesis(ws, noise_mode='random')
        out = TensorGroup(img=img)
        out.ws = ws
        return out

    rngs = {'noise': k_noise}
    if update_emas:
        out, new_vars = G.apply(g_vars, method=fwd, rngs=rngs, mutable=['ema'])
        ema = new_vars['ema']
    else:
        out = G.apply(g_vars, method=fwd, rngs=rngs)
        ema = None

    if cfg.generator.patch.enabled:
        patch_params = sample_patch_params(k_patch, z.shape[0], cfg.generator.patch,
                                           min_scale=sched.patch_min_scale,
                                           beta=sched.patch_beta)
        out.img = extract_patches(out.img, patch_params, cfg.generator.patch.resolution)
    return out, patch_params, ema


# --------------------------------------------------------------- D forward

def d_forward(D: Discriminator, d_vars, img, c, sched: Schedules, cfg: Config,
              patch_params=None, camera_angles=None, predict_feat: bool = False,
              augment_fn=None, rng=None):
    """ref loss.py:85-100 (run_D): blur fade-in, separate depth blur, augment, D."""
    max_blur = cfg.loss.blur_init_sigma
    img = maybe_blur(img, sched.blur_sigma, max_blur)
    if cfg.training.use_depth:
        assert img.shape[-1] == 4, f"RGB-D expected, got {img.shape}"
        img = blur_depth_channel(img, sched.blur_sigma, max_blur)
    if augment_fn is not None:
        img = augment_fn(img, rng)
    return D.apply(d_vars, img, c, patch_params=patch_params,
                   camera_angles=camera_angles, predict_feat=predict_feat, train=True)


# ---------------------------------------------------------- camera regs

def emd_1d_squared(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact 1-D Wasserstein with squared cost between equal-weight samples."""
    return jnp.mean(jnp.square(jnp.sort(x) - jnp.sort(y)))


def camera_emd_reg(G: Generator, g_vars, sched: Schedules, rng, cfg: Config) -> Tuple[jnp.ndarray, Dict]:
    """EMD between prior and posterior camera marginals (ref loss.py:182-216)."""
    acfg = cfg.generator.camera_adaptor
    n = acfg.emd.num_samples
    k_z, k_c, k_cam = jax.random.split(rng, 3)
    z = jax.random.normal(k_z, (n, cfg.generator.z_dim))
    c = sample_random_c(k_c, n, cfg.generator.c_dim)
    prior = sample_camera_params(k_cam, asdict(cfg.camera), n)
    posterior = apply_camera_adaptor(G, g_vars, prior, z, c)
    prior_raw = unroll_camera_params(prior)          # [n, 8]
    post_raw = unroll_camera_params(posterior)       # [n, 8]
    emds = jax.vmap(emd_1d_squared, in_axes=1)(post_raw, prior_raw)  # [8]
    regs = roll_camera_params(emds[None, :])
    loss = sched.emd_multiplier * (
        jnp.sum(regs.angles[:, :2]) * acfg.emd.origin
        + jnp.sum(regs.radius) * acfg.emd.radius
        + jnp.sum(regs.fov) * acfg.emd.fov
        + jnp.sum(regs.look_at) * acfg.emd.look_at)
    stats = {'Loss/camera_dist/emd_loss': loss}
    return loss, stats


def camera_lipschitz_reg(G: Generator, g_vars, rng, cfg: Config) -> Tuple[jnp.ndarray, Dict]:
    """Per-scalar Lipschitz penalty |d post_i / d prior_i| + 1/(.+eps)
    (ref loss.py:143-177)."""
    acfg = cfg.generator.camera_adaptor
    n = 256
    k_z, k_c, k_cam = jax.random.split(rng, 3)
    z = jax.random.normal(k_z, (n, cfg.generator.z_dim))
    c = sample_random_c(k_c, n, cfg.generator.c_dim)
    prior = sample_camera_params(k_cam, asdict(cfg.camera), n)
    prior_raw = unroll_camera_params(prior)  # [n, 8]

    def per_sample(raw_i, z_i, c_i):
        def fn(raw):
            cam = roll_camera_params(raw[None, :])
            post = apply_camera_adaptor(G, g_vars, cam, z_i[None], c_i[None])
            return unroll_camera_params(post)[0]
        return jnp.diagonal(jax.jacfwd(fn)(raw_i))  # [8]

    grads = jax.vmap(per_sample)(prior_raw, z, c)  # [n, 8]
    norms = jnp.abs(grads)
    regs = jnp.mean(norms + 1.0 / (norms + 1e-4), axis=0)  # [8]
    rr = roll_camera_params(regs[None, :])
    lw = acfg.lipschitz_weights
    loss = (jnp.sum(rr.angles[:, :2]) * lw.angles + jnp.sum(rr.radius) * lw.radius
            + jnp.sum(rr.fov) * lw.fov + jnp.sum(rr.look_at) * lw.look_at)
    return loss, {'Loss/camera_dist/lipschitz_loss': loss}


def camera_force_mean_reg(G: Generator, g_vars, rng, cfg: Config) -> Tuple[jnp.ndarray, Dict]:
    """Pull the posterior mean angles to the prior mean (ref loss.py:221-230)."""
    mean_angles = jnp.asarray(get_mean_angles_values(asdict(cfg.camera.origin.angles)))
    n = 256
    k_z, k_c, k_cam = jax.random.split(rng, 3)
    z = jax.random.normal(k_z, (n, cfg.generator.z_dim))
    c = sample_random_c(k_c, n, cfg.generator.c_dim)
    prior = sample_camera_params(k_cam, asdict(cfg.camera), n)
    posterior = apply_camera_adaptor(G, g_vars, prior, z, c)
    raw = jnp.sqrt(jnp.sum(jnp.square(jnp.mean(posterior.angles, axis=0) - mean_angles + 1e-8)))
    loss = cfg.generator.camera_adaptor.force_mean_weight * raw
    return loss, {'Loss/camera_dist/force_mean': raw}


# ---------------------------------------------------------------- adversarial

def adv_loss_g(logits: jnp.ndarray, loss_type: str) -> jnp.ndarray:
    if loss_type == 'non_saturating':
        return jax.nn.softplus(-logits)
    if loss_type == 'hinge':
        return -logits
    raise NotImplementedError(loss_type)


def adv_loss_d_fake(logits: jnp.ndarray, loss_type: str, clamp: float) -> jnp.ndarray:
    if loss_type == 'non_saturating':
        return jax.nn.softplus(jnp.maximum(logits, -clamp))
    if loss_type == 'hinge':
        return jax.nn.relu(1.0 + logits)
    raise NotImplementedError(loss_type)


def adv_loss_d_real(logits: jnp.ndarray, loss_type: str, clamp: float) -> jnp.ndarray:
    if loss_type == 'non_saturating':
        return jax.nn.softplus(-jnp.minimum(logits, clamp))
    if loss_type == 'hinge':
        return jax.nn.relu(1.0 - logits)
    raise NotImplementedError(loss_type)


def compute_sample_weights(patch_params: Optional[Dict], scale_pow: float = 1.0):
    """KD distances weighted by patch scale (ref loss.py:107-114)."""
    if patch_params is None:
        return 1.0
    scales = jnp.mean(patch_params['scales'], axis=1)
    raw = scales ** scale_pow
    return raw / (jnp.mean(raw) + 1e-8)


def kd_loss(real_feats: jnp.ndarray, real_embs: jnp.ndarray, loss_type: str) -> jnp.ndarray:
    """Knowledge distillation distance per sample (ref loss.py:301-307)."""
    if loss_type == 'l2':
        return jnp.linalg.norm(real_feats - real_embs, axis=1)
    if loss_type == 'kl':
        logp = jax.nn.log_softmax(real_feats, axis=1)
        q = jax.nn.softmax(real_embs, axis=1)
        return jnp.sum(q * (jnp.log(q + 1e-12) - logp), axis=1)
    raise NotImplementedError(loss_type)


def prepare_real_img(real_img: jnp.ndarray, real_depth: jnp.ndarray,
                     sched: Schedules, cfg: Config) -> jnp.ndarray:
    """Concat (optionally pre-blurred) real depth as 4th channel (ref loss.py:122-125)."""
    if cfg.training.blur_real_depth_sigma > 0:
        real_depth = maybe_blur(real_depth, jnp.asarray(cfg.training.blur_real_depth_sigma),
                                cfg.training.blur_real_depth_sigma)
    if cfg.training.use_depth:
        return jnp.concatenate([real_img, real_depth], axis=-1)
    return real_img
