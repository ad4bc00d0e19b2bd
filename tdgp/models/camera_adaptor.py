"""Learnable camera distribution ("camera generator").

Counterpart of ref src/training/networks_camera_adaptor.py. Warps prior
camera samples (yaw, pitch, roll, fov, radius, look_at[3]) = 8 scalars via
two small MLPs conditioned on (z, c), squashing back into the prior bounds
through sigmoids. Pure function of (params, prior, z, c) — differentiable
w.r.t. the prior, which the Lipschitz regularizer exploits via jacfwd.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tdgp.config import CameraAdaptorCfg, CameraConfig
from tdgp.models.layers import FullyConnected, normalize_2nd_moment
from tdgp.utils.tensor_group import TensorGroup


def unroll_camera_params(cp: TensorGroup) -> jnp.ndarray:
    """TensorGroup -> [N, 8] (ref networks_camera_adaptor.py:67-69)."""
    return jnp.concatenate([cp.angles, cp.fov[:, None], cp.radius[:, None], cp.look_at], axis=1)


def roll_camera_params(cp: jnp.ndarray) -> TensorGroup:
    """[N, 8] -> TensorGroup (ref :71-73)."""
    return TensorGroup(angles=cp[:, 0:3], fov=cp[:, 3], radius=cp[:, 4], look_at=cp[:, 5:8])


def normalize_camera_params(camera_cfg: CameraConfig, cp: TensorGroup,
                            eps: float = 1e-8) -> TensorGroup:
    """Map camera scalars into [0, 1] by their prior bounds (ref :75-85)."""
    raw = unroll_camera_params(cp)
    yaw, pitch, roll, fov, radius, la_yaw, la_pitch, la_radius = [raw[:, i] for i in range(8)]
    oa = camera_cfg.origin.angles
    la = camera_cfg.look_at
    yaw = (yaw - oa.yaw.min) / (oa.yaw.max - oa.yaw.min + eps)
    pitch = (pitch - oa.pitch.min) / (oa.pitch.max - oa.pitch.min + eps)
    fov = (fov - camera_cfg.fov.min) / (camera_cfg.fov.max - camera_cfg.fov.min + eps)
    la_yaw = (la_yaw - la.angles.yaw.min) / (la.angles.yaw.max - la.angles.yaw.min + eps)
    la_pitch = (la_pitch - la.angles.pitch.min) / (la.angles.pitch.max - la.angles.pitch.min + eps)
    la_radius = (la_radius - la.radius.min) / (la.radius.max - la.radius.min + eps)
    return roll_camera_params(jnp.stack(
        [yaw, pitch, roll, fov, radius, la_yaw, la_pitch, la_radius], axis=1))


def denormalize_camera_params(camera_cfg: CameraConfig, cp: TensorGroup) -> TensorGroup:
    """Sigmoid-squash back into prior bounds (ref :87-98).

    Note: ref line 96 denormalizes look_at radius against
    `look_at.angles.pitch.min` — an upstream typo that is a no-op for every
    shipped config (pitch.min == radius.min == 0); we use the correct bound.
    """
    raw = unroll_camera_params(cp)
    yaw, pitch, roll, fov, radius, la_yaw, la_pitch, la_radius = [raw[:, i] for i in range(8)]
    oa = camera_cfg.origin.angles
    la = camera_cfg.look_at
    sig = nn.sigmoid
    yaw = sig(yaw) * (oa.yaw.max - oa.yaw.min) + oa.yaw.min
    pitch = sig(pitch) * (oa.pitch.max - oa.pitch.min - 2e-5) + oa.pitch.min + 1e-5
    roll = roll * 0.0
    fov = sig(fov) * (camera_cfg.fov.max - camera_cfg.fov.min) + camera_cfg.fov.min
    la_yaw = sig(la_yaw) * (la.angles.yaw.max - la.angles.yaw.min) + la.angles.yaw.min
    la_pitch = sig(la_pitch) * (la.angles.pitch.max - la.angles.pitch.min) + la.angles.pitch.min
    la_radius = sig(la_radius) * (la.radius.max - la.radius.min) + la.radius.min
    return roll_camera_params(jnp.stack(
        [yaw, pitch, roll, fov, radius, la_yaw, la_pitch, la_radius], axis=1))


class ParamsAdaptor(nn.Module):
    """Small softplus MLP over (params, z?, c?) (ref :24-51)."""
    cfg: CameraAdaptorCfg
    out_channels: int
    use_z: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: Optional[jnp.ndarray] = None,
                 c: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        lr = self.cfg.lr_multiplier
        x = FullyConnected(self.cfg.hid_dim, activation='softplus', lr_multiplier=lr,
                           name='project_params')(x)
        if self.use_z:
            zp = FullyConnected(self.cfg.embed_dim, activation='softplus', lr_multiplier=lr,
                                name='project_z')(z)
            x = jnp.concatenate([x, normalize_2nd_moment(zp)], axis=1)
        if self.cfg.c_dim > 0:
            cp = FullyConnected(self.cfg.embed_dim, activation='softplus', lr_multiplier=lr,
                                name='project_c')(c)
            x = jnp.concatenate([x, normalize_2nd_moment(cp)], axis=1)
        x = FullyConnected(self.cfg.hid_dim, activation='softplus', lr_multiplier=lr,
                           name='main0')(x)
        x = FullyConnected(self.out_channels, activation='linear', lr_multiplier=lr,
                           name='main1')(x)
        return x


class CameraAdaptor(nn.Module):
    """Prior camera params -> learned posterior (ref :53-134)."""
    cfg: CameraAdaptorCfg
    camera: CameraConfig

    @nn.compact
    def __call__(self, camera_params_prior: TensorGroup, z: jnp.ndarray,
                 c: Optional[jnp.ndarray] = None) -> TensorGroup:
        old_norm = normalize_camera_params(self.camera, camera_params_prior)

        # origin adaptor: (yaw, pitch, roll, radius) -> same, no z (ref :112-114)
        origin_in = jnp.concatenate([old_norm.angles, old_norm.radius[:, None]], axis=1)
        origin_new = ParamsAdaptor(self.cfg, 4, use_z=False, name='origin_adaptor')(
            origin_in, c=c)
        # look-at adaptor: (new angles, fov, new radius, look_at) -> (fov, look_at) (ref :115-116)
        look_at_in = jnp.concatenate([
            origin_new[:, :3], old_norm.fov[:, None], origin_new[:, 3:4], old_norm.look_at,
        ], axis=1)
        look_at_new = ParamsAdaptor(self.cfg, 4, use_z=True, name='look_at_adaptor')(
            look_at_in, z=z, c=c)

        new_norm = roll_camera_params(jnp.concatenate([
            origin_new[:, :3],          # yaw pitch roll
            look_at_new[:, 0:1],        # fov
            origin_new[:, 3:4],         # radius
            look_at_new[:, 1:4],        # look_at
        ], axis=1))
        if self.cfg.residual:
            new_norm = old_norm + new_norm

        new = denormalize_camera_params(self.camera, new_norm)

        # Selectively keep prior fields (ref adjust_for_prior :100-110). The
        # `+ 0 * new` trick kept DDP grads alive in torch; with functional
        # grads we can select cleanly.
        adj = self.cfg.adjust
        out = TensorGroup(
            angles=new.angles if adj.angles else camera_params_prior.angles + 0.0 * new.angles,
            radius=new.radius if adj.radius else camera_params_prior.radius + 0.0 * new.radius,
            fov=new.fov if adj.fov else camera_params_prior.fov + 0.0 * new.fov,
            look_at=new.look_at if adj.look_at else camera_params_prior.look_at + 0.0 * new.look_at,
        )
        return out
