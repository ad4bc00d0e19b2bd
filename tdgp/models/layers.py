"""Shared model building blocks (ref: src/training/layers.py).

All layers follow StyleGAN's equalized learning rate scheme: parameters are
stored at unit scale and multiplied by `gain / sqrt(fan_in)` at runtime, with
an `lr_multiplier` folded into both init and runtime scale (ref
layers.py:21-58). Layout is NHWC; channels ride the TPU lane dimension.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdgp.ops.bias_act import bias_act
from tdgp.ops.conv2d_resample import conv2d_resample
from tdgp.ops.upfirdn2d import setup_filter


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """ref layers.py:16-17."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnected(nn.Module):
    """Equalized-LR dense layer with fused bias+activation (ref layers.py:21-58)."""
    out_features: int
    activation: str = 'linear'
    use_bias: bool = True
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param('weight', nn.initializers.normal(
            stddev=max(self.weight_init / self.lr_multiplier, 0.0)),
            (in_features, self.out_features))
        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        y = jnp.dot(x, w.astype(x.dtype) * weight_gain,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        b = None
        if self.use_bias:
            b = self.param('bias', nn.initializers.constant(self.bias_init / self.lr_multiplier),
                           (self.out_features,))
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        return bias_act(y, b, act=self.activation)


class FourierEncoder1d(nn.Module):
    """Log-spaced Fourier features for scalars (ref layers.py:303-350)."""
    coord_dim: int
    max_x_value: float = 100.0
    use_cos: bool = True

    def setup(self):
        num_freqs = int(np.ceil(np.log2(self.max_x_value)))
        grid_res = 2 ** num_freqs
        coefs = (2.0 ** np.arange(num_freqs)) / grid_res * np.pi
        self.fourier_coefs = jnp.asarray(coefs, dtype=jnp.float32)
        self.fourier_dim = num_freqs

    def get_dim(self) -> int:
        return self.fourier_dim * (2 if self.use_cos else 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 2 and x.shape[1] == self.coord_dim
        raw = self.fourier_coefs[None, None, :] * x.astype(jnp.float32)[:, :, None]
        if self.use_cos:
            return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=2)
        return jnp.sin(raw)


def fourier_dim_for(x_multiplier: float, use_cos: bool = True) -> int:
    if x_multiplier <= 0:
        return 0
    return int(np.ceil(np.log2(x_multiplier))) * (2 if use_cos else 1)


def scalar_encoder_dim(coord_dim: int, x_multiplier: float, const_emb_dim: int,
                       use_raw: bool = False) -> int:
    """Output dim of ScalarEncoder1d, computable without building the module
    (ref layers.py:277-278)."""
    return coord_dim * (const_emb_dim + fourier_dim_for(x_multiplier) + (1 if use_raw else 0))


class ScalarEncoder1d(nn.Module):
    """Encodes per-sample scalars in [0,1]: raw | fourier | learned table
    (ref layers.py:250-299)."""
    coord_dim: int
    x_multiplier: float
    const_emb_dim: int
    use_raw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        parts = []
        if self.use_raw:
            parts.append(x[:, :, None])
        if self.x_multiplier > 0:
            scaled = x.astype(jnp.float32) * self.x_multiplier
            parts.append(FourierEncoder1d(self.coord_dim, max_x_value=self.x_multiplier,
                                          name='fourier')(scaled))
            if self.const_emb_dim > 0:
                table = nn.Embed(int(np.ceil(self.x_multiplier)) + 1, self.const_emb_dim,
                                 name='const_embed')
                parts.append(table(jnp.round(scaled).astype(jnp.int32)))
        out = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
        return out.reshape(batch, -1)

    def get_dim(self) -> int:
        return scalar_encoder_dim(self.coord_dim, self.x_multiplier, self.const_emb_dim,
                                  self.use_raw)


class MappingNetwork(nn.Module):
    """z, c (and optionally camera angles) -> broadcast w (ref layers.py:65-174).

    The w_avg EMA buffer lives in the 'ema' variable collection; pass
    mutable=['ema'] with update_emas=True during training.
    """
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 2
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = 'lrelu'
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998
    camera_cond: bool = False
    camera_cond_drop_p: float = 0.0
    camera_raw_scalars: bool = True

    @nn.compact
    def __call__(self, z: Optional[jnp.ndarray], c: Optional[jnp.ndarray],
                 camera_angles: Optional[jnp.ndarray] = None,
                 truncation_psi: float = 1.0, truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False, train: bool = False) -> jnp.ndarray:
        c_dim = self.c_dim
        if self.camera_cond:
            assert camera_angles is not None, "camera-conditioned mapping needs angles"
            # yaw/pitch only, wrapped into [-1, 1] (ref layers.py:131-138)
            ang = camera_angles[:, :2]
            ang = jnp.sign(ang) * ((jnp.abs(ang) % (2.0 * np.pi)) / (2.0 * np.pi))
            if self.camera_raw_scalars:
                embs = ScalarEncoder1d(2, 0.0, 0, use_raw=True, name='camera_scalar_enc')(ang)
            else:
                embs = ScalarEncoder1d(2, 64.0, 0, name='camera_scalar_enc')(ang)
            if self.camera_cond_drop_p > 0:
                embs = nn.Dropout(self.camera_cond_drop_p, deterministic=not train)(embs)
            c = embs if c is None or c_dim == 0 else jnp.concatenate([c, embs], axis=1)
            c_dim = c_dim + embs.shape[1]

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if c_dim > 0:
            embed_features = self.w_dim if self.embed_features is None else self.embed_features
            y = FullyConnected(embed_features, name='embed')(c.astype(jnp.float32))
            y = normalize_2nd_moment(y)
            x = y if x is None else jnp.concatenate([x, y], axis=1)

        layer_features = self.w_dim if self.layer_features is None else self.layer_features
        dims = [layer_features] * (self.num_layers - 1) + [self.w_dim]
        for idx, dim in enumerate(dims):
            x = FullyConnected(dim, activation=self.activation,
                               lr_multiplier=self.lr_multiplier, name=f'fc{idx}')(x)

        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable('ema', 'w_avg', lambda: jnp.zeros(self.w_dim))
            if update_emas and not self.is_initializing():
                new_avg = jnp.mean(jax.lax.stop_gradient(x), axis=0)
                w_avg.value = new_avg + (w_avg.value - new_avg) * self.w_avg_beta
            if truncation_psi != 1.0:
                if truncation_cutoff is None:
                    x = w_avg.value + (x - w_avg.value) * truncation_psi
        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
            if truncation_psi != 1.0 and truncation_cutoff is not None and self.w_avg_beta is not None:
                w_avg = self.get_variable('ema', 'w_avg')
                head = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with optional up/down and hypernet modulation
    (ref layers.py:181-241)."""
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = 'linear'
    up: int = 1
    down: int = 1
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True
    hyper_mod: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None,
                 gain: float = 1.0) -> jnp.ndarray:
        in_channels = x.shape[-1]
        k = self.kernel_size
        init = nn.initializers.normal(stddev=1.0)
        # Freeze-D (ref freeze_layers) is handled by optimizer masking, not by
        # buffer-vs-param storage, so weights are always parameters here.
        w = self.param('weight', init, (k, k, in_channels, self.out_channels))
        b = self.param('bias', nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        weight_gain = 1.0 / math.sqrt(in_channels * k * k)

        if self.hyper_mod:
            assert c is not None
            mod = FullyConnected(in_channels, bias_init=0.0, name='affine')(c)
            x = x * (1.0 + jnp.tanh(mod))[:, None, None, :].astype(x.dtype)

        f = setup_filter(list(self.resample_filter)) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(x, (w * weight_gain).astype(x.dtype), f=f, up=self.up,
                            down=self.down, padding=k // 2, flip_weight=(self.up == 1))

        from tdgp.ops.bias_act import activation_funcs
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)
