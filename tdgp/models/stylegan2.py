"""StyleGAN2 synthesis stack, NHWC / flax (ref: src/training/networks_stylegan2.py).

Compute dtype is selectable per block: the reference runs fp16 on the
`num_fp16_res` highest resolutions (ref :298-304); here that maps to
bfloat16 (TPU-native, wider dynamic range so the reference's careful
pre-normalization is belt-and-braces). Parameters stay float32.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdgp.models.layers import Conv2dLayer, FullyConnected, MappingNetwork
from tdgp.ops.bias_act import activation_funcs, bias_act
from tdgp.ops.modulated_conv2d import modulated_conv2d
from tdgp.ops.upfirdn2d import setup_filter, upsample2d


# ------------------------------------------------------- static shape helpers

def sg2_block_resolutions(in_resolution: int, out_resolution: int) -> List[int]:
    """ref networks_epigraf.py:95-97 (generalized SynthesisBlocksSequence)."""
    assert in_resolution == 0 or (in_resolution >= 4 and math.log2(in_resolution).is_integer())
    assert out_resolution >= 4 and math.log2(out_resolution).is_integer()
    in_log2 = 2 if in_resolution == 0 else int(np.log2(in_resolution)) + 1
    out_log2 = int(np.log2(out_resolution))
    return [2 ** i for i in range(in_log2, out_log2 + 1)]


def sg2_channel_dict(cbase: int, cmax: int, fmaps: float, resolutions: List[int]) -> Dict[int, int]:
    """ref networks_stylegan2.py:297."""
    return {res: min(int(cbase * fmaps) // res, cmax) for res in resolutions}


def sg2_num_ws(in_resolution: int, out_resolution: int, has_input: bool = False) -> int:
    """Total w vectors consumed by the block sequence (ref networks_epigraf.py:101-111).

    First block uses 1 conv when it starts from a learned const (2 when it
    consumes an input tensor); every later block uses 2; +1 for the last
    block's ToRGB.
    """
    resolutions = sg2_block_resolutions(in_resolution, out_resolution)
    num_ws = 0
    for i, _ in enumerate(resolutions):
        num_ws += 2 if (i > 0 or has_input) else 1
    return num_ws + 1  # last block's torgb


# ------------------------------------------------------------------- layers

class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias/lrelu (ref networks_stylegan2.py:92-145)."""
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = 'lrelu'
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray, noise_mode: str = 'random',
                 gain: float = 1.0) -> jnp.ndarray:
        assert noise_mode in ('random', 'const', 'none')
        in_channels = x.shape[-1]
        k = self.kernel_size
        styles = FullyConnected(in_channels, bias_init=1.0, name='affine')(w)
        weight = self.param('weight', nn.initializers.normal(stddev=1.0),
                            (k, k, in_channels, self.out_channels))

        noise = None
        if self.use_noise:
            strength = self.param('noise_strength', nn.initializers.zeros, ())
            # Registered unconditionally (ref networks_stylegan2.py:124) so a
            # model initialized in 'random' mode can later run 'const'.
            const = self.variable(
                'consts', 'noise_const',
                lambda: jax.random.normal(self.make_rng('params'),
                                          (self.resolution, self.resolution)))
            if noise_mode == 'random':
                key = self.make_rng('noise')
                noise = jax.random.normal(
                    key, (x.shape[0], self.resolution, self.resolution, 1)) * strength
            elif noise_mode == 'const':
                noise = (const.value * strength)[None, :, :, None]

        f = setup_filter(list(self.resample_filter)) if self.up > 1 else None
        x = modulated_conv2d(x.astype(self.dtype), weight, styles.astype(jnp.float32),
                             noise=noise, up=self.up, padding=k // 2,
                             resample_filter=f, flip_weight=(self.up == 1))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, bias, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv to image channels, no demodulation
    (ref networks_stylegan2.py:154-172)."""
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = 256.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        k = self.kernel_size
        weight_gain = 1.0 / math.sqrt(in_channels * k * k)
        styles = FullyConnected(in_channels, bias_init=1.0, name='affine')(w) * weight_gain
        weight = self.param('weight', nn.initializers.normal(stddev=1.0),
                            (k, k, in_channels, self.out_channels))
        x = modulated_conv2d(x.astype(self.dtype), weight, styles.astype(jnp.float32),
                             demodulate=False)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, bias, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution level: (up-)conv, conv, skip-ToRGB
    (ref networks_stylegan2.py:179-273)."""
    in_channels: int      # 0 = start from learned const
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = 'skip'
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == 'skip') else 0

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], img: Optional[jnp.ndarray],
                 ws: jnp.ndarray, noise_mode: str = 'random') -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        assert self.architecture in ('orig', 'skip', 'resnet')
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])
        layer_kw = dict(w_dim=self.w_dim, resolution=self.resolution,
                        resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                        use_noise=self.use_noise, dtype=self.dtype)

        if self.in_channels == 0:
            const = self.param('const', nn.initializers.normal(stddev=1.0),
                               (self.resolution, self.resolution, self.out_channels))
            x = jnp.repeat(const[None].astype(self.dtype), ws.shape[0], axis=0)
            x = SynthesisLayer(self.out_channels, name='conv1', **layer_kw)(
                x, next(w_iter), noise_mode=noise_mode)
        elif self.architecture == 'resnet':
            y = Conv2dLayer(self.out_channels, 1, use_bias=False, up=2,
                            resample_filter=self.resample_filter, name='skip')(
                x.astype(self.dtype), gain=math.sqrt(0.5))
            x = SynthesisLayer(self.out_channels, up=2, name='conv0', **layer_kw)(
                x.astype(self.dtype), next(w_iter), noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, name='conv1', **layer_kw)(
                x, next(w_iter), noise_mode=noise_mode, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = SynthesisLayer(self.out_channels, up=2, name='conv0', **layer_kw)(
                x.astype(self.dtype), next(w_iter), noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, name='conv1', **layer_kw)(
                x, next(w_iter), noise_mode=noise_mode)

        if img is not None:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == 'skip':
            y = ToRGBLayer(self.img_channels, w_dim=self.w_dim, conv_clamp=self.conv_clamp,
                           dtype=self.dtype, name='torgb')(x, next(w_iter))
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisBlocksSequence(nn.Module):
    """Stack of SynthesisBlocks from in_resolution to out_resolution
    (ref networks_epigraf.py:72-129; also hosts the plain SG2 synthesis)."""
    w_dim: int
    in_resolution: int
    out_resolution: int
    in_channels: int
    out_channels: int
    cbase: int = 32768
    cmax: int = 512
    fmaps: float = 1.0
    architecture: str = 'skip'
    use_noise: bool = True
    num_fp16_res: int = 4
    fp32_only: bool = True
    conv_clamp: Optional[float] = 256.0

    @property
    def block_resolutions(self) -> List[int]:
        return sg2_block_resolutions(self.in_resolution, self.out_resolution)

    @property
    def num_ws(self) -> int:
        return sg2_num_ws(self.in_resolution, self.out_resolution,
                          has_input=self.in_channels != 0)

    @nn.compact
    def __call__(self, ws: jnp.ndarray, x: Optional[jnp.ndarray] = None,
                 noise_mode: str = 'random') -> jnp.ndarray:
        resolutions = self.block_resolutions
        channels = sg2_channel_dict(self.cbase, self.cmax, self.fmaps, resolutions)
        fp16_resolution = max(2 ** (int(np.log2(self.out_resolution)) + 1 - self.num_fp16_res), 8)

        img = None
        w_idx = 0
        for block_idx, res in enumerate(resolutions):
            cur_in = channels[res // 2] if block_idx > 0 else self.in_channels
            cur_out = channels[res]
            is_last = (res == self.out_resolution)
            use_bf16 = (res >= fp16_resolution) and not self.fp32_only
            block = SynthesisBlock(
                in_channels=cur_in, out_channels=cur_out, w_dim=self.w_dim,
                resolution=res, img_channels=self.out_channels, is_last=is_last,
                architecture=self.architecture, use_noise=self.use_noise,
                conv_clamp=self.conv_clamp,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                name=f'b{res}')
            n_w = block.num_conv + block.num_torgb
            x, img = block(x, img, ws[:, w_idx:w_idx + n_w], noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class StyleGAN2Generator(nn.Module):
    """Plain 2D StyleGAN2 baseline (ref networks_stylegan2.py:345-373).

    mapping/synthesis are separate submodules so the training step can reuse
    ws (style mixing, PL reg) and extract patches from the full-resolution
    image (ref networks_stylegan2.py:332-333)."""
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    map_depth: int = 2
    cbase: int = 32768
    cmax: int = 512
    fmaps: float = 1.0
    num_fp16_res: int = 4
    fp32_only: bool = False

    @property
    def num_ws(self) -> int:
        return sg2_num_ws(0, self.img_resolution)

    def setup(self):
        self.mapping = MappingNetwork(z_dim=self.z_dim, c_dim=self.c_dim,
                                      w_dim=self.w_dim, num_ws=self.num_ws,
                                      num_layers=self.map_depth)
        self.synthesis = SynthesisBlocksSequence(
            w_dim=self.w_dim, in_resolution=0, out_resolution=self.img_resolution,
            in_channels=0, out_channels=self.img_channels, cbase=self.cbase,
            cmax=self.cmax, fmaps=self.fmaps, num_fp16_res=self.num_fp16_res,
            fp32_only=self.fp32_only)

    def __call__(self, z: jnp.ndarray, c: Optional[jnp.ndarray],
                 truncation_psi: float = 1.0, truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False, noise_mode: str = 'random',
                 train: bool = False) -> jnp.ndarray:
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas, train=train)
        return self.synthesis(ws, noise_mode=noise_mode)
