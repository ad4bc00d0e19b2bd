"""RGB-D patch discriminator with hypernet modulation and KD feature head.

Counterpart of ref src/training/networks_discriminator.py. SG2-style
residual downsampling blocks over (RGB + adapted-depth) patches;
conditioning:
  - patch params (scale, offset_x, offset_y) -> Fourier + learned-table
    embeddings, concatenated to the class label for the projection head
    (ref :260-266)
  - the same embeddings drive a hypernetwork that modulates conv1 inputs
    in every block (`hyper_mod`, ref :268-271, layers.py:222-233)
  - minibatch-std + epilogue; optional KD head predicting ResNet-50
    embeddings of the real image (ref :149-155).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tdgp.config import DiscriminatorConfig
from tdgp.models.layers import (Conv2dLayer, FullyConnected, MappingNetwork,
                                ScalarEncoder1d, scalar_encoder_dim)
from tdgp.models.stylegan2 import sg2_channel_dict


class DiscriminatorBlock(nn.Module):
    """ref networks_discriminator.py:19-93."""
    in_channels: int  # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    down: int = 2
    activation: str = 'lrelu'
    conv_clamp: Optional[float] = 256.0
    hyper_mod: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], img: Optional[jnp.ndarray],
                 c: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if x is not None:
            x = x.astype(self.dtype)
        if self.in_channels == 0:
            y = Conv2dLayer(self.tmp_channels, 1, activation=self.activation,
                            conv_clamp=self.conv_clamp, name='fromrgb')(img.astype(self.dtype))
            x = x + y if x is not None else y

        y = Conv2dLayer(self.out_channels, 1, use_bias=False, down=self.down,
                        name='skip')(x, gain=math.sqrt(0.5))
        x = Conv2dLayer(self.tmp_channels, 3, activation=self.activation,
                        conv_clamp=self.conv_clamp, name='conv0')(x)
        x = Conv2dLayer(self.out_channels, 3, activation=self.activation, down=self.down,
                        conv_clamp=self.conv_clamp, hyper_mod=self.hyper_mod,
                        name='conv1')(x, c=c, gain=math.sqrt(0.5))
        return y + x


class MinibatchStdLayer(nn.Module):
    """ref networks_discriminator.py:98-120. group_size must divide the
    LOCAL (per-device) batch — asserted, because stats must not cross
    device shards (SURVEY.md 'mbstd x sharding')."""
    group_size: int
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, ch = x.shape
        g = min(self.group_size, n)
        assert n % g == 0, f"mbstd group {g} must divide local batch {n}"
        f = self.num_channels
        c = ch // f
        y = x.reshape(g, n // g, h, w, f, c).astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))          # [n//g, F]
        y = jnp.repeat(y, g, axis=0)             # [n, F]
        y = jnp.broadcast_to(y[:, None, None, :], (n, h, w, f)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """ref networks_discriminator.py:128-181."""
    in_channels: int
    cmap_dim: int
    resolution: int = 4
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = 'lrelu'
    conv_clamp: Optional[float] = 256.0
    feat_predict_dim: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, cmap: Optional[jnp.ndarray],
                 predict_feat: bool = False) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels,
                                  name='mbstd')(x)
        x = Conv2dLayer(self.in_channels, 3, activation=self.activation,
                        conv_clamp=self.conv_clamp, name='conv')(x)
        x = x.reshape(x.shape[0], -1)
        f = None
        if predict_feat and self.feat_predict_dim > 0:
            fh = FullyConnected(self.in_channels, activation=self.activation,
                                name='feat_fc0')(x)
            f = FullyConnected(self.feat_predict_dim, name='feat_fc1')(fh)
        x = FullyConnected(self.in_channels, activation=self.activation, name='fc')(x)
        x = FullyConnected(1 if self.cmap_dim == 0 else self.cmap_dim, name='out')(x)
        if self.cmap_dim > 0:
            assert cmap is not None
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x, f


class Discriminator(nn.Module):
    """ref networks_discriminator.py:188-289."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray, c: Optional[jnp.ndarray],
                 patch_params: Optional[Dict[str, jnp.ndarray]] = None,
                 camera_angles: Optional[jnp.ndarray] = None,
                 update_emas: bool = False, predict_feat: bool = False,
                 train: bool = False) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """img: [N, H, W, C_img] patches in [-1, 1]; returns (logits [N], feats or None)."""
        cfg = self.cfg
        n = img.shape[0]
        img_resolution = cfg.input_resolution * (2 ** cfg.num_additional_start_blocks)
        res_log2 = int(np.log2(img_resolution))
        block_resolutions = [2 ** i for i in range(res_log2, 2, -1)]
        channels = sg2_channel_dict(cfg.cbase, cfg.cmax, cfg.fmaps, block_resolutions + [4])
        fp16_resolution = max(2 ** (res_log2 + 1 - cfg.num_fp16_res), 8)
        cmap_dim = channels[4]

        use_patch_cond = cfg.patch.patch_params_cond
        if use_patch_cond:
            assert patch_params is not None
            pp = jnp.concatenate([patch_params['scales'][:, :1],
                                  patch_params['offsets']], axis=1)  # [N, 3]
            patch_embs = ScalarEncoder1d(3, 1000.0, 256, name='scalar_enc')(pp)
            c = patch_embs if (c is None or cfg.c_dim == 0) else jnp.concatenate([c, patch_embs], axis=1)

        if (cfg.c_dim == 0) and not use_patch_cond and not cfg.camera_cond:
            cmap_dim = 0

        hyper_c = None
        if cfg.hyper_mod:
            assert use_patch_cond
            hyper_c = MappingNetwork(
                z_dim=0, c_dim=scalar_encoder_dim(3, 1000.0, 256), w_dim=512,
                num_ws=None, w_avg_beta=None, num_layers=cfg.map_depth,
                name='hyper_mod_mapping')(None, patch_embs, train=train)

        x = None
        for i, res in enumerate(block_resolutions):
            use_bf16 = (res >= fp16_resolution) and not cfg.fp32_only
            block = DiscriminatorBlock(
                in_channels=channels[res] if res < img_resolution else 0,
                tmp_channels=channels[res], out_channels=channels[res // 2],
                resolution=res, down=1 if i < cfg.num_additional_start_blocks else 2,
                conv_clamp=cfg.conv_clamp, hyper_mod=cfg.hyper_mod,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32, name=f'b{res}')
            x = block(x, img if i == 0 else None, c=hyper_c)

        cmap = None
        if cmap_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=cfg.c_dim + (scalar_encoder_dim(3, 1000.0, 256) if use_patch_cond else 0),
                w_dim=cmap_dim, num_ws=None, w_avg_beta=None, num_layers=cfg.map_depth,
                camera_cond=cfg.camera_cond, camera_cond_drop_p=cfg.camera_cond_drop_p,
                name='head_mapping')(None, c, camera_angles=camera_angles, train=train)

        logits, feats = DiscriminatorEpilogue(
            channels[4], cmap_dim=cmap_dim, mbstd_group_size=cfg.mbstd_group_size,
            mbstd_num_channels=cfg.mbstd_num_channels, conv_clamp=cfg.conv_clamp,
            feat_predict_dim=cfg.embedding_dim, name='b4')(x, cmap, predict_feat=predict_feat)
        return logits[:, 0], feats
