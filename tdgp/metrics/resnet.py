"""ResNet-50 feature extractor in flax, NHWC.

Counterpart of the reference's timm ResNet-50 embedder used to produce the
knowledge-distillation memmaps (ref data_scripts/extract_features.py:94-135)
and consumed by D's KD head (ref loss.py:301-314). Weights convert from a
torchvision/timm state_dict via scripts/convert_resnet.py. Features are the
2048-d global-average-pooled pre-fc activations.

Preprocessing: uint8 -> [0,1] -> resize 224 -> ImageNet mean/std.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import numpy as np

import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name='conv1')(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name='conv2')(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name='bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, name='conv3')(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name='bn3')(y)
        if self.downsample:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name='downsample_conv')(x)
            residual = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                    name='downsample_bn')(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, (blocks, filters, stride) in enumerate(
                [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]):
            for b in range(blocks):
                x = Bottleneck(filters, strides=stride if b == 0 else 1,
                               downsample=(b == 0),
                               name=f'layer{stage + 1}_{b}')(x)
        feats = jnp.mean(x, axis=(1, 2))  # [N, 2048]
        logits = nn.Dense(self.num_classes, name='fc')(feats)
        return feats, logits


def preprocess(images_uint8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    x = images_uint8.astype(jnp.float32) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method='bilinear')
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_weights(path: str) -> Dict[str, Any]:
    from tdgp.metrics.inception import load_weights as _lw
    return _lw(path)


def make_embedder(variables: Dict[str, Any]):
    model = ResNet50()

    @jax.jit
    def fwd(images_uint8):
        feats, _ = model.apply(variables, preprocess(images_uint8))
        return feats

    return fwd
