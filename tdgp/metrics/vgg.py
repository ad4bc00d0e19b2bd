"""VGG16 feature extractor in flax, NHWC — the PPL perceptual detector.

Counterpart of the reference's TorchScript `vgg16.pkl` (NVIDIA URL, ref
perceptual_path_length.py:93). Architecture = torchvision vgg16 features +
classifier head; the LPIPS-style perceptual feature used by StyleGAN's PPL
is the 4096-d fc7 activation. Weights convert offline from a torchvision
state_dict via scripts/convert_vgg.py.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import numpy as np

import jax
import jax.numpy as jnp

# torchvision vgg16 conv plan: channels per conv, 'M' = maxpool
VGG16_PLAN = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512, 'M')

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


class VGG16(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conv_i = 0
        for spec in VGG16_PLAN:
            if spec == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=((1, 1), (1, 1)),
                            name=f'conv{conv_i}')(x)
                x = nn.relu(x)
                conv_i += 1
        x = x.reshape(x.shape[0], -1)          # [N, 7*7*512]
        x = nn.relu(nn.Dense(4096, name='fc6')(x))
        feats = nn.relu(nn.Dense(4096, name='fc7')(x))
        logits = nn.Dense(self.num_classes, name='fc8')(feats)
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


def make_detector(variables: Dict[str, Any]):
    model = VGG16()

    @jax.jit
    def fwd(images_uint8):
        feats, _ = model.apply(variables, preprocess(images_uint8))
        return feats

    return fwd
