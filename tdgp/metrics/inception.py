"""InceptionV3 (FID variant) in flax, NHWC.

The reference evaluator downloads NVIDIA's TorchScript InceptionV3 pickle
(ref src/metrics/frechet_inception_distance.py:22). Here the same network
(torchvision InceptionV3 topology: BasicConv2d = conv->BN(eps=1e-3)->relu,
Mixed_5b..7c, pool3 = 2048-d features) is defined natively so feature
extraction jit-compiles onto the TPU. Weights are converted ONCE from a
torchvision/pytorch-fid state_dict with scripts/convert_inception.py into
an .npz whose keys match this module's parameter tree.

Preprocessing matches pytorch-fid: uint8 -> [0,1] -> bilinear resize to
299x299 -> scale to [-1,1].
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import numpy as np

import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.out_channels, self.kernel, strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.9,
                         name='bn')(x)
        return nn.relu(x)


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _avgpool3(x, fid_pool: bool = False):
    # pytorch-fid's pt_inception patches torchvision's branch avg-pools to
    # count_include_pad=False; torchvision's own weights use True.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=not fid_pool)


class InceptionA(nn.Module):
    pool_features: int
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name='branch3x3dbl_3')(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name='branch_pool')(
            _avgpool3(x, self.fid_pool))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name='branch3x3dbl_3')(bd)
        bp = _maxpool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7dbl_5')(bd)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(_avgpool3(x, self.fid_pool))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name='branch7x7x3_4')(b7)
        bp = _maxpool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    fid_pool: bool = False
    pool_mode: str = 'avg'  # Mixed_7b uses avg, the FID variant's 7c uses max in
                            # the original TF graph; torchvision uses avg for both

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == 'max':
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avgpool3(x, self.fid_pool)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Returns (pool3 features [N, 2048], logits [N, num_logits]).

    fid_pool=True reproduces pytorch-fid's count_include_pad=False branch
    pools (use with pt_inception-2015-12-05 weights); False matches
    torchvision's inception_v3.
    """
    num_logits: int = 1008
    fid_pool: bool = False

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=1, name='Conv2d_2b_3x3')(x)
        x = _maxpool(x)
        x = BasicConv2d(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = _maxpool(x)
        fp = self.fid_pool
        x = InceptionA(32, fp, name='Mixed_5b')(x)
        x = InceptionA(64, fp, name='Mixed_5c')(x)
        x = InceptionA(64, fp, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, fp, name='Mixed_6b')(x)
        x = InceptionC(160, fp, name='Mixed_6c')(x)
        x = InceptionC(160, fp, name='Mixed_6d')(x)
        x = InceptionC(192, fp, name='Mixed_6e')(x)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE(fp, name='Mixed_7b')(x)
        x = InceptionE(fp, name='Mixed_7c')(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 2048]
        logits = nn.Dense(self.num_logits, name='fc')(feats)
        return feats, logits


def preprocess(images_uint8: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """uint8 NHWC -> bilinear 299x299 in [-1, 1] (pytorch-fid convention)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method='bilinear')
    return x * 2.0 - 1.0


def load_weights(path: str) -> Dict[str, Any]:
    """Load converted .npz into the {'params', 'batch_stats'} variable tree.
    `__meta__/...` entries (e.g. the fid_pool marker written by
    scripts/convert_inception.py) are skipped — read them via npz_meta."""
    import flax
    flat = dict(np.load(path))
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        if key.startswith('__meta__'):
            continue
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return flax.core.freeze(tree).unfreeze()


def npz_meta(path: str) -> Dict[str, Any]:
    """Converter-written metadata (`__meta__/<name>` scalar arrays)."""
    flat = np.load(path)
    return {k[len('__meta__/'):]: np.asarray(flat[k]).item()
            for k in flat.files if k.startswith('__meta__/')}


def make_detector(variables: Dict[str, Any], return_logits: bool = False,
                  batch_jit: bool = True, fid_pool: bool = False):
    """fid_pool=True selects pytorch-fid's count_include_pad=False branch
    pools — required for pt_inception-2015-12-05 weights (the reference's
    FID network); torchvision weights use False."""
    num_logits = 1008
    fc_bias = variables.get('params', {}).get('fc', {}).get('bias')
    if fc_bias is not None:
        num_logits = int(np.asarray(fc_bias).shape[0])
    model = InceptionV3FID(num_logits=num_logits, fid_pool=fid_pool)

    def fwd(images_uint8):
        feats, logits = model.apply(variables, preprocess(images_uint8))
        return jax.nn.softmax(logits, axis=-1) if return_logits else feats

    return jax.jit(fwd) if batch_jit else fwd
