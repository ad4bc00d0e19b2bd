"""Fused bias + activation + gain + clamp.

TPU-native counterpart of the reference CUDA kernel (ref:
src/torch_utils/ops/bias_act.py:52-120, bias_act.cu). On TPU this op is a
pure elementwise chain that XLA fuses into the surrounding matmul/conv
epilogue, so the canonical implementation is plain jnp — it compiles to a
single fused VPU loop and is differentiable to any order for free
(the reference needed a hand-written grad/grad² CUDA kernel pair,
bias_act.py:142-203). A Pallas variant exists in tdgp.ops.pallas for
standalone use, parity-tested against this one.

The activation table mirrors ref bias_act.py:21-31 (names, default alpha,
default gain).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from tdgp.utils.tensor_group import EasyDict


def _lrelu(x, alpha):
    return jnp.where(x >= 0, x, x * alpha)


activation_funcs = {
    'linear':   EasyDict(func=lambda x, alpha: x,                      def_alpha=0.0, def_gain=1.0),
    'relu':     EasyDict(func=lambda x, alpha: jax.nn.relu(x),         def_alpha=0.0, def_gain=math.sqrt(2)),
    'lrelu':    EasyDict(func=_lrelu,                                  def_alpha=0.2, def_gain=math.sqrt(2)),
    'tanh':     EasyDict(func=lambda x, alpha: jnp.tanh(x),            def_alpha=0.0, def_gain=1.0),
    'sigmoid':  EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x),      def_alpha=0.0, def_gain=1.0),
    'elu':      EasyDict(func=lambda x, alpha: jax.nn.elu(x),          def_alpha=0.0, def_gain=1.0),
    'selu':     EasyDict(func=lambda x, alpha: jax.nn.selu(x),         def_alpha=0.0, def_gain=1.0),
    'softplus': EasyDict(func=lambda x, alpha: jax.nn.softplus(x),     def_alpha=0.0, def_gain=1.0),
    'swish':    EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x) * x,  def_alpha=0.0, def_gain=math.sqrt(2)),
}


def bias_act(x: jnp.ndarray, b: Optional[jnp.ndarray] = None, *, axis: int = -1,
             act: str = 'linear', alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None) -> jnp.ndarray:
    """Add bias along `axis`, apply activation, scale by gain, clamp.

    Note the reference defaults to channel dim=1 (NCHW); we default to the
    last axis because the framework is NHWC/N...C throughout.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.astype(x.dtype).reshape(shape)
    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        if clamp < 0:
            raise ValueError(f"clamp must be non-negative, got {clamp}")
        x = jnp.clip(x, -clamp, clamp)
    return x
