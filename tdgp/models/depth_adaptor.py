"""Depth adaptor: rendered depth -> fake-LeReS-like depth channel for D.

Counterpart of ref src/training/networks_depth_adaptor.py. Normalizes the
rendered depth with a learned near-plane offset, runs K conv layers, and
stochastically picks one of the K+1 depth maps (annealed selection
probabilities). The anneal progress is passed in as a traced scalar
(`progress`), replacing the reference's mutable `progress_coef` buffer, and
the selection draw uses an explicit 'depth' PRNG stream — both keep the
module pure under jit.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tdgp.config import DepthAdaptorCfg
from tdgp.models.layers import Conv2dLayer


class DepthAdaptor(nn.Module):
    cfg: DepthAdaptorCfg
    min_depth: float
    max_depth: float

    def _near_plane_offset(self, raw: jnp.ndarray, batch: int) -> jnp.ndarray:
        """ref networks_depth_adaptor.py:42-46."""
        depth_range = self.max_depth - self.min_depth
        off = nn.sigmoid(raw) * self.cfg.near_plane_offset_max_fraction * depth_range
        return jnp.broadcast_to(off, (batch,))

    @nn.compact
    def __call__(self, depth_map: jnp.ndarray, w: jnp.ndarray,
                 progress: jnp.ndarray | float = 1.0, train: bool = False) -> jnp.ndarray:
        """depth_map: [N, H, W, 1]; w: [N, w_dim] (only its batch is used, as in ref).

        progress in [0, 1]: linear_schedule(cur_kimg / anneal_kimg).
        """
        n = depth_map.shape[0]
        raw = self.param('near_plane_offset_raw', nn.initializers.constant(
            self.cfg.near_plane_offset_bias), (1,))
        near_shifted = (self.min_depth + self._near_plane_offset(raw, n)).reshape(n, 1, 1, 1)

        # normalize to [-1, 1] against [near_shifted, far] (ref :48-59)
        mid = 0.5 * (self.max_depth + near_shifted)
        rng_contracted = self.max_depth - near_shifted
        x = (depth_map - mid) / (rng_contracted + 1e-12) * 2.0

        head = Conv2dLayer(1, 1, activation='linear', name='head')  # shared (ref :35, :77)
        outs = [x]
        for i in range(self.cfg.num_hid_layers):
            x = Conv2dLayer(self.cfg.hid_dim, self.cfg.kernel_size, activation='lrelu',
                            name=f'layer{i}')(x)
            outs.append(head(x))
        stacked = jnp.stack(outs, axis=1)  # [N, K+1, H, W, 1]
        num_outs = len(outs)

        if self.cfg.out_strategy == 'last':
            return stacked[:, -1]
        if self.cfg.out_strategy == 'mean':
            return jnp.mean(stacked, axis=1)
        if self.cfg.out_strategy == 'random':
            if train:
                # annealed selection probabilities (ref :86-92): start uniform,
                # anneal toward putting selection_start_p on the raw map.
                start_p = (1.0 / num_outs) * (1.0 - progress) + self.cfg.selection_start_p * progress
                idxs = jnp.arange(num_outs, dtype=jnp.float32)
                slope = (1.0 - num_outs * start_p) * 2.0 / (num_outs * (num_outs - 1))
                probs = idxs * slope + start_p  # [num_outs]
                key = self.make_rng('depth')
                sel = jax.random.categorical(key, jnp.log(probs + 1e-12)[None, :].repeat(n, 0))
            else:
                sel = jnp.full((n,), num_outs - 1, dtype=jnp.int32)
            onehot = jax.nn.one_hot(sel, num_outs, dtype=stacked.dtype)  # [N, K+1]
            return jnp.einsum('nk,nkhwc->nhwc', onehot, stacked)
        raise NotImplementedError(self.cfg.out_strategy)
