#!/usr/bin/env python
"""Measure the two 'shelf' Pallas kernels against their XLA forms at
production size, so each has a wiring-or-no-win decision on record
(round-2 VERDICT weak item 6 / round-3 task 8).

- triplane_mlp_pallas vs the jnp 2-layer MLP (lrelu hidden + linear out)
  at the satellite render-pass size: batch 8 x 64^2 rays x 32 steps points,
  F=32 -> hid 64 -> rgb 3 + sigma.
- bias_act_pallas vs jnp bias_act at the largest decoder activation
  ([8, 512, 512, 32ch] lrelu, the top SG2 block epilogue).

Timing uses scalar-pull sync (ledger methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

N = int(os.environ.get('N', '8'))
P = int(os.environ.get('P', str(64 * 64 * 32)))
F = int(os.environ.get('F', '32'))
HID = int(os.environ.get('HID', '64'))
OUT = 4  # rgb 3 + sigma


def timeit(fn, *args, iters=10):
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from tdgp.ops.pallas_kernels import bias_act_pallas, triplane_mlp_pallas
    from tdgp.ops.bias_act import bias_act

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    feats = jax.random.normal(ks[0], (N, P, F), jnp.float32)
    w0 = jax.random.normal(ks[1], (F, HID), jnp.float32) / jnp.sqrt(F)
    b0 = jax.random.normal(ks[2], (HID,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (HID, OUT), jnp.float32) / jnp.sqrt(HID)
    b1 = jax.random.normal(ks[4], (OUT,), jnp.float32) * 0.1
    print(f'MLP: {N}x{P} points, {F}->{HID}->{OUT}', flush=True)

    @jax.jit
    def mlp_jnp(feats, w0, b0, w1, b1):
        h = feats @ w0 + b0
        h = jnp.maximum(h, 0.2 * h) * jnp.sqrt(2.0)
        o = h @ w1 + b1
        return o[..., :-1], o[..., -1]

    t = timeit(mlp_jnp, feats, w0, b0, w1, b1)
    print(f'mlp jnp (XLA-fused)         : {t*1e3:8.2f} ms', flush=True)

    mlp_pal = jax.jit(lambda f_, a, b, c, d: triplane_mlp_pallas(f_, a, b, c, d))
    t = timeit(mlp_pal, feats, w0, b0, w1, b1)
    print(f'triplane_mlp_pallas         : {t*1e3:8.2f} ms', flush=True)

    x = jax.random.normal(ks[5], (N, 512, 512, 32), jnp.float32)
    b = jax.random.normal(ks[2], (32,), jnp.float32) * 0.1
    print(f'bias_act: x {x.shape} lrelu', flush=True)

    ba_jnp = jax.jit(lambda x_, b_: bias_act(x_, b_, act='lrelu'))
    t = timeit(ba_jnp, x, b)
    print(f'bias_act jnp (XLA-fused)    : {t*1e3:8.2f} ms', flush=True)

    ba_pal = jax.jit(lambda x_, b_: bias_act_pallas(x_, b_, act='lrelu'))
    t = timeit(ba_pal, x, b)
    print(f'bias_act_pallas             : {t*1e3:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
