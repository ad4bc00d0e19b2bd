#!/usr/bin/env python
"""Production-size perf: Pallas splat custom_vjp vs XLA scatter VJP.

Shapes = satellite config, one render pass: N=8 images, planes 512^2 x32,
P = 64^2 patch rays x 32 steps. Round-1 ledger: the XLA scatter costs
~1.6 s per pass (3.2 s per step over two passes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from tdgp.ops.splat import triplane_sample_fused
from tdgp.models.epigraf import tri_plane_sample

N = int(os.environ.get('N', '8'))
RES = int(os.environ.get('RES', '512'))
F = int(os.environ.get('F', '32'))
P = int(os.environ.get('P', str(64 * 64 * 32)))
SCALE = 0.5


def timeit(fn, *args, iters=5):
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    planes = jax.random.normal(k1, (N * 3, RES, RES, F), jnp.float32)
    coords = jax.random.uniform(k2, (N, P, 3), minval=-0.45, maxval=0.45)

    def loss_jnp(pl_, co_):
        return jnp.sum(tri_plane_sample(pl_, co_, SCALE) ** 2)

    def loss_fused(pl_, co_):
        return jnp.sum(triplane_sample_fused(pl_, co_, SCALE) ** 2)

    fwd_jnp = jax.jit(loss_jnp)
    fwd_fused = jax.jit(loss_fused)
    g_jnp = jax.jit(jax.grad(loss_jnp, argnums=(0, 1)))
    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))

    print(f'N={N} RES={RES} F={F} P={P} '
          f'(E per pass = {N*3*P/1e6:.1f}M points)', flush=True)
    t = timeit(fwd_jnp, planes, coords)
    print(f'fwd  jnp  : {t*1e3:8.1f} ms', flush=True)
    t = timeit(fwd_fused, planes, coords)
    print(f'fwd  fused: {t*1e3:8.1f} ms', flush=True)
    t = timeit(g_jnp, planes, coords)
    print(f'grad jnp  : {t*1e3:8.1f} ms', flush=True)
    t = timeit(g_fused, planes, coords)
    print(f'grad fused: {t*1e3:8.1f} ms', flush=True)

    # parity spot check at this size
    gp_a, gc_a = g_jnp(planes, coords)
    gp_b, gc_b = g_fused(planes, coords)
    dp = float(jnp.max(jnp.abs(gp_a - gp_b)) / (jnp.max(jnp.abs(gp_a)) + 1e-9))
    dc = float(jnp.max(jnp.abs(gc_a - gc_b)) / (jnp.max(jnp.abs(gc_a)) + 1e-9))
    print(f'rel maxdiff: planes {dp:.2e}  coords {dc:.2e}', flush=True)


if __name__ == '__main__':
    main()
