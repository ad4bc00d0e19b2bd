#!/usr/bin/env python
"""Micro-profile renderer internals on the local chip: gather, MLP, sort,
importance sampling."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n, rays, steps, f, res = 8, 4096, 32, 32, 512
    p = rays * steps  # points per pass
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (n, res, res, 3, f))
    coords = jax.random.uniform(key, (n, p, 3), minval=-0.4, maxval=0.4)

    from tdgp.models.epigraf import tri_plane_sample

    t = timeit(jax.jit(lambda pl, co: tri_plane_sample(pl, co, 0.5)), planes, coords)
    print(f'tri_plane_sample (1 pass, {n}x{p} pts): {t*1e3:8.1f} ms')

    # raw flat gather cost: same bytes, single table
    flat = planes.transpose(0, 3, 1, 2, 4).reshape(n * 3 * res * res, f)
    idx = jax.random.randint(key, (n * 3, p), 0, res * res)
    offs = (jnp.arange(n * 3) * res * res)[:, None]
    gidx = (idx + offs).reshape(-1)

    t = timeit(jax.jit(lambda tbl, i: jnp.take(tbl, i, axis=0)), flat, gidx)
    print(f'single flat gather ({n*3}x{p} rows):    {t*1e3:8.1f} ms')

    # MLP
    feats = jax.random.normal(key, (n, p, f))
    w0 = jax.random.normal(key, (f, 64)); b0 = jnp.zeros(64)
    w1 = jax.random.normal(key, (64, 4)); b1 = jnp.zeros(4)

    def mlp(x):
        h = jax.nn.leaky_relu(x @ w0 + b0)
        return h @ w1 + b1

    t = timeit(jax.jit(mlp), feats)
    print(f'tri-plane MLP (1 pass):                 {t*1e3:8.1f} ms')

    # sort/unify
    depths = jax.random.uniform(key, (n, rays, 2 * steps))
    colors = jax.random.normal(key, (n, rays, 2 * steps, 4))
    dens = jax.random.normal(key, (n, rays, 2 * steps))

    from tdgp.rendering.renderer import unify_samples
    t = timeit(jax.jit(lambda a, b, c_: unify_samples(
        a[..., :steps], b[..., :steps, :], c_[..., :steps],
        a[..., steps:], b[..., steps:, :], c_[..., steps:])), depths, colors, dens)
    print(f'unify_samples (sort {2*steps}):              {t*1e3:8.1f} ms')

    # importance sampling
    from tdgp.rendering.renderer import sample_importance
    weights = jax.random.uniform(key, (n, rays, steps))
    zv = jnp.sort(jax.random.uniform(key, (n, rays, steps)), axis=-1)
    t = timeit(jax.jit(lambda z, w: sample_importance(key, z, w, steps)), zv, weights)
    print(f'sample_importance:                      {t*1e3:8.1f} ms')

    # stratified
    from tdgp.rendering.renderer import sample_stratified
    t = timeit(jax.jit(lambda: sample_stratified(key, n, rays, steps)))
    print(f'sample_stratified:                      {t*1e3:8.1f} ms')

    # full marcher
    from tdgp.rendering.renderer import RenderOptions, classical_ray_march
    opts = RenderOptions()
    t = timeit(jax.jit(lambda c_, d, z: classical_ray_march(c_, d, z, opts)),
               colors, dens, depths)
    print(f'classical_ray_march (jnp):              {t*1e3:8.1f} ms')


if __name__ == '__main__':
    main()
