#!/usr/bin/env python
"""Real forward gather cost at model scale (scalar-only sync, coherent vs
random coords) — decides whether round-2 ray-reordering helps the forward."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=4):
    def sync(out):
        return float(out.ravel()[0])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from tdgp.models.epigraf import tri_plane_sample
    n, p, f, res = 8, 131072, 32, 512
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (n * 3, res, res, f))

    @jax.jit
    def fwd_scalar(pl, co):
        return jnp.sum(tri_plane_sample(pl, co, 0.5))

    # random coords (worst case)
    coords_rand = jax.random.uniform(key, (n, p, 3), minval=-0.4, maxval=0.4)
    t = timeit(fwd_scalar, planes, coords_rand)
    print(f'fwd gather, random coords:    {t*1e3:8.1f} ms', flush=True)

    # ray-coherent coords (realistic): 4096 rays x 32 steps marching +z
    rays = jax.random.uniform(key, (n, 4096, 1, 3), minval=-0.3, maxval=0.3)
    tvals = jnp.linspace(-0.4, 0.4, 32).reshape(1, 1, 32, 1)
    coords_coh = (rays + tvals * jnp.asarray([0.2, 0.3, 1.0])).reshape(n, p, 3)
    coords_coh = jnp.clip(coords_coh, -0.45, 0.45)
    t = timeit(fwd_scalar, planes, coords_coh)
    print(f'fwd gather, ray-coherent:     {t*1e3:8.1f} ms', flush=True)

    # fully sorted coords (what ray-reordering would give)
    flat = coords_coh.reshape(n, p, 3)
    order = jnp.argsort(flat[..., 0] * 512 + flat[..., 1], axis=1)
    coords_sorted = jnp.take_along_axis(flat, order[..., None], axis=1)

    t = timeit(fwd_scalar, planes, coords_sorted)
    print(f'fwd gather, sorted coords:    {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
