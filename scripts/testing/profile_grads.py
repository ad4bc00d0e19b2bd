#!/usr/bin/env python
"""Micro-profile BACKWARD costs of renderer pieces on the local chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n, rays, steps, f, res = 8, 4096, 32, 32, 512
    p = rays * steps
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (n, res, res, 3, f))
    coords = jax.random.uniform(key, (n, p, 3), minval=-0.4, maxval=0.4)

    from tdgp.models.epigraf import tri_plane_sample

    # gather backward = scatter-add into the planes
    g = jax.jit(jax.grad(lambda pl: jnp.sum(tri_plane_sample(pl, coords, 0.5) ** 2)))
    t = timeit(g, planes)
    print(f'grad(tri_plane_sample) [scatter-add]:   {t*1e3:8.1f} ms')

    # merge backward
    from tdgp.rendering.renderer import unify_samples_sorted, unify_samples
    d1 = jnp.sort(jax.random.uniform(key, (n, rays, steps)), -1)
    d2 = jnp.sort(jax.random.uniform(key, (n, rays, steps)), -1)
    c1 = jax.random.normal(key, (n, rays, steps, 4))
    c2 = jax.random.normal(key, (n, rays, steps, 4))
    s1 = jax.random.normal(key, (n, rays, steps))
    s2 = jax.random.normal(key, (n, rays, steps))

    def loss_sorted(c1_):
        d, c, s = unify_samples_sorted(d1, c1_, s1, d2, c2, s2)
        return jnp.sum(c ** 2) + jnp.sum(d * s)

    t = timeit(jax.jit(jax.grad(loss_sorted)), c1)
    print(f'grad(unify_samples_sorted):             {t*1e3:8.1f} ms')

    def loss_sort(c1_):
        d, c, s = unify_samples(d1, c1_, s1, d2, c2, s2)
        return jnp.sum(c ** 2) + jnp.sum(d * s)

    t = timeit(jax.jit(jax.grad(loss_sort)), c1)
    print(f'grad(unify_samples argsort):            {t*1e3:8.1f} ms')

    # full renderer grad wrt planes (the real question)
    from tdgp.rendering.renderer import RenderOptions, importance_render

    opts = RenderOptions(num_proposal_steps=steps, num_fine_steps=steps,
                         ray_start=0.75, ray_end=1.25, box_size=1.0)
    ray_o = jnp.concatenate([jnp.zeros((n, rays, 2)), jnp.full((n, rays, 1), 1.0)], -1)
    ray_d = jnp.concatenate([jax.random.normal(key, (n, rays, 2)) * 0.1,
                             -jnp.ones((n, rays, 1))], -1)
    ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    w0 = jax.random.normal(key, (f, 64)) * 0.1
    w1 = jax.random.normal(key, (64, 4)) * 0.1

    def render_loss(pl):
        def run_model(co):
            feats = tri_plane_sample(pl, co, 0.5)
            h = jax.nn.leaky_relu(feats @ w0)
            y = h @ w1
            return y[..., :-1], y[..., -1]
        rgb, depth, wt, ft = importance_render(run_model, ray_o, ray_d, key, opts)
        return jnp.sum(rgb ** 2) + jnp.sum(depth)

    t = timeit(jax.jit(jax.grad(render_loss)), planes)
    print(f'grad(full renderer wrt planes):         {t*1e3:8.1f} ms')

    t = timeit(jax.jit(render_loss), planes)
    print(f'fwd(full renderer):                     {t*1e3:8.1f} ms')


if __name__ == '__main__':
    main()
