#!/usr/bin/env python
"""Does immediately reducing the gathered corner rows (12-way weighted sum)
let XLA fuse the gather and drop the [12P, F] materialization?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=4):
    def sync(out):
        return float(jax.tree.leaves(out)[0].ravel()[0])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def tri_plane_sample_fused(planes_flat, coords, scale):
    """planes_flat [N*3, H, W, F]; coords [N, P, 3] -> [N, P, F] plane-mean.
    All 12 corner gathers in one take, weighted-summed immediately."""
    n3, h, w, f = planes_flat.shape
    n = n3 // 3
    p = coords.shape[1]
    c = coords / scale
    grids = jnp.stack([
        c[..., jnp.array([0, 1])], c[..., jnp.array([0, 2])],
        c[..., jnp.array([1, 2])],
    ], axis=1).reshape(n3, p, 2)

    gx = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    tx = (gx - x0)[..., None]; ty = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    def cidx(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        return jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1), valid

    i00, m00 = cidx(y0i, x0i); i01, m01 = cidx(y0i, x0i + 1)
    i10, m10 = cidx(y0i + 1, x0i); i11, m11 = cidx(y0i + 1, x0i + 1)
    base = (jnp.arange(n3, dtype=jnp.int32) * h * w)[:, None]
    idx = jnp.stack([i00 + base, i01 + base, i10 + base, i11 + base], axis=2)  # [N3,P,4]
    wts = jnp.concatenate([
        (1 - tx) * (1 - ty) * m00[..., None], tx * (1 - ty) * m01[..., None],
        (1 - tx) * ty * m10[..., None], tx * ty * m11[..., None]], axis=2)     # [N3,P,4]

    table = planes_flat.reshape(n3 * h * w, f)
    vals = jnp.take(table, idx.reshape(-1), axis=0).reshape(n3, p, 4, f)
    out = jnp.einsum('npk,npkf->npf', wts, vals)      # fuse reduce right after
    return jnp.mean(out.reshape(n, 3, p, f), axis=1)


def main():
    from tdgp.models.epigraf import tri_plane_sample
    n, p, f, res = 8, 131072, 32, 512
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (n * 3, res, res, f))
    coords = jax.random.uniform(key, (n, p, 3), minval=-0.4, maxval=0.4)

    # parity
    a = tri_plane_sample_fused(planes, coords, 0.5)
    b = tri_plane_sample(planes, coords, 0.5)
    print('parity maxdiff:', float(jnp.max(jnp.abs(a - b))), flush=True)

    @jax.jit
    def fwd_cur(pl, co):
        return jnp.sum(tri_plane_sample(pl, co, 0.5))

    @jax.jit
    def fwd_fused(pl, co):
        return jnp.sum(tri_plane_sample_fused(pl, co, 0.5))

    t = timeit(fwd_cur, planes, coords)
    print(f'current tri_plane_sample fwd:  {t*1e3:8.1f} ms', flush=True)
    t = timeit(fwd_fused, planes, coords)
    print(f'fused-reduce variant fwd:      {t*1e3:8.1f} ms', flush=True)

    @jax.jit
    def grad_cur(pl, co):
        return jax.grad(lambda q: jnp.sum(tri_plane_sample(q, co, 0.5) ** 2))(pl)

    @jax.jit
    def grad_fused(pl, co):
        return jax.grad(lambda q: jnp.sum(tri_plane_sample_fused(q, co, 0.5) ** 2))(pl)

    t = timeit(grad_cur, planes, coords)
    print(f'current grad:                  {t*1e3:8.1f} ms', flush=True)
    t = timeit(grad_fused, planes, coords)
    print(f'fused grad:                    {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
