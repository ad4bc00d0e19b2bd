#!/usr/bin/env python
"""Find the fastest plane-gradient (scatter-add) formulation on this chip.

Timing forces a host read of one output element per call — block_until_ready
proved unreliable on tunneled rigs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf).ravel()[0]

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    n3, hw, f = 24, 512 * 512, 32
    p = 131072
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (n3, p, f))
    idx = jax.random.randint(key, (n3, p), 0, hw)
    gidx = (idx + (jnp.arange(n3) * hw)[:, None]).reshape(-1)
    gflat = g.reshape(-1, f)

    @jax.jit
    def grad_batched(table, idx_, g_):
        return jax.grad(lambda t: jnp.sum(
            jnp.take_along_axis(t, idx_[..., None], axis=1) * g_))(table)

    t = timeit(grad_batched, jnp.zeros((n3, hw, f)), idx, g)
    print(f'1 batched take_along_axis grad:        {t*1e3:8.1f} ms', flush=True)

    @jax.jit
    def scatter_direct(i_, vals):
        return jnp.zeros((n3 * hw, f)).at[i_].add(vals)

    t = timeit(scatter_direct, gidx, gflat)
    print(f'3 flat .at[].add:                      {t*1e3:8.1f} ms', flush=True)

    from jax.ops import segment_sum

    @jax.jit
    def seg(i_, vals):
        order = jnp.argsort(i_)
        v = jnp.take(vals, order, axis=0)
        si = jnp.take(i_, order, axis=0)
        return segment_sum(v, si, num_segments=n3 * hw, indices_are_sorted=True)

    t = timeit(seg, gidx, gflat)
    print(f'5 argsort + segment_sum:               {t*1e3:8.1f} ms', flush=True)

    # grad of the real tri_plane_sample for comparison, same sync method
    from tdgp.models.epigraf import tri_plane_sample
    planes = jax.random.normal(key, (8, 512, 512, 3, f))
    coords = jax.random.uniform(key, (8, p, 3), minval=-0.4, maxval=0.4)

    @jax.jit
    def grad_tps(pl, co):
        return jax.grad(lambda q: jnp.sum(tri_plane_sample(q, co, 0.5) ** 2))(pl)

    t = timeit(grad_tps, planes, coords)
    print(f'8 grad(tri_plane_sample):              {t*1e3:8.1f} ms', flush=True)

    # forward gather alone, same sync
    t = timeit(jax.jit(lambda pl, co: tri_plane_sample(pl, co, 0.5)), planes, coords)
    print(f'9 fwd(tri_plane_sample):               {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
