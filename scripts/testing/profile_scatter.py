#!/usr/bin/env python
"""Find the fastest plane-gradient (scatter-add) formulation on this chip."""
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
    n3, hw, f = 24, 512 * 512, 32
    p = 131072  # points per plane-batch
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
    print(f'1 batched take_along_axis grad:        {t*1e3:8.1f} ms')

    @jax.jit
    def grad_flat(table, i_, g_):
        return jax.grad(lambda t: jnp.sum(jnp.take(t, i_, axis=0) * g_))(table)

    t = timeit(grad_flat, jnp.zeros((n3 * hw, f)), gidx, gflat)
    print(f'2 flat take grad:                      {t*1e3:8.1f} ms')

    @jax.jit
    def scatter_direct(i_, vals):
        return jnp.zeros((n3 * hw, f)).at[i_].add(vals)

    t = timeit(scatter_direct, gidx, gflat)
    print(f'3 flat .at[].add:                      {t*1e3:8.1f} ms')

    @jax.jit
    def scatter_sorted(i_, vals):
        order = jnp.argsort(i_)
        v = jnp.take(vals, order, axis=0)
        si = jnp.take(i_, order, axis=0)
        return jnp.zeros((n3 * hw, f)).at[si].add(v, indices_are_sorted=True)

    t = timeit(scatter_sorted, gidx, gflat)
    print(f'4 argsort + sorted-scatter:            {t*1e3:8.1f} ms')

    from jax.ops import segment_sum

    @jax.jit
    def seg(i_, vals):
        order = jnp.argsort(i_)
        v = jnp.take(vals, order, axis=0)
        si = jnp.take(i_, order, axis=0)
        return segment_sum(v, si, num_segments=n3 * hw, indices_are_sorted=True)

    t = timeit(seg, gidx, gflat)
    print(f'5 argsort + segment_sum:               {t*1e3:8.1f} ms')

    @jax.jit
    def scatter_bf16(i_, vals):
        return jnp.zeros((n3 * hw, f), jnp.bfloat16).at[i_].add(vals.astype(jnp.bfloat16))

    t = timeit(scatter_bf16, gidx, gflat)
    print(f'6 flat .at[].add bf16:                 {t*1e3:8.1f} ms')

    t = timeit(jax.jit(jnp.argsort), gidx)
    print(f'7 argsort({n3*p}):                      {t*1e3:8.1f} ms')


if __name__ == '__main__':
    main()
