#!/usr/bin/env python
"""Is TPU gather cost per-ROW or per-BYTE? Tests slice_sizes=(2,F) gathers
(one descriptor fetches both x-neighbors) and F scaling."""
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
    hw = 512 * 512
    key = jax.random.PRNGKey(0)

    for f in (32, 64):
        table = jax.random.normal(key, (hw, f))
        n_rows = 12_582_912
        idx = jax.random.randint(key, (n_rows,), 0, hw - 2, dtype=jnp.int32)

        @jax.jit
        def take_rows(t, i):
            return jnp.sum(jnp.take(t, i, axis=0))

        t = timeit(take_rows, table, idx)
        print(f'F={f}: take {n_rows} single rows:      {t*1e3:8.1f} ms '
              f'({t/n_rows*1e9:.1f} ns/row)', flush=True)

        half = n_rows // 2
        idx2 = idx[:half]

        @jax.jit
        def take_slices(t, i):
            # each index fetches a [2, F] window: both x-neighbors at once
            out = jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s, 0), (2, f)))(i)
            return jnp.sum(out)

        t = timeit(take_slices, table, idx2)
        print(f'F={f}: take {half} [2,{f}] slices:     {t*1e3:8.1f} ms '
              f'({t/half*1e9:.1f} ns/slice)', flush=True)


if __name__ == '__main__':
    main()
