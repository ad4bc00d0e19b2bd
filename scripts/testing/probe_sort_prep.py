#!/usr/bin/env python
"""Measure the XLA-side prep for the splat kernel at real scale:
argsort(12.6M int32) + permute-gather of [12.6M, 32] values."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    def sync(out):
        return float(jax.tree.leaves(out)[0].ravel()[0])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    e, f = 12582912, 32
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (e,), 0, 24 * 512 * 512, dtype=jnp.int32)
    vals = jax.random.normal(key, (e, f))

    t = timeit(jax.jit(jnp.argsort), keys)
    print(f'argsort({e}):                    {t*1e3:8.1f} ms', flush=True)

    @jax.jit
    def sort_and_permute(k, v):
        order = jnp.argsort(k)
        return jnp.take(k, order), jnp.take(v, order, axis=0)

    t = timeit(sort_and_permute, keys, vals)
    print(f'argsort + permute vals [E,32]:   {t*1e3:8.1f} ms', flush=True)

    # multi-operand lax.sort alternative (sorts values along with keys)
    @jax.jit
    def multisort(k, v):
        out = jax.lax.sort((k,) + tuple(v[:, i] for i in range(f)), num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)

    t = timeit(multisort, keys, vals)
    print(f'lax.sort 33-operand:             {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
