#!/usr/bin/env python
"""Probe: cheapest way to deliver splat entries in window-sorted order.

The splat kernel (TODO.md #1) needs [E, ~40]-lane entry rows sorted by a
window key. Round-1 measurements: argsort(12.6M keys) = 59 ms but the row
permute of [12.6M, 32] values costs 575 ms (random reads, ~45 ns/row).
Candidates measured here at the production size (E ~= 3.1M points/pass):

  a) argsort(key) + take rows of packed [E, 64]
  b) lax.sort multi-operand (key + packed lanes as extra operands)
  c) lax.sort with ONE [E, 64] operand? (not supported - sort is elementwise
     over operands; skipped)
  d) argsort + take of [E, 8] meta only (what the kernel minimally needs if
     values could stay unsorted - lower bound reference)

Run on the real chip: python scripts/testing/probe_sort_carry.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

E = int(os.environ.get('E', str(3 * 1024 * 1024)))
LANES = 64


def timeit(fn, *args, iters=5):
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].ravel()[0])  # scalar-pull sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    keys = jax.random.randint(k1, (E,), 0, 12288, dtype=jnp.int32)
    packed = jax.random.normal(k2, (E, LANES), dtype=jnp.float32)

    @jax.jit
    def argsort_take(keys, packed):
        perm = jnp.argsort(keys)
        return keys[perm], jnp.take(packed, perm, axis=0)

    @jax.jit
    def argsort_only(keys):
        return jnp.sort(keys)

    @jax.jit
    def sort_carry(keys, packed):
        ops = (keys,) + tuple(packed[:, i] for i in range(LANES))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=1)

    @jax.jit
    def sort_carry_norepack(keys, packed):
        ops = (keys,) + tuple(packed[:, i] for i in range(LANES))
        out = jax.lax.sort(ops, num_keys=1)
        return out  # leave as 64 separate [E] arrays

    @jax.jit
    def argsort_take8(keys, packed):
        perm = jnp.argsort(keys)
        return keys[perm], jnp.take(packed[:, :8], perm, axis=0)

    print(f'E={E}, lanes={LANES}', flush=True)
    t = timeit(argsort_only, keys)
    print(f'argsort only:            {t*1e3:8.1f} ms', flush=True)
    t = timeit(argsort_take, keys, packed)
    print(f'argsort + take [E,64]:   {t*1e3:8.1f} ms', flush=True)
    t = timeit(argsort_take8, keys, packed)
    print(f'argsort + take [E,8]:    {t*1e3:8.1f} ms', flush=True)
    t = timeit(sort_carry_norepack, keys, packed)
    print(f'lax.sort 65-op (no repack): {t*1e3:8.1f} ms', flush=True)
    t = timeit(sort_carry, keys, packed)
    print(f'lax.sort 65-op + stack:  {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
