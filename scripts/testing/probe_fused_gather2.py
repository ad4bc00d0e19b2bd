#!/usr/bin/env python
"""Probe: reduce-fused tri-plane gather forms vs the materializing gather.

Round-1 ledger: take+reduce with no output materialization ran at 13 ns/row
vs 41 ns/row for the in-model gather. Candidates at production size:

  a) current model form: one take of [12*NP rows], 4-slice weighted combine,
     plane mean (materializes [N3, 4P, F])
  b) stacked reduce form: idx/wgt [12, NP]; out = sum_k wgt_k * take(...)_k
     -> reduction over the stacked axis direct from the gather
  c) same but as explicit unrolled sum of 12 takes (no [12,...] temp)
  d) the g_coords shape: take + contraction against a fixed [NP, F] cotangent
     -> output [NP] only (the fully-reduced case, should hit peak)

MEASURED (v5e, 2026-08): a) 41.6 ns/row, c) 39.8, d) 40.1 — all identical.
The round-1 "13 ns/row fused take+reduce" does NOT reproduce at production
table+row count; ~40 ns/row is XLA's gather floor here regardless of fusion
shape. Row COUNT, not fusion, is the lever -> corner pair-packing
(probe_pair_gather.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

N, RES, F = 8, 512, 32
P = 64 * 64 * 32


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
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n3 = N * 3
    flat = jax.random.normal(k1, (n3 * RES * RES, F))
    idx = jax.random.randint(k2, (12, N * P), 0, n3 * RES * RES)
    wgt = jax.random.uniform(k3, (12, N * P))
    g = jax.random.normal(k4, (N * P, F))

    @jax.jit
    def form_a(flat, idx, wgt):
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(12, N * P, F)
        return jnp.sum(vals * wgt[..., None], axis=0)

    @jax.jit
    def form_c(flat, idx, wgt):
        out = 0.
        for k in range(12):
            out = out + jnp.take(flat, idx[k], axis=0) * wgt[k][:, None]
        return out

    @jax.jit
    def form_d(flat, idx, wgt, g):
        out = 0.
        for k in range(12):
            out = out + jnp.sum(jnp.take(flat, idx[k], axis=0) * g, axis=1) * wgt[k]
        return out

    rows = 12 * N * P
    t = timeit(form_a, flat, idx, wgt)
    print(f'a) stacked take+reduce:     {t*1e3:7.1f} ms  ({t/rows*1e9:5.1f} ns/row)', flush=True)
    t = timeit(form_c, flat, idx, wgt)
    print(f'c) unrolled 12x take-sum:   {t*1e3:7.1f} ms  ({t/rows*1e9:5.1f} ns/row)', flush=True)
    t = timeit(form_d, flat, idx, wgt, g)
    print(f'd) take+full contraction:   {t*1e3:7.1f} ms  ({t/rows*1e9:5.1f} ns/row)', flush=True)


if __name__ == '__main__':
    main()
