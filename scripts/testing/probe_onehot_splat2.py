#!/usr/bin/env python
"""Splat probe v2: grid-driven chunk iteration (pipelined DMA) instead of an
in-kernel fori_loop. Output block stays resident across grid steps."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = int(os.environ.get('SPLAT_CHUNK', '1024'))


def make_kernel(n_entries, f):
    n_chunks = n_entries // CHUNK

    def kernel(idx_ref, vals_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # idx block [8, CHUNK//128... actually [CHUNK//128 rows? see below]
        idx_blk = idx_ref[:]                                      # [CHUNK//128, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK // 128, 128, 128), 2)
        oh = (idx_blk[:, :, None] == lane).astype(jnp.float32)    # [c, 128, 128]
        oh = oh.reshape(CHUNK, 128)                               # entries row-major
        out_ref[:] += jax.lax.dot_general(
            vals_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [F, 128]

    @jax.jit
    def run(idx, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((f, 128), jnp.float32),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((CHUNK // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((f, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx.reshape(n_chunks * (CHUNK // 128), 128), vals)

    return run


def main():
    n_entries = int(os.environ.get('SPLAT_ENTRIES', '131072'))
    f = 32
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_entries,), 0, 128, dtype=jnp.int32)
    vals = jax.random.normal(key, (n_entries, f))

    run = make_kernel(n_entries, f)
    out = run(idx, vals).T
    ref = jnp.zeros((128, f)).at[idx].add(vals)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f'correct: rel maxdiff={err:.2e}', flush=True)

    s = float(out.ravel()[0])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        s = float(run(idx, vals).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    ns = dt / n_entries * 1e9
    print(f'{dt*1e3:.2f} ms for {n_entries} entries -> {ns:.1f} ns/entry '
          f'(includes ~28ms fixed call overhead)', flush=True)


if __name__ == '__main__':
    main()
