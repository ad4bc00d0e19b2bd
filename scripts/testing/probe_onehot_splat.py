#!/usr/bin/env python
"""Feasibility probe #2 for the splat kernel: 8-entry-unrolled one-hot
outer-product accumulation on the MXU (registers, no per-entry RMW).

Single 128-row window; entries pre-bucketed. Measures ns/entry."""
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

UNROLL = int(os.environ.get('SPLAT_UNROLL', '128'))


def make_kernel(n_entries, f):
    def kernel(idx_ref, vals_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (UNROLL, 128), 1)

        def body(i, acc):
            base = i * UNROLL
            vals8 = vals_ref[pl.ds(base, UNROLL), :]          # [8, F]
            idx8 = idx_ref[pl.ds(i, 1), :]                    # [1, 8] int32 (VMEM)
            oh = (lane == idx8.reshape(UNROLL, 1)).astype(jnp.float32)  # [8, 128]
            return acc + jax.lax.dot_general(
                vals8, oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [F, 128]

        acc = jax.lax.fori_loop(0, n_entries // UNROLL, body,
                                jnp.zeros((f, 128), jnp.float32))
        out_ref[:] = acc.T  # [128, F]

    @jax.jit
    def run(idx, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, f), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx.reshape(-1, UNROLL), vals)

    return run


def main():
    n_entries = int(os.environ.get('SPLAT_ENTRIES', '65536'))
    f = 32
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_entries,), 0, 128, dtype=jnp.int32)
    vals = jax.random.normal(key, (n_entries, f))

    run = make_kernel(n_entries, f)
    out = run(idx, vals)
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
    print(f'{dt*1e3:.2f} ms for {n_entries} entries -> {ns:.1f} ns/entry', flush=True)
    print(f'extrapolated 12.6M-entry pass: {12.6e6 * ns / 1e9:.3f} s', flush=True)


if __name__ == '__main__':
    main()
