#!/usr/bin/env python
"""Feasibility probe: per-entry dynamic-row RMW accumulation in a Pallas
kernel (the core loop of the planned splat kernel). Measures cycles/entry."""
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


def make_kernel(n_entries, t_rows, f):
    def kernel(idx_ref, vals_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + vals_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, n_entries, body, 0)

    @jax.jit
    def run(idx, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t_rows, f), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, vals)

    return run


def main():
    n_entries, t_rows, f = 65536, 8192, 32
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_entries,), 0, t_rows, dtype=jnp.int32)
    vals = jax.random.normal(key, (n_entries, f))

    run = make_kernel(n_entries, t_rows, f)
    out = run(idx, vals)
    # correctness vs XLA scatter
    ref = jnp.zeros((t_rows, f)).at[idx].add(vals)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f'correct: maxdiff={err:.2e}', flush=True)

    s = float(out.ravel()[0])  # sync
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        s = float(run(idx, vals).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    ns_per_entry = dt / n_entries * 1e9
    print(f'{dt*1e3:.2f} ms for {n_entries} entries -> {ns_per_entry:.1f} ns/entry', flush=True)
    total = 12.6e6 * ns_per_entry / 1e9
    print(f'extrapolated full splat (12.6M entries/pass): {total:.2f} s/pass', flush=True)


if __name__ == '__main__':
    main()
