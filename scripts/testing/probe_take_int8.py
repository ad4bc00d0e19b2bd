#!/usr/bin/env python
"""Probe: does an int8 row-take move half the bytes of a bf16 one?

The splat's sorted row-take gathers [E, 41] bf16 rows — 82 useful bytes
padded to 128 lanes x 2B = 256B of tile traffic per row. Bitcasting to
[E, 82] int8 pads to 128 lanes x 1B = 128B/row. If XLA's gather cost is
(fixed per row) + (padded bytes / BW), the int8 take should save ~bytes/2;
if the fixed per-row cost dominates, it won't. Also times the inverse:
f32 rows (512B) as the upper anchor, and a keys-only [E, 1] take as the
fixed-cost floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

E = int(os.environ.get('E', str(6_291_456)))
LANES = int(os.environ.get('LANES', '41'))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rows_bf = jax.random.normal(k1, (E, LANES), jnp.float32).astype(jnp.bfloat16)
    perm = jax.random.permutation(k2, E)

    take = jax.jit(lambda p, q: jnp.take(p, q, axis=0))
    t = timeit(take, rows_bf, perm)
    print(f'take bf16 [E,{LANES}] (256B/row pad): {t*1e3:8.1f} ms', flush=True)

    rows_i8 = jax.jit(lambda r: jax.lax.bitcast_convert_type(
        r, jnp.int8).reshape(E, LANES * 2))(rows_bf)
    t = timeit(take, rows_i8, perm)
    print(f'take int8 [E,{LANES * 2}] (128B/row pad): {t*1e3:8.1f} ms', flush=True)

    # fused bitcast->take->bitcast (what the splat would actually run)
    @jax.jit
    def take_via_i8(r, q):
        i8 = jax.lax.bitcast_convert_type(r, jnp.int8).reshape(E, LANES * 2)
        s = jnp.take(i8, q, axis=0)
        return jax.lax.bitcast_convert_type(
            s.reshape(E, LANES, 2), jnp.bfloat16)
    t = timeit(take_via_i8, rows_bf, perm)
    print(f'take bf16 via int8 roundtrip      : {t*1e3:8.1f} ms', flush=True)

    rows_f32 = rows_bf.astype(jnp.float32)
    t = timeit(take, rows_f32, perm)
    print(f'take f32  [E,{LANES}] (512B/row pad): {t*1e3:8.1f} ms', flush=True)

    keys = jnp.arange(E, dtype=jnp.int32).reshape(E, 1)
    t = timeit(take, keys, perm)
    print(f'take i32 keys [E,1] (fixed floor) : {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
