#!/usr/bin/env python
"""Overlap-window splat sweep at production b16 size (round 5).

Times the END-TO-END backward splat (triplane_splat, prod bf16 flags) for
the shipped family mode (wrows=2) against single-family OVERLAP windows at
wrows 2/4/8 — the table shrinks from 2x planes to (1+1/wrows)x, and the
accumulate kernel is bound by visited-window-block HBM traffic, so the
prediction is overlap wins despite the wider [K, (wrows+1)*W] one-hot
build (the effect that made FAMILY wrows=4 regress in the r3 battery).
One process, transients freed between stages. Scalar-pull sync timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from tdgp.ops import splat as S

N = int(os.environ.get('N', '16'))
RES = int(os.environ.get('RES', '512'))
F = int(os.environ.get('F', '32'))
P = int(os.environ.get('P', str(64 * 64 * 32)))
SCALE = 0.5


def timeit(fn, *args, iters=5):
    out = fn(*args)
    s = float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n3 = N * 3
    H = W = RES
    g_pts = jax.random.normal(k1, (n3, P, F), jnp.float32)
    coords = jax.random.uniform(k2, (N, P, 3), minval=-0.45, maxval=0.45)
    print(f'N={N} RES={RES} F={F} P={P}  E={n3 * P / 1e6:.1f}M entries',
          flush=True)

    def run(label, **kw):
        fn = jax.jit(lambda g, c: S.triplane_splat(
            g, c, SCALE, n3, H, W, mxu_bf16=True, entry_bf16=True, **kw))
        t = timeit(fn, g_pts, coords)
        print(f'{label:34s}: {t * 1e3:8.1f} ms', flush=True)
        return t

    base = run('family wrows=2 (shipped)', wrows=2, overlap=False)
    for wr in (2, 4, 8):
        t = run(f'overlap wrows={wr}', wrows=wr, overlap=True)
        print(f'  -> vs shipped: {(t / base - 1) * 100:+.1f}%', flush=True)


if __name__ == '__main__':
    main()
