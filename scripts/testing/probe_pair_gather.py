#!/usr/bin/env python
"""Probe: corner pair-packing — trade gather ROW COUNT for row WIDTH.

probe_fused_gather2.py established the XLA gather floor at ~40 ns/row
regardless of fusion shape, and the round-1 ledger established cost is
per-row, not per-byte (F=32 vs F=64 identical). If that holds for packed
rows, re-laying the plane table so that the 2 x-adjacent bilinear corners
(and optionally the 2x2 corner block) live in ONE row cuts the dominant
render-pass cost 2x / 4x:

  base : 4 corners/point -> take rows of [F]      (12 * NP rows)
  pair : 2 row-pairs/pt  -> take rows of [2F]     (6 * NP rows)
         table = concat(even-x pairs, odd-x pairs)   [M, 2F]
  quad : 1 block/pt      -> take rows of [4F]     (3 * NP rows)
         table = 4 parity-shifted 2x2-block views     [M, 4F]

Total gathered bytes are identical in all three forms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

N, RES, F = 8, 512, 32
P = 64 * 64 * 32  # points per image per pass
N3 = N * 3
M = N3 * RES * RES


def timeit(fn, *args, iters=5):
    out = fn(*args)
    s = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    skip_base = bool(os.environ.get('SKIP_BASE'))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    flat = jax.random.normal(k1, (M, F))
    npts = N * P

    # --- base: 12 * NP rows of [F]
    idx12 = jax.random.randint(k2, (12, npts), 0, M)
    wgt12 = jax.random.uniform(k3, (12, npts))

    if not skip_base:
        @jax.jit
        def base(flat, idx, wgt):
            out = 0.
            for k in range(12):
                out = out + jnp.take(flat, idx[k], axis=0) * wgt[k][:, None]
            return out

        t = timeit(lambda i, w: base(flat, i, w), idx12, wgt12)
        rows = 12 * npts
        print(f'base  [F]x{rows/1e6:.1f}M rows: {t*1e3:7.1f} ms ({t/rows*1e9:5.1f} ns/row)', flush=True)

    # --- pair: table [M, 2F] (simulates the parity-concat layout), 6*NP rows
    @jax.jit
    def build_pair(flat):
        ev = flat.reshape(M // 2, 2 * F)
        od = jnp.concatenate([flat[1:], flat[:1]], axis=0).reshape(M // 2, 2 * F)
        return jnp.concatenate([ev, od], axis=0)

    t = timeit(build_pair, flat)
    print(f'pair table build ([M,2F] concat): {t*1e3:7.1f} ms', flush=True)
    pair_tab = build_pair(flat)
    idx6 = jax.random.randint(k2, (6, npts), 0, M)
    wgt6a = jax.random.uniform(k3, (6, npts))
    wgt6b = jax.random.uniform(jax.random.fold_in(k3, 1), (6, npts))

    @jax.jit
    def pair(tab, idx, wa, wb):
        out = 0.
        for k in range(6):
            v = jnp.take(tab, idx[k], axis=0)          # [NP, 2F]
            out = out + v[:, :F] * wa[k][:, None] + v[:, F:] * wb[k][:, None]
        return out

    t = timeit(lambda i, a, b: pair(pair_tab, i, a, b), idx6, wgt6a, wgt6b)
    rows = 6 * npts
    print(f'pair  [2F]x{rows/1e6:.1f}M rows: {t*1e3:7.1f} ms ({t/rows*1e9:5.1f} ns/row)', flush=True)

    # --- quad: table [M, 4F], 3*NP rows
    @jax.jit
    def build_quad(flat):
        # 2x2-block view at one parity (the real thing builds 4 shifted views;
        # bytes moved are identical per view)
        x = flat.reshape(N3, RES // 2, 2, RES // 2, 2, F)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(M // 4, 4 * F)
        return jnp.concatenate([x, x, x, x], axis=0)

    t = timeit(build_quad, flat)
    print(f'quad table build (4 shifted views): {t*1e3:7.1f} ms', flush=True)
    quad_tab = build_quad(flat)
    idx3 = jax.random.randint(k2, (3, npts), 0, M)
    wq = [jax.random.uniform(jax.random.fold_in(k3, i), (3, npts)) for i in range(4)]

    @jax.jit
    def quad(tab, idx, w0, w1, w2, w3):
        out = 0.
        for k in range(3):
            v = jnp.take(tab, idx[k], axis=0)          # [NP, 4F]
            out = (out + v[:, :F] * w0[k][:, None] + v[:, F:2*F] * w1[k][:, None]
                   + v[:, 2*F:3*F] * w2[k][:, None] + v[:, 3*F:] * w3[k][:, None])
        return out

    t = timeit(lambda i, a, b, c, d: quad(quad_tab, i, a, b, c, d), idx3, *wq)
    rows = 3 * npts
    print(f'quad  [4F]x{rows/1e6:.1f}M rows: {t*1e3:7.1f} ms ({t/rows*1e9:5.1f} ns/row)', flush=True)


if __name__ == '__main__':
    main()
