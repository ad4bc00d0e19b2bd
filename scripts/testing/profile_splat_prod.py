#!/usr/bin/env python
"""Splat backward at PRODUCTION settings (quad_bf16 operating point:
entry_bf16 + mxu_bf16 rows) at b16 size — the lean sibling of
profile_splat_prep.py, which OOMs at N=16 before reaching its bf16 stages
(it keeps the fp32 packed/sorted copies alive; known r4 ledger note).

Stages: end-to-end bf16 splat, bf16-row take, bf16 accumulate kernel.
Timing uses scalar-pull sync (ledger methodology).
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
    s = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s += float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n3 = N * 3
    H = W = RES
    g_pts = jax.random.normal(k1, (n3, P, F), jnp.float32)
    coords = jax.random.uniform(k2, (N, P, 3), minval=-0.45, maxval=0.45)
    E = n3 * P
    print(f'N={N} RES={RES} F={F} P={P}  E={E/1e6:.1f}M entries', flush=True)

    # end-to-end at production flags (what _sample_bwd runs for quad_bf16)
    full_bf = jax.jit(lambda g, c: S.triplane_splat(
        g, c, SCALE, n3, H, W, mxu_bf16=True, entry_bf16=True))
    t = timeit(full_bf, g_pts, coords)
    print(f'TOTAL triplane_splat (prod bf16): {t*1e3:8.1f} ms', flush=True)

    # isolate the accumulate kernel with bf16 packed rows: build+sort once
    # outside the timed region, keep ONLY the sorted bf16 rows alive
    @jax.jit
    def prep(g_pts, coords):
        gx, gy = S._pixel_coords(coords, SCALE, H, W)
        x0i, y0i, _tx, _ty, _ms, ws = S._corner_meta(gx, gy, H, W)
        pid = jnp.broadcast_to(
            jnp.arange(n3, dtype=jnp.int32)[:, None], (n3, P))
        key_, avec = S._window_meta(y0i, ws, H, n3, pid)
        bf = jnp.bfloat16
        x1 = jnp.clip(x0i + 1, 0, W)
        meta = [key_ >> 8, key_ & 255, x1 >> 8, x1 & 255]
        cols = ([g_pts.reshape(E, F).astype(bf)]
                + [m.reshape(E, 1).astype(bf) for m in meta]
                + [a.reshape(E, 1).astype(bf) for a in avec])
        packed = jnp.concatenate(cols, axis=1)
        keys = key_.reshape(E)
        return packed, keys

    packed, keys = prep(g_pts, coords)
    del g_pts
    hp = H // 2
    n_windows = 2 * n3 * hp
    epad = -(-E // S._CHUNK) * S._CHUNK
    n_extra = epad - E
    extra_keys = jnp.full((n_extra,), n_windows, dtype=jnp.int32)
    extra = jnp.zeros((n_extra, packed.shape[1]), dtype=packed.dtype)
    extra = extra.at[:, F].set((extra_keys >> 8).astype(packed.dtype))
    extra = extra.at[:, F + 1].set((extra_keys & 255).astype(packed.dtype))
    packed = jnp.concatenate([packed, extra], axis=0)
    keys = jnp.concatenate([keys, extra_keys], axis=0)

    argsort = jax.jit(jnp.argsort)
    t = timeit(argsort, keys)
    print(f'argsort keys [{epad/1e6:.1f}M]         : {t*1e3:8.1f} ms',
          flush=True)
    perm = argsort(keys)

    take = jax.jit(lambda p, q: jnp.take(p, q, axis=0))
    t = timeit(take, packed, perm)
    print(f'row-take bf16 [E, {packed.shape[1]}]       : {t*1e3:8.1f} ms',
          flush=True)
    packed_sorted = take(packed, perm)
    del packed, perm
    f32 = jnp.float32
    keys_sorted = (packed_sorted[:, F].astype(f32) * 256.0
                   + packed_sorted[:, F + 1].astype(f32)).astype(jnp.int32)

    kern = jax.jit(lambda ps, ks: S._splat_table(
        ps, ks, n_windows, F, W, False, mxu_bf16=True, entry_bf16=True))
    t = timeit(kern, packed_sorted, keys_sorted)
    print(f'pallas accumulate (prod bf16)   : {t*1e3:8.1f} ms', flush=True)

    table = kern(packed_sorted, keys_sorted)
    del packed_sorted

    @jax.jit
    def unfold(table):
        nwa = n3 * hp
        A = table[:nwa].reshape(n3, hp, F, 2, W).transpose(0, 1, 3, 4, 2)
        A = A.reshape(n3, H, W, F)
        B = table[nwa:n_windows].reshape(n3, hp, F, 2, W).transpose(
            0, 1, 3, 4, 2)
        B = B.reshape(n3, H, W, F)
        return A + jnp.pad(B, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :H]

    t = timeit(unfold, table)
    print(f'window-table unfold             : {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
