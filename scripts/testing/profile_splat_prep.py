#!/usr/bin/env python
"""Decompose the splat backward (tdgp/ops/splat.py:triplane_splat) into its
prep stages at production size to locate the residual cost (TODO #4 / round-3
VERDICT item 7): weights/meta build, argsort, row-take, kernel accumulate.

Timing uses scalar-pull sync (ledger methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from tdgp.ops import splat as S

N = int(os.environ.get('N', '8'))
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
    k1, k2, k3 = jax.random.split(key, 3)
    n3 = N * 3
    H = W = RES
    g_pts = jax.random.normal(k1, (n3, P, F), jnp.float32)
    coords = jax.random.uniform(k2, (N, P, 3), minval=-0.45, maxval=0.45)
    E = n3 * P
    print(f'N={N} RES={RES} F={F} P={P}  E={E/1e6:.1f}M entries', flush=True)

    # --- stage 1: meta (pixel coords, corner weights, window keys) + packed
    @jax.jit
    def build_packed(g_pts, coords):
        gx, gy = S._pixel_coords(coords, SCALE, H, W)
        x0i, y0i, _tx, _ty, _ms, ws = S._corner_meta(gx, gy, H, W)
        pid = jnp.broadcast_to(jnp.arange(n3, dtype=jnp.int32)[:, None], (n3, P))
        key_, avec = S._window_meta(y0i, ws, H, n3, pid)
        f32 = jnp.float32
        packed = jnp.concatenate([
            g_pts.reshape(E, F).astype(f32),
            key_.reshape(E, 1).astype(f32),
            x0i.reshape(E, 1).astype(f32),
            avec[0].reshape(E, 1).astype(f32),
            avec[1].reshape(E, 1).astype(f32),
            avec[2].reshape(E, 1).astype(f32),
            avec[3].reshape(E, 1).astype(f32),
        ], axis=1)
        return packed, key_.reshape(E)

    t = timeit(build_packed, g_pts, coords)
    print(f'build packed [E,F+6]        : {t*1e3:8.1f} ms', flush=True)
    packed, keys = build_packed(g_pts, coords)

    hp = H // 2
    n_windows = 2 * n3 * hp
    n_cov = n_windows + 1
    epad = -(-(E + n_cov) // S._CHUNK) * S._CHUNK
    n_extra = epad - E
    extra_keys = jnp.minimum(jnp.arange(n_extra, dtype=jnp.int32), n_windows)
    extra = jnp.zeros((n_extra, F + 6), dtype=jnp.float32)
    extra = extra.at[:, F].set(extra_keys.astype(jnp.float32))
    packed_full = jnp.concatenate([packed, extra], axis=0)
    keys_full = jnp.concatenate([keys, extra_keys], axis=0)

    # --- stage 2: argsort
    argsort = jax.jit(jnp.argsort)
    t = timeit(argsort, keys_full)
    print(f'argsort keys [{epad/1e6:.1f}M]       : {t*1e3:8.1f} ms', flush=True)
    perm = argsort(keys_full)

    # --- stage 3: row-take of the packed entries
    take = jax.jit(lambda p, q: jnp.take(p, q, axis=0))
    t = timeit(take, packed_full, perm)
    print(f'row-take [E, {F+6}]          : {t*1e3:8.1f} ms', flush=True)
    packed_sorted = take(packed_full, perm)

    # variant: take keys only (narrow) + values separately
    take_keys = jax.jit(lambda k, q: jnp.take(k, q, axis=0))
    t = timeit(take_keys, keys_full, perm)
    print(f'row-take keys only [E]      : {t*1e3:8.1f} ms', flush=True)

    keys_sorted = take_keys(keys_full, perm)

    # --- stage 4: the Pallas accumulate kernel
    kern = jax.jit(lambda ps, ks: S._splat_table(ps, ks, n_windows, F, W, False))
    t = timeit(kern, packed_sorted, keys_sorted)
    print(f'pallas accumulate kernel    : {t*1e3:8.1f} ms', flush=True)

    # --- stage 5: table unfold back to planes
    table = kern(packed_sorted, keys_sorted)

    @jax.jit
    def unfold(table):
        nwa = n3 * hp
        A = table[:nwa].reshape(n3, hp, F, 2, W).transpose(0, 1, 3, 4, 2)
        A = A.reshape(n3, H, W, F)
        B = table[nwa:n_windows].reshape(n3, hp, F, 2, W).transpose(0, 1, 3, 4, 2)
        B = B.reshape(n3, H, W, F)
        return A.at[:, 1:].add(B[:, :H - 1])

    t = timeit(unfold, table)
    print(f'window-table unfold         : {t*1e3:8.1f} ms', flush=True)

    # --- bf16-entry variants (round-3 prep diet): the physical row is
    # lane-padded to 128 either way, so bf16 halves the take's bytes
    packed_bf = packed_full.astype(jnp.bfloat16)  # layout stand-in ([E,38]bf16)
    t = timeit(take, packed_bf, perm)
    print(f'row-take bf16 [E, {F+6}]     : {t*1e3:8.1f} ms', flush=True)

    kern_bf = jax.jit(lambda ps, ks: S._splat_table(
        ps, ks, n_windows, F, W, False, mxu_bf16=True))
    t = timeit(kern_bf, packed_sorted, keys_sorted)
    print(f'pallas accumulate mxu_bf16  : {t*1e3:8.1f} ms', flush=True)

    kern_tbf = jax.jit(lambda ps, ks: S._splat_table(
        ps, ks, n_windows, F, W, False, mxu_bf16=True, table_bf16=True))
    t = timeit(kern_tbf, packed_sorted, keys_sorted)
    print(f'pallas accumulate table_bf16: {t*1e3:8.1f} ms', flush=True)

    # --- end to end for reference
    full = jax.jit(lambda g, c: S.triplane_splat(g, c, SCALE, n3, H, W))
    t = timeit(full, g_pts, coords)
    print(f'TOTAL triplane_splat (f32)  : {t*1e3:8.1f} ms', flush=True)

    full_bf = jax.jit(lambda g, c: S.triplane_splat(
        g, c, SCALE, n3, H, W, mxu_bf16=True, entry_bf16=True))
    t = timeit(full_bf, g_pts, coords)
    print(f'TOTAL triplane_splat (bf16) : {t*1e3:8.1f} ms', flush=True)

    full_tbf = jax.jit(lambda g, c: S.triplane_splat(
        g, c, SCALE, n3, H, W, mxu_bf16=True, entry_bf16=True, table_bf16=True))
    t = timeit(full_tbf, g_pts, coords)
    print(f'TOTAL splat (bf16+tablebf16): {t*1e3:8.1f} ms', flush=True)


if __name__ == '__main__':
    main()
