"""On-chip parity gate for the splat kernel (ADVICE r3 item 1).

The 6-to-2 SMEM prefetch repack in tdgp/ops/splat.py relies on
``input_output_aliases`` to keep unvisited windows zeroed — a path that
Pallas interpret mode (the CPU test suite) does NOT honor. This script runs
the REAL (non-interpret) kernels on the attached TPU chip and asserts:

  1. ``triplane_splat`` matches ``triplane_splat_ref`` with coords clustered
     so MOST windows are unvisited (exercises the zero-init/aliasing path).
  2. The model's production VJP route (hoisted quad_bf16 table, save_bf16
     residuals, remat segment — epigraf.py:~276) produces plane/coord grads
     matching fp32 jnp autodiff to bf16 tolerance.

Exit code 0 = parity holds; any assertion failure is a hard error. Run this
BEFORE trusting any bench ladder number produced by the repacked kernel.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

from tdgp.ops.grid_sample import grid_sample_2d
from tdgp.ops.splat import (build_sample_table, triplane_sample_hoisted,
                            triplane_splat, triplane_splat_ref)


def _tri_plane_sample_jnp(planes_flat, coords, scale):
    n3, h, w, f = planes_flat.shape
    n = n3 // 3
    p = coords.shape[1]
    c = coords / scale
    grids = jnp.stack([
        c[..., jnp.array([0, 1])],
        c[..., jnp.array([0, 2])],
        c[..., jnp.array([1, 2])],
    ], axis=1)
    feats = grid_sample_2d(planes_flat, grids.reshape(n * 3, p, 2),
                           align_corners=True)
    return jnp.mean(feats.reshape(n, 3, p, f), axis=1)


def main():
    dev = jax.devices()[0]
    print(f'device: {dev}', flush=True)
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # --- 1. splat kernel, sparse coords: most windows unvisited ----------
    n, h, w, f, p = 2, 256, 256, 32, 513
    scale = 0.5
    g_pts = jax.random.normal(k3, (n * 3, p, f), jnp.float32)
    # cluster in one corner octant -> the vast majority of (plane, row)
    # windows receive zero scatter traffic and must come out exactly zero
    coords = jax.random.uniform(k2, (n, p, 3), minval=-0.45, maxval=-0.25)
    out = jax.jit(lambda g, c: triplane_splat(g, c, scale, n * 3, h, w))(
        g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n * 3, h, w)
    out, ref = np.asarray(out), np.asarray(ref)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    visited = np.abs(ref).sum(axis=(1, 2, 3)) > 0
    # unvisited region must be EXACTLY zero (aliasing zero-init path)
    untouched = out[:, h // 2:, :, :]
    assert np.all(untouched == 0.0), np.abs(untouched).max()
    print(f'splat sparse parity OK (max|ref|={np.abs(ref).max():.3f}, '
          f'visited planes={int(visited.sum())}/{n * 3})', flush=True)

    # --- 2. splat kernel, dense coords ------------------------------------
    coords_d = jax.random.uniform(k1, (n, p, 3), minval=-0.62, maxval=0.62)
    out_d = jax.jit(lambda g, c: triplane_splat(g, c, scale, n * 3, h, w))(
        g_pts, coords_d)
    ref_d = triplane_splat_ref(g_pts, coords_d, scale, n * 3, h, w)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-4)
    print('splat dense parity OK', flush=True)

    # --- 3. production VJP route: hoisted quad_bf16 + save_bf16 ----------
    planes = jax.random.normal(k4, (n * 3, h, w, f), jnp.float32)
    shape = tuple(planes.shape)
    pack = 'quad_bf16'

    out_h = triplane_sample_hoisted(
        planes, jax.lax.stop_gradient(build_sample_table(planes, pack)),
        coords_d, scale, shape, pack, False, 'bf16')
    ref_h = _tri_plane_sample_jnp(planes, coords_d, scale)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=3e-2, atol=3e-2)

    @jax.checkpoint
    def seg(pl_, table_, co_):
        return jnp.tanh(triplane_sample_hoisted(pl_, table_, co_, scale,
                                                shape, pack, False, 'bf16'))

    def loss(pl_, co_):
        table_ = jax.lax.stop_gradient(build_sample_table(pl_, pack))
        return jnp.sum(seg(pl_, table_, co_) ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(jnp.tanh(_tri_plane_sample_jnp(pl_, co_, scale)) ** 2)

    gp_f, gc_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(planes, coords_d)
    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords_d)
    gp_f, gp_r = np.asarray(gp_f), np.asarray(gp_r)
    rel = np.linalg.norm(gp_f - gp_r) / max(np.linalg.norm(gp_r), 1e-30)
    assert rel < 0.05, f'plane-grad rel err {rel}'
    relc = (np.linalg.norm(np.asarray(gc_f) - np.asarray(gc_r))
            / max(np.linalg.norm(np.asarray(gc_r)), 1e-30))
    assert relc < 0.05, f'coord-grad rel err {relc}'
    print(f'hoisted quad_bf16 VJP parity OK (plane rel={rel:.2e}, '
          f'coord rel={relc:.2e})', flush=True)

    # --- 4. merged pair splat: the ALIASED init_table accumulation --------
    # (interpret mode adds two tables instead; only hardware runs the
    # second _splat_table call on top of the first's aliased output, and
    # only hardware skips the in-kernel zeroing with live prior content).
    # Sparse coords1 + dense coords2 exercise windows visited by one set,
    # the other, both, and neither.
    from tdgp.ops.splat import triplane_splat_pair
    g2 = jax.random.normal(k1, (n * 3, p, f), jnp.float32)
    ref_m = ref + np.asarray(triplane_splat_ref(g2, coords_d, scale,
                                                n * 3, h, w))
    # pin the pair mode per sub-check: 'concat' is the shipped default but
    # 'alias' stays production-selectable, and only hardware runs its
    # aliased-init_table + zeroing-disabled path — both must stay gated
    for mode in ('alias', 'concat'):
        os.environ['TDGP_SPLAT_PAIR_MODE'] = mode
        try:
            merged = jax.jit(lambda a, b, c_, d: triplane_splat_pair(
                a, b, c_, d, scale, n * 3, h, w))(g_pts, coords, g2, coords_d)
        finally:
            del os.environ['TDGP_SPLAT_PAIR_MODE']
        np.testing.assert_allclose(np.asarray(merged), ref_m,
                                   rtol=1e-4, atol=1e-4, err_msg=mode)
    print('merged pair splat (alias + concat modes) parity OK', flush=True)

    # and through the production pair ops (token channel) vs two hoisted
    from tdgp.ops.splat import (triplane_sample_pair_first,
                                triplane_sample_pair_second)

    def loss_pair(pl_, c1, c2):
        table_ = jax.lax.stop_gradient(build_sample_table(pl_, pack))
        f1, token = triplane_sample_pair_first(pl_, table_, c1, c2.shape[1],
                                               scale, shape, pack, False,
                                               'bf16')
        f2 = triplane_sample_pair_second(table_, c2, token, scale, shape,
                                         pack, False, 'bf16')
        return jnp.sum(jnp.tanh(f1) ** 2) + jnp.sum(jnp.tanh(2.0 * f2))

    def loss_two(pl_, c1, c2):
        table_ = jax.lax.stop_gradient(build_sample_table(pl_, pack))
        f1 = triplane_sample_hoisted(pl_, table_, c1, scale, shape, pack,
                                     False, 'bf16')
        f2 = triplane_sample_hoisted(pl_, table_, c2, scale, shape, pack,
                                     False, 'bf16')
        return jnp.sum(jnp.tanh(f1) ** 2) + jnp.sum(jnp.tanh(2.0 * f2))

    gp_p, gc1_p, gc2_p = jax.jit(jax.grad(loss_pair, argnums=(0, 1, 2)))(
        planes, coords, coords_d)
    gp_t, gc1_t, gc2_t = jax.jit(jax.grad(loss_two, argnums=(0, 1, 2)))(
        planes, coords, coords_d)
    for a, b, name, tol in ((gp_p, gp_t, 'planes', 1e-3),
                            (gc1_p, gc1_t, 'coords1', 1e-4),
                            (gc2_p, gc2_t, 'coords2', 1e-4)):
        a, b = np.asarray(a), np.asarray(b)
        r = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
        assert r < tol, f'pair-op {name} rel err {r}'
    print('pair sample ops (token channel) parity OK', flush=True)

    # --- 5. overlap windows on hardware ----------------------------------
    # Single-family (wrows+1)-row windows at stride wrows: the aliasing
    # zero-init, the overlap-row unfold add, and the production bf16 flags
    # all only fully exercise on the real kernel. Sparse coords cover the
    # unvisited-window path; the merged pair covers init_table accumulation
    # into an overlap-shaped table.
    # wrows=8 exceeds the 16 MB scoped-VMEM limit (the wide kernel's
    # one-hot build materializes [K, (wrows+1)*W] temporaries) — 2/4 are
    # the compilable overlap points (r5 battery stage 1)
    for wr in (2, 4):
        out_o = jax.jit(lambda g, c: triplane_splat(
            g, c, scale, n * 3, h, w, wrows=wr, overlap=True))(
                g_pts, coords_d)
        np.testing.assert_allclose(np.asarray(out_o), np.asarray(ref_d),
                                   rtol=1e-4, atol=1e-4, err_msg=f'wr={wr}')
        out_os = jax.jit(lambda g, c: triplane_splat(
            g, c, scale, n * 3, h, w, wrows=wr, overlap=True))(g_pts, coords)
        out_os = np.asarray(out_os)
        np.testing.assert_allclose(out_os, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f'wr={wr} sparse')
        assert np.all(out_os[:, h // 2:, :, :] == 0.0), f'wr={wr} zero-init'
        out_ob = jax.jit(lambda g, c: triplane_splat(
            g, c, scale, n * 3, h, w, wrows=wr, overlap=True,
            mxu_bf16=True, entry_bf16=True))(g_pts, coords_d)
        rb = (np.linalg.norm(np.asarray(out_ob) - np.asarray(ref_d))
              / np.linalg.norm(np.asarray(ref_d)))
        assert rb < 0.01, f'wr={wr} bf16 rel {rb}'
    merged_o = jax.jit(lambda a, b, c_, d: triplane_splat_pair(
        a, b, c_, d, scale, n * 3, h, w, wrows=4, overlap=True))(
            g_pts, coords, g2, coords_d)
    np.testing.assert_allclose(np.asarray(merged_o), ref_m,
                               rtol=1e-4, atol=1e-4)
    print('overlap windows (wr 2/4 + bf16 + merged pair) parity OK',
          flush=True)
    print('ONCHIP SPLAT PARITY: ALL OK', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
