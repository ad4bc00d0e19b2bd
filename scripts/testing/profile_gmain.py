#!/usr/bin/env python
"""Bisect the Gmain gradient cost on the local chip.

Timing protocol: per-call pull of ONE scalar derived from the output
(device->host of 4 bytes) — block_until_ready alone is unreliable on this
rig, and pulling large outputs measures the tunnel, not the chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
jax.config.update('jax_default_prng_impl', 'rbg')
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    def sync(out):
        return float(jax.tree.leaves(out)[0].ravel()[0])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from tdgp.config import satellite_config
    from tdgp.training import losses
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import (create_train_state, _sample_gen_inputs)

    cfg = satellite_config(c_dim=0, resolution=256)
    n = int(os.environ.get('N', '8'))
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    z, c, cam, cond = _sample_gen_inputs(rng, n, cfg, sched)

    def make_gloss(stop_planes=False, coarse_only=False):
        def loss_fn(g_params):
            g_vars = {'params': g_params, 'consts': state.g_consts, 'ema': state.g_ema_coll}

            def fwd(g):
                ws = g.mapping(z, c, camera_angles=cond, train=True)
                cam_post = g.synthesis.apply_camera_adaptor(cam, z, c)
                out = g.synthesis(ws, cam_post, None, train=True,
                                  concat_depth=True, return_depth=True,
                                  nerf_noise_std=sched.nerf_noise_std,
                                  depth_progress=sched.depth_progress)
                return out, cam_post

            out, cam_post = G.apply(g_vars, method=fwd, rngs={
                'noise': rng, 'render': rng, 'depth': rng, 'dropout': rng})
            logits, _ = losses.d_forward(D, {'params': state.d_params}, out.img, c,
                                         sched, cfg, patch_params={
                                             'scales': jnp.full((n, 2), 0.5),
                                             'offsets': jnp.full((n, 2), 0.2)},
                                         camera_angles=cam_post.angles)
            return jnp.mean(jax.nn.softplus(-logits))
        return loss_fn

    g_loss = make_gloss()
    t = timeit(jax.jit(g_loss), state.g_params)
    print(f'G loss fwd:                      {t*1e3:8.1f} ms', flush=True)
    t = timeit(jax.jit(jax.grad(g_loss)), state.g_params)
    print(f'G loss grad (full):              {t*1e3:8.1f} ms', flush=True)

    # variant: stop-grad planes inside sampling (no plane scatter in backward)
    import tdgp.models.epigraf as epigraf
    orig = epigraf.tri_plane_sample

    def tps_stopped(planes, coords, scale, **kw):
        return orig(jax.lax.stop_gradient(planes), coords, scale, **kw)

    # NOTE: with the hoisted-table path (plane_sample_impl fused + pack)
    # the model calls triplane_sample_packed instead; stop the gradient at
    # the table build for the same bisect
    import tdgp.ops.splat as splat
    orig_build = splat.build_sample_table

    def build_stopped(planes, pack):
        return orig_build(jax.lax.stop_gradient(planes), pack)

    epigraf.tri_plane_sample = tps_stopped
    splat.build_sample_table = build_stopped
    try:
        t = timeit(jax.jit(jax.grad(make_gloss())), state.g_params)
        print(f'G loss grad (stop-grad planes):  {t*1e3:8.1f} ms', flush=True)
    finally:
        epigraf.tri_plane_sample = orig
        splat.build_sample_table = orig_build


if __name__ == '__main__':
    main()
