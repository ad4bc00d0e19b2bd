#!/usr/bin/env python
"""Does a bf16 plane-sampling path reduce the scatter-dominated G grad?"""
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
    from tdgp.training.train_step import create_train_state, _sample_gen_inputs
    import tdgp.models.epigraf as epigraf

    cfg = satellite_config(c_dim=0, resolution=256)
    n = 8
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    z, c, cam, cond = _sample_gen_inputs(rng, n, cfg, sched)

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

    orig = epigraf.tri_plane_sample

    def tps_bf16(planes, coords, scale):
        @jax.custom_vjp
        def sample_bf16(pl, co):
            return orig(pl.astype(jnp.bfloat16).astype(jnp.float32), co, scale)

        def fwd_fn(pl, co):
            out, vjp = jax.vjp(lambda p, c_: orig(p, c_, scale),
                               pl.astype(jnp.bfloat16), co)
            return out.astype(jnp.float32), vjp

        def bwd_fn(vjp, g):
            dp, dc = vjp(g.astype(jnp.bfloat16))
            return dp.astype(jnp.float32), dc.astype(jnp.float32)

        sample_bf16.defvjp(fwd_fn, bwd_fn)
        return sample_bf16(planes, coords)

    epigraf.tri_plane_sample = tps_bf16
    try:
        t = timeit(jax.jit(jax.grad(loss_fn)), state.g_params)
        print(f'G loss grad (bf16 plane sampling): {t*1e3:8.1f} ms', flush=True)
    finally:
        epigraf.tri_plane_sample = orig


if __name__ == '__main__':
    main()
