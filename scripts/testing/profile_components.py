#!/usr/bin/env python
"""Component-level timing of the train step on the local TPU chip.

Times (compile excluded): tri-plane decode, renderer (given planes), full G
forward, D forward, G grad, D grad — to locate the throughput bottleneck.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--preset', default='satellite')
    ap.add_argument('--parts', default='decode,render,gfwd,dfwd,ggrad,dgrad')
    args = ap.parse_args()
    parts = set(args.parts.split(','))

    from tdgp.config import satellite_config, asdict
    from tdgp.rendering.camera import sample_camera_params
    from tdgp.training import losses
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import (create_train_state, g_variables,
                                          _sample_gen_inputs)

    cfg = satellite_config(c_dim=0, resolution=256)
    n = args.batch
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    g_vars = g_variables(state)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    z, c, cam, cond = _sample_gen_inputs(rng, n, cfg, sched)
    rngs = {'noise': rng, 'render': rng, 'depth': rng, 'dropout': rng}

    if 'decode' in parts:
        @jax.jit
        def decode(g_vars, z):
            def fwd(g):
                ws = g.mapping(z, c, camera_angles=cond, train=True)
                return g.synthesis.decode_planes(ws)
            return G.apply(g_vars, method=fwd, rngs=rngs)
        t = timeit(decode, g_vars, z)
        print(f'decode_planes (mapping + SG2 512^2):  {t*1e3:8.1f} ms')
        planes = decode(g_vars, z)

    if 'render' in parts:
        @jax.jit
        def render_only(g_vars, planes):
            from tdgp.rendering.camera import compute_cam2world_matrix
            from tdgp.rendering.rays import sample_rays
            from tdgp.models.epigraf import tri_plane_sample
            from tdgp.rendering.renderer import importance_render

            def fwd(g):
                syn = g.synthesis
                c2w = compute_cam2world_matrix(cam)
                ray_o, ray_d = sample_rays(c2w, cam.fov, resolution=(64, 64))
                opts = syn._render_opts()

                def run_model(coords):
                    feats = tri_plane_sample(planes, coords, scale=cfg.camera.cube_scale)
                    return syn.tri_plane_mlp(feats)

                return importance_render(run_model, ray_o, ray_d,
                                         jax.random.PRNGKey(0), opts)
            return G.apply(g_vars, method=fwd)
        t = timeit(render_only, g_vars, planes)
        print(f'renderer (64^2 patch, 2x32 steps):    {t*1e3:8.1f} ms')

    if 'gfwd' in parts:
        @jax.jit
        def g_fwd(g_vars, z):
            out, pp, cam_post, _ = losses.g_forward(G, g_vars, z, c, cam, cond,
                                                    sched, rng, cfg)
            return out.img
        t = timeit(g_fwd, g_vars, z)
        print(f'G forward (train, patch):             {t*1e3:8.1f} ms')
        fake = g_fwd(g_vars, z)

    if 'dfwd' in parts:
        pp = {'scales': jnp.full((n, 2), 0.5), 'offsets': jnp.full((n, 2), 0.2)}

        @jax.jit
        def d_fwd(d_params, img):
            return losses.d_forward(D, {'params': d_params}, img, c, sched, cfg,
                                    patch_params=pp, camera_angles=cam.angles)[0]
        t = timeit(d_fwd, state.d_params, fake)
        print(f'D forward:                            {t*1e3:8.1f} ms')

    if 'ggrad' in parts:
        @jax.jit
        def g_grad(g_params, z):
            def loss_fn(p):
                gv = {'params': p, 'consts': state.g_consts, 'ema': state.g_ema_coll}
                out, pp_, cam_post, _ = losses.g_forward(G, gv, z, c, cam, cond,
                                                         sched, rng, cfg)
                logits, _ = losses.d_forward(D, {'params': state.d_params}, out.img,
                                             c, sched, cfg, patch_params=pp_,
                                             camera_angles=cam_post.angles)
                return jnp.mean(jax.nn.softplus(-logits))
            return jax.grad(loss_fn)(g_params)
        t = timeit(g_grad, state.g_params, z)
        print(f'G loss grad (Gmain core):             {t*1e3:8.1f} ms')

    if 'dgrad' in parts:
        pp = {'scales': jnp.full((n, 2), 0.5), 'offsets': jnp.full((n, 2), 0.2)}
        real = jax.random.uniform(rng, (n, 64, 64, 4), minval=-1, maxval=1)

        @jax.jit
        def d_grad(d_params, fake_img, real_img):
            def loss_fn(p):
                dv = {'params': p}
                fl, _ = losses.d_forward(D, dv, fake_img, c, sched, cfg,
                                         patch_params=pp, camera_angles=cam.angles)
                rl, _ = losses.d_forward(D, dv, real_img, c, sched, cfg,
                                         patch_params=pp, camera_angles=cam.angles)
                return jnp.mean(jax.nn.softplus(fl)) + jnp.mean(jax.nn.softplus(-rl))
            return jax.grad(loss_fn)(d_params)
        t = timeit(d_grad, state.d_params, fake, real)
        print(f'D loss grad (Dmain core):             {t*1e3:8.1f} ms')


if __name__ == '__main__':
    main()
