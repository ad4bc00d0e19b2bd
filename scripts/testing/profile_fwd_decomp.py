#!/usr/bin/env python
"""Decompose the FORWARD render at batch N (default 16) on-chip.

profile_reuse_phases measured the reuse step as 95% Gmain (fwd 645 ms +
bwd 913 ms at b16). This probe splits the 645 ms forward into its blocks
so the next lever targets the real residual:

  mapping        z->ws (+camera cond)
  decode         SG2 tri-plane decoder (512^2 planes)
  table          packed-table build (hoisted, once per step)
  gather1        ONE gather sweep over coarse-shaped coords
  gather_mlp1    gather + tri-plane MLP, one sweep (the fused fwd unit)
  splat1         ONE in-situ plane-gradient splat (the backward unit)
  render         the full two-pass importance render (synthesis minus
                 decoder/mapping/adaptors)
  g_fwd          whole G forward (profile_reuse_phases cross-check)

Timing: per-call scalar pull (ledger methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
from tdgp.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()
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
    from tdgp.models.epigraf import (flatten_planes, resolve_sample_impl,
                                     resolve_sample_save)
    from tdgp.ops.splat import build_sample_table, triplane_sample_hoisted
    from tdgp.training import losses
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import (create_train_state,
                                          _sample_gen_inputs)

    cfg = satellite_config(c_dim=0, resolution=256)
    # default b8: at b16 the probe itself OOMs — it must hold fp32 planes
    # (6.4 GB), the packed table AND a plane-cotangent copy live at once,
    # which the real step never does (XLA frees planes after the hoisted
    # table build; save_bf16 keeps the VJP off the planes). Ratios scale.
    n = int(os.environ.get('N', '8'))
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    z, c, cam, cond = _sample_gen_inputs(rng, n, cfg, sched)
    g_vars = {'params': state.g_params, 'consts': state.g_consts,
              'ema': state.g_ema_coll}
    gc = cfg.generator
    rngs = {'noise': rng, 'render': rng, 'depth': rng, 'dropout': rng}

    # ---- mapping ------------------------------------------------------
    def mapping(_):
        return G.apply(g_vars, method=lambda g: g.mapping(
            z, c, camera_angles=cond, train=True), rngs=rngs)

    ws = jax.jit(mapping)(0)
    t = timeit(jax.jit(mapping), 0)
    print(f'mapping     z->ws:                {t*1e3:8.1f} ms', flush=True)

    # ---- decoder ------------------------------------------------------
    def decode(_):
        return G.apply(g_vars, method=lambda g: g.synthesis.decode_planes(ws),
                       rngs=rngs)

    planes4 = jax.jit(decode)(0)
    t_dec = timeit(jax.jit(decode), 0)
    print(f'decode      SG2 tri-plane decoder:{t_dec*1e3:8.1f} ms', flush=True)

    planes = jax.jit(flatten_planes)(planes4)
    if gc.render_bf16:
        planes = planes.astype(jnp.bfloat16)
    jax.block_until_ready(planes)
    planes4.delete()  # free the duplicate [n3,512,512,32] fp32 copy
    impl = resolve_sample_impl(gc.plane_sample_impl, planes.shape[1],
                               planes.shape[2])
    save_mode = resolve_sample_save(gc.sample_save, impl)
    residual_dtype = 'bf16' if save_mode == 'save_bf16' else 'table'
    print(f'(impl={impl} save={save_mode} pack={gc.plane_pack} '
          f'planes {planes.shape} {planes.dtype})', flush=True)

    # ---- packed-table build -------------------------------------------
    tbl_fn = jax.jit(lambda p: build_sample_table(p, gc.plane_pack))
    table = tbl_fn(planes)
    t = timeit(tbl_fn, planes)
    print(f'table       packed build:         {t*1e3:8.1f} ms', flush=True)

    # ---- one gather sweep (coarse-shaped coords) -----------------------
    p_pts = (gc.patch.resolution ** 2) * gc.num_ray_steps
    coords = jax.random.uniform(jax.random.PRNGKey(1), (n, p_pts, 3),
                                minval=-0.45, maxval=0.45)
    pshape = tuple(planes.shape)

    def gather1(pl, tb, co):
        return triplane_sample_hoisted(pl, tb, co, gc.camera.cube_scale,
                                       pshape, gc.plane_pack, False,
                                       residual_dtype)

    g1 = jax.jit(gather1)
    t = timeit(g1, planes, table, coords)
    print(f'gather1     one sweep [{n},{p_pts}]: {t*1e3:8.1f} ms', flush=True)

    # ---- gather + MLP (the per-pass fwd unit) ---------------------------
    def gather_mlp(pl, tb, co):
        feats = gather1(pl, tb, co)
        if gc.render_bf16:
            feats = feats.astype(jnp.bfloat16)
        return G.apply(g_vars, method=lambda g: g.synthesis.tri_plane_mlp(feats))

    t = timeit(jax.jit(gather_mlp), planes, table, coords)
    print(f'gather_mlp1 one sweep + MLP:      {t*1e3:8.1f} ms', flush=True)

    # ---- one in-situ splat (plane-cotangent unit of the backward) ------
    def splat_loss(pl, tb, co):
        out = gather1(pl, tb, co)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    spl = jax.jit(jax.grad(splat_loss))
    t = timeit(spl, planes, table, coords)
    print(f'splat1      one plane-grad splat: {t*1e3:8.1f} ms', flush=True)

    # ---- full two-pass render (synthesis minus decoder/mapping) --------
    def g_fwd(_):
        fake_out, fpp, cam_post, _ = losses.g_forward(
            G, g_vars, z, c, cam, cond, sched, rng, cfg)
        return jax.lax.stop_gradient(fake_out.img)

    t_gf = timeit(jax.jit(g_fwd), 0)
    print(f'g_fwd       whole G forward:      {t_gf*1e3:8.1f} ms '
          f'(=> render-minus-decoder ~{(t_gf - t_dec)*1e3:.0f} ms)',
          flush=True)


if __name__ == '__main__':
    main()
