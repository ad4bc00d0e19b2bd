#!/usr/bin/env python
"""Decompose the reuse-fakes train step at batch N (default 16) on-chip.

With training.dmain_reuse_fakes the step is ONE differentiated render
(Gmain) + a D grad over reused fakes + reals + optimizer updates. This
profiler times each block in isolation so the next perf lever targets the
actual residual (round-4 ledger; the 9.76 imgs/s step == 1.64 s at b16):

  g_fwd      G forward only (render, no grad)      — fwd share of Gmain
  g_grad     grad of adv G loss (render + D fwd)   — the Gmain block
  d_grad     D grad with PRE-generated fakes       — the Dmain block
  step       the shipped jitted step (reuse on)    — everything
  step_r1    the shipped r1 step                   — amortized 1/16 cadence

Timing: per-call scalar pull (ledger methodology — block_until_ready alone
returns early on tunneled rigs).
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
    import dataclasses

    from tdgp.config import satellite_config
    from tdgp.training import losses
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import (create_train_state,
                                          make_jitted_train_steps,
                                          _sample_gen_inputs)

    cfg = satellite_config(c_dim=0, resolution=256)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training,
                                          dmain_reuse_fakes=True))
    n = int(os.environ.get('N', '16'))
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    zg, cg, camg, condg = _sample_gen_inputs(rng, n, cfg, sched)
    g_vars = {'params': state.g_params, 'consts': state.g_consts,
              'ema': state.g_ema_coll}
    pres = cfg.generator.patch.resolution
    real = jnp.zeros((n, pres, pres, 4), jnp.float32)
    rpp = {'scales': jnp.full((n, 2), 0.5), 'offsets': jnp.full((n, 2), 0.2)}

    # ---- G forward only (the render) ----------------------------------
    def g_fwd(_):
        fake_out, fpp, cam_post, _ = losses.g_forward(
            G, g_vars, zg, cg, camg, condg, sched, rng, cfg)
        return (jax.lax.stop_gradient(fake_out.img),
                jax.lax.stop_gradient(cam_post.angles), fpp)

    t_gfwd = timeit(jax.jit(g_fwd), 0)
    print(f'g_fwd   (render fwd, no grad):     {t_gfwd*1e3:8.1f} ms',
          flush=True)

    # ---- Gmain grad (differentiated render + D fwd) --------------------
    def g_loss(g_params):
        gv = {'params': g_params, 'consts': state.g_consts,
              'ema': state.g_ema_coll}
        fake_out, fpp, cam_post, _ = losses.g_forward(
            G, gv, zg, cg, camg, condg, sched, rng, cfg)
        logits, _ = losses.d_forward(
            D, {'params': state.d_params}, fake_out.img, cg, sched, cfg,
            patch_params=fpp, camera_angles=cam_post.angles)
        return jnp.mean(losses.adv_loss_g(logits, 'non_saturating'))

    t_ggrad = timeit(jax.jit(jax.grad(g_loss)), state.g_params)
    print(f'g_grad  (Gmain block):             {t_ggrad*1e3:8.1f} ms '
          f'(bwd ~{(t_ggrad - t_gfwd)*1e3:.0f} ms)', flush=True)

    # ---- Dmain grad with pre-generated fakes ---------------------------
    fakes = jax.jit(g_fwd)(0)

    def d_cost(d_params, fk):
        fake_img, fake_angles, fpp = fk
        dv = {'params': d_params}
        fl, _ = losses.d_forward(D, dv, fake_img, cg, sched, cfg,
                                 patch_params=fpp, camera_angles=fake_angles)
        rl, _ = losses.d_forward(D, dv, real, cg, sched, cfg,
                                 patch_params=rpp, camera_angles=condg)
        return (jnp.mean(losses.adv_loss_d_fake(fl, 'non_saturating', 10.0))
                + jnp.mean(losses.adv_loss_d_real(rl, 'non_saturating', 10.0)))

    t_dgrad = timeit(jax.jit(jax.grad(d_cost)), state.d_params, fakes)
    print(f'd_grad  (Dmain block, fakes given):{t_dgrad*1e3:8.1f} ms',
          flush=True)

    # ---- the shipped step ----------------------------------------------
    from bench import make_batch
    step_plain, step_r1 = make_jitted_train_steps(cfg, G, D, donate=False)
    batch = make_batch(jax.random.PRNGKey(0), n, cfg.dataset.resolution,
                       cfg.dataset.c_dim, cfg.dataset.embedding_dim)

    def run_plain(s):
        s2, st = step_plain(s, batch, rng, sched)
        return st['Loss/G/loss']

    def run_r1(s):
        s2, st = step_r1(s, batch, rng, sched)
        return st['Loss/G/loss']

    t_step = timeit(run_plain, state)
    print(f'step    (shipped, reuse, no r1):   {t_step*1e3:8.1f} ms',
          flush=True)
    t_r1 = timeit(run_r1, state)
    print(f'step_r1 (shipped, reuse, +r1):     {t_r1*1e3:8.1f} ms',
          flush=True)
    resid = t_step - t_ggrad - t_dgrad
    print(f'=> residual (opt/EMA/stats/regs):  {resid*1e3:8.1f} ms',
          flush=True)
    cad = (15 * t_step + t_r1) / 16
    print(f'=> 15:1 cadence imgs/s @ b{n}:     {n/cad:8.2f}', flush=True)


if __name__ == '__main__':
    main()
