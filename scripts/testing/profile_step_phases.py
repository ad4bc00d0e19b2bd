#!/usr/bin/env python
"""Phase decomposition of the Dmain cost on the local chip.

Isolates the fake-gen share of the D phase (the G forward inside d_loss
runs with NO gradient — ref loss.py Dmain does the same under no_grad):
  (a) d grad with in-loss fake generation       (the shipped path)
  (b) d grad with PRE-GENERATED fakes           (pure D cost)
  (a) - (b) = the forward-only render — the candidate for a fuller-bf16
  D-phase render (TODO #4) if it is a material share of the step.

Timing protocol: per-call pull of ONE scalar derived from the output
(block_until_ready alone returns early on tunneled rigs).
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
    from tdgp.training import losses
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import (create_train_state,
                                          _sample_gen_inputs)

    cfg = satellite_config(c_dim=0, resolution=256)
    n = int(os.environ.get('N', '16'))
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=500_000)
    rng = jax.random.PRNGKey(0)
    zd, cd, camd, condd = _sample_gen_inputs(rng, n, cfg, sched)
    g_vars = {'params': state.g_params, 'consts': state.g_consts,
              'ema': state.g_ema_coll}
    pres = cfg.generator.patch.resolution
    real = jnp.zeros((n, pres, pres, 4), jnp.float32)
    rpp = {'scales': jnp.full((n, 2), 0.5), 'offsets': jnp.full((n, 2), 0.2)}

    def gen_fakes(_):
        fake_out, fpp, cam_post, _ = losses.g_forward(
            G, g_vars, zd, cd, camd, condd, sched, rng, cfg)
        return (jax.lax.stop_gradient(fake_out.img),
                jax.lax.stop_gradient(cam_post.angles), fpp)

    def d_cost(d_params, fakes):
        fake_img, fake_angles, fpp = fakes
        d_vars = {'params': d_params}
        fake_logits, _ = losses.d_forward(
            D, d_vars, fake_img, cd, sched, cfg, patch_params=fpp,
            camera_angles=fake_angles)
        real_logits, _ = losses.d_forward(
            D, d_vars, real, cd, sched, cfg, patch_params=rpp,
            camera_angles=condd)
        return (jnp.mean(losses.adv_loss_d_fake(fake_logits, 'non_saturating', 10.0))
                + jnp.mean(losses.adv_loss_d_real(real_logits, 'non_saturating', 10.0)))

    def dmain_full(d_params):
        return d_cost(d_params, gen_fakes(None))

    t_fwd = timeit(jax.jit(gen_fakes), 0)
    print(f'fake-gen forward (G fwd, no grad): {t_fwd*1e3:8.1f} ms', flush=True)

    t_full = timeit(jax.jit(jax.grad(dmain_full)), state.d_params)
    print(f'Dmain grad incl. fake-gen:         {t_full*1e3:8.1f} ms', flush=True)

    fakes = jax.jit(gen_fakes)(0)
    t_d = timeit(jax.jit(jax.grad(d_cost)), state.d_params, fakes)
    print(f'Dmain grad, pre-generated fakes:   {t_d*1e3:8.1f} ms', flush=True)
    print(f'=> fake-gen share inside Dmain:    {(t_full-t_d)*1e3:8.1f} ms '
          f'(standalone fwd {t_fwd*1e3:.1f} ms)', flush=True)

    # bf16-view fake render (training.dmain_fake_bf16)
    import dataclasses
    from tdgp.models.epigraf import Generator
    G_bf = Generator(dataclasses.replace(
        cfg.generator, render_bf16=True, fp32_only=False, num_fp16_res=16))

    def gen_fakes_bf16(_):
        fake_out, fpp, cam_post, _ = losses.g_forward(
            G_bf, g_vars, zd, cd, camd, condd, sched, rng, cfg)
        return (jax.lax.stop_gradient(fake_out.img).astype(jnp.float32),
                jax.lax.stop_gradient(cam_post.angles), fpp)

    t_bf = timeit(jax.jit(gen_fakes_bf16), 0)
    print(f'fake-gen forward, bf16 view:       {t_bf*1e3:8.1f} ms '
          f'(vs fp32 {t_fwd*1e3:.1f})', flush=True)


if __name__ == '__main__':
    main()
