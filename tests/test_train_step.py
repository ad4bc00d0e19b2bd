"""End-to-end train-step tests on the tiny config (SURVEY.md §4 items (c)+(d))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import tiny_test_config
from tdgp.training.schedules import compute_schedules
from tdgp.training.train_step import (create_train_state, make_jitted_train_steps,
                                      make_train_step)

CFG = tiny_test_config()


def make_batch(key, n):
    res = CFG.dataset.resolution
    ks = jax.random.split(key, 4)
    return {
        'img': jax.random.uniform(ks[0], (n, res, res, 3), minval=-1, maxval=1),
        'depth': jax.random.uniform(ks[1], (n, res, res, 1), minval=-1, maxval=1),
        'c': jax.nn.one_hot(jnp.arange(n) % CFG.dataset.c_dim, CFG.dataset.c_dim),
        'camera_angles': jnp.concatenate([
            jax.random.uniform(ks[2], (n, 2), minval=0.5, maxval=1.5),
            jnp.zeros((n, 1))], axis=1),
        'embs': jax.random.normal(ks[3], (n, CFG.dataset.embedding_dim)),
    }


@pytest.fixture(scope='module')
def state_and_models():
    return create_train_state(CFG, seed=0, local_batch=4)


def test_single_device_steps(state_and_models):
    state, G, D = state_and_models
    step_plain, step_r1 = make_jitted_train_steps(CFG, G, D)
    batch = make_batch(jax.random.PRNGKey(0), 4)
    sched = compute_schedules(CFG, cur_nimg=0)

    d_before = jax.tree.leaves(state.d_params)[0].copy()
    g_before = jax.tree.leaves(state.g_params)[0].copy()

    state1, stats1 = step_plain(state, batch, jax.random.PRNGKey(1), sched)
    assert int(state1.step) == 1
    for k, v in stats1.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert not np.allclose(jax.tree.leaves(state1.g_params)[0], g_before)
    assert not np.allclose(jax.tree.leaves(state1.d_params)[0], d_before)

    state2, stats2 = step_r1(state1, batch, jax.random.PRNGKey(2), sched)
    assert 'Loss/D/r1_penalty' in stats2
    assert np.isfinite(float(stats2['Loss/D/r1_penalty']))

    # EMA moved toward params (beta < 1 at nimg=0 due to rampup -> beta=0 -> ema == params)
    sched0 = compute_schedules(CFG, cur_nimg=0)
    assert float(sched0.ema_beta) == 0.0
    np.testing.assert_allclose(jax.tree.leaves(state1.ema_params)[0],
                               jax.tree.leaves(state1.g_params)[0])
    # w_avg EMA buffer updated
    w_avg = state2.g_ema_coll['mapping']['w_avg']
    assert float(jnp.sum(jnp.abs(w_avg))) > 0.0


def test_multichip_mesh_step(state_and_models):
    state, G, D = state_and_models
    # the mesh step donates its state arg — donate a copy, not the
    # module-scoped fixture (later tests reuse it)
    state = jax.tree.map(jnp.copy, state)
    devices = jax.devices()
    assert len(devices) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = jax.sharding.Mesh(np.asarray(devices), ('data',))
    step_plain, _ = make_jitted_train_steps(CFG, G, D, mesh=mesh)
    # global batch 16 -> 2 per device (mbstd_group_size=2)
    batch = make_batch(jax.random.PRNGKey(0), 16)
    sched = compute_schedules(CFG, cur_nimg=0)
    state1, stats = step_plain(state, batch, jax.random.PRNGKey(1), sched)
    for k, v in stats.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # params stay replicated-consistent: fetch from two device shards
    p = jax.tree.leaves(state1.g_params)[0]
    assert np.all(np.isfinite(np.asarray(p)))


def test_schedules_values():
    s0 = compute_schedules(CFG, cur_nimg=0)
    assert float(s0.blur_sigma) == CFG.loss.blur_init_sigma
    assert float(s0.gpc_spoof_p) == 1.0
    s_end = compute_schedules(CFG, cur_nimg=25_000_000)
    assert float(s_end.blur_sigma) == 0.0
    assert float(s_end.nerf_noise_std) == 0.0
    assert abs(float(s_end.gpc_spoof_p) - CFG.generator.camera_cond_spoof_p) < 1e-6


def test_dmain_fake_bf16(state_and_models):
    """training.dmain_fake_bf16: the bf16-view fake render matches the fp32
    render loosely, Gmain is bit-identical (the flag touches only Dmain),
    and the step stays finite."""
    import dataclasses

    from tdgp.training import losses

    state, G, D = state_and_models
    cfg_bf = dataclasses.replace(
        CFG, training=dataclasses.replace(CFG.training, dmain_fake_bf16=True))
    batch = make_batch(jax.random.PRNGKey(0), 4)
    sched = compute_schedules(CFG, cur_nimg=0)

    # --- forward parity of the bf16 generator view (same params)
    from tdgp.models.epigraf import Generator
    G_bf = Generator(dataclasses.replace(
        CFG.generator, render_bf16=True, fp32_only=False, num_fp16_res=16))
    g_vars = {'params': state.g_params, 'consts': state.g_consts,
              'ema': state.g_ema_coll}
    from tdgp.rendering.camera import sample_camera_params
    from tdgp.config import asdict
    n = 4
    z = jax.random.normal(jax.random.PRNGKey(3), (n, CFG.generator.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % CFG.generator.c_dim, CFG.generator.c_dim)
    cam = sample_camera_params(jax.random.PRNGKey(4), asdict(CFG.camera), n)
    rng = jax.random.PRNGKey(5)
    out32, _, _, _ = losses.g_forward(G, g_vars, z, c, cam, cam.angles,
                                      sched, rng, CFG)
    out16, _, _, _ = losses.g_forward(G_bf, g_vars, z, c, cam, cam.angles,
                                      sched, rng, CFG)
    assert out16.img.dtype == out32.img.dtype  # render output stays fp32-ish
    diff = np.abs(np.asarray(out32.img) - np.asarray(out16.img))
    assert np.mean(diff) < 0.05, f"mean diff {np.mean(diff)}"
    assert np.max(diff) < 0.5, f"max diff {np.max(diff)}"

    # --- full step: finite, and Gmain stats identical to the fp32-flag step
    step32, _ = make_jitted_train_steps(CFG, G, D)
    step16, _ = make_jitted_train_steps(cfg_bf, G, D)
    _, stats32 = step32(state, batch, jax.random.PRNGKey(1), sched)
    state16, stats16 = step16(state, batch, jax.random.PRNGKey(1), sched)
    for k, v in stats16.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    np.testing.assert_allclose(float(stats16['Loss/G/loss']),
                               float(stats32['Loss/G/loss']), rtol=1e-5)
    # D still learns against the bf16 fakes
    assert np.isfinite(float(stats16['Loss/D/loss']))
    assert not np.allclose(jax.tree.leaves(state16.d_params)[0],
                           jax.tree.leaves(state.d_params)[0])


def test_dmain_reuse_fakes(state_and_models):
    """training.dmain_reuse_fakes: Dmain trains D against Gmain's rendered
    fakes — no second G render. Covers both the plain and the microbatched
    ('_collect' scan stacking) paths."""
    import dataclasses

    state, G, D = state_and_models
    batch = make_batch(jax.random.PRNGKey(0), 4)
    sched = compute_schedules(CFG, cur_nimg=0)

    for bg in (None, 2):  # plain / 2 microbatches
        cfg_r = dataclasses.replace(
            CFG, training=dataclasses.replace(
                CFG.training, dmain_reuse_fakes=True, batch_gpu=bg))
        step, step_r1 = make_jitted_train_steps(cfg_r, G, D)
        state1, stats = step(state, batch, jax.random.PRNGKey(1), sched)
        for k, v in stats.items():
            assert np.isfinite(float(v)), f"bg={bg}: {k} not finite"
        assert not np.allclose(jax.tree.leaves(state1.d_params)[0],
                               jax.tree.leaves(state.d_params)[0])
        # Gmain untouched by the flag: same G loss as the reference step
        step0, _ = make_jitted_train_steps(
            dataclasses.replace(CFG, training=dataclasses.replace(
                CFG.training, batch_gpu=bg)), G, D)
        _, stats0 = step0(state, batch, jax.random.PRNGKey(1), sched)
        np.testing.assert_allclose(float(stats['Loss/G/loss']),
                                   float(stats0['Loss/G/loss']), rtol=1e-5)
    # r1 variant compiles and runs too
    state2, stats2 = step_r1(state1, batch, jax.random.PRNGKey(2), sched)
    assert np.isfinite(float(stats2['Loss/D/r1_penalty']))


def test_gmain_render_bf16(state_and_models):
    """training.gmain_render_bf16: the DIFFERENTIATED Gmain render runs
    through a render_bf16 view — the step stays finite, G still learns, and
    the G loss tracks the fp32 step loosely (bf16 streams shift the forward
    by rounding only)."""
    import dataclasses

    state, G, D = state_and_models
    cfg_bf = dataclasses.replace(
        CFG, training=dataclasses.replace(CFG.training, gmain_render_bf16=True))
    batch = make_batch(jax.random.PRNGKey(0), 4)
    sched = compute_schedules(CFG, cur_nimg=0)

    step32, _ = make_jitted_train_steps(CFG, G, D)
    step16, _ = make_jitted_train_steps(cfg_bf, G, D)
    _, stats32 = step32(state, batch, jax.random.PRNGKey(1), sched)
    state16, stats16 = step16(state, batch, jax.random.PRNGKey(1), sched)
    for k, v in stats16.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # G params moved (gradients flowed through the bf16 streams)
    assert not np.allclose(jax.tree.leaves(state16.g_params)[0],
                           jax.tree.leaves(state.g_params)[0])
    # forward shift is rounding-scale, not structural
    assert abs(float(stats16['Loss/G/loss']) - float(stats32['Loss/G/loss'])) \
        < 0.25 + 0.05 * abs(float(stats32['Loss/G/loss']))
