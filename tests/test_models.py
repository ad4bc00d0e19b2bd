"""Model-level tests: shapes, init sanity, EMA buffers, grads (SURVEY.md §4 item (c))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import tiny_test_config
from tdgp.models import (Generator, Discriminator, MappingNetwork, StyleGAN2Generator,
                         CameraAdaptor, DepthAdaptor)
from tdgp.models.stylegan2 import sg2_num_ws
from tdgp.rendering import sample_camera_params
from tdgp.training.patch import sample_patch_params, extract_patches
from tdgp.config import asdict

CFG = tiny_test_config()
KEY = jax.random.PRNGKey(0)


def init_rngs():
    return {'params': jax.random.PRNGKey(1), 'noise': jax.random.PRNGKey(2),
            'render': jax.random.PRNGKey(3), 'depth': jax.random.PRNGKey(4),
            'dropout': jax.random.PRNGKey(5)}


def make_inputs(n=4):
    gc = CFG.generator
    z = jax.random.normal(KEY, (n, gc.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % gc.c_dim, gc.c_dim)
    cam = sample_camera_params(KEY, asdict(CFG.camera), n)
    return z, c, cam


def test_num_ws_matches_reference_formula():
    # 512-res tri-plane decoder: blocks at 4..512 -> 1 + 2*7 convs + 1 torgb = 16
    assert sg2_num_ws(0, 512) == 16
    assert sg2_num_ws(0, 32) == 1 + 2 * 3 + 1


def test_generator_forward_shapes():
    n = 4
    z, c, cam = make_inputs(n)
    g = Generator(CFG.generator)
    variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                       train=True, concat_depth=True, return_depth=True)
    out = g.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                  train=True, concat_depth=True, return_depth=True,
                  rngs=init_rngs(), mutable=['ema'])[0]
    patch_res = CFG.generator.patch.resolution
    assert out.img.shape == (n, patch_res, patch_res, 4)  # rgb + adapted depth
    assert out.depth.shape == (n, patch_res, patch_res, 1)
    assert np.all(np.isfinite(np.asarray(out.img)))


def test_generator_eval_full_resolution():
    n = 2
    z, c, cam = make_inputs(n)
    g = Generator(CFG.generator)
    variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles, train=True)
    img = g.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                  train=False, noise_mode='const')
    res = CFG.generator.img_resolution
    assert img.shape == (n, res, res, 3)


def test_generator_ray_chunk_matches_unchunked():
    n = 1
    z, c, cam = make_inputs(n)
    g = Generator(CFG.generator)
    variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles, train=True)
    img_full = g.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                       train=False, noise_mode='const')
    img_chunk = g.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                        train=False, noise_mode='const', ray_chunk=1024)
    np.testing.assert_allclose(np.asarray(img_full), np.asarray(img_chunk),
                               rtol=1e-4, atol=1e-4)


def test_mapping_ema_updates():
    m = MappingNetwork(z_dim=16, c_dim=0, w_dim=16, num_ws=4, num_layers=2)
    z = jax.random.normal(KEY, (8, 16))
    variables = m.init({'params': KEY}, z, None)
    assert float(jnp.sum(jnp.abs(variables['ema']['w_avg']))) == 0.0
    _, updated = m.apply(variables, z, None, update_emas=True, mutable=['ema'])
    assert float(jnp.sum(jnp.abs(updated['ema']['w_avg']))) > 0.0


def test_discriminator_forward():
    n = 4
    d = Discriminator(CFG.discriminator)
    res = CFG.discriminator.input_resolution
    img = jax.random.normal(KEY, (n, res, res, 4))
    c = jax.nn.one_hot(jnp.arange(n) % 4, 4)
    patch_params = sample_patch_params(KEY, n, CFG.generator.patch, min_scale=0.25)
    cam_angles = jnp.zeros((n, 3))
    variables = d.init({'params': KEY}, img, c, patch_params=patch_params,
                       camera_angles=cam_angles, predict_feat=True)
    logits, feats = d.apply(variables, img, c, patch_params=patch_params,
                            camera_angles=cam_angles, predict_feat=True)
    assert logits.shape == (n,)
    assert feats.shape == (n, CFG.discriminator.embedding_dim)
    logits2, feats2 = d.apply(variables, img, c, patch_params=patch_params,
                              camera_angles=cam_angles, predict_feat=False)
    assert feats2 is None


def test_discriminator_grad_wrt_input_finite():
    n = 2
    cfg = CFG.discriminator
    d = Discriminator(cfg)
    res = cfg.input_resolution
    img = jax.random.normal(KEY, (n, res, res, 4))
    c = jax.nn.one_hot(jnp.arange(n) % 4, 4)
    pp = sample_patch_params(KEY, n, CFG.generator.patch, min_scale=0.25)
    variables = d.init({'params': KEY}, img, c, patch_params=pp,
                       camera_angles=jnp.zeros((n, 3)))

    def f(im):
        logits, _ = d.apply(variables, im, c, patch_params=pp,
                            camera_angles=jnp.zeros((n, 3)))
        return jnp.sum(logits)

    g = jax.grad(f)(img)
    assert np.all(np.isfinite(np.asarray(g)))
    # r1-style double grad
    r1 = jax.grad(lambda im: jnp.sum(jax.grad(f)(im) ** 2))(img)
    assert np.all(np.isfinite(np.asarray(r1)))


def test_camera_adaptor_respects_bounds_and_adjust_flags():
    n = 16
    cfg = CFG.generator.camera_adaptor
    ca = CameraAdaptor(cfg, CFG.camera)
    cam = sample_camera_params(KEY, asdict(CFG.camera), n)
    z = jax.random.normal(KEY, (n, cfg.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % cfg.c_dim, cfg.c_dim)
    variables = ca.init({'params': KEY}, cam, z, c)
    out = ca.apply(variables, cam, z, c)
    a = np.asarray(out.angles)
    assert a[:, 0].min() >= CFG.camera.origin.angles.yaw.min - 1e-5
    assert a[:, 0].max() <= CFG.camera.origin.angles.yaw.max + 1e-5
    assert np.all(a[:, 2] == 0.0)  # roll forced to zero
    f = np.asarray(out.fov)
    assert f.min() >= CFG.camera.fov.min and f.max() <= CFG.camera.fov.max
    # adjust.radius=False -> radius must equal the prior
    np.testing.assert_allclose(np.asarray(out.radius), np.asarray(cam.radius), atol=1e-6)


def test_depth_adaptor_shapes_and_strategies():
    n, res = 4, 16
    cfg = CFG.generator.depth_adaptor
    depth = jax.random.uniform(KEY, (n, res, res, 1), minval=0.75, maxval=1.25)
    w = jax.random.normal(KEY, (n, 8))
    da = DepthAdaptor(cfg, min_depth=0.75, max_depth=1.25)
    variables = da.init({'params': KEY, 'depth': KEY}, depth, w, train=True)
    out_train = da.apply(variables, depth, w, progress=0.5, train=True,
                         rngs={'depth': KEY})
    out_eval = da.apply(variables, depth, w, train=False)
    assert out_train.shape == (n, res, res, 1)
    assert out_eval.shape == (n, res, res, 1)


def test_stylegan2_baseline_generator():
    g = StyleGAN2Generator(z_dim=32, c_dim=0, w_dim=32, img_resolution=32,
                           cbase=1024, cmax=64, fp32_only=True)
    z = jax.random.normal(KEY, (2, 32))
    variables = g.init(init_rngs(), z, None)
    img = g.apply(variables, z, None, rngs={'noise': KEY}, mutable=['ema'])[0]
    assert img.shape == (2, 32, 32, 3)


def test_extract_patches_identity_when_full_scale():
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    pp = {'scales': jnp.ones((2, 2)), 'offsets': jnp.zeros((2, 2))}
    out = extract_patches(x, pp, resolution=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_patch_params_group_replication():
    pp = sample_patch_params(KEY, 8, CFG.generator.patch, min_scale=0.25, beta=0.5)
    s = np.asarray(pp['scales'])
    assert s.shape == (8, 2)
    # mbstd_group_size=2 -> pairs share scales
    np.testing.assert_allclose(s[0::2], s[1::2])
    assert s.min() >= 0.25 - 1e-6 and s.max() <= 1.0 + 1e-6
    o = np.asarray(pp['offsets'])
    assert np.all(o >= 0) and np.all(o <= 1 - s + 1e-6)


def test_generator_fused_ray_march_matches_jnp():
    """Full-G parity between the jnp marcher and the fused Pallas marcher
    (interpret mode off-TPU) — the training path default on TPU."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu
    n = 2
    z, c, cam = make_inputs(n)
    g_jnp = Generator(dataclasses.replace(CFG.generator, ray_march_impl='jnp'))
    g_fused = Generator(dataclasses.replace(CFG.generator, ray_march_impl='fused'))
    variables = g_jnp.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                           train=True)
    img_ref = g_jnp.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                          train=False, noise_mode='const')
    if jax.devices()[0].platform != 'tpu':
        with pltpu.force_tpu_interpret_mode():
            img_fused = g_fused.apply(variables, z, c, cam,
                                      camera_angles_cond=cam.angles,
                                      train=False, noise_mode='const')
    else:
        img_fused = g_fused.apply(variables, z, c, cam,
                                  camera_angles_cond=cam.angles,
                                  train=False, noise_mode='const')
    np.testing.assert_allclose(np.asarray(img_fused), np.asarray(img_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('pack,save,tol', [
    ('quad', 'save_f32', 1e-4),          # exact-path wiring
    ('quad_bf16', 'save_bf16', 2e-2),    # the shipped TPU defaults
])
def test_generator_fused_sampling_path_matches_jnp(pack, save, tol):
    """Full-G gradient parity between the jnp sampling path and the
    PRODUCTION TPU path (plane_sample_impl fused + hoisted stop-grad quad
    table + Pallas splat plane-VJP, interpret mode off-TPU) — pins the
    epigraf.py wiring (hoisted build, remat interplay, residual save), not
    just the op-level custom VJP (tests/test_splat.py)."""
    import dataclasses

    z, c, cam = make_inputs(2)
    # fused requires plane W % 128 == 0 (splat window layout)
    tri = dataclasses.replace(CFG.generator.tri_plane, res=128)

    def g_loss_grads(cfg_gen):
        g = Generator(cfg_gen)
        variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                           train=True)

        def loss(params):
            v = {**variables, 'params': params}
            img = g.apply(v, z, c, cam, camera_angles_cond=cam.angles,
                          train=True, rngs=init_rngs(), mutable=['ema'])[0]
            return jnp.mean(img ** 2)

        return jax.grad(loss)(variables['params'])

    base = dataclasses.replace(CFG.generator, tri_plane=tri,
                               plane_sample_impl='jnp', sample_save='remat')
    fused = dataclasses.replace(CFG.generator, tri_plane=tri,
                                plane_sample_impl='fused_interpret',
                                plane_pack=pack, sample_save=save)
    g_ref = g_loss_grads(base)
    g_new = g_loss_grads(fused)
    flat_r = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ref)])
    flat_n = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_new)])
    err = float(jnp.linalg.norm(flat_n - flat_r)
                / (jnp.linalg.norm(flat_r) + 1e-12))
    assert err < tol, err


@pytest.mark.parametrize('save_mode', ['save_f32', 'save_bf16'])
def test_generator_sample_save_modes_match_remat(save_mode):
    """sample_save moves the plane gather outside the remat region; loss
    gradients must match the in-remat configuration (exactly for f32
    residuals; near-exactly for bf16, which only touches d/d coords)."""
    import dataclasses

    z, c, cam = make_inputs(2)

    def g_loss_grads(cfg_gen):
        g = Generator(cfg_gen)
        variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                           train=True)

        def loss(params):
            v = {**variables, 'params': params}
            img = g.apply(v, z, c, cam, camera_angles_cond=cam.angles,
                          train=True, rngs=init_rngs(), mutable=['ema'])[0]
            return jnp.mean(img ** 2)

        return jax.grad(loss)(variables['params'])

    base = dataclasses.replace(CFG.generator, sample_save='remat')
    mode = dataclasses.replace(CFG.generator, sample_save=save_mode)
    g_ref = g_loss_grads(base)
    g_new = g_loss_grads(mode)
    flat_r = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ref)])
    flat_n = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_new)])
    tol = 1e-6 if save_mode == 'save_f32' else 2e-3
    err = float(jnp.linalg.norm(flat_n - flat_r)
                / (jnp.linalg.norm(flat_r) + 1e-12))
    assert err < tol, err


def test_generator_render_bf16_fused_forward():
    """render_bf16 (the Dmain fake-render precision view) through the
    PRODUCTION fused sampling path: bf16 planes/table/feats, fp32 coords.
    Forward-only (the Dmain phase differentiates nothing through G)."""
    import dataclasses

    z, c, cam = make_inputs(2)
    tri = dataclasses.replace(CFG.generator.tri_plane, res=128)
    base = dataclasses.replace(CFG.generator, tri_plane=tri,
                               plane_sample_impl='jnp', sample_save='remat')
    bf = dataclasses.replace(CFG.generator, tri_plane=tri,
                             plane_sample_impl='fused_interpret',
                             plane_pack='quad_bf16', sample_save='save_bf16',
                             render_bf16=True)
    g_ref = Generator(base)
    variables = g_ref.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                           train=True)
    img_ref = g_ref.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                          train=False, noise_mode='const')
    g_bf = Generator(bf)
    img_bf = g_bf.apply(variables, z, c, cam, camera_angles_cond=cam.angles,
                        train=False, noise_mode='const')
    assert img_bf.dtype == img_ref.dtype
    diff = np.abs(np.asarray(img_bf) - np.asarray(img_ref))
    assert np.mean(diff) < 0.05, np.mean(diff)
    assert np.max(diff) < 0.5, np.max(diff)


@pytest.mark.parametrize('pack', ['quad', 'quad_bf16'])
def test_generator_merged_splat_matches_unmerged(pack):
    """generator.merged_splat merges the coarse+fine backward splats into
    one window table via the pair ops' token channel (ops/splat.py) — a
    pure reassociation: loss gradients must match the unmerged fused path."""
    import dataclasses

    z, c, cam = make_inputs(2)
    tri = dataclasses.replace(CFG.generator.tri_plane, res=128)

    def g_loss_grads(cfg_gen):
        g = Generator(cfg_gen)
        variables = g.init(init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                           train=True)

        def loss(params):
            v = {**variables, 'params': params}
            img = g.apply(v, z, c, cam, camera_angles_cond=cam.angles,
                          train=True, rngs=init_rngs(), mutable=['ema'])[0]
            return jnp.mean(img ** 2)

        return jax.grad(loss)(variables['params'])

    save = 'save_bf16' if pack.endswith('_bf16') else 'save_f32'
    unmerged = dataclasses.replace(CFG.generator, tri_plane=tri,
                                   plane_sample_impl='fused_interpret',
                                   plane_pack=pack, sample_save=save)
    merged = dataclasses.replace(unmerged, merged_splat=True)
    g_ref = g_loss_grads(unmerged)
    g_new = g_loss_grads(merged)
    flat_r = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ref)])
    flat_n = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_new)])
    err = float(jnp.linalg.norm(flat_n - flat_r)
                / (jnp.linalg.norm(flat_r) + 1e-12))
    assert err < 5e-5, err
