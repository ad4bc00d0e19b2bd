"""Optional training paths: ADA augmentation in-step, PL regularization,
style mixing."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import tiny_test_config
from tdgp.training.schedules import compute_schedules
from tdgp.training.train_step import create_train_state, make_jitted_train_steps
from tests.test_train_step import make_batch

CFG = tiny_test_config()


def test_augment_pipe_shapes_and_identity_at_p0():
    from tdgp.training.augment import AugmentPipe
    cfg = CFG.training.augment
    pipe = AugmentPipe(cfg, num_color_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    out0 = pipe(x, jnp.asarray(0.0), jax.random.PRNGKey(1))
    assert out0.shape == x.shape
    # p=0 -> all transforms gated off -> identity up to resampling error
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=5e-2)
    out1 = pipe(x, jnp.asarray(1.0), jax.random.PRNGKey(1))
    assert out1.shape == x.shape
    assert np.mean(np.abs(np.asarray(out1) - np.asarray(x))) > 0.05
    assert np.all(np.isfinite(np.asarray(out1)))


def test_augment_depth_channel_untouched_by_color():
    from tdgp.config import AugmentCfg
    from tdgp.training.augment import AugmentPipe
    # color-only pipeline (no geometric) -> depth channel must be identical
    cfg = AugmentCfg(xflip=0, rotate90=0, xint=0, scale=0, rotate=0, aniso=0,
                     xfrac=0, brightness=1, contrast=1, lumaflip=1, hue=1,
                     saturation=1)
    pipe = AugmentPipe(cfg, num_color_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    out = pipe(x, jnp.asarray(1.0), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(x[..., 3]),
                               atol=1e-5)
    assert np.mean(np.abs(np.asarray(out[..., :3]) - np.asarray(x[..., :3]))) > 0.05


def test_train_step_with_ada_and_pl():
    training = dataclasses.replace(
        CFG.training, augment=dataclasses.replace(CFG.training.augment, mode='ada'))
    loss = dataclasses.replace(CFG.loss, pl_weight=2.0, style_mixing_prob=0.5)
    cfg = dataclasses.replace(CFG, training=training, loss=loss)

    state, G, D = create_train_state(cfg, seed=0, local_batch=4)
    _, step_r1 = make_jitted_train_steps(cfg, G, D)
    batch = make_batch(jax.random.PRNGKey(0), 4)
    sched = compute_schedules(cfg, cur_nimg=0, ada_p=0.3)
    state1, stats = step_r1(state, batch, jax.random.PRNGKey(1), sched)
    assert 'Loss/pl_penalty' in stats
    for k, v in stats.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert float(state1.pl_mean) != 0.0


def test_grad_accumulation_microbatching():
    """batch_gpu microbatching (ref train.py:169, training_loop.py:329-330):
    the step must run with n_micro > 1, keep mbstd grouping identical to the
    full-batch layout, and produce finite stats + updated params."""
    import dataclasses

    import jax
    import numpy as np

    from tdgp.config import tiny_test_config
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import create_train_state, make_jitted_train_steps
    from tests.test_train_step import make_batch  # reuse fixture helper

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, batch_gpu=2))
    n = 4  # -> 2 microbatches of 2 (mbstd_group_size=2 divides)
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    step_plain, step_r1 = make_jitted_train_steps(cfg, G, D)
    batch = make_batch(jax.random.PRNGKey(0), n)
    sched = compute_schedules(cfg, cur_nimg=0)

    state2, stats = step_r1(state, batch, jax.random.PRNGKey(1), sched)
    for k, v in stats.items():
        assert np.isfinite(float(np.asarray(v))), k
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).sum()),
                     state.g_params, state2.g_params))
    assert delta > 0


def test_custom_camera_distribution():
    """'custom' camera dist (ref rendering_utils.py:187 + training_loop.py:305-312):
    gen cameras use dataset-sampled angles delivered through the batch."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from tdgp.config import tiny_test_config
    from tdgp.rendering.camera import sample_camera_angles
    from tdgp.training.loop import with_gen_conditioning
    from tdgp.training.schedules import compute_schedules
    from tdgp.training.train_step import create_train_state, make_jitted_train_steps
    from tests.test_train_step import make_batch

    cfg = tiny_test_config()
    angles = dataclasses.replace(cfg.camera.origin.angles, dist='custom')
    origin = dataclasses.replace(cfg.camera.origin, angles=angles)
    camera = dataclasses.replace(cfg.camera, origin=origin)
    # force-mean reg needs analytic mean angles -> undefined for 'custom'
    # (ref rendering_utils.py get_mean_angles_values raises too)
    cfg = dataclasses.replace(
        cfg, camera=camera,
        generator=dataclasses.replace(cfg.generator, camera=camera),
        training=dataclasses.replace(cfg.training, learn_camera_dist=False))

    # drawing angles without dataset angles must fail loudly
    with _pytest.raises(ValueError, match='custom'):
        sample_camera_angles(jax.random.PRNGKey(0), 
                             {'dist': 'custom', 'yaw': {}, 'pitch': {}}, 4)

    n = 4
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    step_plain, _ = make_jitted_train_steps(cfg, G, D)
    batch = make_batch(jax.random.PRNGKey(0), n)

    # the gen-conditioning wrapper supplies the angles from a dataset
    class FakeDataset:
        def __len__(self):
            return 7

        def get_label(self, i):
            lab = np.zeros(cfg.dataset.c_dim, np.float32)
            lab[i % cfg.dataset.c_dim] = 1
            return lab

        def get_camera_angles(self, i):
            return np.array([0.1 * i, np.pi / 2, 0.0], np.float32)

    it = with_gen_conditioning(iter([dict(batch)]), FakeDataset(), cfg)
    batch2 = next(it)
    assert 'gen_camera_angles_g' in batch2 and 'gen_c_d' in batch2

    sched = compute_schedules(cfg, cur_nimg=0)
    state2, stats = step_plain(state, batch2, jax.random.PRNGKey(1), sched)
    for k, v in stats.items():
        assert np.isfinite(float(np.asarray(v))), k


def test_augment_imgfilter_noise_cutout():
    """The three strength-0-in-shipped-configs modes (ref augment.py:385-442):
    imgfilter's band sum is a perfect-reconstruction delta at p=0, cutout
    zeroes a block, noise adds variance."""
    import dataclasses as dc
    from tdgp.config import AugmentCfg
    from tdgp.training.augment import AugmentPipe, _build_fbank

    # QMF perfect reconstruction: the 4 bands sum to (approximately) a delta
    fbank = _build_fbank()
    s = fbank.sum(axis=0)
    assert abs(s[s.shape[0] // 2] - 1.0) < 1e-5
    assert np.abs(np.delete(s, s.shape[0] // 2)).max() < 1e-5

    base = AugmentCfg(xflip=0, rotate90=0, xint=0, scale=0, rotate=0, aniso=0,
                      xfrac=0, brightness=0, contrast=0, lumaflip=0, hue=0,
                      saturation=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))

    # imgfilter: identity at p=0, structure-preserving but changed at p=1
    pipe = AugmentPipe(dc.replace(base, imgfilter=1.0), num_color_channels=3)
    out0 = pipe(x, jnp.asarray(0.0), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=5e-2)
    out1 = pipe(x, jnp.asarray(1.0), jax.random.PRNGKey(1))
    assert out1.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out1)))
    assert np.mean(np.abs(np.asarray(out1) - np.asarray(x))) > 1e-3

    # noise: variance increases
    pipe = AugmentPipe(dc.replace(base, noise=1.0), num_color_channels=3)
    outn = pipe(x, jnp.asarray(1.0), jax.random.PRNGKey(2))
    assert np.var(np.asarray(outn)) > np.var(np.asarray(x)) * 0.99
    assert np.mean(np.abs(np.asarray(outn) - np.asarray(x))) > 1e-3

    # cutout: zeroes a centered-size-0.5 block across all channels
    pipe = AugmentPipe(dc.replace(base, cutout=1.0), num_color_channels=3)
    outc = pipe(x, jnp.asarray(1.0), jax.random.PRNGKey(3))
    zero_frac = np.mean(np.asarray(outc) == 0.0)
    assert 0.01 < zero_frac < 0.5  # ~ (0.5^2) minus boundary clipping
    # zeroed positions agree across channels
    zc = np.asarray(outc == 0).reshape(4, 16, 16, 4)
    assert np.all(zc.any(-1) == zc.all(-1))
