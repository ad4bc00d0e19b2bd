"""The 'custom' camera-angle distribution (dataset-driven angles) must not
crash telemetry or metric conditioning (round-2 advisor findings): the
reference feeds dataset angles wherever the prior would be sampled
(ref rendering_utils.py:187, metric_utils.py:85-90, training_loop.py:305-312).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import tiny_test_config, replace


def _custom_cfg():
    cfg = tiny_test_config()
    cam = dataclasses.replace(
        cfg.camera,
        origin=dataclasses.replace(
            cfg.camera.origin,
            angles=dataclasses.replace(cfg.camera.origin.angles, dist='custom')))
    gen = dataclasses.replace(cfg.generator, camera=cam)
    return dataclasses.replace(cfg, camera=cam, generator=gen)


class _FakeDataset:
    """get_label/get_camera_angles provider with recognizable angles."""

    def __len__(self):
        return 10

    def get_label(self, i):
        out = np.zeros(4, np.float32)
        out[i % 4] = 1
        return out

    def get_camera_angles(self, i):
        return np.array([0.1 * i, 1.2, 0.0], np.float32)


def test_posterior_fn_custom_dist_needs_angles():
    from tdgp.training.telemetry import (camera_posterior_report,
                                         make_camera_posterior_fn)
    from tdgp.training.train_step import create_train_state, g_variables

    cfg = _custom_cfg()
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    fn = make_camera_posterior_fn(G, cfg, num_samples=8)
    assert fn is not None
    rng = jax.random.PRNGKey(0)

    # no dataset angles -> report degrades to empty instead of raising
    assert camera_posterior_report(fn, g_variables(state), rng) == {}

    # with dataset angles (shorter than num_samples -> tiled) -> full report
    angles = np.stack([_FakeDataset().get_camera_angles(i) for i in range(3)])
    out = camera_posterior_report(fn, g_variables(state), rng,
                                  origin_angles=angles)
    assert 'Camera/posterior/yaw/mean' in out
    assert np.isfinite(out['Camera/posterior/yaw/mean'])


def test_iterate_random_conditioning_custom_dist():
    from tdgp.metrics.features import iterate_random_conditioning

    cfg = _custom_cfg()
    it = iterate_random_conditioning(cfg, _FakeDataset(), batch_size=4, seed=0)
    cond = next(it)
    angles = np.asarray(cond['camera_params'].angles)
    assert angles.shape == (4, 3)
    # dataset angles: yaw is 0.1*i for i in [0, 10), pitch exactly 1.2
    np.testing.assert_allclose(angles[:, 1], 1.2, rtol=1e-6)
    assert np.all(np.isin(np.round(angles[:, 0] / 0.1).astype(int),
                          np.arange(10)))

    with pytest.raises(ValueError, match='custom'):
        next(iterate_random_conditioning(cfg, None, batch_size=4))


def test_noncustom_posterior_unaffected():
    from tdgp.training.telemetry import (camera_posterior_report,
                                         make_camera_posterior_fn)
    from tdgp.training.train_step import create_train_state, g_variables

    cfg = tiny_test_config()
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    fn = make_camera_posterior_fn(G, cfg, num_samples=8)
    out = camera_posterior_report(fn, g_variables(state), jax.random.PRNGKey(0))
    assert 'Camera/posterior/yaw/mean' in out
