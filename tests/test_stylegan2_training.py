"""2D StyleGAN2 baseline training path (model_name='stylegan2')."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import (Config, DatasetConfig, DiscriminatorConfig,
                         GeneratorConfig, KDCfg, LossConfig, PatchCfg,
                         TrainingConfig, CameraAdaptorCfg, DepthAdaptorCfg)
from tdgp.training.schedules import compute_schedules
from tdgp.training.train_step import create_train_state, make_jitted_train_steps

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"


def tiny_2d_config() -> Config:
    patch = PatchCfg(resolution=16, min_scale_trg=0.25, mbstd_group_size=2)
    gen = GeneratorConfig(z_dim=16, w_dim=16, c_dim=0, cbase=512, cmax=32,
                          img_resolution=32, patch=patch,
                          depth_adaptor=DepthAdaptorCfg(enabled=False),
                          camera_adaptor=CameraAdaptorCfg(enabled=False, z_dim=16, c_dim=0))
    disc = DiscriminatorConfig(c_dim=0, cbase=512, cmax=32, input_resolution=16,
                               img_channels=3, num_additional_start_blocks=1,
                               mbstd_group_size=2, patch=patch, embedding_dim=8)
    return Config(
        model_name='stylegan2', generator=gen, discriminator=disc,
        loss=LossConfig(r1_gamma=0.1, pl_weight=2.0, style_mixing_prob=0.5,
                        kd=KDCfg(weight=0.0)),
        training=TrainingConfig(batch_size=4, use_depth=False,
                                learn_camera_dist=False, metrics=()),
        dataset=DatasetConfig(resolution=32, c_dim=0, embedding_dim=8,
                              use_embeddings=False))


def make_batch_2d(key, n, res):
    ks = jax.random.split(key, 2)
    return {
        'img': jax.random.uniform(ks[0], (n, res, res, 3), minval=-1, maxval=1),
        'depth': jnp.zeros((n, res, res, 1)),
        'c': jnp.zeros((n, 0)),
        'camera_angles': jnp.zeros((n, 3)),
        'embs': jnp.zeros((n, 8)),
    }


def test_stylegan2_train_step_runs():
    cfg = tiny_2d_config()
    state, G, D = create_train_state(cfg, seed=0, local_batch=4)
    step_plain, step_r1 = make_jitted_train_steps(cfg, G, D)
    batch = make_batch_2d(jax.random.PRNGKey(0), 4, 32)
    sched = compute_schedules(cfg, cur_nimg=0)

    g_before = jax.tree.leaves(state.g_params)[0].copy()
    state1, stats1 = step_plain(state, batch, jax.random.PRNGKey(1), sched)
    for k, v in stats1.items():
        assert np.isfinite(float(v)), f'{k} not finite'
    assert not np.allclose(jax.tree.leaves(state1.g_params)[0], g_before)

    # R1 + PL regularization step
    state2, stats2 = step_r1(state1, batch, jax.random.PRNGKey(2), sched)
    assert 'Loss/D/r1_penalty' in stats2
    assert 'Loss/pl_penalty' in stats2
    assert np.isfinite(float(stats2['Loss/pl_penalty']))
    assert float(state2.pl_mean) != 0.0
