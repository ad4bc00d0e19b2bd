"""Config loader / overrides / resolvers / experiment dirs + converter mapping."""
import os

import numpy as np
import pytest
import yaml

from tdgp.infra.experiment import (apply_overrides, create_experiment_dir,
                                   finalize_config, load_config, save_config)
from tdgp.config import Config


def test_overrides_nested():
    cfg = Config()
    cfg = apply_overrides(cfg, ['training.batch_size=32',
                                'generator.tri_plane.res=256',
                                'camera.fov.max=30.0',
                                'dataset.mirror=false'])
    assert cfg.training.batch_size == 32
    assert cfg.generator.tri_plane.res == 256
    assert cfg.camera.fov.max == 30.0
    assert cfg.dataset.mirror is False


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), ['training.nonexistent=1'])


def test_finalize_resolvers():
    cfg = apply_overrides(Config(), ['dataset.resolution=256',
                                     'generator.patch.resolution=64',
                                     'training.batch_size=64'])
    cfg = finalize_config(cfg)
    # log2(256/64) = 2 extra start blocks (ref model/3dgp.yaml:83-87)
    assert cfg.discriminator.num_additional_start_blocks == 2
    # min_scale_trg = 64/256 (ref training/base.yaml:36-39)
    assert abs(cfg.generator.patch.min_scale_trg - 0.25) < 1e-9
    # ema_kimg = batch * 0.3125 (ref model/base.yaml:47-50)
    assert abs(cfg.training.ema_kimg - 20.0) < 1e-9
    assert cfg.generator.img_resolution == 256
    assert cfg.discriminator.input_resolution == 64


def test_gamma_auto():
    cfg = apply_overrides(Config(), ['loss.r1_gamma=-1', 'dataset.resolution=256',
                                     'training.batch_size=64'])
    cfg = finalize_config(cfg)
    # 0.0002 * 256^2 / 64 (ref train.py:176)
    assert abs(cfg.loss.r1_gamma - 0.2048) < 1e-6


def test_yaml_roundtrip_and_experiment_dir(tmp_path):
    cfg = finalize_config(Config())
    run_dir = create_experiment_dir(cfg, str(tmp_path))
    frozen = os.path.join(run_dir, 'experiment_config.yaml')
    assert os.path.exists(frozen)
    cfg2 = load_config(frozen, finalize=False)
    assert cfg2.training.batch_size == cfg.training.batch_size
    assert cfg2.generator.tri_plane.res == cfg.generator.tri_plane.res


def test_yaml_preset_overlay(tmp_path):
    p = tmp_path / 'exp.yaml'
    p.write_text(yaml.safe_dump({
        'preset': 'imagenet',
        'training': {'batch_size': 32},
        'dataset': {'resolution': 128, 'path': 'x.zip'},
    }))
    cfg = load_config(str(p))
    assert cfg.generator.cbase == 65536  # imagenet preset
    assert cfg.training.batch_size == 32
    assert cfg.generator.img_resolution == 128


def test_synth256_preset():
    """Flagship-shape demo preset: satellite widths, 64^2 patches at 256^2,
    compressed schedules so every anneal engages within a ~100-kimg run."""
    cfg = load_config(preset='synth256')
    assert cfg.generator.cbase == 32768          # satellite widths (default)
    assert cfg.generator.patch.resolution == 64
    assert cfg.generator.patch.min_scale_trg == 0.25
    assert cfg.generator.patch.anneal_kimg == 100
    assert cfg.discriminator.num_additional_start_blocks == 2
    assert cfg.loss.kd.weight == 0.0
    assert not cfg.dataset.use_embeddings
    assert cfg.training.augment.mode == 'ada'


def test_torch_ckpt_key_mapping():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from scripts.convert_torch_ckpt import map_generator_key

    cases = {
        'mapping.fc0.weight': ('params', 'mapping/fc0/weight', (512, 514)),
        'synthesis.tri_plane_decoder.b4.const': ('params', 'synthesis/tri_plane_decoder/b4/const', None),
        'synthesis.tri_plane_decoder.b512.conv1.weight':
            ('params', 'synthesis/tri_plane_decoder/b512/conv1/weight', None),
        'synthesis.tri_plane_decoder.b512.conv1.noise_const':
            ('consts', 'synthesis/tri_plane_decoder/b512/conv1/noise_const', None),
        'synthesis.tri_plane_mlp.model.0.weight': ('params', 'synthesis/tri_plane_mlp/fc0/weight', None),
        'synthesis.depth_adaptor.head.weight': ('params', 'synthesis/depth_adaptor/head/weight', None),
        'synthesis.camera_adaptor.origin_adaptor.main.1.bias':
            ('params', 'synthesis/camera_adaptor/origin_adaptor/main1/bias', None),
        'mapping.w_avg': ('ema', 'mapping/w_avg', None),
    }
    for name, (col, path, _) in cases.items():
        t = np.zeros((514, 512)) if name.endswith('fc0.weight') else \
            np.zeros((2, 3, 3, 3)) if 'conv' in name or 'head' in name else \
            np.zeros((96, 4, 4)) if name.endswith('const') else np.zeros(8)
        mapped = map_generator_key(name, t)
        assert mapped, f'{name} mapped to nothing'
        assert mapped[0][0] == col and mapped[0][1] == path

    # linear weights transposed, conv weights HWIO, const HWC
    w = np.arange(6).reshape(2, 3).astype(np.float32)
    assert map_generator_key('mapping.fc0.weight', w)[0][2].shape == (3, 2)
    cw = np.zeros((8, 4, 3, 3))
    assert map_generator_key('synthesis.tri_plane_decoder.b8.conv1.weight', cw)[0][2].shape == (3, 3, 4, 8)
    const = np.zeros((96, 4, 4))
    assert map_generator_key('synthesis.tri_plane_decoder.b4.const', const)[0][2].shape == (4, 4, 96)
    # buffers that are recomputed here are dropped
    assert map_generator_key('synthesis.tri_plane_decoder.b4.resample_filter', np.zeros(4)) == []
