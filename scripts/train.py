#!/usr/bin/env python
"""Training entry point (ref: src/train.py + src/infra/launch.py).

Usage:
  python scripts/train.py --preset satellite dataset.path=data/dogs.zip \
      training.batch_size=64 [--config extra.yaml] [--desc myrun] [--dry-run]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax

from tdgp.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()

# rbg PRNG: much faster per-step random sampling on TPU than threefry
jax.config.update('jax_default_prng_impl', 'rbg')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=None, help='YAML config overlay')
    ap.add_argument('--preset', default='default',
                    choices=['default', 'imagenet', 'satellite', 'tiny', 'synth64', 'synth256', 'stylegan2'])
    ap.add_argument('--run-root', default='experiments')
    ap.add_argument('--run-dir', default=None,
                    help='existing experiment dir to resume into (defaults '
                         'to its frozen experiment_config.yaml; the usual '
                         'dir naming includes the git hash, so resuming '
                         'after a code change needs this)')
    ap.add_argument('--desc', default=None)
    ap.add_argument('--dry-run', action='store_true')
    ap.add_argument('--max-kimg', type=float, default=None)
    ap.add_argument('overrides', nargs='*', help='dotted key=value overrides')
    args = ap.parse_args()

    from tdgp.infra.experiment import create_experiment_dir, load_config
    if args.run_dir and args.config is None:
        frozen = os.path.join(args.run_dir, 'experiment_config.yaml')
        if os.path.exists(frozen):
            args.config = frozen
    cfg = load_config(args.config, overrides=args.overrides, preset=args.preset)

    # startup property validation (ref train.py:206-228)
    if cfg.camera.validate_viewing_frustum:
        from tdgp.rendering.camera import validate_frustum, get_max_sampling_value
        from tdgp.config import asdict
        fov_max = get_max_sampling_value(asdict(cfg.camera.fov))
        assert validate_frustum(
            fov=fov_max, near=cfg.camera.ray.start, far=cfg.camera.ray.end,
            radius=get_max_sampling_value(asdict(cfg.camera.origin.radius)),
            scale=cfg.camera.cube_scale), \
            'Viewing frustum escapes the scene cube — adjust fov/radius/cube_scale'
    assert cfg.training.batch_size % cfg.discriminator.mbstd_group_size == 0

    if args.dry_run:
        from tdgp.infra.experiment import config_to_dict
        import json
        print(json.dumps(config_to_dict(cfg), indent=2, default=str))
        return

    if args.run_dir:
        run_dir = args.run_dir
        assert os.path.isdir(run_dir), run_dir
    else:
        run_dir = create_experiment_dir(cfg, args.run_root, desc=args.desc)
    print(f'Run dir: {run_dir}')

    import jax
    devices = jax.devices()
    mesh = None
    if len(devices) > 1:
        mesh = jax.sharding.Mesh(np.asarray(devices), ('data',))
        print(f'Data-parallel mesh over {len(devices)} devices')

    # metric + vis hooks
    metric_fn = None
    if cfg.training.metrics and cfg.dataset.path:
        from tdgp.data.dataset import ImageFolderDataset
        from tdgp.metrics.detectors import (RandomProjectionDetector,
                                            load_inception_detector)
        from tdgp.metrics.registry import EvalContext, calc_metric, report_metric
        from tdgp.training.train_step import ema_variables
        try:
            detector = load_inception_detector()
        except FileNotFoundError:
            print('WARNING: no InceptionV3 weights; using RandomProjectionDetector '
                  '(metric values will not be comparable to the reference)')
            detector = RandomProjectionDetector(2048)
        eval_dataset = ImageFolderDataset(cfg.dataset.path,
                                          resolution=cfg.dataset.resolution,
                                          use_labels=cfg.dataset.c_dim > 0)

        def metric_fn(state, G, cur_nimg):
            ctx = EvalContext(cfg=cfg, G=G, g_vars=ema_variables(state),
                              dataset=eval_dataset, detector=detector,
                              cache_dir=os.path.join(run_dir, 'metric-cache'))
            results = {}
            for m in cfg.training.metrics:
                rd = calc_metric(m, ctx)
                report_metric(rd, run_dir=run_dir, snapshot=f'{cur_nimg // 1000:06d}')
                results.update(rd['results'])
            return results

    def vis_fn(state, G, cur_nimg):
        from tdgp import inference
        from tdgp.training.train_step import ema_variables
        import jax.numpy as jnp
        g_vars = ema_variables(state)
        z = inference.sample_z_from_seeds(range(16), cfg.generator.z_dim)
        c = None
        if cfg.dataset.c_dim > 0:
            import jax
            c = jax.nn.one_hot(jnp.arange(16) % cfg.dataset.c_dim, cfg.dataset.c_dim)
        cams = inference.canonical_cameras(cfg, 16, G=G, g_vars=g_vars, z=z, c=c)
        ws = G.apply(g_vars, method=lambda g: g.mapping(
            z, c, camera_angles=cams.angles, train=False))
        imgs = inference.generate(G, g_vars, ws, cams, batch_size=4)
        grid = inference.make_grid(imgs)
        inference.save_image(grid, os.path.join(run_dir, f'fakes{cur_nimg // 1000:06d}.png'))

    from tdgp.training.loop import training_loop
    training_loop(cfg, run_dir, mesh=mesh, metric_fn=metric_fn, vis_fn=vis_fn,
                  max_kimg=args.max_kimg)


if __name__ == '__main__':
    main()
