#!/usr/bin/env python
"""Visualization CLI: image grids and multi-view videos from a checkpoint
(ref: scripts/inference.py).

Usage:
  python scripts/inference.py --run-dir experiments/run --vis image_grid \
      --seeds 0-15 --truncation 0.7 --output out.png
  python scripts/inference.py --run-dir ... --vis video_grid --trajectory front_circle
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def parse_seeds(spec: str):
    out = []
    for part in spec.split(','):
        if '-' in part:
            a, b = part.split('-')
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def load_run(run_dir: str, snapshot: str = 'latest', metric: str = 'fid2k_full'):
    """Load cfg + EMA generator vars from a run dir (ref scripts/utils.py:150-204).
    snapshot: 'latest' | 'best' | explicit path."""
    from tdgp import checkpoint as ckpt
    from tdgp.infra.experiment import load_config
    from tdgp.training.train_step import create_train_state, ema_variables

    cfg = load_config(os.path.join(run_dir, 'experiment_config.yaml'), finalize=False)
    if snapshot.endswith('.npz'):
        # EMA-only export (scripts/infra/export_ema.py) — the slim artifact
        # that survives sessions when full orbax TrainStates (~6x larger)
        # are not retained. Flat 'col/path/leaf' layout == ema_variables
        # structure, so no TrainState template is needed.
        import numpy as np
        from tdgp.checkpoint import variables_from_flat
        from tdgp.training.train_step import build_models
        candidates = [snapshot, os.path.join(run_dir, snapshot)]
        path = next((p for p in candidates if os.path.exists(p)), None)
        assert path, (f'no EMA export found; tried {candidates[0]!r} and '
                      f'{candidates[1]!r}')
        G, _ = build_models(cfg)
        return cfg, G, variables_from_flat(np.load(path))
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    if snapshot == 'best':
        path = ckpt.find_best_checkpoint(run_dir, metric=metric)
    else:
        path = ckpt.resolve_resume(run_dir, snapshot)
    assert path, f'no snapshot found in {run_dir}'
    state, _ = ckpt.load_snapshot(path, state)
    return cfg, G, ema_variables(state)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--snapshot', default='latest', help='latest | best | path')
    ap.add_argument('--vis', default='image_grid', choices=['image_grid', 'video_grid'])
    ap.add_argument('--seeds', default='0-15')
    ap.add_argument('--truncation', type=float, default=1.0)
    ap.add_argument('--trajectory', default='front_circle',
                    choices=['front_circle', 'line', 'wiggle', 'points', 'point'])
    ap.add_argument('--num-frames', type=int, default=32)
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--classes', default=None, help='comma list of class ids')
    ap.add_argument('--output', default=None)
    args = ap.parse_args()

    import jax
    from tdgp.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    import jax.numpy as jnp
    from tdgp import inference

    cfg, G, g_vars = load_run(args.run_dir, args.snapshot)
    seeds = parse_seeds(args.seeds)
    n = len(seeds)
    c = None
    if cfg.dataset.c_dim > 0:
        if args.classes:
            cls = [int(x) for x in args.classes.split(',')]
            idx = jnp.asarray([cls[i % len(cls)] for i in range(n)])
        else:
            idx = jnp.asarray([s % cfg.dataset.c_dim for s in seeds])
        c = jax.nn.one_hot(idx, cfg.dataset.c_dim)

    z = inference.sample_z_from_seeds(seeds, cfg.generator.z_dim)
    cams = inference.canonical_cameras(cfg, n, G=G, g_vars=g_vars, z=z, c=c)
    ws = inference.sample_ws_from_seeds(G, g_vars, seeds, c, cams.angles,
                                        truncation_psi=args.truncation)

    if args.vis == 'image_grid':
        imgs = inference.generate(G, g_vars, ws, cams, batch_size=args.batch_size)
        grid = inference.make_grid(imgs)
        out = args.output or os.path.join(args.run_dir, 'grid.png')
        inference.save_image(grid, out)
        print(f'wrote {out}')
    else:
        traj = dict(name=args.trajectory, num_frames=args.num_frames,
                    fov_diff=1.0, yaw_diff=0.5, pitch_diff=0.3,
                    yaw_left=-0.5, yaw_right=0.5,
                    yaw_start=-0.5, yaw_end=0.5,
                    pitch_start=np.pi / 2, pitch_end=np.pi / 2,
                    yaw_offset=0.0, pitch_offset=0.0, fov=None,
                    yaw_offsets=[-0.4, 0.0, 0.4], use_mean_camera=True)
        cams_traj = inference.generate_camera_trajectory(traj, cams)
        frames = inference.generate_trajectory(G, g_vars, ws, cams_traj,
                                               batch_size=args.batch_size)
        grids = np.stack([inference.make_grid(f) for f in frames])
        out = args.output or os.path.join(args.run_dir, 'video.gif')
        inference.save_video_frames(grids, out)
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
