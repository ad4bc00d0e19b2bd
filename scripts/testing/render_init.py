#!/usr/bin/env python
"""Render grids from an UNTRAINED generator and measure imgs/sec
(ref: scripts/testing/render_init.py — init-sanity + throughput harness).

Usage:
  python scripts/testing/render_init.py [--preset satellite] [--batch-sizes 1,4,8]
      [--resolution 256] [--out render_init.png]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='satellite')
    ap.add_argument('--batch-sizes', default='1,4,8')
    ap.add_argument('--resolution', type=int, default=None)
    ap.add_argument('--out', default=None)
    ap.add_argument('overrides', nargs='*')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tdgp import inference
    from tdgp.infra.experiment import load_config
    from tdgp.training.train_step import create_train_state, ema_variables

    overrides = list(args.overrides)
    if args.resolution:
        overrides.append(f'dataset.resolution={args.resolution}')
    cfg = load_config(None, overrides=overrides, preset=args.preset)
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    g_vars = ema_variables(state)

    for bs in [int(x) for x in args.batch_sizes.split(',')]:
        z = inference.sample_z_from_seeds(range(bs), cfg.generator.z_dim)
        c = (jax.nn.one_hot(jnp.arange(bs) % cfg.dataset.c_dim, cfg.dataset.c_dim)
             if cfg.dataset.c_dim > 0 else None)
        cams = inference.canonical_cameras(cfg, bs, G=G, g_vars=g_vars, z=z, c=c)
        ws = G.apply(g_vars, method=lambda g: g.mapping(
            z, c, camera_angles=cams.angles, train=False))
        fn = inference.make_synthesis_fn(G, g_vars)
        # warmup/compile
        img = fn(ws, cams.angles, cams.fov, cams.radius, cams.look_at)
        jax.block_until_ready(img)
        n_iter = 8
        t0 = time.perf_counter()
        for _ in range(n_iter):
            img = fn(ws, cams.angles, cams.fov, cams.radius, cams.look_at)
            jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / n_iter
        print(f'batch {bs:3d}: {bs / dt:8.2f} imgs/sec  ({dt * 1e3:.1f} ms/call)')
        if args.out and bs == max(int(x) for x in args.batch_sizes.split(',')):
            grid = inference.make_grid(np.asarray(jnp.clip(img, -1, 1) * 0.5 + 0.5))
            inference.save_image(grid, args.out)
            print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
