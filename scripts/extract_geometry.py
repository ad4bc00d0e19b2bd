#!/usr/bin/env python
"""Density-grid geometry extraction to .obj/.mrc (ref: scripts/extract_geometry.py).

Usage:
  python scripts/extract_geometry.py --run-dir experiments/run --seeds 0,1,2 \
      --resolution 128 --out-dir meshes/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--snapshot', default='latest')
    ap.add_argument('--seeds', default='0')
    ap.add_argument('--resolution', type=int, default=128)
    ap.add_argument('--level', type=float, default=None, help='iso level (default: p90)')
    ap.add_argument('--save-mrc', action='store_true')
    ap.add_argument('--out-dir', default=None)
    args = ap.parse_args()

    import jax
    from tdgp.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    import jax.numpy as jnp
    from scripts.inference import load_run, parse_seeds
    from tdgp import geometry, inference

    cfg, G, g_vars = load_run(args.run_dir, args.snapshot)
    out_dir = args.out_dir or os.path.join(args.run_dir, 'geometry')
    os.makedirs(out_dir, exist_ok=True)

    seeds = parse_seeds(args.seeds)
    for seed in seeds:
        z = inference.sample_z_from_seeds([seed], cfg.generator.z_dim)
        c = (jax.nn.one_hot(jnp.asarray([seed % cfg.dataset.c_dim]), cfg.dataset.c_dim)
             if cfg.dataset.c_dim > 0 else None)
        cams = inference.canonical_cameras(cfg, 1, G=G, g_vars=g_vars, z=z, c=c)
        ws = G.apply(g_vars, method=lambda g: g.mapping(
            z, c, camera_angles=cams.angles, train=False))
        verts, faces, sigma = geometry.extract_geometry(
            G, g_vars, ws, resolution=args.resolution,
            cube_scale=cfg.camera.cube_scale, level=args.level)
        obj_path = os.path.join(out_dir, f'seed{seed:04d}.obj')
        geometry.save_obj(verts, faces, obj_path)
        print(f'seed {seed}: {len(verts)} verts, {len(faces)} faces -> {obj_path}')
        if args.save_mrc:
            geometry.save_mrc(sigma, os.path.join(out_dir, f'seed{seed:04d}.mrc'))


if __name__ == '__main__':
    main()
