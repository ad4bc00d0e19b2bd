#!/usr/bin/env python
"""CLI frustum-in-cube validation (ref: scripts/testing/validate_ray_bounds.py).

Usage:
  python scripts/testing/validate_ray_bounds.py --fov 45 --radius 1.0 \
      --near 0.75 --far 1.25 --cube-scale 0.5 [--verbose]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--fov', type=float, required=True)
    ap.add_argument('--radius', type=float, default=1.0)
    ap.add_argument('--near', type=float, default=0.75)
    ap.add_argument('--far', type=float, default=1.25)
    ap.add_argument('--cube-scale', type=float, default=0.5)
    ap.add_argument('--step', type=float, default=1e-2)
    ap.add_argument('--verbose', action='store_true')
    args = ap.parse_args()

    from tdgp.rendering.camera import compute_viewing_frustum_sizes, validate_frustum
    from tdgp.rendering.rays import validate_image_plane

    ok_frustum = validate_frustum(fov=args.fov, near=args.near, far=args.far,
                                  radius=args.radius, scale=args.cube_scale,
                                  step=args.step, verbose=args.verbose)
    ok_plane = validate_image_plane(fov=args.fov, radius=args.radius,
                                    scale=args.cube_scale, step=args.step)
    sizes = compute_viewing_frustum_sizes(args.near, args.far, args.fov)
    print(f'frustum inside cube: {ok_frustum}')
    print(f'image plane hits cube: {ok_plane}')
    print(f'frustum sizes: {dict(sizes)}')
    sys.exit(0 if (ok_frustum and ok_plane) else 1)


if __name__ == '__main__':
    main()
