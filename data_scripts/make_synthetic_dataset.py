#!/usr/bin/env python
"""Generate a 3D-consistent synthetic dataset for training-dynamics runs.

Renders lambertian-shaded spheres (per-class albedo, random size/offset)
from random cameras matching the training camera prior, with LeReS-format
16-bit depth maps and a dataset.json carrying labels + camera angles — the
exact on-disk layout ImageFolderDataset consumes (ref src/training/
dataset.py:126-229 semantics: *_depth.png, dataset.json labels/camera_angles).

Single-view 2D collection of a 3D scene == the data regime 3DGP trains on,
so losses/FID-proxy trend meaningfully, unlike uniform-noise batches.

Usage: python data_scripts/make_synthetic_dataset.py --out data/synth64 \
          --n 2000 --res 64 --classes 4
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import PIL.Image


def render_scene(rs, res, albedo, yaw, pitch, radius=1.0, fov_deg=30.0):
    """Ray-trace one sphere (center ~ origin, r in [0.2, 0.3]) from a camera
    on the sphere of given radius, looking at the origin. Returns (rgb u8
    [H,W,3], depth u16 [H,W])."""
    r_sphere = 0.2 + 0.1 * rs.rand()
    center = (rs.rand(3) - 0.5) * 0.15

    # cam2world matching tdgp.rendering.camera conventions (yaw/pitch on a
    # sphere, looking at the origin)
    cam_pos = radius * np.array([
        np.sin(pitch) * np.cos(np.pi - yaw),
        np.cos(pitch),
        np.sin(pitch) * np.sin(np.pi - yaw)])
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-9
    up2 = np.cross(right, fwd)

    # pixel rays
    xs = np.linspace(-1, 1, res)
    ys = np.linspace(1, -1, res)
    gx, gy = np.meshgrid(xs, ys)
    tanf = np.tan(np.deg2rad(fov_deg) / 2)
    dirs = (gx[..., None] * right * tanf + gy[..., None] * up2 * tanf
            + fwd[None, None, :])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # ray-sphere intersection
    oc = cam_pos - center
    b = np.sum(dirs * oc, axis=-1)
    c = np.dot(oc, oc) - r_sphere ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0

    normal = (cam_pos + t[..., None] * dirs) - center
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-9
    light = np.array([0.4, 0.8, 0.45])
    light /= np.linalg.norm(light)
    shade = np.clip(normal @ light, 0.1, 1.0)

    rgb = np.full((res, res, 3), 235, np.uint8)  # light background
    shaded = np.clip(albedo[None, None] * shade[..., None] * 255, 0, 255)
    rgb[hit] = shaded[hit].astype(np.uint8)

    # LeReS-style inverted-ish normalized depth: near -> large values
    depth = np.zeros((res, res), np.uint16)
    if hit.any():
        tn = t[hit]
        near, far = tn.min(), max(tn.max(), tn.min() + 1e-6)
        depth_vals = (1.0 - (tn - near) / (far - near)) * 0.8 + 0.1
        d = np.zeros((res, res), np.float32)
        d[hit] = depth_vals
        depth = (d * 65535).astype(np.uint16)
    return rgb, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', required=True)
    ap.add_argument('--n', type=int, default=2000)
    ap.add_argument('--res', type=int, default=64)
    ap.add_argument('--classes', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    rs = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)
    palette = rs.rand(args.classes, 3) * 0.7 + 0.25

    labels, angles = [], []
    for i in range(args.n):
        cls = int(rs.randint(args.classes))
        yaw = rs.uniform(-np.pi, np.pi)
        pitch = np.pi / 2 + rs.uniform(-0.4, 0.4)
        rgb, depth = render_scene(rs, args.res, palette[cls], yaw, pitch)
        name = f'img{i:06d}.png'
        PIL.Image.fromarray(rgb).save(os.path.join(args.out, name))
        PIL.Image.fromarray(depth).save(
            os.path.join(args.out, f'img{i:06d}_depth.png'))
        labels.append([name, cls])
        angles.append([name, [float(yaw), float(pitch), 0.0]])

    with open(os.path.join(args.out, 'dataset.json'), 'w') as f:
        json.dump({'labels': labels, 'camera_angles': angles}, f)
    print(f'wrote {args.n} images ({args.res}x{args.res}, '
          f'{args.classes} classes) -> {args.out}')


if __name__ == '__main__':
    main()
