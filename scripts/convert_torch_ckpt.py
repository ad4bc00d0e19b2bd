#!/usr/bin/env python
"""Convert a reference 3DGP torch snapshot into tdgp flax variables.

The reference pickles live torch modules with embedded source
(`network-snapshot-*.pkl`, ref persistence.py). Loading such a pickle
requires a torch environment (baked in here); this script extracts
`G_ema.state_dict()` and remaps every tensor into this framework's
NHWC/flax layout so the reference model can be run for pixel-parity checks
(BASELINE.md config[0]).

Layout rules:
  torch Linear weight [out, in]        -> flax 'weight' [in, out]
  torch Conv weight   [co, ci, kh, kw] -> flax 'weight'/'kernel' [kh, kw, ci, co]
  SynthesisBlock const [c, h, w]       -> [h, w, c]
  plane channel split: reference planes are [3*F] channel-major by plane
  (networks_epigraf.py:219) == our reshape (..., 3, F) — no permutation.

Usage:
  python scripts/convert_torch_ckpt.py --src network-snapshot-025000.pkl \
      --dst g_ema_flax.npz
"""
import argparse
import os
import pickle
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def t2np(t):
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def map_generator_key(name: str, t: np.ndarray):
    """torch G_ema state_dict name -> (collection, flax path, array) or None."""
    out = []

    def emit(col, path, arr):
        out.append((col, path, arr))

    linear_w = lambda a: a.T
    conv_w = lambda a: a.transpose(2, 3, 1, 0)

    # ---- mapping network
    m = re.match(r'mapping\.fc(\d+)\.(weight|bias)$', name)
    if m:
        i, kind = m.group(1), m.group(2)
        emit('params', f'mapping/fc{i}/{kind}', linear_w(t) if kind == 'weight' else t)
        return out
    m = re.match(r'mapping\.embed\.(weight|bias)$', name)
    if m:
        kind = m.group(1)
        emit('params', f'mapping/embed/{kind}', linear_w(t) if kind == 'weight' else t)
        return out
    if name == 'mapping.w_avg':
        emit('ema', 'mapping/w_avg', t)
        return out

    # ---- tri-plane decoder (SynthesisBlocksSequence)
    m = re.match(r'synthesis\.tri_plane_decoder\.b(\d+)\.(.*)$', name)
    if m:
        res, rest = m.group(1), m.group(2)
        base = f'synthesis/tri_plane_decoder/b{res}'
        if rest == 'const':
            emit('params', f'{base}/const', t.transpose(1, 2, 0))
        elif re.match(r'(conv\d|torgb)\.weight$', rest):
            layer = rest.split('.')[0]
            emit('params', f'{base}/{layer}/weight', conv_w(t))
        elif re.match(r'(conv\d|torgb)\.bias$', rest):
            layer = rest.split('.')[0]
            emit('params', f'{base}/{layer}/bias', t)
        elif re.match(r'(conv\d|torgb)\.affine\.(weight|bias)$', rest):
            layer, _, kind = rest.split('.')
            emit('params', f'{base}/{layer}/affine/{kind}',
                 linear_w(t) if kind == 'weight' else t)
        elif re.match(r'conv\d\.noise_strength$', rest):
            layer = rest.split('.')[0]
            emit('params', f'{base}/{layer}/noise_strength', t)
        elif re.match(r'conv\d\.noise_const$', rest):
            layer = rest.split('.')[0]
            emit('consts', f'{base}/{layer}/noise_const', t)
        elif 'resample_filter' in rest:
            return []  # recomputed constant
        else:
            raise ValueError(f'unmapped decoder key: {name}')
        return out

    # ---- tri-plane MLP (nn.Sequential 'model.{i}')
    m = re.match(r'synthesis\.tri_plane_mlp\.model\.(\d+)\.(weight|bias)$', name)
    if m:
        i, kind = m.group(1), m.group(2)
        emit('params', f'synthesis/tri_plane_mlp/fc{i}/{kind}',
             linear_w(t) if kind == 'weight' else t)
        return out

    # ---- depth adaptor
    m = re.match(r'synthesis\.depth_adaptor\.layers\.(\d+)\.(weight|bias)$', name)
    if m:
        i, kind = m.group(1), m.group(2)
        emit('params', f'synthesis/depth_adaptor/layer{i}/{kind}',
             conv_w(t) if kind == 'weight' else t)
        return out
    m = re.match(r'synthesis\.depth_adaptor\.head\.(weight|bias)$', name)
    if m:
        kind = m.group(1)
        emit('params', f'synthesis/depth_adaptor/head/{kind}',
             conv_w(t) if kind == 'weight' else t)
        return out
    if name == 'synthesis.depth_adaptor.near_plane_offset_raw':
        emit('params', 'synthesis/depth_adaptor/near_plane_offset_raw', t)
        return out
    if name == 'synthesis.depth_adaptor.progress_coef':
        return []  # schedule value, passed as traced arg here

    # ---- camera adaptor (ParamsAdaptor: project_*, main.0, main.1)
    m = re.match(r'synthesis\.camera_adaptor\.(origin_adaptor|look_at_adaptor)\.(.*)$', name)
    if m:
        adaptor, rest = m.group(1), m.group(2)
        base = f'synthesis/camera_adaptor/{adaptor}'
        m2 = re.match(r'(project_params|project_z|project_c)\.(weight|bias)$', rest)
        if m2:
            layer, kind = m2.group(1), m2.group(2)
            emit('params', f'{base}/{layer}/{kind}', linear_w(t) if kind == 'weight' else t)
            return out
        m2 = re.match(r'main\.(\d)\.(weight|bias)$', rest)
        if m2:
            i, kind = m2.group(1), m2.group(2)
            emit('params', f'{base}/main{i}/{kind}', linear_w(t) if kind == 'weight' else t)
            return out
        raise ValueError(f'unmapped camera adaptor key: {name}')

    # mean camera params buffer (test-time conditioning default)
    if 'mean_camera_params' in name or 'fourier_coefs' in name:
        return []
    raise ValueError(f'unmapped key: {name}')


def convert_state_dict(sd) -> dict:
    flat = {}
    for name, tensor in sd.items():
        for col, path, arr in map_generator_key(name, t2np(tensor)):
            flat[f'{col}/{path}'] = arr
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', required=True, help='reference network-snapshot .pkl')
    ap.add_argument('--dst', required=True, help='output .npz of G_ema variables')
    ap.add_argument('--module', default='G_ema')
    args = ap.parse_args()

    with open(args.src, 'rb') as f:
        snapshot = pickle.load(f)  # needs torch; persistence pickles self-load
    module = snapshot[args.module]
    sd = {k: v for k, v in module.state_dict().items()}
    flat = convert_state_dict(sd)
    np.savez(args.dst, **flat)
    print(f'wrote {len(flat)} arrays -> {args.dst}')


if __name__ == '__main__':
    main()
