#!/usr/bin/env python
"""Convert a torchvision/timm ResNet-50 state_dict to the tdgp flax .npz layout.

Usage: python scripts/convert_resnet.py --src resnet50.pth --dst resnet50.npz
"""
import argparse

import numpy as np


def convert(sd):
    out = {}

    def put(col, scope, name, t):
        out[f'{col}/{scope}/{name}'] = t

    def conv(scope, t):
        put('params', scope, 'kernel', t.transpose(2, 3, 1, 0))

    def bn(scope, key, t):
        col, name = {'weight': ('params', 'scale'), 'bias': ('params', 'bias'),
                     'running_mean': ('batch_stats', 'mean'),
                     'running_var': ('batch_stats', 'var')}[key]
        put(col, scope, name, t)

    for name, tensor in sd.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, 'detach') else np.asarray(tensor)
        if name.endswith('num_batches_tracked'):
            continue
        parts = name.split('.')
        if parts[0] == 'fc':
            out['params/fc/kernel' if parts[1] == 'weight' else 'params/fc/bias'] = \
                t.T if parts[1] == 'weight' else t
        elif parts[0] == 'conv1':
            conv('conv1', t)
        elif parts[0] == 'bn1':
            bn('bn1', parts[1], t)
        elif parts[0].startswith('layer'):
            stage, block = parts[0], parts[1]
            scope = f'{stage}_{block}'
            if parts[2] == 'downsample':
                sub = 'downsample_conv' if parts[3] == '0' else 'downsample_bn'
                if sub == 'downsample_conv':
                    conv(f'{scope}/downsample_conv', t)
                else:
                    bn(f'{scope}/downsample_bn', parts[4], t)
            elif parts[2].startswith('conv'):
                conv(f'{scope}/{parts[2]}', t)
            elif parts[2].startswith('bn'):
                bn(f'{scope}/{parts[2]}', parts[3], t)
            else:
                raise ValueError(f'unmapped: {name}')
        else:
            raise ValueError(f'unmapped: {name}')
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', required=True)
    ap.add_argument('--dst', required=True)
    args = ap.parse_args()
    import torch
    obj = torch.load(args.src, map_location='cpu', weights_only=False)
    sd = obj.state_dict() if hasattr(obj, 'state_dict') else obj
    flat = convert(sd)
    np.savez(args.dst, **flat)
    print(f'wrote {len(flat)} arrays -> {args.dst}')


if __name__ == '__main__':
    main()
