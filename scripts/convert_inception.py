#!/usr/bin/env python
"""Convert a torch InceptionV3 state_dict to the tdgp flax .npz layout.

Accepts either torchvision's `inception_v3` weights or pytorch-fid's
`pt_inception-2015-12-05` checkpoint (both share the module naming used
here). Run once offline, then point TDGP_INCEPTION_WEIGHTS at the output.

Usage:
  python scripts/convert_inception.py --src inception.pth --dst inception_fid.npz
"""
import argparse
import re

import numpy as np


def convert(state_dict, num_logits=None):
    out = {}
    for name, tensor in state_dict.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, 'detach') else np.asarray(tensor)
        if name.endswith('num_batches_tracked') or name.startswith('AuxLogits'):
            continue
        parts = name.split('.')
        if parts[0] == 'fc':
            if parts[1] == 'weight':
                out['params/fc/kernel'] = t.T  # [in, out]
            else:
                out['params/fc/bias'] = t
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / Conv2d_1a_3x3.bn.running_mean
        *scope, layer, param = parts
        scope_key = '/'.join(scope + [layer.replace('conv', 'conv').replace('bn', 'bn')])
        if layer == 'conv' and param == 'weight':
            out[f'params/{scope_key}/kernel'] = t.transpose(2, 3, 1, 0)  # OIHW->HWIO
        elif layer == 'bn':
            dest = {'weight': ('params', 'scale'), 'bias': ('params', 'bias'),
                    'running_mean': ('batch_stats', 'mean'),
                    'running_var': ('batch_stats', 'var')}[param]
            out[f'{dest[0]}/{scope_key}/{dest[1]}'] = t
        else:
            raise ValueError(f'unmapped key: {name}')
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', required=True, help='torch .pth state_dict or TorchScript file')
    ap.add_argument('--dst', required=True, help='output .npz')
    ap.add_argument('--fid-pool', choices=['auto', 'true', 'false'], default='auto',
                    help="mark the weights as needing pytorch-fid's "
                         'count_include_pad=False branch pools '
                         '(auto: true iff fc has 1008 logits, i.e. '
                         'pt_inception-2015-12-05)')
    args = ap.parse_args()

    import torch
    try:
        obj = torch.load(args.src, map_location='cpu', weights_only=False)
    except Exception:
        obj = torch.jit.load(args.src, map_location='cpu')
    state_dict = obj.state_dict() if hasattr(obj, 'state_dict') else obj
    flat = convert(state_dict)
    if args.fid_pool == 'auto':
        fid_pool = flat['params/fc/bias'].shape[0] == 1008
    else:
        fid_pool = args.fid_pool == 'true'
    # marker read back by tdgp.metrics.detectors.load_inception_detector so
    # the right pooling variant is selected automatically
    flat['__meta__/fid_pool'] = np.asarray(fid_pool)
    np.savez(args.dst, **flat)
    print(f'wrote {len(flat)} arrays -> {args.dst} (fid_pool={fid_pool})')


if __name__ == '__main__':
    main()
