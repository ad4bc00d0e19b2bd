#!/usr/bin/env python
"""Convert a torchvision VGG16 state_dict to the tdgp flax .npz layout.

Usage: python scripts/convert_vgg.py --src vgg16.pth --dst vgg16.npz
"""
import argparse

import numpy as np

# torchvision features module indices of the 13 convs
TV_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
TV_FC = {'0': 'fc6', '3': 'fc7', '6': 'fc8'}


def convert(sd):
    out = {}
    for name, tensor in sd.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, 'detach') else np.asarray(tensor)
        parts = name.split('.')
        if parts[0] == 'features':
            conv_i = TV_CONV_IDS.index(int(parts[1]))
            if parts[2] == 'weight':
                out[f'params/conv{conv_i}/kernel'] = t.transpose(2, 3, 1, 0)
            else:
                out[f'params/conv{conv_i}/bias'] = t
        elif parts[0] == 'classifier':
            fc = TV_FC[parts[1]]
            if parts[2] == 'weight':
                # NOTE: torch flattens NCHW (512,7,7); flax flattens NHWC (7,7,512)
                if fc == 'fc6':
                    w = t.reshape(4096, 512, 7, 7).transpose(0, 2, 3, 1).reshape(4096, -1)
                    out['params/fc6/kernel'] = w.T
                else:
                    out[f'params/{fc}/kernel'] = t.T
            else:
                out[f'params/{fc}/bias'] = t
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
