#!/usr/bin/env python
"""ResNet-50 feature extraction into a .memmap + desc json
(ref: data_scripts/extract_features.py:94-135). These embeddings are the
knowledge-distillation targets for D (ref loss.py:301-314).

Usage:
  python data_scripts/extract_features.py --data data/dogs.zip \
      --weights resnet50.npz --out-dir embeddings/dogs [--batch-size 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', required=True)
    ap.add_argument('--weights', required=True, help='converted resnet50 .npz')
    ap.add_argument('--out-dir', required=True)
    ap.add_argument('--batch-size', type=int, default=64)
    ap.add_argument('--embedder-name', default='resnet50')
    args = ap.parse_args()

    import jax.numpy as jnp
    from tdgp.data.dataset import ImageFolderDataset, remove_root
    from tdgp.metrics.resnet import load_weights, make_embedder

    dataset = ImageFolderDataset(args.data)
    embedder = make_embedder(load_weights(args.weights))

    os.makedirs(args.out_dir, exist_ok=True)
    n = len(dataset._image_fnames)
    dim = 2048
    mm_path = os.path.join(args.out_dir, f'embeddings_{args.embedder_name}.memmap')
    mm = np.memmap(mm_path, dtype='float32', mode='w+', shape=(n, dim))

    for i in range(0, n, args.batch_size):
        idx = range(i, min(i + args.batch_size, n))
        imgs = np.stack([dataset._load_raw_image(j) for j in idx])
        feats = np.asarray(embedder(jnp.asarray(imgs)))
        mm[i:i + len(feats)] = feats
        if (i // args.batch_size) % 50 == 0:
            print(f'{i}/{n}')
    mm.flush()

    desc = {
        'shape': [n, dim],
        'filepath_to_idx': {
            remove_root(f, dataset.name).replace('\\', '/'): i
            for i, f in enumerate(dataset._image_fnames)},
    }
    with open(os.path.join(args.out_dir,
                           f'embeddings_{args.embedder_name}_desc.json'), 'w') as f:
        json.dump(desc, f)
    print(f'wrote {mm_path} [{n} x {dim}]')


if __name__ == '__main__':
    main()
