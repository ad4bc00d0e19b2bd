#!/usr/bin/env python
"""Per-class instance selection with a Gaussian model on detector features
(ref: data_scripts/run_instance_selection.py:29-76): keep the top-X% most
typical images per class by feature-space likelihood.

Usage:
  python data_scripts/run_instance_selection.py --data data/imagenet/ \
      --keep-ratio 0.5 --out selected_files.json [--weights inception.npz]
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
    ap.add_argument('--keep-ratio', type=float, default=0.5)
    ap.add_argument('--out', required=True)
    ap.add_argument('--weights', default=None, help='inception .npz (else random proj)')
    ap.add_argument('--batch-size', type=int, default=64)
    args = ap.parse_args()

    import jax.numpy as jnp
    from sklearn.mixture import GaussianMixture
    from tdgp.data.dataset import ImageFolderDataset
    from tdgp.metrics.detectors import RandomProjectionDetector, load_inception_detector

    dataset = ImageFolderDataset(args.data, use_labels=True)
    try:
        detector = load_inception_detector(args.weights)
    except FileNotFoundError:
        print('WARNING: using RandomProjectionDetector for selection features')
        detector = RandomProjectionDetector(256)

    n = len(dataset._image_fnames)
    labels = dataset._get_raw_labels()
    feats = []
    for i in range(0, n, args.batch_size):
        imgs = np.stack([dataset._load_raw_image(j)
                         for j in range(i, min(i + args.batch_size, n))])
        feats.append(np.asarray(detector(jnp.asarray(imgs))))
    feats = np.concatenate(feats)

    keep = []
    for cls in np.unique(labels):
        idx = np.where(labels == cls)[0]
        x = feats[idx]
        gm = GaussianMixture(n_components=1, covariance_type='diag').fit(x)
        scores = gm.score_samples(x)
        k = max(1, int(len(idx) * args.keep_ratio))
        keep.extend(idx[np.argsort(-scores)[:k]].tolist())

    files = [dataset._image_fnames[i] for i in sorted(keep)]
    with open(args.out, 'w') as f:
        json.dump({'files': files, 'keep_ratio': args.keep_ratio}, f)
    print(f'selected {len(files)}/{n} -> {args.out}')


if __name__ == '__main__':
    main()
