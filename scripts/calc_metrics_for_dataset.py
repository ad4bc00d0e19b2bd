#!/usr/bin/env python
"""Dataset-vs-dataset metrics (ref: scripts/calc_metrics_for_dataset.py):
FID/KID between two image folders/zips, no generator involved.

Usage:
  python scripts/calc_metrics_for_dataset.py --real data/a.zip --fake data/b.zip \
      --metrics fid,kid [--max-items 50000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--real', required=True)
    ap.add_argument('--fake', required=True)
    ap.add_argument('--metrics', default='fid,kid')
    ap.add_argument('--max-items', type=int, default=None)
    ap.add_argument('--resolution', type=int, default=None)
    args = ap.parse_args()

    from tdgp.data.dataset import ImageFolderDataset
    from tdgp.metrics.detectors import RandomProjectionDetector, load_inception_detector
    from tdgp.metrics.features import compute_feature_stats_for_dataset
    from tdgp.metrics.fid import compute_fid
    from tdgp.metrics.kid import compute_kid

    try:
        detector = load_inception_detector()
    except FileNotFoundError:
        print('WARNING: using RandomProjectionDetector (no InceptionV3 weights)')
        detector = RandomProjectionDetector(2048)

    real = ImageFolderDataset(args.real, resolution=args.resolution)
    fake = ImageFolderDataset(args.fake, resolution=args.resolution)
    metrics = args.metrics.split(',')
    want_all = 'kid' in metrics

    real_stats = compute_feature_stats_for_dataset(
        real, detector, max_items=args.max_items, capture_mean_cov=True,
        capture_all=want_all)
    fake_stats = compute_feature_stats_for_dataset(
        fake, detector, max_items=args.max_items, capture_mean_cov=True,
        capture_all=want_all)

    if 'fid' in metrics:
        print(f'fid: {compute_fid(real_stats, fake_stats):.4f}')
    if 'kid' in metrics:
        print(f'kid: {compute_kid(real_stats.get_all(), fake_stats.get_all()):.6f}')


if __name__ == '__main__':
    main()
