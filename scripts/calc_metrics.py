#!/usr/bin/env python
"""Offline metric evaluation for a checkpoint (ref: scripts/calc_metrics.py).

Usage:
  python scripts/calc_metrics.py --run-dir experiments/run \
      --metrics fid50k_full,nfs256 --data data/dogs.zip [--snapshot best]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--snapshot', default='best')
    ap.add_argument('--metrics', default='fid2k_full')
    ap.add_argument('--data', default=None, help='dataset path (defaults to config)')
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--batch-gpu', type=int, default=None,
                    help='static per-compile render micro-batch (default: '
                         'auto — full batch <=128px, 4 at >=256px)')
    args = ap.parse_args()

    from scripts.inference import load_run
    from tdgp.data.dataset import ImageFolderDataset
    from tdgp.metrics.detectors import RandomProjectionDetector, load_inception_detector
    from tdgp.metrics.registry import EvalContext, calc_metric, report_metric

    cfg, G, g_vars = load_run(args.run_dir, args.snapshot)
    data_path = args.data or cfg.dataset.path
    dataset = ImageFolderDataset(data_path, resolution=cfg.dataset.resolution,
                                 use_labels=cfg.dataset.c_dim > 0) if data_path else None
    try:
        detector = load_inception_detector()
    except FileNotFoundError:
        print('WARNING: using RandomProjectionDetector (no InceptionV3 weights)')
        detector = RandomProjectionDetector(2048)

    ctx = EvalContext(cfg=cfg, G=G, g_vars=g_vars, dataset=dataset,
                      detector=detector, batch_size=args.batch_size,
                      batch_gpu=args.batch_gpu,
                      cache_dir=os.path.join(args.run_dir, 'metric-cache'))
    # normalize the snapshot label: an explicit path records just its kimg
    # id so metric-*.jsonl stays parseable by plot/compare tooling
    import re
    m = re.search(r'network-snapshot-(\d{6})', args.snapshot)
    snap_label = m.group(1) if m else args.snapshot
    for name in args.metrics.split(','):
        result = calc_metric(name, ctx)
        report_metric(result, run_dir=args.run_dir, snapshot=snap_label)


if __name__ == '__main__':
    main()
