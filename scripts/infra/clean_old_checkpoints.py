#!/usr/bin/env python
"""Checkpoint GC: keep the best-metric and the N latest snapshots
(ref: scripts/infra/clean_old_checkpoints.py:16-41).

Usage:
  python scripts/infra/clean_old_checkpoints.py --run-dir experiments/run \
      --keep-last 2 [--metric fid2k_full] [--dry-run]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--keep-last', type=int, default=2)
    ap.add_argument('--metric', default='fid2k_full')
    ap.add_argument('--dry-run', action='store_true')
    args = ap.parse_args()

    from tdgp import checkpoint as ckpt

    snaps = ckpt.list_snapshots(args.run_dir)
    best = ckpt.find_best_checkpoint(args.run_dir, metric=args.metric)
    keep = {path for _, path in snaps[-args.keep_last:]}
    if best:
        keep.add(best)
    for kimg, path in snaps:
        if path in keep:
            print(f'keep   {path}')
        else:
            print(f'delete {path}')
            if not args.dry_run:
                ckpt.delete_snapshot(path)


if __name__ == '__main__':
    main()
