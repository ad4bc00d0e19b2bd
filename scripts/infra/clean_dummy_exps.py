#!/usr/bin/env python
"""Delete short "test" experiments that pollute the experiments root.

Counterpart of ref scripts/infra/clean_dummy_exps.py:25-76: find experiment
dirs whose training never got past --min-kimg (by snapshot scan — the
reference greps network-snapshot-*.pkl the same way), older than
--days, and remove them. --print-only lists without deleting.

Usage:
  python scripts/infra/clean_dummy_exps.py --root experiments \
      [--min-kimg 10] [--days 1] [--print-only]
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from tdgp.checkpoint import list_snapshots


def sizeof_fmt(num: float) -> str:
    for unit in ('B', 'KiB', 'MiB', 'GiB', 'TiB'):
        if abs(num) < 1024.0:
            return f'{num:3.1f}{unit}'
        num /= 1024.0
    return f'{num:.1f}PiB'


def dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def is_experiment_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, 'experiment_config.yaml'))


def max_kimg(path: str) -> int:
    snaps = list_snapshots(path)
    return snaps[-1][0] if snaps else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='experiments')
    ap.add_argument('--min-kimg', type=int, default=10,
                    help='delete runs that never reached this many kimg')
    ap.add_argument('--days', type=float, default=1.0,
                    help='only touch dirs untouched for this many days')
    ap.add_argument('--print-only', action='store_true')
    args = ap.parse_args()

    now = time.time()
    victims = []
    for name in sorted(os.listdir(args.root)):
        path = os.path.join(args.root, name)
        if not os.path.isdir(path) or not is_experiment_dir(path):
            continue
        if max_kimg(path) >= args.min_kimg:
            continue
        if (now - os.stat(path).st_mtime) < args.days * 86400:
            continue
        victims.append(path)

    freed = 0
    for path in victims:
        size = dir_size(path)
        freed += size
        print(f'{"would delete" if args.print_only else "deleting"} '
              f'{path} ({sizeof_fmt(size)}, {max_kimg(path)} kimg)')
        if not args.print_only:
            shutil.rmtree(path)
    print(f'{len(victims)} experiments, {sizeof_fmt(freed)} '
          f'{"would be " if args.print_only else ""}freed')


if __name__ == '__main__':
    main()
