#!/usr/bin/env python
"""Center-crop + Lanczos-resize a dataset (ref: data_scripts/resize_dataset.py).

Usage:
  python data_scripts/resize_dataset.py --src raw_images/ --dst out_256/ --size 256
"""
import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import PIL.Image


def process_one(src_path, dst_path, size):
    img = PIL.Image.open(src_path).convert('RGB')
    w, h = img.size
    side = min(w, h)
    left, top = (w - side) // 2, (h - side) // 2
    img = img.crop((left, top, left + side, top + side))
    img = img.resize((size, size), PIL.Image.LANCZOS)
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    img.save(dst_path, quality=95)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--src', required=True)
    ap.add_argument('--dst', required=True)
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--workers', type=int, default=8)
    args = ap.parse_args()

    exts = {'.jpg', '.jpeg', '.png', '.bmp', '.webp'}
    jobs = []
    for root, _dirs, files in os.walk(args.src):
        for f in files:
            if os.path.splitext(f)[1].lower() in exts:
                src = os.path.join(root, f)
                rel = os.path.relpath(src, args.src)
                jobs.append((src, os.path.join(args.dst, rel)))
    print(f'{len(jobs)} images')
    with ThreadPoolExecutor(args.workers) as ex:
        list(ex.map(lambda j: process_one(j[0], j[1], args.size), jobs))


if __name__ == '__main__':
    main()
