#!/usr/bin/env python
"""Join images with their depth estimates into one training folder
(ref: data_scripts/merge_depth_data.py): copies `<name>.<ext>` from the image
dir and `<name>.png` (16-bit LeReS / 8-bit ZoeDepth) from the depth dir as
`<name>_depth.png` next to it.

Usage:
  python data_scripts/merge_depth_data.py --images imgs/ --depths depths/ --dst merged/
"""
import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', required=True)
    ap.add_argument('--depths', required=True)
    ap.add_argument('--dst', required=True)
    args = ap.parse_args()

    exts = {'.jpg', '.jpeg', '.png', '.bmp', '.webp'}
    n_ok, n_missing = 0, 0
    for root, _dirs, files in os.walk(args.images):
        for f in files:
            if os.path.splitext(f)[1].lower() not in exts:
                continue
            rel = os.path.relpath(os.path.join(root, f), args.images)
            base = os.path.splitext(rel)[0]
            depth_src = None
            for cand in (base + '.png', base + '_depth.png'):
                p = os.path.join(args.depths, cand)
                if os.path.exists(p):
                    depth_src = p
                    break
            dst_img = os.path.join(args.dst, rel)
            os.makedirs(os.path.dirname(dst_img), exist_ok=True)
            shutil.copy2(os.path.join(root, f), dst_img)
            if depth_src:
                shutil.copy2(depth_src, os.path.join(args.dst, base + '_depth.png'))
                n_ok += 1
            else:
                n_missing += 1
    print(f'merged {n_ok} pairs, {n_missing} images without depth')


if __name__ == '__main__':
    main()
