#!/usr/bin/env python
"""Render training-run curves (losses, D sign rate + ADA p, FID trend) from a
run dir's stats.jsonl / metric-*.jsonl into one PNG for the run artifact.

Usage: python scripts/testing/plot_run_curves.py --run-dir experiments/<run>
"""
import argparse
import json
import os

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

# dataviz reference palette, categorical slots in fixed order (light mode)
S1, S2, S3 = '#2a78d6', '#eb6834', '#1baf7a'
SURFACE = '#fcfcfb'
TEXT = '#0b0b0b'
TEXT2 = '#52514e'
GRID = '#e5e4e0'


def series(ticks, key, tick_kimg):
    xs, ys = [], []
    for i, d in enumerate(ticks):
        v = d.get(key)
        if v is None:
            continue
        xs.append((i + 1) * tick_kimg)
        ys.append(v['mean'] if isinstance(v, dict) else v)
    return xs, ys


def style(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=TEXT, fontsize=11, loc='left')
    ax.tick_params(colors=TEXT2, labelsize=9)
    ax.grid(True, color=GRID, linewidth=0.6)
    for s in ax.spines.values():
        s.set_visible(False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    ticks = [json.loads(l) for l in
             open(os.path.join(args.run_dir, 'stats.jsonl'))]
    tick_kimg = 4.0
    cfg_path = os.path.join(args.run_dir, 'experiment_config.yaml')
    if os.path.exists(cfg_path):
        import yaml
        tick_kimg = float(yaml.safe_load(open(cfg_path))['training']
                          .get('tick_kimg', 4.0))
    fig, axes = plt.subplots(3, 1, figsize=(7, 8), dpi=120)
    fig.patch.set_facecolor(SURFACE)

    ax = axes[0]
    for key, label, color in (('Loss/G/loss', 'G loss', S1),
                              ('Loss/D/loss', 'D loss', S2)):
        xs, ys = series(ticks, key, tick_kimg)
        ax.plot(xs, ys, color=color, linewidth=2, label=label)
    style(ax, 'Adversarial losses')
    ax.legend(frameon=False, labelcolor=TEXT2, fontsize=9)

    ax = axes[1]
    for key, label, color in (('Loss/signs/real', 'D sign rate (real)', S1),
                              ('Progress/augment_p', 'ADA p', S2)):
        xs, ys = series(ticks, key, tick_kimg)
        ax.plot(xs, ys, color=color, linewidth=2, label=label)
    ax.axhline(0.6, color=TEXT2, linewidth=1, linestyle=':',
               label='ADA target')
    style(ax, 'Discriminator overfitting / ADA response')
    ax.legend(frameon=False, labelcolor=TEXT2, fontsize=9)

    ax = axes[2]
    mpath = os.path.join(args.run_dir, 'metric-fid2k_full.jsonl')
    if os.path.exists(mpath):
        rows = [json.loads(l) for l in open(mpath)]
        xs = [int(r['snapshot']) for r in rows]
        ys = [r['results']['fid2k_full'] for r in rows]
        ax.plot(xs, ys, color=S3, linewidth=2, marker='o', markersize=4,
                label='fid2k_full (proxy detector)')
        ax.legend(frameon=False, labelcolor=TEXT2, fontsize=9)
    style(ax, 'FID-proxy trend')
    ax.set_xlabel('kimg', color=TEXT2, fontsize=9)

    fig.tight_layout()
    out = args.out or os.path.join(args.run_dir, 'curves.png')
    fig.savefig(out, facecolor=SURFACE)
    print(out)


if __name__ == '__main__':
    main()
