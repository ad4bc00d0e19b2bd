#!/usr/bin/env python
"""Compare the metric trend of two run dirs (e.g. a baseline dynamics run vs
a flag A/B such as training.dmain_reuse_fakes) over their common kimg range.

Usage: python scripts/testing/compare_runs.py RUN_A RUN_B [--metric fid2k_full]

Prints a per-snapshot table and the mean relative gap over the common range —
the neutrality evidence a perf flag needs before becoming a default
(docs/DESIGN.md ledger protocol).
"""
import argparse
import json
import os


def load_trend(run_dir: str, metric: str):
    path = os.path.join(run_dir, f'metric-{metric}.jsonl')
    trend = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            # snapshot key: kimg as int (records carry 'snapshot' '000123');
            # skip non-kimg records — calc_metrics appends snapshot='best'
            # (or null) into the same jsonl
            snap = rec.get('snapshot')
            if snap is None or not str(snap).isdigit():
                continue
            val = rec['results'][metric] if 'results' in rec else rec[metric]
            trend[int(snap)] = float(val)
    return trend


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('run_a')
    ap.add_argument('run_b')
    ap.add_argument('--metric', default='fid2k_full')
    args = ap.parse_args()
    a = load_trend(args.run_a, args.metric)
    b = load_trend(args.run_b, args.metric)
    common = sorted(set(a) & set(b))
    if not common:
        print(f'no common snapshots (A: {sorted(a)[:5]}..., B: {sorted(b)[:5]}...)')
        return
    print(f'{"kimg":>6}  {"A":>10}  {"B":>10}  {"rel gap":>8}')
    gaps = []
    for k in common:
        gap = (b[k] - a[k]) / max(abs(a[k]), 1e-9)
        gaps.append(gap)
        print(f'{k:>6}  {a[k]:>10.3f}  {b[k]:>10.3f}  {gap:>+8.1%}')
    print(f'mean relative gap over {len(common)} snapshots: '
          f'{sum(gaps) / len(gaps):+.1%} (B vs A; + means B worse for FID-like)')


if __name__ == '__main__':
    main()
