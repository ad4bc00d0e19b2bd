#!/usr/bin/env python
"""Export a slim, portable G_ema-only checkpoint from a training snapshot.

Counterpart of the reference's scripts/move_ckpt_to_cpu.py (ref :1-51):
there, full-pickle snapshots embed live CUDA modules + optimizer state and
must be rewritten to CPU tensors before they can be shared or served. Orbax
pytrees are device-agnostic by construction, so the remaining real job is
SLIMMING: a full TrainState carries G+D params, both optimizer moment sets
and the EMA copy — ~6x the weights a consumer needs. This extracts
{ema_params, ema_ema_coll, g_consts} (exactly what inference loads,
tdgp/inference.py) into one .npz keyed 'col/path/leaf' — the same flat
layout scripts/convert_torch_ckpt.py emits, loadable via
tdgp.checkpoint.variables_from_flat.

Usage:
  python scripts/infra/export_ema.py --run-dir experiments/<run> \
      [--snapshot latest|best|<path>] [--out g_ema.npz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def flatten_tree(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f'{prefix}{k}/'))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--snapshot', default='latest',
                    help="latest | best | explicit snapshot path")
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    # hard-set, not setdefault: deployment rigs export JAX_PLATFORMS for
    # the accelerator plugin; the export needs no device and must not
    # grab (or contend for) a chip a training job may be using
    os.environ['JAX_PLATFORMS'] = 'cpu'
    from tdgp.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from tdgp import checkpoint as ckpt
    import orbax.checkpoint as ocp

    if args.snapshot == 'latest':
        path = ckpt.resolve_resume(args.run_dir, 'latest')
    elif args.snapshot == 'best':
        path = ckpt.find_best_checkpoint(args.run_dir)
    else:
        path = args.snapshot
    assert path, f'no snapshot found in {args.run_dir}'

    # restore WITHOUT a shape template: read the stored pytree as saved
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))

    flat = {}
    flat.update(flatten_tree(state['ema_params'], 'params/'))
    flat.update(flatten_tree(state['ema_ema_coll'], 'ema/'))
    flat.update(flatten_tree(state['g_consts'], 'consts/'))

    out = args.out or os.path.join(args.run_dir,
                                   os.path.basename(path) + '-g_ema.npz')
    np.savez(out, **flat)
    total = sum(v.size * v.itemsize for v in flat.values())
    print(f'{out}: {len(flat)} arrays, {total / 1e6:.1f} MB '
          f'(from {os.path.basename(path)})')


if __name__ == '__main__':
    main()
