"""Checkpoint save/resume (ref: training_loop.py:424-497, persistence.py).

The reference pickles live torch modules with embedded source code
(`@persistent_class`) so old checkpoints survive code changes. The JAX-native
equivalent is structural: checkpoints are pure pytrees of arrays (orbax),
decoupled from code by construction — any code that can build the same tree
shape can load them. Snapshot naming, 'latest' resume scanning and
best-checkpoint retention mirror the reference.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

SNAPSHOT_RE = re.compile(r'network-snapshot-(\d{6})$')


def snapshot_path(run_dir: str, kimg: int) -> str:
    return os.path.join(run_dir, f'network-snapshot-{int(kimg):06d}')


def save_snapshot(run_dir: str, state, *, cur_nimg: int, meta: Optional[Dict[str, Any]] = None) -> str:
    """Save the full TrainState + metadata under network-snapshot-{kimg:06d}."""
    path = os.path.abspath(snapshot_path(run_dir, cur_nimg // 1000))
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    with open(path + '.meta.json', 'w') as f:
        json.dump({'cur_nimg': int(cur_nimg), **(meta or {})}, f)
    return path


def list_snapshots(run_dir: str):
    """Sorted (kimg, path) pairs of snapshots in run_dir (ref train.py:249-259)."""
    if not os.path.isdir(run_dir):
        return []
    out = []
    for name in os.listdir(run_dir):
        m = SNAPSHOT_RE.match(name)
        if m and os.path.isdir(os.path.join(run_dir, name)):
            out.append((int(m.group(1)), os.path.join(run_dir, name)))
    return sorted(out)


def resolve_resume(run_dir: str, resume: str) -> Optional[str]:
    """'latest' -> newest snapshot path; explicit path -> itself; None if nothing."""
    if resume in (None, '', 'none'):
        return None
    if resume == 'latest':
        snaps = list_snapshots(run_dir)
        return snaps[-1][1] if snaps else None
    return resume


def load_snapshot(path: str, target_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore a TrainState (shape/dtype template = target_state) + metadata."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(target_state))
    state = ckptr.restore(os.path.abspath(path), abstract)
    meta = {}
    meta_path = path + '.meta.json'
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def find_best_checkpoint(run_dir: str, metric: str = 'fid2k_full') -> Optional[str]:
    """Pick the snapshot with the best (lowest) recorded metric value from
    metric-<name>.jsonl (ref scripts/utils.py:155-171). Falls back to latest."""
    jsonl = os.path.join(run_dir, f'metric-{metric}.jsonl')
    snaps = dict(list_snapshots(run_dir))
    if not snaps:
        return None
    if os.path.exists(jsonl):
        best_val, best_kimg = None, None
        with open(jsonl) as f:
            for line in f:
                rec = json.loads(line)
                val = rec.get('results', {}).get(metric)
                snap = rec.get('snapshot')
                if val is None or snap is None:
                    continue
                kimg = int(snap)
                if kimg in snaps and (best_val is None or val < best_val):
                    best_val, best_kimg = val, kimg
        if best_kimg is not None:
            return snaps[best_kimg]
    return snaps[max(snaps)]


def delete_snapshot(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    meta = path + '.meta.json'
    if os.path.exists(meta):
        os.remove(meta)


def variables_from_flat(flat) -> dict:
    """'col/a/b/leaf' -> nested flax variables dict (jnp leaves).

    Inverse of scripts/convert_torch_ckpt.py's flat layout; used to load
    reference-converted weights for parity evaluation (BASELINE.md config[0],
    ref scripts/utils.py:150-204 load_generator counterpart).
    """
    import jax.numpy as jnp
    tree: dict = {}
    for key in flat.keys() if hasattr(flat, 'keys') else flat.files:
        parts = key.split('/')
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(flat[key])
    return tree
