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


def _host_tree(state):
    """Pull a (possibly multi-host) TrainState to host numpy.

    jax.device_get raises on arrays spanning non-addressable devices; the
    train state is REPLICATED across the mesh, so each process's local
    shard IS the full value — read that."""
    def pull(x):
        if hasattr(x, 'is_fully_addressable') and not x.is_fully_addressable:
            return np.asarray(x.addressable_shards[0].data)
        return jax.device_get(x)
    return jax.tree.map(pull, state)


def save_snapshot(run_dir: str, state, *, cur_nimg: int, meta: Optional[Dict[str, Any]] = None) -> str:
    """Save the full TrainState + metadata under network-snapshot-{kimg:06d}.

    Multi-process: every process participates (the host pull touches global
    arrays), process 0 writes the files (state is replicated — orbax on host
    trees is not a collective save), and a barrier keeps the others from
    racing ahead to read a half-written snapshot (ref training_loop.py:461
    writes the pickle on rank 0 only)."""
    path = os.path.abspath(snapshot_path(run_dir, cur_nimg // 1000))
    host_state = _host_tree(state)
    multiproc = jax.process_count() > 1
    if multiproc:
        from jax.experimental import multihost_utils
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    if multiproc:  # nobody enters orbax's save while rank 0 clears the dir
        multihost_utils.sync_global_devices(f'tdgp_save_pre_{cur_nimg}')
    # orbax's Checkpointer is itself collective in multi-process runs (it
    # barriers internally on '_Checkpointer:save_start' and coordinates who
    # writes) — ALL processes must call save with the same (host,
    # replicated) tree; a rank-0-only call deadlocks its barrier
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_state)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(path + '.meta.json', 'w') as f:
            json.dump({'cur_nimg': int(cur_nimg), **(meta or {})}, f)
    if multiproc:  # meta.json visible to every process before returning
        multihost_utils.sync_global_devices(f'tdgp_save_post_{cur_nimg}')
    return path


def snapshot_kimg(snap) -> Optional[int]:
    """Parse the kimg out of any snapshot reference — a zero-padded kimg
    string ('000010', what calc_metrics writes into metric jsonls), a
    snapshot dir basename, or a full path. The ONE parser for the value
    that best-checkpoint retention keys off (the loop's path-basename
    parse and find_best_checkpoint's int(snap) previously disagreed)."""
    if snap is None:
        return None
    if isinstance(snap, int):
        return snap
    name = os.path.basename(str(snap).rstrip('/'))
    m = SNAPSHOT_RE.match(name)
    if m:
        return int(m.group(1))
    return int(name) if name.isdigit() else None


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
    # _host_tree (not device_get): the template may hold multi-host arrays
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, _host_tree(target_state))
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
                kimg = snapshot_kimg(rec.get('snapshot'))
                if val is None or kimg is None:
                    continue
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
