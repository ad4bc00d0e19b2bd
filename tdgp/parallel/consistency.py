"""Replica-divergence detection.

Counterpart of ref misc.check_ddp_consistency (misc.py:261-272): the
reference broadcasts every param from rank 0 and compares, every snapshot
tick, with an ignore-regex for intentionally unsynced EMA buffers. Under
shard_map-DP the params are a single replicated jax.Array, so divergence
would be a runtime bug rather than a training bug — but the check still
exists for multi-process setups and as a guard on donation/aliasing errors:
it hashes each replica shard on its device and compares.
"""
from __future__ import annotations

import re
from typing import Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _dotted(path) -> str:
    return '.'.join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)


def check_replica_consistency(tree, ignore_regex: str = r'.*\.(w_avg|magnitude_ema|p)$',
                              name_prefix: str = '') -> List[str]:
    """Returns a list of param paths whose per-device replicas differ.
    Default ignore regex matches the reference's (misc.py:261-272)."""
    mismatches: List[str] = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    pattern = re.compile(ignore_regex)
    for path, leaf in flat:
        name = name_prefix + _dotted(path)
        if pattern.match(name):
            continue
        if not isinstance(leaf, jax.Array) or leaf.is_fully_addressable is False:
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(ref, np.asarray(s.data)):
                mismatches.append(name)
                break
    return mismatches
