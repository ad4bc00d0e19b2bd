"""Device mesh + sharding helpers.

Counterpart of the reference's NCCL plumbing (SURVEY.md §2.3): the reference
hand-rolled DP with `torch.multiprocessing.spawn` + flat-tensor all_reduce
(ref training_loop.py:335-344); here a 1-D 'data' mesh + shard_map inside the
train step (tdgp.training.train_step) replaces all of it, and multi-host
comes free from jax.distributed over DCN with ICI handling the intra-slice
collectives.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = 'data') -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = 'data') -> Dict[str, Any]:
    """Place host batch arrays sharded along axis 0 of the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def init_distributed() -> None:
    """Multi-host initialization (replaces the reference's file-based NCCL
    rendezvous, ref train.py:37-44). No-op on a single host.

    Explicit COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env vars drive the
    rendezvous (cluster auto-detection — SLURM/GKE — still applies when only
    COORDINATOR_ADDRESS is set); exercised by the real two-process test in
    tests/test_multiprocess.py."""
    import os
    if 'COORDINATOR_ADDRESS' in os.environ:
        if 'NUM_PROCESSES' in os.environ:
            if 'PROCESS_ID' not in os.environ:
                raise RuntimeError(
                    'NUM_PROCESSES is set but PROCESS_ID is not — explicit '
                    'rendezvous needs COORDINATOR_ADDRESS + NUM_PROCESSES + '
                    'PROCESS_ID together')
            jax.distributed.initialize(
                coordinator_address=os.environ['COORDINATOR_ADDRESS'],
                num_processes=int(os.environ['NUM_PROCESSES']),
                process_id=int(os.environ['PROCESS_ID']))
        else:
            jax.distributed.initialize()
