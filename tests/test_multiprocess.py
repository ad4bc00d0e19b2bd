"""REAL multi-process jax.distributed test (SURVEY §2.3 / §5.8).

The rest of the suite exercises the 8-device mesh in ONE process; this
spawns two OS processes that rendezvous through jax.distributed (the same
path a multi-host TPU pod uses over DCN), each owning 2 virtual CPU
devices, and checks the framework's actual cross-process collectives:
pmean-in-shard_map (gradient sync) and process_allgather (metric feature
gather). Reference counterpart: torch.multiprocessing.spawn + NCCL
file-init (ref train.py:33-53) — which upstream never tested beyond one
node either.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_collectives(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), '_mp_worker.py')
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(('XLA_FLAGS', 'JAX_'))}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
                   NUM_PROCESSES='2', PROCESS_ID=str(pid),
                   MP_CACHE_DIR=str(tmp_path / 'metric-cache'))
        procs.append(subprocess.Popen([sys.executable, worker], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {i} failed:\n{out[-3000:]}'
        assert f'MP_OK process={i}/2' in out, out[-3000:]
        assert f'MP_CACHE_OK process={i}' in out, out[-3000:]
