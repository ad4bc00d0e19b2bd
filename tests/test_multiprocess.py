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

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_toy_dataset(root, n=48, res=16, n_classes=3):
    import json

    import numpy as np
    import PIL.Image
    os.makedirs(root)
    rng = np.random.RandomState(0)
    labels, cameras = {}, {}
    for i in range(n):
        name = f'img{i:03d}.png'
        arr = rng.randint(0, 255, (res, res, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(os.path.join(root, name))
        depth = rng.randint(0, 65535, (res, res), dtype=np.uint16)
        PIL.Image.fromarray(depth, mode='I;16').save(
            os.path.join(root, f'img{i:03d}_depth.png'))
        labels[name] = i % n_classes
        cameras[name] = [0.1 * i, 1.5, 0.0]
    with open(os.path.join(root, 'dataset.json'), 'w') as f:
        json.dump({'labels': labels, 'camera_angles': cameras}, f)


def test_two_process_distributed_collectives(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), '_mp_worker.py')
    port = _free_port()
    data_dir = str(tmp_path / 'toy')
    _make_toy_dataset(data_dir)
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(('XLA_FLAGS', 'JAX_'))}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
                   NUM_PROCESSES='2', PROCESS_ID=str(pid),
                   MP_CACHE_DIR=str(tmp_path / 'metric-cache'),
                   MP_DATA_DIR=data_dir,
                   MP_LOOP_DIR=str(tmp_path / 'loop-run'))
        procs.append(subprocess.Popen([sys.executable, worker], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            # the MP_LOOP leg compiles the full train step in each worker:
            # minutes on a cold compile cache, fast warm
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {i} failed:\n{out[-3000:]}'
        assert f'MP_OK process={i}/2' in out, out[-3000:]
        assert f'MP_CACHE_OK process={i}' in out, out[-3000:]
        assert f'MP_DATA_OK process={i}' in out, out[-3000:]
        assert f'MP_LOOP_OK process={i}' in out, out[-3000:]
