"""Worker for the real two-process jax.distributed test
(tests/test_multiprocess.py). Each process owns 2 virtual CPU devices; the
global mesh is 2 processes x 2 devices = 4. Validates the actual multi-host
code paths the framework ships: init_distributed rendezvous, cross-process
pmean inside shard_map (the train step's gradient sync), and
process_allgather (the metric feature gather)."""
import os
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tdgp.parallel.mesh import init_distributed


def main():
    init_distributed()
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, nproc
    devices = jax.devices()
    assert len(devices) == 4, devices

    mesh = Mesh(np.asarray(devices).reshape(4), ('data',))

    # ---- cross-process pmean (the gradient-sync collective in train_step)
    local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * pid
    garr = multihost_utils.host_local_array_to_global_array(local, mesh,
                                                           P('data'))

    def f(x):
        return jax.lax.pmean(jnp.sum(x), axis_name='data')

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P('data'),
                            out_specs=P()))(garr)
    # fully-replicated output: every process holds an addressable replica
    got = float(np.asarray(out.addressable_data(0)))
    # global rows: proc0 rows sum (3+12), proc1 ((100..)=303, 312);
    # pmean over 4 shards of per-shard row-sums
    want = (3.0 + 12.0 + 303.0 + 312.0) / 4
    assert abs(got - want) < 1e-5, (got, want)

    # ---- process_allgather (metric feature gather, metrics/features.py)
    feats = np.full((2, 4), float(pid), dtype=np.float32)
    gathered = multihost_utils.process_allgather(feats)
    assert gathered.shape == (2, 2, 4), gathered.shape
    assert np.allclose(gathered[0], 0.0) and np.allclose(gathered[1], 1.0)

    # ---- metric feature stats over a shared cache dir: cold pass computes
    # (rank-strided subsets + interleaved gather, rank 0 saves, barrier),
    # warm pass loads via the rank-0 cache-flag broadcast
    # (ref metric_utils.py:249-258; tdgp/metrics/features.py)
    cache_dir = os.environ.get('MP_CACHE_DIR')
    if cache_dir:
        from tdgp.metrics.features import compute_feature_stats_for_dataset

        class DS:
            name = 'mpfake'

            def __len__(self):
                return 16

            def __getitem__(self, i):
                return {'image': np.full((4, 4, 3), i, np.uint8)}

        def detector(images):
            return jnp.asarray(np.asarray(images)[:, 0, 0, :1], jnp.float32)

        cold = compute_feature_stats_for_dataset(
            DS(), detector, detector_name='idx', batch_size=4, max_items=16,
            cache_dir=cache_dir, capture_all=True)
        items = np.sort(cold.get_all()[:, 0])
        assert np.array_equal(items, np.arange(16, dtype=np.float32)), items

        warm = compute_feature_stats_for_dataset(
            DS(), detector, detector_name='idx', batch_size=4, max_items=16,
            cache_dir=cache_dir, capture_all=True)
        assert np.array_equal(np.sort(warm.get_all()[:, 0]), items)
        print(f'MP_CACHE_OK process={pid}', flush=True)

    print(f'MP_OK process={pid}/{nproc}', flush=True)


if __name__ == '__main__':
    main()
