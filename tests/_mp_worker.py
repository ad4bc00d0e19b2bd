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

# persistent compile cache (machine-keyed, same as conftest): the MP_LOOP
# leg compiles the full train step in each worker — minutes fresh, cheap
# on reruns
from tdgp.utils.platform import compilation_cache_dir  # noqa: E402

jax.config.update('jax_compilation_cache_dir', os.path.abspath(
    compilation_cache_dir(os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

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

    # ---- rank-sharded data loading through the LOOP's own constructor
    # (make_data_iterator): per-process index streams must be the sampler's
    # rank-strided shares — disjoint across processes on a fresh epoch
    # (ref misc.py:112-143 + training_loop.py:99-100)
    data_dir = os.environ.get('MP_DATA_DIR')
    if data_dir:
        import dataclasses

        from tdgp.config import tiny_test_config
        from tdgp.data.dataset import InfiniteSampler
        from tdgp.training.loop import make_data_iterator

        cfg = tiny_test_config()
        cfg = dataclasses.replace(
            cfg,
            dataset=dataclasses.replace(
                cfg.dataset, path=data_dir, resolution=16, c_dim=3,
                mirror=False, use_embeddings=False),
            loss=dataclasses.replace(cfg.loss, kd=dataclasses.replace(
                cfg.loss.kd, weight=0.0)))
        # single prefetch thread -> batches arrive in sampler order (the
        # 2-thread default can reorder chunks, which only permutes batches
        # but would make the exact-prefix check racy)
        it, loader = make_data_iterator(cfg, batch_size=8, loader_threads=1)
        assert loader.rank == pid and loader.num_replicas == nproc
        n_batches = 6
        got = []
        for _ in range(n_batches):
            got.extend(int(i) for i in next(it)['_indices'])
        loader.close()
        # exact multiset vs the rank-strided sampler prefix (batches may be
        # queue-reordered by the prefetch threads; each is a contiguous
        # chunk, so the prefix multiset is invariant). This is the
        # load-bearing check: the loop's loader really consumes THIS
        # process's rank-strided share of the global index stream.
        sampler = iter(InfiniteSampler(48, rank=pid, num_replicas=nproc,
                                       seed=cfg.training.seed))
        want = [next(sampler) for _ in range(len(got))]
        assert sorted(got) == sorted(want), (sorted(got)[:8], sorted(want)[:8])
        # cross-process: the two rank streams are disjoint BY POSITION
        # (stream[r::nproc]); exact per-epoch VALUE disjointness does NOT
        # hold because the reference's InfiniteSampler window-shuffles
        # across epoch boundaries (ref misc.py:112-143). Each process
        # consumed 6 local batches of batch_size//nproc = 4 -> 24 indices,
        # 48 combined ~= one epoch: assert near-full coverage and bounded
        # repetition instead.
        mine = np.zeros(48, np.int32)
        for i in got:
            mine[i] += 1
        counts = multihost_utils.process_allgather(mine)
        assert counts.shape == (2, 48)
        total = counts.sum(axis=0)
        assert int(total.sum()) == 48, total.sum()
        assert int((total == 0).sum()) <= 10, total  # window shuffle slack
        assert int(total.max()) <= 3, total          # no runaway repetition
        print(f'MP_DATA_OK process={pid}', flush=True)

    # ---- end-to-end 2-process TRAINING LOOP smoke (MP_LOOP_DIR): the full
    # loop over the global 2x2 mesh — shard_map step with cross-process
    # pmean, rank-0-gated host IO (stats.jsonl/TB), multi-process snapshot
    # save (local-shard pull + rank-0 write + barrier), telemetry host_np
    # pulls on multi-host arrays. Synthetic data (dims self-consistent);
    # the rank-sharded REAL loader is covered by the MP_DATA leg above.
    loop_dir = os.environ.get('MP_LOOP_DIR')
    if loop_dir:
        import dataclasses

        from tdgp.config import tiny_test_config
        from tdgp.training.loop import training_loop

        lcfg = tiny_test_config()
        lcfg = dataclasses.replace(
            lcfg, training=dataclasses.replace(lcfg.training, batch_size=8))
        # 6 global batches -> the done-tick fires once: one jsonl line, one
        # snapshot, one camera-posterior telemetry pull
        final_state = training_loop(lcfg, loop_dir, mesh=mesh,
                                    max_kimg=0.048, verbose=False)
        # params stayed replica-consistent across processes
        leaf = np.asarray(jax.tree.leaves(final_state.g_params)[0].addressable_shards[0].data)
        sums = multihost_utils.process_allgather(
            np.asarray([float(np.abs(leaf).sum())], np.float64))
        assert np.allclose(sums[0], sums[1]), sums
        # snapshot written (by rank 0, behind the save barrier -> visible
        # to both) and host IO gated to rank 0
        snaps = [f for f in os.listdir(loop_dir)
                 if f.startswith('network-snapshot-') and not f.endswith('.json')]
        assert snaps, os.listdir(loop_dir)
        stats_path = os.path.join(loop_dir, 'stats.jsonl')
        assert os.path.exists(stats_path), os.listdir(loop_dir)
        with open(stats_path) as f:
            n_lines = sum(1 for _ in f)
        assert n_lines == 1, n_lines  # exactly one tick, written once
        print(f'MP_LOOP_OK process={pid}', flush=True)

    print(f'MP_OK process={pid}/{nproc}', flush=True)


if __name__ == '__main__':
    main()
