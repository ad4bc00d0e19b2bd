"""Mesh/sharding helpers + replica consistency checker."""
import numpy as np

import jax
import jax.numpy as jnp

from tdgp.parallel import check_replica_consistency, make_mesh, replicate, shard_batch


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    batch = {'img': np.random.randn(16, 4, 4, 3).astype(np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded['img'].shape == (16, 4, 4, 3)
    assert len(sharded['img'].addressable_shards) == 8
    assert sharded['img'].addressable_shards[0].data.shape == (2, 4, 4, 3)


def test_replica_consistency_detects_divergence():
    mesh = make_mesh(8)
    tree = {'dense': {'weight': jnp.ones((4, 4))}, 'mapping': {'w_avg': jnp.zeros(4)}}
    rep = replicate(tree, mesh)
    assert check_replica_consistency(rep) == []

    # build an intentionally divergent "replicated" array
    from jax.sharding import NamedSharding, PartitionSpec as P
    per_dev = [jax.device_put(jnp.full((4, 4), float(i)), d)
               for i, d in enumerate(mesh.devices.ravel())]
    divergent = jax.make_array_from_single_device_arrays(
        (4, 4), NamedSharding(mesh, P()), per_dev)
    bad = {'dense': {'weight': divergent}}
    assert check_replica_consistency(bad) == ['dense.weight']


def test_ignore_regex_skips_ema_buffers():
    mesh = make_mesh(2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    per_dev = [jax.device_put(jnp.full(3, float(i)), d)
               for i, d in enumerate(mesh.devices.ravel())]
    divergent = jax.make_array_from_single_device_arrays(
        (3,), NamedSharding(mesh, P()), per_dev)
    tree = {'mapping': {'w_avg': divergent}}
    assert check_replica_consistency(tree) == []
