"""AOT serving export (tdgp/serving.py): the serialized artifact must
reproduce the live model bit-for-bit-ish on the same backend."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.config import tiny_test_config, asdict
from tdgp.models.epigraf import Generator
from tdgp.rendering import sample_camera_params
from tdgp import serving

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"


def _init_rngs():
    return {'params': jax.random.PRNGKey(1), 'noise': jax.random.PRNGKey(2),
            'render': jax.random.PRNGKey(3), 'depth': jax.random.PRNGKey(4),
            'dropout': jax.random.PRNGKey(5)}


def test_export_roundtrip_matches_live():
    cfg = tiny_test_config()
    gc = cfg.generator
    n = 2
    G = Generator(gc)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (n, gc.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % gc.c_dim, gc.c_dim)
    cam = sample_camera_params(key, asdict(cfg.camera), n)
    g_vars = G.init(_init_rngs(), z, c, cam, camera_angles_cond=cam.angles,
                    train=True, concat_depth=True)

    blob = serving.export_serving(G, g_vars, n, truncation_psi=0.7)
    assert isinstance(blob, bytes) and len(blob) > 1000

    served = serving.load_serving(blob)
    live = serving.make_serving_fn(G, g_vars, truncation_psi=0.7)(
        z, c, cam.angles, cam.fov, cam.radius, cam.look_at)
    loaded = served(z, c, cam.angles, cam.fov, cam.radius, cam.look_at)

    assert live.shape == (n, gc.img_resolution, gc.img_resolution, 3)
    assert float(jnp.min(live)) >= 0.0 and float(jnp.max(live)) <= 1.0
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(live),
                               rtol=1e-5, atol=1e-5)


def test_sharded_export_runs_on_mesh():
    """mesh_devices=8: the artifact records batch shardings over the 'data'
    mesh and reproduces the single-device fn on the 8-device test mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    cfg = tiny_test_config()
    gc = cfg.generator
    n = 8
    G = Generator(gc)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (n, gc.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % gc.c_dim, gc.c_dim)
    cam = sample_camera_params(key, asdict(cfg.camera), n)
    g_vars = G.init(_init_rngs(), z[:2], c[:2], cam[:2],
                    camera_angles_cond=cam.angles[:2], train=True,
                    concat_depth=True)

    blob = serving.export_serving(G, g_vars, n, mesh_devices=8)
    served = serving.load_serving(blob)
    mesh = serving.serving_mesh(8)
    shard = NamedSharding(mesh, PartitionSpec('data'))
    args = [jax.device_put(a, shard)
            for a in (z, c, cam.angles, cam.fov, cam.radius, cam.look_at)]
    out = served(*args)
    assert out.sharding.is_equivalent_to(shard, out.ndim)

    live = serving.make_serving_fn(G, g_vars)(
        z, c, cam.angles, cam.fov, cam.radius, cam.look_at)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-4, atol=1e-4)
