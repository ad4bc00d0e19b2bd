"""AOT serving export: freeze the EMA generator into a portable XLA artifact.

`jax.export` lowers the full z→image pipeline (mapping + truncation +
tri-plane synthesis, const noise) to serialized StableHLO. The artifact
reloads WITHOUT the model code — a serving process needs jax and the bytes,
not tdgp — and compiles on whatever backend loads it (the TPU serving
fleet). The reference has no deployment story beyond running its research
repo (ref scripts/inference.py); this is the TPU-native counterpart for
production serving.

The exported signature is positional:
    (z [B, z_dim], c [B, c_dim], angles [B, 3], fov [B], radius [B],
     look_at [B, 3]) -> images [B, H, W, 3] in [0, 1]
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jexport

from tdgp.utils.tensor_group import TensorGroup


def make_serving_fn(G, g_vars, truncation_psi: float = 1.0,
                    **synthesis_kwargs) -> Callable:
    """z→image closure over frozen EMA variables (truncation toward the
    mapping w_avg EMA, const-noise synthesis — ref inference_utils semantics)."""
    mbr = G.cfg.max_batch_res
    if 'ray_chunk' not in synthesis_kwargs and G.cfg.img_resolution > mbr:
        synthesis_kwargs['ray_chunk'] = mbr * mbr

    def fn(z, c, angles, fov, radius, look_at):
        cam = TensorGroup(angles=angles, fov=fov, radius=radius,
                          look_at=look_at)

        def run(g):
            ws = g.map_ws(z, c, camera_angles=angles,
                          truncation_psi=truncation_psi, train=False)
            return g.synthesis(ws, cam, train=False, noise_mode='const',
                               **synthesis_kwargs)

        img = G.apply(g_vars, method=run)
        return jnp.clip(img, -1.0, 1.0) * 0.5 + 0.5

    return fn


def serving_mesh(n_devices: int):
    """1-D 'data' mesh over the first n_devices local devices — the batch
    axis of a sharded serving artifact (see export_serving mesh_devices)."""
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:n_devices]), ('data',))


def export_serving(G, g_vars, batch_size: int, truncation_psi: float = 1.0,
                   platforms=None, mesh_devices: int = 1,
                   **synthesis_kwargs) -> bytes:
    """Serialize the serving fn for a fixed batch size. `platforms` (e.g.
    ['tpu'] or ['cpu','tpu']) pins the lowering targets; default = the
    current backend.

    mesh_devices > 1 exports a BATCH-SHARDED artifact: inputs/outputs are
    split over a 1-D 'data' mesh (rays are embarrassingly parallel, so
    serving scales over ICI with zero cross-chip communication until the
    host reads the images). The loading process must run it on the same
    device count — feed arrays placed with `serving_mesh(n)` +
    `NamedSharding(mesh, P('data'))` (uncommitted arrays work too; the
    recorded shardings commit them)."""
    fn = make_serving_fn(G, g_vars, truncation_psi, **synthesis_kwargs)
    gc = G.cfg
    specs = (
        jax.ShapeDtypeStruct((batch_size, gc.z_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, gc.c_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 3), jnp.float32),
    )
    if mesh_devices > 1:
        assert batch_size % mesh_devices == 0, (batch_size, mesh_devices)
        from jax.sharding import NamedSharding, PartitionSpec
        mesh = serving_mesh(mesh_devices)
        shard = NamedSharding(mesh, PartitionSpec('data'))
        jf = jax.jit(fn, in_shardings=(shard,) * len(specs),
                     out_shardings=shard)
    else:
        jf = jax.jit(fn)
    exp = jexport.export(jf, platforms=platforms)(*specs)
    return bytes(exp.serialize())


def load_serving(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a callable (jit-compiled on
    first call for the loading process's backend)."""
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call)
