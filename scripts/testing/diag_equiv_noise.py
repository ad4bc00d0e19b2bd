"""Diagnostic: bound fp32 reduction-order noise across three program
structures of the SAME controlled-inputs step semantics — single-device
(scan-of-8 grad accumulation), 4-device mesh (scan-of-2 per shard + pmean),
8-device mesh (1/shard + pmean). batch_gpu=1 everywhere so every per-sample
RNG fold is identical; any disagreement is program-structure numerics (XLA
fusion + reduction order), the floor below which the shard_map equivalence
test cannot assert."""
import dataclasses
import os
import sys

# The axon TPU plugin registers at interpreter startup and IGNORES the
# JAX_PLATFORMS env var (verified: JAX_PLATFORMS=cpu still yields
# [TpuDevice]); the only working override is jax.config.update AFTER
# import, exactly as tests/conftest.py does. Without it every "mesh"
# below silently becomes the same 1-device TPU mesh and the comparison
# is trivially zero.
if 'xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', jax.devices()
assert len(jax.devices()) == 8, jax.devices()
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from tdgp.config import asdict, tiny_test_config
from tdgp.rendering.camera import sample_camera_params
from tdgp.training.patch import sample_patch_params
from tdgp.training.schedules import compute_schedules
from tdgp.training.train_step import create_train_state, make_jitted_train_steps

CFG = tiny_test_config()


def make_cfg():
    patch_eq = dataclasses.replace(CFG.generator.patch, mbstd_group_size=1)
    adaptor_eq = dataclasses.replace(
        CFG.generator.camera_adaptor,
        emd=dataclasses.replace(CFG.generator.camera_adaptor.emd, enabled=False),
        force_mean_weight=0.0)
    return dataclasses.replace(
        CFG,
        generator=dataclasses.replace(CFG.generator, patch=patch_eq,
                                      camera_adaptor=adaptor_eq),
        discriminator=dataclasses.replace(
            CFG.discriminator, mbstd_group_size=1, patch=patch_eq),
        training=dataclasses.replace(CFG.training, batch_gpu=1, batch_size=8),
    )


def main():
    n = 8
    cfg = make_cfg()
    state, G, D = create_train_state(cfg, seed=0, local_batch=n)
    sched = compute_schedules(cfg, cur_nimg=0)
    sched = dataclasses.replace(sched, gpc_spoof_p=jnp.zeros(()))

    ks = jax.random.split(jax.random.PRNGKey(42), 6)
    res = cfg.dataset.resolution
    kb = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = {
        'img': jax.random.uniform(kb[0], (n, res, res, 3), minval=-1, maxval=1),
        'depth': jax.random.uniform(kb[1], (n, res, res, 1), minval=-1, maxval=1),
        'c': jax.nn.one_hot(jnp.arange(n) % cfg.dataset.c_dim, cfg.dataset.c_dim),
        'camera_angles': jnp.concatenate([
            jax.random.uniform(kb[2], (n, 2), minval=0.5, maxval=1.5),
            jnp.zeros((n, 1))], axis=1),
        'embs': jax.random.normal(kb[3], (n, cfg.dataset.embedding_dim)),
        'sample_idx': jnp.arange(n, dtype=jnp.int32),
        'gen_z_g': jax.random.normal(ks[0], (n, cfg.generator.z_dim)),
        'gen_z_d': jax.random.normal(ks[1], (n, cfg.generator.z_dim)),
        'gen_cam_g': sample_camera_params(ks[2], asdict(cfg.camera), n),
        'gen_cam_d': sample_camera_params(ks[3], asdict(cfg.camera), n),
    }
    cdim = cfg.generator.c_dim
    batch['gen_c_g'] = jax.nn.one_hot(jnp.arange(n) % cdim, cdim)
    batch['gen_c_d'] = jax.nn.one_hot((jnp.arange(n) + 1) % cdim, cdim)
    pp = sample_patch_params(ks[4], n, cfg.generator.patch,
                             min_scale=sched.patch_min_scale,
                             beta=sched.patch_beta)
    batch['real_pp_scales'] = pp['scales']
    batch['real_pp_offsets'] = pp['offsets']

    rng = jax.random.PRNGKey(7)

    def run(mesh):
        _, step = make_jitted_train_steps(cfg, G, D, mesh=mesh, controlled=True)
        _, stats = step(jax.tree.map(jnp.copy, state), batch, rng, sched)
        return stats

    stats_all = {
        'single': run(None),
        'mesh4': run(jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ('data',))),
        'mesh8': run(jax.sharding.Mesh(np.asarray(jax.devices()), ('data',))),
    }
    dbg = {k: v['_debug'] for k, v in stats_all.items()}

    # scalar stats first: pinpoints WHICH loss term diverges
    ss = stats_all['single']
    for other in ('mesh4', 'mesh8'):
        so = stats_all[other]
        for k in sorted(ss):
            if k == '_debug':
                continue
            a, b = float(ss[k]), float(so[k])
            if abs(a - b) > 1e-7 + 1e-5 * abs(a):
                print(f'STAT single vs {other} {k}: {a:.8f} vs {b:.8f} '
                      f'(diff {b - a:+.3e})', flush=True)

    pairs = [('single', 'mesh4'), ('single', 'mesh8'), ('mesh4', 'mesh8')]
    for x, y in pairs:
        for name in ('g_grads', 'd_grads', 'r1_grads'):
            worst_abs = worst_rel = 0.0
            for a, b in zip(jax.tree.leaves(dbg[x][name]),
                            jax.tree.leaves(dbg[y][name])):
                a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
                d = np.abs(a - b)
                worst_abs = max(worst_abs, float(d.max()))
                worst_rel = max(worst_rel, float(
                    (d / np.maximum(np.abs(a), 1e-8)).max()))
            print(f'{x} vs {y} {name}: max_abs={worst_abs:.3e} '
                  f'max_rel={worst_rel:.3e}', flush=True)

    # per-leaf localization: WHICH parameter's grad diverges single vs mesh8
    from jax.tree_util import tree_flatten_with_path, keystr
    for name in ('g_grads', 'd_grads', 'r1_grads'):
        pa, _ = tree_flatten_with_path(dbg['single'][name])
        pb = jax.tree.leaves(dbg['mesh8'][name])
        rows = []
        for (path, a), b in zip(pa, pb):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            d = float(np.abs(a - b).max())
            if d > 1e-7:
                rows.append((d, keystr(path), float(np.abs(a).max())))
        rows.sort(reverse=True)
        for d, path, amax in rows[:8]:
            print(f'LEAF {name} {path}: max_abs_diff={d:.3e} '
                  f'(|single|max={amax:.3e})', flush=True)


if __name__ == '__main__':
    main()
