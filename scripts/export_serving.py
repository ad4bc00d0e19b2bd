#!/usr/bin/env python
"""Export a trained run's EMA generator as a portable AOT serving artifact.

The output file contains serialized StableHLO of the full z→image pipeline
(see tdgp/serving.py) — loadable with jax alone, no tdgp code, on the
platform(s) it was lowered for.

Usage:
  python scripts/export_serving.py --run-dir experiments/<run> \
      [--snapshot latest|best|<path>] [--batch 4] [--psi 0.7] \
      [--platforms tpu,cpu] [--out serving.jaxexp]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', required=True)
    ap.add_argument('--snapshot', default='latest')
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--psi', type=float, default=1.0)
    ap.add_argument('--platforms', default=None,
                    help='comma list (tpu,cpu); default = current backend')
    ap.add_argument('--mesh', type=int, default=1,
                    help='export batch-sharded over an N-device data mesh '
                         '(the loading process must run on N devices)')
    ap.add_argument('--out', default=None)
    ap.add_argument('--verify', action='store_true',
                    help='reload the artifact and compare against the live '
                         'model on one batch')
    args = ap.parse_args()

    import numpy as np
    import jax
    from tdgp.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()   # JAX_PLATFORMS=cpu exports work offline
    from tdgp import checkpoint as ckpt
    from tdgp import serving
    from tdgp.infra.experiment import load_config
    from tdgp.models.epigraf import Generator
    from tdgp.training.train_step import create_train_state, ema_variables

    cfg = load_config(os.path.join(args.run_dir, 'experiment_config.yaml'))
    if args.snapshot == 'latest':
        path = ckpt.resolve_resume(args.run_dir, 'latest')
    elif args.snapshot == 'best':
        path = ckpt.find_best_checkpoint(args.run_dir)
    else:
        path = args.snapshot
    assert path, f'no snapshot found in {args.run_dir}'

    state, G, _D = create_train_state(cfg, seed=0,
                                      local_batch=cfg.training.batch_size)
    state, _meta = ckpt.load_snapshot(path, state)
    g_vars = ema_variables(state)

    platforms = args.platforms.split(',') if args.platforms else None
    blob = serving.export_serving(G, g_vars, args.batch,
                                  truncation_psi=args.psi,
                                  platforms=platforms,
                                  mesh_devices=args.mesh)
    out = args.out or os.path.join(args.run_dir, 'serving.jaxexp')
    with open(out, 'wb') as f:
        f.write(blob)
    print(f'wrote {out} ({len(blob) / 1e6:.1f} MB, batch {args.batch}, '
          f'psi {args.psi}, platforms {platforms or "current"}, '
          f'mesh {args.mesh})')

    if args.verify:
        import jax.numpy as jnp
        served = serving.load_serving(blob)
        gc = G.cfg
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (args.batch, gc.z_dim))
        c = jax.nn.one_hot(jnp.arange(args.batch) % max(gc.c_dim, 1), gc.c_dim)
        from tdgp.config import asdict
        from tdgp.rendering.camera import sample_camera_params
        cam = sample_camera_params(key, asdict(cfg.camera), args.batch)
        live = serving.make_serving_fn(G, g_vars, args.psi)(
            z, c, cam.angles, cam.fov, cam.radius, cam.look_at)
        loaded = served(z, c, cam.angles, cam.fov, cam.radius, cam.look_at)
        err = float(np.max(np.abs(np.asarray(live) - np.asarray(loaded))))
        print(f'verify: max |live - loaded| = {err:.2e}')
        assert err < 1e-4


if __name__ == '__main__':
    main()
