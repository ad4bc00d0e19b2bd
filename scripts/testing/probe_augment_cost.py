#!/usr/bin/env python
"""Probe: what does the ADA augment pipe cost per D-forward at flagship
shapes? (r5 ledger: the flagship step is ~2.0 s vs the noaug bench's
1.565 s, and the pipe runs branchlessly on every D input regardless of p.)

Times the jitted pipe alone on [B, 64, 64, 4] patches at p=0 and p=0.5
(same program — p is traced), and its VJP (the Gmain/Dmain-fake sites
differentiate through it). If the pipe explains the gap, candidate fix:
a lax.cond(p > 0) around the whole pipe — skips ~all cost in the long
early phase where the ADA controller holds p at 0.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

B = int(os.environ.get('B', '16'))
RES = int(os.environ.get('RES', '64'))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from tdgp.config import synth256_config
    try:
        cfg = synth256_config()
    except Exception:
        from tdgp.infra.experiment import load_config
        cfg = load_config(preset='synth256')
    from tdgp.training.augment import AugmentPipe
    pipe = AugmentPipe(cfg.training.augment, num_color_channels=3)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, RES, RES, 4), minval=-1, maxval=1)

    fwd = jax.jit(lambda x, p, k: pipe(x, p, k))
    for p in (0.0, 0.5):
        t = timeit(fwd, img, jnp.float32(p), key)
        print(f'augment fwd  p={p}: {t * 1e3:8.2f} ms', flush=True)

    vjp = jax.jit(lambda x, p, k: jax.grad(
        lambda y: jnp.sum(pipe(y, p, k) ** 2))(x))
    for p in (0.0, 0.5):
        t = timeit(vjp, img, jnp.float32(p), key)
        print(f'augment grad p={p}: {t * 1e3:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
