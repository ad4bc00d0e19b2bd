#!/usr/bin/env python
"""Probe: fused Pallas ray-march kernel vs the XLA-fused jnp marcher.

Measured on the v5e (2026-08, production tile shape b=8, r=4096, s=64, c=3):

    fused fwd compile+run 177.4 s   <- Mosaic compile is ~3 min per shape
    fused fwd 20x          0.63 s   (31.5 ms/call)
    fused grad 20x         0.73 s
    jnp   fwd compile+run  1.3 s
    jnp   fwd 20x          0.63 s   (31.3 ms/call)  <- IDENTICAL runtime
    jnp   grad 20x         0.70 s

Conclusion (docs/DESIGN.md ledger): at training sizes the volume integration
is call-overhead/HBM bound either way — the Pallas kernel buys nothing and
costs minutes of compile per shape instantiation. GeneratorConfig
ray_march_impl='auto' therefore resolves to 'jnp'; 'fused' stays available
and parity-tested (tests/test_pallas.py) for bigger-S regimes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

from tdgp.ops.pallas_kernels import ray_march_fused
from tdgp.rendering.renderer import RenderOptions, classical_ray_march

b, r, s, c = 8, 4096, 64, 3
key = jax.random.PRNGKey(0)
colors = jax.random.normal(key, (b, r, s, c))
dens = jax.random.normal(jax.random.fold_in(key, 1), (b, r, s))
depths = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 2), (b, r, s)),
                  axis=-1) + 0.5


@jax.jit
def f_fused(co, de, dp):
    rgb, d, w, ft = ray_march_fused(co, de, dp, 'softplus', 1.0, True, False)
    return jnp.sum(rgb) + jnp.sum(d) + jnp.sum(w) + jnp.sum(ft)


@jax.jit
def f_jnp(co, de, dp):
    opts = RenderOptions(clamp_mode='softplus', use_inf_depth=True)
    rgb, d, w, ft = classical_ray_march(co, de, dp, opts)
    return jnp.sum(rgb) + jnp.sum(d) + jnp.sum(w) + jnp.sum(ft)


for name, f in (('fused', f_fused), ('jnp', f_jnp)):
    t0 = time.perf_counter()
    v = float(f(colors, dens, depths))
    print(name, 'fwd compile+run', time.perf_counter() - t0, v, flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        v = float(f(colors, dens, depths))
    print(name, 'fwd 20x', time.perf_counter() - t0, flush=True)
    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
    t0 = time.perf_counter()
    gv = g(colors, dens, depths)
    _ = float(gv[0].ravel()[0])
    print(name, 'grad compile+run', time.perf_counter() - t0, flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        gv = g(colors, dens, depths)
        _ = float(gv[0].ravel()[0])
    print(name, 'grad 20x', time.perf_counter() - t0, flush=True)
