"""Pallas kernel parity tests vs the pure-jnp reference implementations
(SURVEY.md §4 item (a)). On CPU these run in interpret mode via
force_tpu_interpret_mode; on TPU they compile for real."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tdgp.ops.bias_act import bias_act
from tdgp.rendering.renderer import RenderOptions, classical_ray_march

RNG = np.random.RandomState(0)


def run_interpreted(fn, *args, **kwargs):
    if jax.devices()[0].platform != 'tpu':
        with pltpu.force_tpu_interpret_mode():
            return fn(*args, **kwargs)
    return fn(*args, **kwargs)


@pytest.mark.parametrize("act", ["linear", "lrelu", "softplus"])
def test_bias_act_pallas_parity(act):
    from tdgp.ops.pallas_kernels import bias_act_pallas
    x = jnp.asarray(RNG.randn(4, 16, 16, 128).astype(np.float32))
    b = jnp.asarray(RNG.randn(128).astype(np.float32))
    out = run_interpreted(bias_act_pallas, x, b, act=act, clamp=5.0)
    ref = bias_act(x, b, act=act, clamp=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_inf_depth,last_back", [(True, False), (False, False),
                                                     (False, True)])
def test_ray_march_pallas_parity(use_inf_depth, last_back):
    from tdgp.ops.pallas_kernels import ray_march_pallas
    b, r, s, c = 2, 64, 32, 4
    colors = jnp.asarray(RNG.randn(b, r, s, c).astype(np.float32))
    densities = jnp.asarray(RNG.randn(b, r, s).astype(np.float32) * 2)
    depths = jnp.asarray(np.sort(RNG.rand(b, r, s).astype(np.float32), axis=-1) + 0.5)

    opts = RenderOptions(clamp_mode='softplus', use_inf_depth=use_inf_depth,
                         last_back=last_back)
    ref_rgb, ref_depth, ref_w, ref_ft = classical_ray_march(colors, densities,
                                                            depths, opts)
    rgb, depth, wsum, ftrans = run_interpreted(
        ray_march_pallas, colors, densities, depths,
        use_inf_depth=use_inf_depth, last_back=last_back)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wsum), np.asarray(jnp.sum(ref_w, -1)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ftrans), np.asarray(ref_ft), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_inf_depth,last_back,clamp_mode",
                         [(True, False, 'softplus'), (False, True, 'softplus'),
                          (True, False, 'relu')])
def test_ray_march_fused_grad_parity(use_inf_depth, last_back, clamp_mode):
    """The analytic custom VJP must match jax.grad of the jnp marcher for
    every input (colors, densities, depths) under a generic cotangent mix."""
    from tdgp.ops.pallas_kernels import ray_march_fused
    b, r, s, c = 2, 16, 24, 3
    colors = jnp.asarray(RNG.randn(b, r, s, c).astype(np.float32))
    densities = jnp.asarray(RNG.randn(b, r, s).astype(np.float32) * 2)
    depths = jnp.asarray(np.sort(RNG.rand(b, r, s).astype(np.float32), axis=-1) + 0.5)
    # generic contraction over all four outputs exercises every cotangent path
    p_rgb = jnp.asarray(RNG.randn(b, r, c).astype(np.float32))
    p_d = jnp.asarray(RNG.randn(b, r).astype(np.float32))
    p_w = jnp.asarray(RNG.randn(b, r).astype(np.float32))
    p_ft = jnp.asarray(RNG.randn(b, r).astype(np.float32))

    opts = RenderOptions(clamp_mode=clamp_mode, use_inf_depth=use_inf_depth,
                         last_back=last_back)

    def loss_ref(co, de, dp):
        rgb, depth, w, ft = classical_ray_march(co, de, dp, opts)
        return (jnp.sum(rgb * p_rgb) + jnp.sum(depth * p_d)
                + jnp.sum(jnp.sum(w, -1) * p_w) + jnp.sum(ft * p_ft))

    def loss_fused(co, de, dp):
        rgb, depth, wsum, ft = ray_march_fused(co, de, dp, clamp_mode, 1.0,
                                               use_inf_depth, last_back)
        return (jnp.sum(rgb * p_rgb) + jnp.sum(depth * p_d)
                + jnp.sum(wsum * p_w) + jnp.sum(ft * p_ft))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(colors, densities, depths)
    got_grads = run_interpreted(jax.grad(loss_fused, argnums=(0, 1, 2)),
                                colors, densities, depths)
    for got, ref, name in zip(got_grads, ref_grads,
                              ('colors', 'densities', 'depths')):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_triplane_mlp_pallas_parity():
    from tdgp.ops.pallas_kernels import triplane_mlp_pallas
    n, p, f, hid, out = 2, 256, 32, 64, 4
    feats = jnp.asarray(RNG.randn(n, p, f).astype(np.float32))
    # pre-folded equalized-lr weights
    w0 = jnp.asarray(RNG.randn(f, hid).astype(np.float32) / np.sqrt(f))
    b0 = jnp.asarray(RNG.randn(hid).astype(np.float32) * 0.1)
    w1 = jnp.asarray(RNG.randn(hid, out).astype(np.float32) / np.sqrt(hid))
    b1 = jnp.asarray(RNG.randn(out).astype(np.float32) * 0.1)

    rgb, sigma = run_interpreted(triplane_mlp_pallas, feats, w0, b0, w1, b1)

    h = jnp.maximum(feats @ w0 + b0, 0) + 0.2 * jnp.minimum(feats @ w0 + b0, 0)
    h = h * np.sqrt(2.0)
    y = h @ w1 + b1
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(y[..., :-1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(y[..., -1]),
                               rtol=1e-4, atol=1e-5)
