"""Op-level parity tests: tdgp ops vs independent golden models (torch CPU / numpy).

This is the test the reference never had: its CUDA kernels were only checked
against its own `impl='ref'` torch paths upstream (SURVEY.md §4.1). Here every
op is compared against torch's own operators (an independent implementation)
for forward AND gradients.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as TF

from tdgp.ops import (
    bias_act, setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
    conv2d_resample, grid_sample_2d, grid_sample_nhwc, modulated_conv2d,
)

RNG = np.random.RandomState(0)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


# ---------------------------------------------------------------- bias_act

@pytest.mark.parametrize("act,gain", [("linear", 1.0), ("relu", None), ("lrelu", None),
                                      ("tanh", None), ("sigmoid", None), ("softplus", None)])
def test_bias_act_matches_torch(act, gain):
    x = RNG.randn(4, 8, 8, 16).astype(np.float32) * 3
    b = RNG.randn(16).astype(np.float32)
    out = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act, gain=gain, clamp=5.0))

    xt = torch.tensor(x) + torch.tensor(b)
    fn = {"linear": lambda v: v, "relu": TF.relu,
          "lrelu": lambda v: TF.leaky_relu(v, 0.2), "tanh": torch.tanh,
          "sigmoid": torch.sigmoid, "softplus": TF.softplus}[act]
    def_gain = {"linear": 1.0, "relu": np.sqrt(2), "lrelu": np.sqrt(2),
                "tanh": 1.0, "sigmoid": 1.0, "softplus": 1.0}[act]
    ref = (fn(xt) * (def_gain if gain is None else gain)).clamp(-5.0, 5.0).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_bias_act_second_order_grad():
    # grad² must exist (R1 path flows through bias_act, SURVEY.md §2.2).
    b = jnp.zeros(1)

    def f(x):
        return jnp.sum(bias_act(x, b, act="lrelu") ** 2)

    x = jnp.asarray(RNG.randn(4, 1).astype(np.float32))
    g2 = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g2)))


# ---------------------------------------------------------------- upfirdn2d

def _upfirdn_ref_torch(x_nchw, f, up, down, padding, gain=1.0):
    """Independent torch reference: explicit zero-stuff / pad / conv / stride."""
    upx = upy = up
    downx = downy = down
    px0, px1, py0, py1 = padding
    b, c, h, w = x_nchw.shape
    x = x_nchw.reshape(b, c, h, 1, w, 1)
    x = TF.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(b, c, h * upy, w * upx)
    x = TF.pad(x, [max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)])
    x = x[:, :, max(-py0, 0): x.shape[2] - max(-py1, 0), max(-px0, 0): x.shape[3] - max(-px1, 0)]
    f2 = f if f.ndim == 2 else torch.outer(f, f)
    f2 = (f2 * gain).flip([0, 1])[None, None].repeat(c, 1, 1, 1)
    x = TF.conv2d(x, f2, groups=c)
    return x[:, :, ::downy, ::downx]


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, (0, 0, 0, 0)),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (2, 2, (3, 2, 3, 2)),
    (1, 1, (-1, 2, 0, 1)),
])
def test_upfirdn2d_matches_torch(up, down, padding):
    x = RNG.randn(2, 12, 10, 3).astype(np.float32)
    f1 = np.array([1, 3, 3, 1], dtype=np.float32)
    f1 = f1 / f1.sum()
    out = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f1), up=up, down=down,
                               padding=padding, gain=1.5))
    ref = _upfirdn_ref_torch(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(f1),
                             up, down, padding, gain=1.5)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)


def test_filter2d_preserves_shape_and_mean():
    x = RNG.randn(2, 16, 16, 4).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(jnp.asarray(x), f)
    assert y.shape == x.shape
    np.testing.assert_allclose(float(jnp.mean(y)), float(np.mean(x)), atol=2e-2)


def test_upsample_downsample_roundtrip_shapes():
    x = jnp.asarray(RNG.randn(2, 8, 8, 4).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f, up=2)
    assert up.shape == (2, 16, 16, 4)
    down = downsample2d(up, f, down=2)
    assert down.shape == (2, 8, 8, 4)


def test_upsample2d_constant_preserved():
    # A normalized filter with gain=up**2 must preserve a constant signal.
    x = jnp.ones((1, 8, 8, 1), dtype=jnp.float32)
    f = setup_filter([1, 3, 3, 1])
    y = np.asarray(upsample2d(x, f, up=2))
    np.testing.assert_allclose(y[:, 2:-2, 2:-2], 1.0, atol=1e-5)


# ---------------------------------------------------------------- grid_sample

@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(align_corners):
    x = RNG.randn(3, 9, 7, 5).astype(np.float32)
    grid = (RNG.rand(3, 6, 4, 2).astype(np.float32) * 2.4 - 1.2)  # includes out-of-bounds

    out = np.asarray(grid_sample_nhwc(jnp.asarray(x), jnp.asarray(grid),
                                      align_corners=align_corners))
    ref = TF.grid_sample(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(grid),
                         mode="bilinear", padding_mode="zeros", align_corners=align_corners)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)


def test_grid_sample_grad_wrt_coords_and_input():
    x = jnp.asarray(RNG.randn(2, 8, 8, 3).astype(np.float32))
    coords = jnp.asarray((RNG.rand(2, 10, 2).astype(np.float32) * 1.6 - 0.8))

    gx, gc = jax.grad(lambda a, c: jnp.sum(grid_sample_2d(a, c) ** 2), argnums=(0, 1))(x, coords)
    assert np.all(np.isfinite(np.asarray(gx))) and np.all(np.isfinite(np.asarray(gc)))


# ---------------------------------------------------------------- conv2d_resample

def test_conv2d_resample_plain_matches_torch():
    x = RNG.randn(2, 10, 10, 6).astype(np.float32)
    w = RNG.randn(3, 3, 6, 8).astype(np.float32) * 0.1
    out = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), padding=1))
    ref = TF.conv2d(torch.tensor(x).permute(0, 3, 1, 2),
                    torch.tensor(w).permute(3, 2, 0, 1), padding=1)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_conv2d_resample_up2_shape_and_energy():
    x = RNG.randn(2, 8, 8, 4).astype(np.float32)
    w = RNG.randn(3, 3, 4, 4).astype(np.float32) * 0.1
    f = setup_filter([1, 3, 3, 1])
    out = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, up=2, padding=1)
    assert out.shape == (2, 16, 16, 4)


def test_conv2d_resample_down2_matches_torch_composition():
    x = RNG.randn(2, 16, 16, 4).astype(np.float32)
    w = RNG.randn(3, 3, 4, 8).astype(np.float32) * 0.1
    f1 = np.array([1, 3, 3, 1], dtype=np.float32)
    f1 = f1 / f1.sum()
    out = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w),
                                     f=jnp.asarray(f1), down=2, padding=1))
    # torch composition: filter (with the same adjusted padding), strided conv.
    fw = 4
    px0 = 1 + (fw - 2 + 1) // 2
    px1 = 1 + (fw - 2) // 2
    xt = _upfirdn_ref_torch(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(f1),
                            1, 1, (px0, px1, px0, px1))
    ref = TF.conv2d(xt, torch.tensor(w).permute(3, 2, 0, 1), stride=2)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- modulated_conv2d

def _modconv_ref_torch(x, w, s, demodulate=True):
    """Per-sample grouped conv, the reference 'fused' formulation (networks_stylegan2.py:78-88)."""
    n = x.shape[0]
    co, ci, kh, kw = w.shape
    wmod = w[None] * s.reshape(n, 1, ci, 1, 1)
    if demodulate:
        d = (wmod.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        wmod = wmod * d.reshape(n, co, 1, 1, 1)
    xg = x.reshape(1, -1, *x.shape[2:])
    wg = wmod.reshape(n * co, ci, kh, kw)
    out = TF.conv2d(xg, wg, padding=kh // 2, groups=n)
    return out.reshape(n, co, *out.shape[2:])


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_equals_grouped_conv(demodulate):
    n, h, ci, co, k = 4, 8, 6, 10, 3
    x = RNG.randn(n, h, h, ci).astype(np.float32)
    w = RNG.randn(k, k, ci, co).astype(np.float32) * 0.3
    s = (RNG.randn(n, ci).astype(np.float32) * 0.5 + 1.0)

    out = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                      padding=k // 2, demodulate=demodulate))
    ref = _modconv_ref_torch(torch.tensor(x).permute(0, 3, 1, 2),
                             torch.tensor(w).permute(3, 2, 0, 1),
                             torch.tensor(s), demodulate=demodulate)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4)


def test_modulated_conv2d_grad_finite():
    n, h, ci, co, k = 2, 8, 4, 4, 3
    x = jnp.asarray(RNG.randn(n, h, h, ci).astype(np.float32))
    w = jnp.asarray(RNG.randn(k, k, ci, co).astype(np.float32) * 0.3)
    s = jnp.asarray(RNG.randn(n, ci).astype(np.float32))

    g = jax.grad(lambda w_: jnp.sum(modulated_conv2d(x, w_, s, padding=1) ** 2))(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_grid_sample_exact_boundary_vs_torch():
    """TODO#14: coords at exactly -1/1 (and epsilon outside) must match
    torch's align_corners=True zero-padding semantics bit-for-bit."""
    import torch
    import torch.nn.functional as TF
    from tdgp.ops.grid_sample import grid_sample_2d

    rs = np.random.RandomState(0)
    H, W, F = 8, 8, 3
    planes = rs.randn(1, H, W, F).astype(np.float32)
    pts = np.array([[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [1.0, -1.0],
                    [0.0, 1.0], [1.0, 0.0], [-1.0000001, 0.0],
                    [1.0000001, 0.0], [0.9999999, 0.9999999],
                    [-0.99999994, -1.0]], dtype=np.float32)
    coords = pts[None]

    out_j = np.asarray(grid_sample_2d(jnp.asarray(planes), jnp.asarray(coords),
                                      align_corners=True))
    x_t = torch.from_numpy(planes.transpose(0, 3, 1, 2))
    g_t = torch.from_numpy(coords[:, :, None, :])
    out_t = TF.grid_sample(x_t, g_t, mode='bilinear', align_corners=True,
                           padding_mode='zeros')
    out_t = out_t[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=1e-6)
