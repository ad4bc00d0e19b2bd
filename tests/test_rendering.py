"""Golden-value tests for camera math and the volume renderer (SURVEY.md §4 item (b))."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.rendering import (
    sample_camera_params, sample_camera_angles, compute_cam2world_matrix,
    spherical2cartesian, validate_frustum, sample_rays, get_ray_limits_box,
    validate_image_plane, RenderOptions, importance_render, sample_pdf,
    sample_stratified,
)
from tdgp.rendering.camera import sample_truncnorm, get_mean_camera_params
from tdgp.utils.tensor_group import TensorGroup

KEY = jax.random.PRNGKey(0)

CAMERA_CFG = {  # configs/camera/base.yaml defaults
    'ray': {'start': 0.75, 'end': 1.25},
    'fov': {'dist': 'uniform', 'min': 10.0, 'max': 45.0},
    'origin': {
        'radius': {'dist': 'normal', 'mean': 1.0, 'std': 0.0},
        'angles': {'dist': 'truncnorm',
                   'yaw': {'min': -1.57079633, 'max': 1.57079633, 'mean': 0.0, 'std': 0.4},
                   'pitch': {'min': 0.392699082, 'max': 2.74889357, 'mean': 1.57, 'std': 0.2}},
    },
    'look_at': {
        'radius': {'dist': 'uniform', 'min': 0.0, 'max': 0.0},
        'angles': {'dist': 'spherical_uniform',
                   'yaw': {'min': -3.14159265, 'max': 3.14159265},
                   'pitch': {'min': 0.0, 'max': 3.14159265}},
    },
    'cube_scale': 0.5,
}


# ----------------------------------------------------------- camera sampling

def test_truncnorm_within_bounds_and_mean():
    x = sample_truncnorm(KEY, mean=0.0, std=0.4, lo=-1.0, hi=1.0, shape=(20000,))
    x = np.asarray(x)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert abs(x.mean()) < 0.02


def test_sample_camera_params_shapes_and_bounds():
    cp = sample_camera_params(KEY, CAMERA_CFG, batch_size=64)
    assert cp.angles.shape == (64, 3)
    assert cp.fov.shape == (64,)
    assert cp.radius.shape == (64,)
    assert cp.look_at.shape == (64, 3)
    a = np.asarray(cp.angles)
    assert a[:, 0].min() >= -1.5708 and a[:, 0].max() <= 1.5708
    assert a[:, 1].min() >= 0.39 and a[:, 1].max() <= 2.75
    assert np.all(a[:, 2] == 0)
    f = np.asarray(cp.fov)
    assert f.min() >= 10.0 and f.max() <= 45.0
    np.testing.assert_allclose(np.asarray(cp.radius), 1.0)


@pytest.mark.parametrize("dist", ["uniform", "normal", "spherical_uniform", "hybrid"])
def test_angle_distributions_run(dist):
    cfg = {'dist': dist,
           'yaw': {'min': -1.0, 'max': 1.0, 'mean': 0.0, 'std': 0.3},
           'pitch': {'min': 0.5, 'max': 2.5, 'mean': 1.5, 'std': 0.2}}
    a = sample_camera_angles(KEY, cfg, 32)
    assert a.shape == (32, 3)
    p = np.asarray(a[:, 1])
    assert p.min() > 0 and p.max() < math.pi


# ----------------------------------------------------------- cam2world

def test_cam2world_origin_and_forward():
    cp = TensorGroup(
        angles=jnp.asarray([[0.3, 1.2, 0.0]]),
        radius=jnp.asarray([1.5]),
        fov=jnp.asarray([30.0]),
        look_at=jnp.zeros((1, 3)),
    )
    c2w = np.asarray(compute_cam2world_matrix(cp))[0]
    origin = c2w[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(origin), 1.5, rtol=1e-5)
    # camera -z axis must point from origin toward look_at (= world origin)
    fwd_world = c2w[:3, :3] @ np.array([0.0, 0.0, -1.0])
    expected = -origin / np.linalg.norm(origin)
    np.testing.assert_allclose(fwd_world, expected, atol=1e-5)
    # rotation block must be orthonormal
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_spherical2cartesian_poles():
    # pitch=pi/2, yaw=0 -> +z; radius scales
    v = np.asarray(spherical2cartesian(jnp.asarray([0.0]), jnp.asarray([math.pi / 2]), 2.0))
    np.testing.assert_allclose(v, [[0.0, 0.0, 2.0]], atol=1e-6)
    # pitch=0 -> +y
    v = np.asarray(spherical2cartesian(jnp.asarray([0.0]), jnp.asarray([0.0]), 1.0))
    np.testing.assert_allclose(v, [[0.0, 1.0, 0.0]], atol=1e-6)


# ----------------------------------------------------------- rays

def test_sample_rays_center_points_forward():
    cp = TensorGroup(
        angles=jnp.asarray([[0.5, 1.3, 0.0]]),
        radius=jnp.asarray([1.0]),
        fov=jnp.asarray([30.0]),
        look_at=jnp.zeros((1, 3)),
    )
    c2w = compute_cam2world_matrix(cp)
    h = w = 17  # odd -> exact center pixel
    ray_o, ray_d = sample_rays(c2w, cp.fov, resolution=(w, h))
    assert ray_o.shape == (1, h * w, 3) and ray_d.shape == (1, h * w, 3)
    center = np.asarray(ray_d[0, (h // 2) * w + w // 2])
    origin = np.asarray(ray_o[0, 0])
    expected = -origin / np.linalg.norm(origin)
    np.testing.assert_allclose(center, expected, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ray_d), axis=-1), 1.0, atol=1e-5)


def test_sample_rays_patch_crop_subsets_full_grid():
    cp = TensorGroup(
        angles=jnp.asarray([[0.0, math.pi / 2, 0.0]]),
        radius=jnp.asarray([1.0]),
        fov=jnp.asarray([30.0]),
        look_at=jnp.zeros((1, 3)),
    )
    c2w = compute_cam2world_matrix(cp)
    res = 16
    # Full grid at 2*res-1 so the half-scale patch lattice aligns exactly:
    # patch x_j = -1 + j/15 == full x_j; patch y_i = -i/15 == full y_{15+i}.
    _, full_d = sample_rays(c2w, cp.fov, resolution=(2 * res - 1, 2 * res - 1))
    patch = {'scales': jnp.asarray([[0.5, 0.5]]), 'offsets': jnp.asarray([[0.0, 0.0]])}
    _, patch_d = sample_rays(c2w, cp.fov, resolution=(res, res), patch_params=patch)
    fd = np.asarray(full_d[0]).reshape(2 * res - 1, 2 * res - 1, 3)
    pd = np.asarray(patch_d[0]).reshape(res, res, 3)
    np.testing.assert_allclose(pd, fd[res - 1:, :res], atol=1e-6)


def test_ray_box_intersection_analytic():
    # ray along -z from (0,0,2) into cube side 1 -> enters at t=1.5, exits t=2.5
    o = jnp.asarray([[[0.0, 0.0, 2.0]]])
    d = jnp.asarray([[[0.0, 0.0, -1.0]]])
    tmin, tmax = get_ray_limits_box(o, d, box_size=1.0)
    np.testing.assert_allclose(np.asarray(tmin), 1.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax), 2.5, atol=1e-6)
    # miss
    o2 = jnp.asarray([[[0.0, 5.0, 2.0]]])
    tmin2, tmax2 = get_ray_limits_box(o2, d, box_size=1.0)
    assert float(tmax2[0, 0, 0]) < float(tmin2[0, 0, 0])


def test_validate_frustum():
    assert validate_frustum(fov=20.0, near=0.8, far=1.2, radius=1.0, scale=0.5, step=0.1)
    assert not validate_frustum(fov=90.0, near=0.5, far=1.5, radius=1.0, scale=0.5, step=0.1)


def test_validate_image_plane():
    assert validate_image_plane(fov=20.0, radius=1.0, scale=0.5, step=0.1)


def test_mean_camera_params():
    mc = get_mean_camera_params(CAMERA_CFG)
    np.testing.assert_allclose(np.asarray(mc.fov), [27.5])
    np.testing.assert_allclose(np.asarray(mc.radius), [1.0])


# ----------------------------------------------------------- renderer

def test_stratified_samples_sorted_in_range():
    s = sample_stratified(KEY, 2, 8, 32)
    arr = np.asarray(s)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert np.all(np.diff(arr, axis=-1) > -1e-6)


def test_sample_pdf_uniform_weights_det():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = np.asarray(sample_pdf(KEY, bins, weights, 16, det=True))
    np.testing.assert_allclose(s, np.broadcast_to(np.linspace(0, 1, 16), (4, 16)), atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bin():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (1, 9))
    weights = jnp.zeros((1, 8)).at[:, 4].set(100.0)
    s = np.asarray(sample_pdf(KEY, bins, weights, 64))
    inside = np.mean((s >= 0.5) & (s <= 0.625))
    assert inside > 0.95


def test_unify_samples_sorted_matches_argsort_path():
    from tdgp.rendering.renderer import unify_samples, unify_samples_sorted
    rng = np.random.RandomState(0)
    d1 = jnp.asarray(np.sort(rng.rand(2, 8, 5), -1))
    d2 = jnp.asarray(np.sort(rng.rand(2, 8, 7), -1))
    c1 = jnp.asarray(rng.randn(2, 8, 5, 3))
    c2 = jnp.asarray(rng.randn(2, 8, 7, 3))
    s1 = jnp.asarray(rng.randn(2, 8, 5))
    s2 = jnp.asarray(rng.randn(2, 8, 7))
    ref = unify_samples(d1, c1, s1, d2, c2, s2)
    out = unify_samples_sorted(d1, c1, s1, d2, c2, s2)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sample_pdf_stratified_sorted():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.asarray(np.random.RandomState(0).rand(4, 8))
    s = np.asarray(sample_pdf(KEY, bins, weights, 16))
    assert np.all(np.diff(s, axis=-1) >= -1e-6)  # sorted by construction


def test_render_constant_density_matches_analytic_transmittance():
    sigma_val = 2.0
    color_val = 0.7
    opts = RenderOptions(num_proposal_steps=256, num_fine_steps=0,
                         ray_start=0.5, ray_end=1.5, clamp_mode='relu',
                         use_inf_depth=False)

    def run_model(coords):
        b, p, _ = coords.shape
        return jnp.full((b, p, 3), color_val), jnp.full((b, p), sigma_val)

    o = jnp.zeros((1, 4, 3))
    d = jnp.concatenate([jnp.zeros((1, 4, 2)), -jnp.ones((1, 4, 1))], axis=-1)
    rgb, depth, wtotal, ftrans = importance_render(run_model, o, d, KEY, opts)

    L = opts.ray_end - opts.ray_start
    expected_w = 1.0 - math.exp(-sigma_val * L)
    np.testing.assert_allclose(np.asarray(wtotal), expected_w, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ftrans), math.exp(-sigma_val * L), rtol=6e-2)
    np.testing.assert_allclose(np.asarray(rgb), color_val * expected_w, rtol=2e-2)
    # With num_fine_steps=0 the marcher consumes s-space depths (matches the
    # reference quirk, tri_plane_renderer.py:168), so depth = sum_i w_i s_i =
    # (E[t | hit] - t0) * P(hit) since L = 1 maps s to t one-to-one.
    t0, s = opts.ray_start, sigma_val
    m = t0 + (1 - math.exp(-s * L) * (1 + s * L)) / (s * (1 - math.exp(-s * L)))
    np.testing.assert_allclose(np.asarray(depth), (m - t0) * expected_w, rtol=5e-2)


def test_render_importance_localizes_surface():
    # density = sharp bump at t ~= 1.0 along the ray; depth should land there
    opts = RenderOptions(num_proposal_steps=32, num_fine_steps=32,
                         ray_start=0.5, ray_end=1.5, clamp_mode='relu',
                         use_inf_depth=True)

    def run_model(coords):
        # coords z goes from -0.5... camera at z=2.0 shooting -z, surface at z=1.0
        z = coords[..., 2]
        sigma = 500.0 * jnp.exp(-((z - 1.0) ** 2) / (2 * 0.01 ** 2))
        rgb = jnp.stack([jnp.ones_like(z), jnp.zeros_like(z), jnp.zeros_like(z)], axis=-1)
        return rgb, sigma

    o = jnp.asarray([[[0.0, 0.0, 2.0]]])
    d = jnp.asarray([[[0.0, 0.0, -1.0]]])
    # t in [0.5, 1.5] -> z = 2 - t in [0.5, 1.5]; bump at z=1 -> t=1
    rgb, depth, wtotal, _ = importance_render(run_model, o, d, KEY, opts)
    assert abs(float(depth[0, 0]) - 1.0) < 0.02
    assert float(wtotal[0, 0]) > 0.95
    np.testing.assert_allclose(np.asarray(rgb[0, 0]), [1.0, 0.0, 0.0], atol=0.05)


def test_render_mip_marcher_runs():
    opts = RenderOptions(num_proposal_steps=16, num_fine_steps=16,
                         ray_marcher_type='mip', ray_start=0.5, ray_end=1.5)

    def run_model(coords):
        b, p, _ = coords.shape
        return jnp.full((b, p, 3), 0.6), jnp.zeros((b, p))

    o = jnp.zeros((2, 4, 3))
    d = jnp.concatenate([jnp.zeros((2, 4, 2)), jnp.ones((2, 4, 1))], axis=-1)
    rgb, depth, wtotal, ftrans = importance_render(run_model, o, d, KEY, opts)
    assert rgb.shape == (2, 4, 3) and depth.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_render_differentiable_wrt_model_params():
    opts = RenderOptions(num_proposal_steps=8, num_fine_steps=8,
                         ray_start=0.5, ray_end=1.5)

    def loss(scale):
        def run_model(coords):
            b, p, _ = coords.shape
            return jnp.full((b, p, 3), 0.5) * scale, jnp.full((b, p), 1.0) * scale

        o = jnp.zeros((1, 2, 3))
        d = jnp.concatenate([jnp.zeros((1, 2, 2)), jnp.ones((1, 2, 1))], axis=-1)
        rgb, _, _, _ = importance_render(run_model, o, d, KEY, opts)
        return jnp.sum(rgb ** 2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
