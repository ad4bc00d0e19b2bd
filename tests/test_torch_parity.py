"""Pixel parity of our Generator against the REFERENCE torch code.

The single strongest validator of every convention in the rebuild
(grid_sample align_corners, plane projection order, cam2world, fov scaling,
equalized-lr layers, renderer math): instantiate the reference
networks_epigraf.Generator (torch CPU) at a fixed seed, convert its weights
with scripts/convert_torch_ckpt.py's mapping, and require pixel-level
agreement of the full G forward (BASELINE.md configs[0]).

Determinism: the reference renderer always draws stratified jitter
(tri_plane_renderer.py:225 torch.rand_like) — we pin it to 0.5, which is
exactly our eval-mode mid-bin sampling, and force det=True inverse-CDF
(both sides then use u = linspace(0,1,S)). noise_mode='const' on both sides
uses the converted noise buffers.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tests._torch_ref import load_reference_epigraf, make_parity_cfgs  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier: excluded by -m "not slow"


@pytest.fixture(scope='module')
def ref_and_ours():
    ref_epigraf = load_reference_epigraf()
    ref_cfg, our_cfg = make_parity_cfgs()

    torch.manual_seed(0)
    # mapping kwargs exactly as ref train.py:170-172 builds them
    G_ref = ref_epigraf.Generator(
        ref_cfg, img_resolution=our_cfg.img_resolution, img_channels=3,
        num_fp16_res=0,
        mapping_kwargs=dict(camera_cond=True, camera_cond_drop_p=0.0,
                            mean_camera_params=None))
    G_ref.eval()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))
    from convert_torch_ckpt import convert_state_dict
    flat = convert_state_dict(G_ref.state_dict())

    from tdgp.checkpoint import variables_from_flat
    from tdgp.models.epigraf import Generator
    from tdgp.training.train_step import init_rngs

    G = Generator(our_cfg)
    n = 2
    z = jnp.zeros((n, our_cfg.z_dim))
    c = jax.nn.one_hot(jnp.arange(n) % our_cfg.c_dim, our_cfg.c_dim)
    from tdgp.utils.tensor_group import TensorGroup
    cam = TensorGroup(angles=jnp.zeros((n, 3)).at[:, 1].set(np.pi / 2),
                      fov=jnp.full((n,), 30.0), radius=jnp.ones((n,)),
                      look_at=jnp.zeros((n, 3)))
    variables = G.init(init_rngs(0), z, c, cam, camera_angles_cond=cam.angles,
                       train=False, noise_mode='const')
    converted = variables_from_flat(flat)

    # structural equality: every init leaf must be fed by a converted array
    def paths(tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p) + f':{tuple(x.shape)}' for p, x in leaves}

    missing = paths(variables) - paths(converted)
    extra = paths(converted) - paths(variables)
    assert not missing, f'converted ckpt missing leaves: {sorted(missing)[:8]}'
    assert not extra, f'converted ckpt has extra leaves: {sorted(extra)[:8]}'

    return ref_epigraf, ref_cfg, our_cfg, G_ref, G, converted


def _deterministic_reference(ref_epigraf, monkeypatch):
    """Pin the reference's stratified jitter to mid-bin + det inverse-CDF."""
    tpr = sys.modules['src.training.tri_plane_renderer']
    orig_pdf = tpr.ImportanceRenderer.sample_pdf

    def det_pdf(self, bins, weights, n_imp, det=False, eps=1e-5):
        return orig_pdf(self, bins, weights, n_imp, det=True, eps=eps)

    monkeypatch.setattr(tpr.ImportanceRenderer, 'sample_pdf', det_pdf)
    monkeypatch.setattr(torch, 'rand_like',
                        lambda x, **kw: torch.full_like(x, 0.5))


def test_mapping_ws_parity(ref_and_ours):
    _, _, our_cfg, G_ref, G, converted = ref_and_ours
    n = 4
    rs = np.random.RandomState(123)
    z = rs.randn(n, our_cfg.z_dim).astype(np.float32)
    c = np.eye(our_cfg.c_dim, dtype=np.float32)[rs.randint(0, our_cfg.c_dim, n)]
    angles = np.stack([rs.uniform(-np.pi, np.pi, n),
                       rs.uniform(np.pi / 2 - 0.3, np.pi / 2 + 0.3, n),
                       np.zeros(n)], axis=1).astype(np.float32)

    with torch.no_grad():
        ws_ref = G_ref.mapping(torch.from_numpy(z), torch.from_numpy(c),
                               camera_angles=torch.from_numpy(angles)).numpy()
    ws = G.apply(converted, jnp.asarray(z), jnp.asarray(c),
                 camera_angles=jnp.asarray(angles), method=G.map_ws)
    assert ws.shape == ws_ref.shape
    np.testing.assert_allclose(np.asarray(ws), ws_ref, rtol=1e-4, atol=2e-5)


def test_generator_pixel_parity(ref_and_ours, monkeypatch):
    ref_epigraf, _, our_cfg, G_ref, G, converted = ref_and_ours
    _deterministic_reference(ref_epigraf, monkeypatch)

    n = 2
    rs = np.random.RandomState(7)
    z = rs.randn(n, our_cfg.z_dim).astype(np.float32)
    c = np.eye(our_cfg.c_dim, dtype=np.float32)[rs.randint(0, our_cfg.c_dim, n)]
    angles = np.stack([np.array([0.3, -1.1]),
                       np.array([np.pi / 2 - 0.2, np.pi / 2 + 0.15]),
                       np.zeros(n)], axis=1).astype(np.float32)
    fov = np.array([25.0, 38.0], dtype=np.float32)
    radius = np.array([1.0, 1.05], dtype=np.float32)
    look_at = np.zeros((n, 3), dtype=np.float32)

    from tests._torch_ref import nested_easydict
    cam_ref = nested_easydict(dict(
        angles=torch.from_numpy(angles), fov=torch.from_numpy(fov),
        radius=torch.from_numpy(radius), look_at=torch.from_numpy(look_at)))
    with torch.no_grad():
        img_ref = G_ref(torch.from_numpy(z), torch.from_numpy(c), cam_ref,
                        camera_angles_cond=torch.from_numpy(angles),
                        noise_mode='const').numpy()          # [N, 3, H, W]

    from tdgp.utils.tensor_group import TensorGroup
    cam = TensorGroup(angles=jnp.asarray(angles), fov=jnp.asarray(fov),
                      radius=jnp.asarray(radius), look_at=jnp.asarray(look_at))
    img = G.apply(converted, jnp.asarray(z), jnp.asarray(c), cam,
                  camera_angles_cond=jnp.asarray(angles), train=False,
                  noise_mode='const')                        # [N, H, W, 3]
    img = np.asarray(img).transpose(0, 3, 1, 2)

    assert img.shape == img_ref.shape
    max_diff = np.abs(img - img_ref).max()
    assert max_diff <= 1e-3, f'pixel parity failed: max abs diff {max_diff:.2e}'
