"""Parity tests for the Pallas tri-plane splat (tdgp/ops/splat.py).

The splat kernel is the TPU replacement for the reference's grid_sample
backward (ref src/training/tri_plane_renderer.py:584 under G training).
Runs in Pallas interpret mode on the CPU test mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdgp.ops.grid_sample import grid_sample_2d
from tdgp.ops.splat import (triplane_sample_fused, triplane_splat,
                            triplane_splat_ref)


def _tri_plane_sample_jnp(planes_flat, coords, scale):
    """The model's pure-jnp path (tdgp/models/epigraf.py:tri_plane_sample)."""
    n3, h, w, f = planes_flat.shape
    n = n3 // 3
    p = coords.shape[1]
    c = coords / scale
    grids = jnp.stack([
        c[..., jnp.array([0, 1])],
        c[..., jnp.array([0, 2])],
        c[..., jnp.array([1, 2])],
    ], axis=1)
    feats = grid_sample_2d(planes_flat, grids.reshape(n * 3, p, 2),
                           align_corners=True)
    return jnp.mean(feats.reshape(n, 3, p, f), axis=1)


@pytest.fixture(scope='module')
def setup():
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    n, h, w, f, p = 2, 64, 128, 8, 97
    scale = 0.5
    planes = jax.random.normal(k1, (n * 3, h, w, f), jnp.float32)
    # coords straddle the cube boundary to exercise corner validity masks
    coords = jax.random.uniform(k2, (n, p, 3), minval=-0.62, maxval=0.62)
    g_pts = jax.random.normal(k3, (n * 3, p, f), jnp.float32)
    return planes, coords, g_pts, scale


def test_splat_kernel_vs_scatter_ref(setup):
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(g, c, scale, n3, h, w,
                                              interpret=True))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(ref)).max() > 0  # non-trivial case


@pytest.mark.parametrize('pack', ['quad', 'pair', 'none'])
def test_fused_forward_matches_jnp(setup, pack):
    planes, coords, _, scale = setup
    out = triplane_sample_fused(planes, coords, scale, True, pack)
    ref = _tri_plane_sample_jnp(planes, coords, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('pack', ['quad', 'pair', 'none'])
def test_fused_grads_match_jnp_autodiff(setup, pack):
    planes, coords, _, scale = setup

    def loss_fused(pl_, co_):
        y = triplane_sample_fused(pl_, co_, scale, True, pack)
        return jnp.sum(jnp.sin(y) * y)

    def loss_jnp(pl_, co_):
        y = _tri_plane_sample_jnp(pl_, co_, scale)
        return jnp.sum(jnp.sin(y) * y)

    gp_f, gc_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(planes, coords)
    gp_r, gc_r = jax.grad(loss_jnp, argnums=(0, 1))(planes, coords)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-4)


def test_fused_grads_under_remat(setup):
    """The model wraps sampling in jax.checkpoint — VJP must survive remat."""
    planes, coords, _, scale = setup

    @jax.checkpoint
    def seg(pl_, co_):
        return jnp.tanh(triplane_sample_fused(pl_, co_, scale, True))

    def loss(pl_, co_):
        return jnp.sum(seg(pl_, co_) ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(jnp.tanh(_tri_plane_sample_jnp(pl_, co_, scale)) ** 2)

    gp_f, gc_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(planes, coords)
    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-4)


def test_splat_bf16_entries(setup):
    """entry_bf16 + mxu_bf16 (the kernel precision used with *_bf16 packs):
    packed entry rows carry bf16 values/weights and byte-split integer meta;
    the result must match the f32 scatter reference to bf16 tolerance."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True,
        mxu_bf16=True, entry_bf16=True))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    den = np.linalg.norm(np.asarray(ref))
    assert num / den < 0.01, num / den
    # integer meta must round-trip exactly: zero-entry texels stay zero
    assert (np.asarray(out)[np.asarray(ref) == 0] == 0).all()


def test_splat_bf16_table_output(setup):
    """table_bf16 (bf16 window table + fp32 VMEM run accumulator): one bf16
    rounding per texel on top of the bf16-entry tolerance."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True,
        mxu_bf16=True, entry_bf16=True, table_bf16=True))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    den = np.linalg.norm(np.asarray(ref))
    assert num / den < 0.01, num / den
    assert (np.asarray(out)[np.asarray(ref) == 0] == 0).all()


def test_splat_bf16_table_f32_entries(setup):
    """table_bf16 composes with f32 entries/MXU (env-override measurement
    combinations must all be correct, not just the default pairing)."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True, table_bf16=True))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    den = np.linalg.norm(np.asarray(ref))
    assert num / den < 0.005, num / den


def test_splat_bf16_entries_boundary_rows():
    """Byte-split meta under boundary conditions (x0=-1, y0=H-1, OOB)."""
    n, h, w, f = 1, 64, 128, 8
    scale = 1.0
    key = jax.random.PRNGKey(3)
    p = 64
    coords = jax.random.uniform(key, (n, p, 3), minval=-1.1, maxval=1.1)
    coords = coords.at[:, :16, 0].set(jnp.linspace(-1.05, -0.95, 16))
    coords = coords.at[:, 16:32, 0].set(jnp.linspace(0.95, 1.05, 16))
    g_pts = jax.random.normal(key, (n * 3, p, f), jnp.float32)
    out = triplane_splat(g_pts, coords, scale, n * 3, h, w, interpret=True,
                         mxu_bf16=True, entry_bf16=True)
    ref = triplane_splat_ref(g_pts, coords, scale, n * 3, h, w)
    num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    den = np.linalg.norm(np.asarray(ref))
    assert num / den < 0.01, num / den


@pytest.mark.parametrize('wrows', [4, 8])
def test_splat_wide_windows_vs_scatter_ref(setup, wrows):
    """wrows-row window families (TDGP_SPLAT_WROWS): the generalized
    single-matmul kernel must match the scatter reference exactly."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True, wrows=wrows))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_splat_wide_windows_bf16(setup):
    """wide windows compose with the bf16 entry/MXU/table variants."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    for table_bf16 in (False, True):
        out = jax.jit(lambda g, c: triplane_splat(
            g, c, scale, n3, h, w, interpret=True, wrows=4,
            mxu_bf16=True, entry_bf16=True, table_bf16=table_bf16))(
                g_pts, coords)
        num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
        den = np.linalg.norm(np.asarray(ref))
        assert num / den < 0.01, (table_bf16, num / den)
        assert (np.asarray(out)[np.asarray(ref) == 0] == 0).all()


def test_splat_wide_windows_boundary_rows():
    """Edge footprints (y0=-1, y0=H-1) and family-B straddlers under wide
    windows — the row-offset remap's corner cases."""
    n, h, w, f = 1, 64, 128, 8
    scale = 1.0
    key = jax.random.PRNGKey(3)
    p = 96
    coords = jax.random.uniform(key, (n, p, 3), minval=-1.1, maxval=1.1)
    coords = coords.at[:, :16, 1].set(jnp.linspace(-1.05, -0.95, 16))
    coords = coords.at[:, 16:32, 1].set(jnp.linspace(0.95, 1.05, 16))
    # rows ≡ wrows-1 (mod wrows): the family-B straddler parity for wrows=4
    ys = (jnp.arange(16) % (h // 4)) * 4 + 3
    coords = coords.at[:, 32:48, 1].set(ys / (h - 1) * 2.0 - 1.0 + 1e-4)
    g_pts = jax.random.normal(key, (n * 3, p, f), jnp.float32)
    ref = triplane_splat_ref(g_pts, coords, scale, n * 3, h, w)
    out = triplane_splat(g_pts, coords, scale, n * 3, h, w, interpret=True,
                         wrows=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    out_bf = triplane_splat(g_pts, coords, scale, n * 3, h, w, interpret=True,
                            wrows=4, mxu_bf16=True, entry_bf16=True)
    num = np.linalg.norm(np.asarray(out_bf) - np.asarray(ref))
    assert num / np.linalg.norm(np.asarray(ref)) < 0.01


@pytest.mark.parametrize('wrows', [2, 4, 8])
def test_splat_overlap_windows_vs_scatter_ref(setup, wrows):
    """Single-family OVERLAP windows (TDGP_SPLAT_OVERLAP): (wrows+1)-row
    windows at stride wrows hold every footprint without parity families;
    the table is (1+1/wrows)x planes instead of 2x. Exact parity."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True, wrows=wrows,
        overlap=True))(g_pts, coords)
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_splat_overlap_windows_bf16(setup):
    """Overlap windows compose with the bf16 entry/MXU production flags."""
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    out = jax.jit(lambda g, c: triplane_splat(
        g, c, scale, n3, h, w, interpret=True, wrows=4, overlap=True,
        mxu_bf16=True, entry_bf16=True))(g_pts, coords)
    num = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    den = np.linalg.norm(np.asarray(ref))
    assert num / den < 0.01, num / den
    assert (np.asarray(out)[np.asarray(ref) == 0] == 0).all()


def test_splat_overlap_boundary_rows():
    """Overlap-window corner cases: plane-edge footprints (y0=-1, y0=H-1)
    and footprints whose top row is the LAST in-stride row of a window
    (ytop % wrows == wrows-1 — the bottom corner lands on the overlap row
    that the unfold adds into the next window)."""
    n, h, w, f = 1, 64, 128, 8
    scale = 1.0
    key = jax.random.PRNGKey(3)
    p = 96
    coords = jax.random.uniform(key, (n, p, 3), minval=-1.1, maxval=1.1)
    coords = coords.at[:, :16, 1].set(jnp.linspace(-1.05, -0.95, 16))
    coords = coords.at[:, 16:32, 1].set(jnp.linspace(0.95, 1.05, 16))
    # top rows ≡ wrows-1 (mod wrows): every footprint uses its overlap row
    ys = (jnp.arange(16) % (h // 4)) * 4 + 3
    coords = coords.at[:, 32:48, 1].set(ys / (h - 1) * 2.0 - 1.0 + 1e-4)
    g_pts = jax.random.normal(key, (n * 3, p, f), jnp.float32)
    ref = triplane_splat_ref(g_pts, coords, scale, n * 3, h, w)
    for wrows in (2, 4):
        out = triplane_splat(g_pts, coords, scale, n * 3, h, w,
                             interpret=True, wrows=wrows, overlap=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=str(wrows))


def test_splat_pair_overlap(setup):
    """The merged coarse+fine pair splat under overlap windows."""
    from tdgp.ops.splat import triplane_splat_pair
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    coords2 = jax.random.uniform(k1, coords.shape, minval=-0.62, maxval=0.62)
    g2 = jax.random.normal(k2, g_pts.shape, jnp.float32)
    merged = jax.jit(lambda a, b, c, d: triplane_splat_pair(
        a, b, c, d, scale, n3, h, w, interpret=True, wrows=4,
        overlap=True))(g_pts, coords, g2, coords2)
    ref = (triplane_splat_ref(g_pts, coords, scale, n3, h, w)
           + triplane_splat_ref(g2, coords2, scale, n3, h, w))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sorted_take_i8_roundtrip(setup):
    """TDGP_SPLAT_TAKE=i8: the int8-bitcast row-take must be bit-exact for
    bf16 and f32 rows, and the splat must be identical under it."""
    from tdgp.ops.splat import _sorted_take
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    key = jax.random.PRNGKey(5)
    for dtype in (jnp.bfloat16, jnp.float32):
        rows = jax.random.normal(key, (64, 11), jnp.float32).astype(dtype)
        perm = jax.random.permutation(jax.random.PRNGKey(6), 64)
        a = _sorted_take(rows, perm, via_i8=False)
        b = _sorted_take(rows, perm, via_i8=True)
        assert a.dtype == b.dtype == dtype
        assert (np.asarray(a) == np.asarray(b)).all()
    import tdgp.ops.splat as S
    old = S._TAKE_I8
    try:
        S._TAKE_I8 = True
        out = jax.jit(lambda g, c: triplane_splat(
            g, c, scale, n3, h, w, interpret=True))(g_pts, coords)
    finally:
        S._TAKE_I8 = old
    ref = triplane_splat_ref(g_pts, coords, scale, n3, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_splat_boundary_rows():
    """Points whose corners touch rows -1/H-1/H exercise the window remap."""
    n, h, w, f = 1, 64, 128, 8
    scale = 1.0
    key = jax.random.PRNGKey(3)
    p = 64
    coords = jax.random.uniform(key, (n, p, 3), minval=-1.1, maxval=1.1)
    # force many points onto the top/bottom edges
    coords = coords.at[:, :16, 1].set(jnp.linspace(-1.05, -0.95, 16))
    coords = coords.at[:, 16:32, 1].set(jnp.linspace(0.95, 1.05, 16))
    g_pts = jax.random.normal(key, (n * 3, p, f), jnp.float32)
    out = triplane_splat(g_pts, coords, scale, n * 3, h, w, interpret=True)
    ref = triplane_splat_ref(g_pts, coords, scale, n * 3, h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('pack', ['quad', 'pair'])
def test_embed_gplanes_is_right_inverse_of_build_transpose(pack):
    """build^T(embed(g)) == g — the identity the hoisted-table gradient
    path relies on (ops/splat.py:_embed_gplanes)."""
    from tdgp.ops.splat import build_sample_table, _embed_gplanes
    key = jax.random.PRNGKey(11)
    planes = jax.random.normal(key, (3, 8, 10, 4), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 1), planes.shape, jnp.float32)

    _, build_vjp = jax.vjp(lambda p: build_sample_table(p, pack), planes)
    (recovered,) = build_vjp(_embed_gplanes(g, pack))
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(g),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('pack', ['quad', 'pair'])
def test_packed_sample_with_hoisted_table(setup, pack):
    """triplane_sample_packed with the table built OUTSIDE a remat region:
    forward and both gradients must match the jnp reference (the model's
    hoisted-table configuration, models/epigraf.py)."""
    from tdgp.ops.splat import build_sample_table, triplane_sample_packed
    planes, coords, _, scale = setup
    shape = planes.shape

    out = triplane_sample_packed(build_sample_table(planes, pack), coords,
                                 scale, shape, pack, True)
    ref = _tri_plane_sample_jnp(planes, coords, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    @jax.checkpoint
    def seg(table_, co_):
        return jnp.tanh(triplane_sample_packed(table_, co_, scale, shape,
                                               pack, True))

    def loss(pl_, co_):
        table = build_sample_table(pl_, pack)       # outside the remat
        return jnp.sum(seg(table, co_) ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(jnp.tanh(_tri_plane_sample_jnp(pl_, co_, scale)) ** 2)

    gp_f, gc_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(planes, coords)
    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-4)


def test_packed_sample_bf16_table(setup):
    """quad_bf16: quad row count at half the table bytes; values quantize to
    bf16 (~3 decimal digits) but gradients still flow and match loosely."""
    from tdgp.ops.splat import build_sample_table, triplane_sample_packed
    planes, coords, _, scale = setup
    shape = planes.shape
    table = build_sample_table(planes, 'quad_bf16')
    assert table.dtype == jnp.bfloat16
    out = triplane_sample_packed(table, coords, scale, shape, 'quad_bf16', True)
    assert out.dtype == jnp.float32
    ref = _tri_plane_sample_jnp(planes, coords, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)

    def loss(pl_, co_):
        t = build_sample_table(pl_, 'quad_bf16')
        return jnp.sum(triplane_sample_packed(t, co_, scale, shape,
                                              'quad_bf16', True) ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(_tri_plane_sample_jnp(pl_, co_, scale) ** 2)

    gp_f, gc_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(planes, coords)
    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=0.15, atol=0.06)
    # d/dcoords takes DIFFERENCES of bf16-quantized corner values — element
    # outliers are inherent; bound the relative L2 error instead
    num = np.linalg.norm(np.asarray(gc_f) - np.asarray(gc_r))
    den = np.linalg.norm(np.asarray(gc_r))
    assert num / den < 0.05, num / den


def test_packed_sample_bf16_residuals(setup):
    """residual_dtype='bf16' (GeneratorConfig.sample_save='save_bf16'):
    the fp32-table forward is exact; only the d/d coords path sees the
    bf16-quantized saved corner values."""
    from tdgp.ops.splat import build_sample_table, triplane_sample_packed
    planes, coords, _, scale = setup
    shape = planes.shape
    table = build_sample_table(planes, 'pair')

    out = triplane_sample_packed(table, coords, scale, shape, 'pair', True,
                                 'bf16')
    ref = _tri_plane_sample_jnp(planes, coords, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(pl_, co_, rd):
        t = build_sample_table(pl_, 'pair')
        return jnp.sum(triplane_sample_packed(t, co_, scale, shape, 'pair',
                                              True, rd) ** 2)

    gp_b, gc_b = jax.jit(jax.grad(loss, argnums=(0, 1)),
                         static_argnums=2)(planes, coords, 'bf16')
    gp_r, gc_r = jax.jit(jax.grad(loss, argnums=(0, 1)),
                         static_argnums=2)(planes, coords, 'table')
    # d/d planes is computed from coords + cotangents only -> exact
    np.testing.assert_allclose(np.asarray(gp_b), np.asarray(gp_r),
                               rtol=1e-6, atol=1e-6)
    # d/d coords reads the bf16 residuals -> bounded relative L2 error
    num = np.linalg.norm(np.asarray(gc_b) - np.asarray(gc_r))
    den = np.linalg.norm(np.asarray(gc_r))
    assert num / den < 0.02, num / den


@pytest.mark.parametrize('pack', ['quad', 'pair', 'quad_bf16'])
def test_hoisted_sample_direct_vjp(setup, pack):
    """triplane_sample_hoisted: forward == jnp reference; d/d planes goes
    directly through the splat (the stop_gradient'd table gets a dead
    cotangent) — the model's production configuration after the round-3
    build-VJP OOM fix."""
    from tdgp.ops.splat import build_sample_table, triplane_sample_hoisted
    planes, coords, _, scale = setup
    shape = tuple(planes.shape)
    bf16 = pack.endswith('_bf16')

    table = jax.lax.stop_gradient(build_sample_table(planes, pack))
    out = triplane_sample_hoisted(planes, table, coords, scale, shape, pack,
                                  True)
    ref = _tri_plane_sample_jnp(planes, coords, scale)
    if bf16:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-2, atol=3e-2)
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    @jax.checkpoint
    def seg(pl_, table_, co_):
        return jnp.tanh(triplane_sample_hoisted(pl_, table_, co_, scale,
                                                shape, pack, True))

    def loss(pl_, co_):
        table_ = jax.lax.stop_gradient(build_sample_table(pl_, pack))
        return jnp.sum(seg(pl_, table_, co_) ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(jnp.tanh(_tri_plane_sample_jnp(pl_, co_, scale)) ** 2)

    gp_f, gc_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(planes, coords)
    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords)
    tol = 0.08 if bf16 else 1e-4
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=tol, atol=tol)
    num = np.linalg.norm(np.asarray(gc_f) - np.asarray(gc_r))
    den = np.linalg.norm(np.asarray(gc_r))
    assert num / den < (0.05 if bf16 else 1e-4), num / den


def test_bf16_planes_primal_grads(setup):
    """render_bf16 generator views pass bf16 PLANES as the primal: the
    custom VJPs must return a bf16 plane cotangent (JAX enforces
    primal/cotangent dtype match) that still tracks the fp32 autodiff
    gradient loosely (splat accumulation stays fp32; only the boundary
    rounds). Guards the Gmain-bf16 flag (training.gmain_render_bf16)."""
    from tdgp.ops.splat import build_sample_table, triplane_sample_hoisted
    planes, coords, _, scale = setup
    planes16 = planes.astype(jnp.bfloat16)
    shape = tuple(planes.shape)

    def loss_fused(pl_, co_):
        return jnp.sum(triplane_sample_fused(pl_, co_, scale, True, 'quad') ** 2)

    def loss_hoisted(pl_, co_):
        table_ = jax.lax.stop_gradient(build_sample_table(pl_, 'quad_bf16'))
        return jnp.sum(triplane_sample_hoisted(
            pl_, table_, co_, scale, shape, 'quad_bf16', True, 'bf16') ** 2)

    def loss_ref(pl_, co_):
        return jnp.sum(_tri_plane_sample_jnp(pl_.astype(jnp.float32), co_, scale) ** 2)

    gp_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(planes, coords)
    for name, fn in (('fused', loss_fused), ('hoisted', loss_hoisted)):
        gp, gc = jax.jit(jax.grad(fn, argnums=(0, 1)))(planes16, coords)
        assert gp.dtype == jnp.bfloat16, (name, gp.dtype)
        assert gc.dtype == jnp.float32, (name, gc.dtype)
        gp32 = np.asarray(gp.astype(jnp.float32))
        np.testing.assert_allclose(gp32, np.asarray(gp_r), rtol=0.15, atol=0.15)
        num = np.linalg.norm(np.asarray(gc) - np.asarray(gc_r))
        den = np.linalg.norm(np.asarray(gc_r))
        assert num / den < 0.08, (name, num / den)


@pytest.mark.parametrize('mode', ['alias', 'concat'])
def test_splat_pair_equals_sum_of_splats(setup, monkeypatch, mode):
    """triplane_splat_pair == splat(g1,c1) + splat(g2,c2) (merged
    coarse+fine backward) in BOTH pair modes — 'concat' is the shipped
    default since round 5, but 'alias' stays production-selectable via
    TDGP_SPLAT_PAIR_MODE (interpret path adds two tables; the hardware
    aliased-init_table path is covered by onchip_splat_parity.py)."""
    from tdgp.ops.splat import triplane_splat_pair
    monkeypatch.setenv('TDGP_SPLAT_PAIR_MODE', mode)
    planes, coords, g_pts, scale = setup
    n3, h, w, f = planes.shape
    k = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(k)
    coords2 = jax.random.uniform(k1, coords.shape, minval=-0.62, maxval=0.62)
    g2 = jax.random.normal(k2, g_pts.shape, jnp.float32)
    merged = jax.jit(lambda a, b, c, d: triplane_splat_pair(
        a, b, c, d, scale, n3, h, w, interpret=True))(g_pts, coords, g2, coords2)
    ref = (triplane_splat_ref(g_pts, coords, scale, n3, h, w)
           + triplane_splat_ref(g2, coords2, scale, n3, h, w))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('pack', ['quad', 'quad_bf16'])
def test_pair_sample_ops_match_two_hoisted(setup, pack):
    """The token-threaded pair ops (coarse emits a token, fine's cotangent
    rides it back) must produce the same loss gradients as two independent
    triplane_sample_hoisted calls — the merged backward is a pure
    reassociation of the same splat sums."""
    from tdgp.ops.splat import (build_sample_table, triplane_sample_hoisted,
                                triplane_sample_pair_first,
                                triplane_sample_pair_second)
    planes, coords, _, scale = setup
    n3, h, w, f = planes.shape
    shape = tuple(planes.shape)
    k = jax.random.PRNGKey(13)
    coords2 = jax.random.uniform(k, coords.shape, minval=-0.62, maxval=0.62)
    p_fine = coords2.shape[1]

    def loss_pair(pl, c1, c2):
        table = jax.lax.stop_gradient(build_sample_table(pl, pack))
        f1, token = triplane_sample_pair_first(pl, table, c1, p_fine, scale,
                                               shape, pack, True)
        f2 = triplane_sample_pair_second(table, c2, token, scale, shape,
                                         pack, True)
        return jnp.sum(jnp.tanh(f1)) + jnp.sum(jnp.tanh(2.0 * f2))

    def loss_two(pl, c1, c2):
        table = jax.lax.stop_gradient(build_sample_table(pl, pack))
        f1 = triplane_sample_hoisted(pl, table, c1, scale, shape, pack, True)
        f2 = triplane_sample_hoisted(pl, table, c2, scale, shape, pack, True)
        return jnp.sum(jnp.tanh(f1)) + jnp.sum(jnp.tanh(2.0 * f2))

    v1, g1 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2))(planes, coords, coords2)
    v2, g2 = jax.value_and_grad(loss_two, argnums=(0, 1, 2))(planes, coords, coords2)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b, name in zip(g1, g2, ('planes', 'coords1', 'coords2')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
