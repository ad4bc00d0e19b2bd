"""Metric math golden tests + generator-sampling glue smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.metrics.features import FeatureStats
from tdgp.metrics.fid import compute_fid, frechet_distance
from tdgp.metrics.kid import compute_kid
from tdgp.metrics.inception_score import compute_is
from tdgp.metrics.precision_recall import compute_pr
from tdgp.metrics.nfs import compute_nfs_from_depth_maps
from tdgp.metrics.detectors import RandomProjectionDetector

RNG = np.random.RandomState(0)


def make_stats(x, **kw):
    s = FeatureStats(**kw)
    s.append(x)
    return s


def test_feature_stats_mean_cov():
    x = RNG.randn(5000, 8).astype(np.float32) * 2 + 1
    s = make_stats(x, capture_mean_cov=True)
    mu, cov = s.get_mean_cov()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-4)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-2)


def test_feature_stats_max_items():
    s = FeatureStats(capture_all=True, max_items=10)
    s.append(RNG.randn(7, 4))
    s.append(RNG.randn(7, 4))
    assert s.num_items == 10 and s.is_full()
    assert s.get_all().shape == (10, 4)


def test_fid_zero_for_identical_distributions():
    mu = RNG.randn(16)
    a = RNG.randn(16, 16)
    sigma = a @ a.T
    assert abs(frechet_distance(mu, sigma, mu.copy(), sigma.copy())) < 1e-6


def test_fid_increases_with_shift():
    x = RNG.randn(4000, 8)
    fids = []
    for shift in (0.0, 0.5, 2.0):
        y = RNG.randn(4000, 8) + shift
        fids.append(compute_fid(make_stats(x, capture_mean_cov=True),
                                make_stats(y, capture_mean_cov=True)))
    assert fids[0] < fids[1] < fids[2]
    assert fids[0] < 0.1
    # analytic: FID between N(0,I) and N(shift,I) = d * shift^2
    assert abs(fids[2] - 8 * 4.0) < 1.5


def test_kid_near_zero_for_same_distribution():
    x = RNG.randn(2000, 8)
    y = RNG.randn(2000, 8)
    z = RNG.randn(2000, 8) + 1.0
    kid_same = compute_kid(x, y, num_subsets=20, max_subset_size=500)
    kid_diff = compute_kid(x, z, num_subsets=20, max_subset_size=500)
    assert abs(kid_same) < 0.05
    assert kid_diff > kid_same + 0.1


def test_inception_score_uniform_is_one():
    probs = np.full((1000, 10), 0.1)
    mean, std = compute_is(probs)
    assert abs(mean - 1.0) < 1e-5
    # confident, diverse predictions -> IS ~ num_classes
    onehot = np.eye(10)[RNG.randint(0, 10, 1000)] * 0.999 + 1e-4
    mean2, _ = compute_is(onehot / onehot.sum(1, keepdims=True))
    assert mean2 > 5.0


def test_precision_recall_identical_sets():
    x = RNG.randn(300, 8)
    p, r = compute_pr(x, x.copy(), nhood_size=3)
    assert p == 1.0 and r == 1.0
    far = RNG.randn(300, 8) + 50.0
    p2, r2 = compute_pr(x, far, nhood_size=3)
    assert p2 < 0.05 and r2 < 0.05


def test_nfs_flat_vs_varied_depth():
    # 1.01 sits inside a bin (1.0 is exactly a bin edge of [0.75,1.25]/64)
    flat = np.ones((8, 32, 32)) * 1.01 + RNG.randn(8, 32, 32) * 1e-6
    varied = RNG.uniform(0.75, 1.25, (8, 32, 32))
    nfs_flat = compute_nfs_from_depth_maps(flat, 0.75, 1.25)
    nfs_varied = compute_nfs_from_depth_maps(varied, 0.75, 1.25)
    assert abs(nfs_flat - 1.0) < 1e-3       # single-bin histogram -> exp(0)
    assert nfs_varied > 50.0                 # ~uniform over 64 bins -> ~64


def test_random_projection_detector_shapes():
    det = RandomProjectionDetector(feature_dim=32)
    imgs = jnp.asarray(RNG.randint(0, 255, (4, 64, 64, 3)), dtype=jnp.uint8)
    f = det(imgs)
    assert f.shape == (4, 32)
    f2 = det(imgs)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))


@pytest.mark.slow
def test_eval_context_samplers_run():
    from tdgp.config import tiny_test_config
    from tdgp.metrics.registry import EvalContext
    from tdgp.training.train_step import create_train_state, ema_variables

    cfg = tiny_test_config()
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    ctx = EvalContext(cfg=cfg, G=G, g_vars=ema_variables(state),
                      detector=RandomProjectionDetector(16), batch_size=2)
    imgs = ctx.make_image_sampler()(2, 0)
    assert imgs.shape == (2, cfg.generator.img_resolution, cfg.generator.img_resolution, 3)
    assert imgs.dtype == jnp.uint8
    depth = ctx.make_depth_sampler()(2, 0)
    assert depth.shape[0] == 2 and depth.shape[-1] == 1
    assert np.all(np.isfinite(np.asarray(depth)))


@pytest.mark.slow
def test_eval_batch_gpu_micro_batching_matches_full():
    """batch_gpu host-level micro-batching must reproduce the full-batch
    sampler exactly: G renders are per-sample independent, and the
    conditioning stream is seed-deterministic (features.py:193)."""
    from tdgp.config import tiny_test_config
    from tdgp.metrics.registry import EvalContext
    from tdgp.training.train_step import create_train_state, ema_variables

    cfg = tiny_test_config()
    state, G, D = create_train_state(cfg, seed=0, local_batch=2)
    g_vars = ema_variables(state)
    det = RandomProjectionDetector(16)
    full = EvalContext(cfg=cfg, G=G, g_vars=g_vars, detector=det, batch_size=2)
    micro = EvalContext(cfg=cfg, G=G, g_vars=g_vars, detector=det, batch_size=2,
                        batch_gpu=1)
    assert micro._resolve_batch_gpu() == 1
    assert full._resolve_batch_gpu() == 2  # auto = full batch below 256 px
    a = np.asarray(full.make_image_sampler()(2, 0))
    b = np.asarray(micro.make_image_sampler()(2, 0))
    # uint8 after identical fp math; allow off-by-one from rounding at the
    # quantization boundary under a different batch shape
    assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= 1
    # cut_quantile pools densities across the rendered batch (matching the
    # reference's global torch.quantile), so exact equality holds only at
    # cut_quantile=0; at the NFS default 0.5 the micro-batch is the pool.
    da = np.asarray(full.make_depth_sampler(cut_quantile=0.0)(2, 0))
    db = np.asarray(micro.make_depth_sampler(cut_quantile=0.0)(2, 0))
    np.testing.assert_allclose(da, db, atol=1e-5, rtol=1e-5)
    dq = np.asarray(micro.make_depth_sampler(cut_quantile=0.5)(2, 0))
    assert dq.shape == da.shape and np.all(np.isfinite(dq))


def test_multiprocess_feature_gather_semantics():
    """Rank-strided dataset subsets + deterministic rank-interleaved gather
    (ref metric_utils.py:145-155, :269): simulating 2 processes must cover
    the same items as 1 process and in the interleaved order."""
    import jax.numpy as jnp
    import numpy as np

    from tdgp.metrics.features import compute_feature_stats_for_dataset

    class DS:
        name = 'fake'

        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {'image': np.full((4, 4, 3), i, np.uint8)}

    def detector(images):
        return jnp.asarray(images[:, 0, 0, :1], jnp.float32)  # feature = index

    # single process reference
    s1 = compute_feature_stats_for_dataset(
        DS(), detector, batch_size=8, max_items=32, capture_all=True,
        rank=0, num_shards=1)
    ref_items = s1.get_all()[:, 0]

    # two simulated processes: run each rank with a gather that interleaves
    # this rank's features with the other rank's (computed analytically)
    def make_gather(rank):
        def gather(feats):
            feats = np.asarray(feats)
            other = feats[:, 0] + (1 if rank == 0 else -1)  # other rank's idx
            both = np.empty((2 * len(feats), 1), np.float32)
            both[rank::2, 0] = feats[:, 0]
            both[1 - rank::2, 0] = other
            return both
        return gather

    for rank in (0, 1):
        s = compute_feature_stats_for_dataset(
            DS(), detector, batch_size=8, max_items=32, capture_all=True,
            rank=rank, num_shards=2, gather_fn=make_gather(rank))
        got = np.sort(s.get_all()[:, 0])
        assert np.array_equal(got, np.sort(ref_items)), (rank, got)
