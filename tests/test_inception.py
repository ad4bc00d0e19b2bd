"""InceptionV3-FID architecture tests: shapes, preprocessing, weight IO."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdgp.metrics.inception import (InceptionV3FID, load_weights, make_detector,
                                    preprocess)


@pytest.fixture(scope='module')
def model_and_vars():
    model = InceptionV3FID()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_feature_and_logit_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).rand(2, 299, 299, 3), dtype=jnp.float32)
    feats, logits = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1008)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_param_count_matches_inception_v3(model_and_vars):
    # torchvision inception_v3 (no aux) ~= 23.8M params; the 1008-logit FID
    # variant differs only in the fc row count.
    _, variables = model_and_vars
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables['params']))
    n += sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables['batch_stats']))
    assert 23e6 < n < 26e6, f"got {n/1e6:.2f}M params"


def test_preprocess_resizes_and_scales():
    imgs = jnp.full((1, 64, 64, 3), 255, dtype=jnp.uint8)
    x = preprocess(imgs)
    assert x.shape == (1, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-5)


def test_weight_roundtrip(tmp_path, model_and_vars):
    _, variables = model_and_vars
    # flatten exactly like the converter output
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                flat['/'.join(prefix + [k])] = np.asarray(v)

    walk(variables, [])
    path = str(tmp_path / 'w.npz')
    np.savez(path, **flat)
    restored = load_weights(path)
    # identical tree structure and values
    orig_leaves = jax.tree.leaves(variables)
    rest_leaves = jax.tree.leaves(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    det = make_detector(restored, batch_jit=False)
    feats = det(jnp.zeros((1, 32, 32, 3), dtype=jnp.uint8))
    assert feats.shape == (1, 2048)
