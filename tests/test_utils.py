"""Tests for core utils: TensorGroup pytree semantics, misc helpers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgp.utils import TensorGroup, assert_shape, linear_schedule


def make_group(n=6):
    return TensorGroup(
        angles=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
        fov=jnp.arange(n, dtype=jnp.float32),
        radius=jnp.ones(n),
        look_at=jnp.zeros((n, 3)),
    )


def test_tensor_group_basicsemantics():
    g = make_group()
    assert len(g) == 6
    assert g.angles.shape == (6, 3)
    assert g["fov"].shape == (6,)
    sliced = g[2:4]
    assert len(sliced) == 2
    np.testing.assert_allclose(sliced.fov, [2.0, 3.0])
    parts = g.split(4)
    assert [len(p) for p in parts] == [4, 2]


def test_tensor_group_arithmetic():
    g = make_group(2)
    h = (g + g) * 0.5
    np.testing.assert_allclose(h.angles, g.angles)
    d = g - g
    np.testing.assert_allclose(d.fov, 0.0)


def test_tensor_group_is_pytree():
    g = make_group(3)
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 4

    @jax.jit
    def f(grp):
        return grp * 2.0

    out = f(g)
    assert isinstance(out, TensorGroup)
    np.testing.assert_allclose(out.fov, np.asarray(g.fov) * 2)

    # grad through a TensorGroup
    grad = jax.grad(lambda grp: jnp.sum(grp.angles ** 2))(g)
    np.testing.assert_allclose(grad.angles, 2 * np.asarray(g.angles))


def test_tensor_group_vmap_axis0():
    g = make_group(4)
    out = jax.vmap(lambda grp: grp.fov + 1.0)(g)
    np.testing.assert_allclose(out, np.asarray(g.fov) + 1)


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    assert_shape(x, [2, None, 4])
    with pytest.raises(AssertionError):
        assert_shape(x, [2, 3, 5])
    with pytest.raises(AssertionError):
        assert_shape(x, [2, 3])


def test_linear_schedule():
    assert linear_schedule(0, 1.0, 0.0, 100) == 1.0
    assert linear_schedule(50, 1.0, 0.0, 100) == 0.5
    assert linear_schedule(200, 1.0, 0.0, 100) == 0.0
    assert linear_schedule(5, 1.0, 0.0, 100, start_step=10) == 1.0
