"""Unit tests for periodic-space math."""

import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import space


def test_min_image_range():
    rng = np.random.RandomState(0)
    box = 10.0
    dr = rng.uniform(-50, 50, size=(100, 3)).astype(np.float32)
    out = np.asarray(space.min_image(dr, box))
    assert np.all(out >= -box / 2 - 1e-5)
    assert np.all(out < box / 2 + 1e-5)


def test_min_image_identity_within_half_box():
    box = 10.0
    dr = np.array([[1.0, -2.0, 3.0]], dtype=np.float32)
    out = np.asarray(space.min_image(dr, box))
    np.testing.assert_allclose(out, dr, atol=1e-6)


def test_min_image_wraps_long_displacement():
    box = 10.0
    dr = np.array([[6.0, -6.0, 11.0]], dtype=np.float32)
    out = np.asarray(space.min_image(dr, box))
    np.testing.assert_allclose(out, [[-4.0, 4.0, 1.0]], atol=1e-5)


def test_min_image_vector_box():
    box = np.array([10.0, 20.0, 5.0], dtype=np.float32)
    dr = np.array([[6.0, 6.0, 3.0]], dtype=np.float32)
    out = np.asarray(space.min_image(dr, box))
    np.testing.assert_allclose(out, [[-4.0, 6.0, -2.0]], atol=1e-5)


def test_wrap():
    box = 10.0
    pos = np.array([[11.0, -1.0, 5.0]], dtype=np.float32)
    out = np.asarray(space.wrap(pos, box))
    np.testing.assert_allclose(out, [[1.0, 9.0, 5.0]], atol=1e-5)


def test_pairwise_displacement_antisymmetric_sign():
    """dr[i, j] must equal pos[j] - pos[i] (min-imaged)."""
    rng = np.random.RandomState(1)
    box = 8.0
    pos = rng.uniform(0, box, size=(5, 3)).astype(np.float32)
    dr = np.asarray(space.pairwise_displacement(pos, box))
    expected = np.asarray(space.min_image(pos[2] - pos[1], box))
    np.testing.assert_allclose(dr[1, 2], expected, atol=1e-6)


def test_pairwise_distance_symmetric():
    rng = np.random.RandomState(2)
    box = 8.0
    pos = rng.uniform(0, box, size=(20, 3)).astype(np.float32)
    d2 = np.asarray(space.pairwise_distance2(pos, box))
    np.testing.assert_allclose(d2, d2.T, atol=1e-4)
    np.testing.assert_allclose(np.diag(d2), 0.0, atol=1e-6)


def test_distance_invariant_to_image_shift():
    box = 10.0
    a = jnp.array([1.0, 1.0, 1.0])
    b = jnp.array([9.5, 9.5, 9.5])
    d1 = float(space.distance(a, b, box))
    d2 = float(space.distance(a, b + box * 3, box))
    assert d1 == pytest.approx(d2, abs=1e-5)
    assert d1 == pytest.approx(np.sqrt(3 * 1.5**2), abs=1e-5)


def test_pairwise_displacement_two_system():
    box = 10.0
    a = np.array([[1.0, 0, 0], [9.0, 0, 0]], dtype=np.float32)
    b = np.array([[0.0, 0, 0]], dtype=np.float32)
    out = np.asarray(space.pairwise_displacement_two_system(a, b, box))
    assert out.shape == (1, 2, 3)
    np.testing.assert_allclose(out[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [-1, 0, 0], atol=1e-6)
