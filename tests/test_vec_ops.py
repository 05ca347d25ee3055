"""Vector-math unit tests (mirror tests/utilFuncs from the reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

from viennaray_tpu.ops import vec


def test_dot_cross_norm():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vec.dot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(
        vec.cross(a, b)[1], [0.0, 0.0, -1.0], atol=1e-7
    )
    np.testing.assert_allclose(vec.norm(b), [np.sqrt(77.0), 1.0], rtol=1e-6)


def test_normalize():
    v = jnp.array([[3.0, 4.0, 0.0]])
    n = vec.normalize(v)
    np.testing.assert_allclose(n, [[0.6, 0.8, 0.0]], rtol=1e-6)


def test_reflect_specular():
    """d' = 2(n . -d)n + d (ref: rayReflection.hpp:13-29)."""
    d = jnp.array([[0.0, 0.0, -1.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        vec.reflect_specular(d, n), [[0.0, 0.0, 1.0]], atol=1e-7
    )
    # 45-degree incidence on tilted normal
    d = vec.normalize(jnp.array([[1.0, 0.0, -1.0]]))
    r = vec.reflect_specular(d, n)
    np.testing.assert_allclose(
        r, vec.normalize(jnp.array([[1.0, 0.0, 1.0]])), atol=1e-6
    )


def test_orthonormal_basis():
    """Mirror tests/utilFuncs orthonormal-basis checks
    (ref: rayUtil.hpp:287-321)."""
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    B = vec.orthonormal_basis(v)
    u, w1, w2 = B[:, 0], B[:, 1], B[:, 2]
    np.testing.assert_allclose(vec.norm(u), 1.0, atol=1e-5)
    np.testing.assert_allclose(vec.norm(w1), 1.0, atol=1e-5)
    np.testing.assert_allclose(vec.norm(w2), 1.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(u, w1), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(u, w2), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(w1, w2), 0.0, atol=1e-5)
    # u is the normalized input
    np.testing.assert_allclose(u, vec.normalize(v), atol=1e-5)


def test_frisvad_basis():
    rng = np.random.default_rng(1)
    w = vec.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    t, b = vec.frisvad_basis(w)
    # "orthonormal enough for our use" (ref: rayReflection.hpp:82) — f32
    # error grows near the -z pole
    np.testing.assert_allclose(vec.dot(t, w), 0.0, atol=1e-4)
    np.testing.assert_allclose(vec.dot(b, w), 0.0, atol=1e-4)
    np.testing.assert_allclose(vec.dot(t, b), 0.0, atol=1e-4)
    # degenerate pole
    t, b = vec.frisvad_basis(jnp.array([[0.0, 0.0, -1.0]]))
    np.testing.assert_allclose(t, [[0.0, -1.0, 0.0]])
    np.testing.assert_allclose(b, [[-1.0, 0.0, 0.0]])


def test_flatten_2d():
    d = jnp.array([[0.6, 0.0, 0.8]])
    f = vec.flatten_2d(d)
    np.testing.assert_allclose(f, [[1.0, 0.0, 0.0]], atol=1e-6)
