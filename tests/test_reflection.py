"""Reflection-model distribution tests (mirror tests/reflection)."""

import jax
import jax.numpy as jnp
import numpy as np

from viennaray_tpu.physics import reflection

KEY = jax.random.PRNGKey(7)
N = 100_000


def _batch(v):
    return jnp.broadcast_to(jnp.asarray(v, jnp.float32), (N, 3))


def test_specular():
    d = _batch([0.0, 0.0, -1.0])
    n = _batch([0.0, 0.0, 1.0])
    out = np.asarray(reflection.specular(d, n))
    np.testing.assert_allclose(out, np.tile([0, 0, 1.0], (N, 1)), atol=1e-6)


def test_diffuse_cosine_distribution():
    """Diffuse = normalize(sphere + n) is cosine-weighted: E[cos theta] = 2/3
    (ref: rayReflection.hpp:32-50, sampled 5000x in tests/reflection)."""
    n = _batch([0.0, 0.0, 1.0])
    out = np.asarray(reflection.diffuse(KEY, n, dim=3))
    cos_t = out[:, 2]
    assert (cos_t > -1e-6).all()
    np.testing.assert_allclose(cos_t.mean(), 2.0 / 3.0, atol=3e-3)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_diffuse_2d():
    n = _batch([0.0, 1.0, 0.0])
    out = np.asarray(reflection.diffuse(KEY, n, dim=2))
    np.testing.assert_allclose(out[:, 2], 0.0, atol=1e-7)
    assert (out[:, 1] > -1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_coned_cosine_within_cone():
    """All reflected directions stay within max_cone_angle of the specular
    direction and above the surface (ref: rayReflection.hpp:52-120)."""
    d = _batch([0.0, 0.0, -1.0])
    n = jnp.broadcast_to(
        jnp.asarray([np.sin(0.3), 0.0, np.cos(0.3)], jnp.float32), (N, 3)
    )
    angle = 0.4
    out = np.asarray(reflection.coned_cosine(KEY, d, n, angle, dim=3))
    spec = np.asarray(reflection.specular(d, n))
    cos_to_spec = np.sum(out * spec, axis=1)
    # within the cone up to the hemisphere fix-up flip
    above = np.sum(out * np.asarray(n), axis=1)
    assert (above > -1e-5).all()
    assert (cos_to_spec > np.cos(angle) - 0.05).mean() > 0.95
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_coned_cosine_limits():
    """angle <= 0 -> specular; angle >= pi/2 -> diffuse
    (ref: rayReflection.hpp:60-63)."""
    d = _batch([0.0, 0.0, -1.0])
    n = _batch([0.0, 0.0, 1.0])
    out0 = np.asarray(reflection.coned_cosine(KEY, d, n, 0.0, dim=3))
    np.testing.assert_allclose(out0, np.asarray(reflection.specular(d, n)),
                               atol=1e-6)
    out_d = np.asarray(reflection.coned_cosine(KEY, d, n, np.pi / 2, dim=3))
    np.testing.assert_allclose(out_d[:, 2].mean(), 2.0 / 3.0, atol=5e-3)
