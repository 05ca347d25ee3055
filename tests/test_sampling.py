"""Distribution tests for sampling primitives (mirror tests/createRay and
tests/reflection's sampled-distribution strategy from the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from viennaray_tpu.ops import sampling

KEY = jax.random.PRNGKey(42)
N = 200_000


def test_unit_sphere_uniform():
    v = np.asarray(sampling.unit_sphere(KEY, (N,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # uniform on sphere: mean ~ 0, E[z^2] = 1/3
    assert np.abs(v.mean(axis=0)).max() < 5e-3
    np.testing.assert_allclose((v**2).mean(axis=0), 1 / 3, atol=5e-3)


def test_power_cosine_moments():
    """cos(theta) = r^(1/(p+1)) => E[cos theta] = (p+1)/(p+2)
    (ref: raySourceRandom.hpp:70-86)."""
    for p in [1.0, 2.0, 5.0]:
        d = np.asarray(sampling.power_cosine_direction(KEY, (N,), p))
        cos_t = d[:, 2]
        assert (cos_t >= 0).all()
        np.testing.assert_allclose(
            cos_t.mean(), (p + 1) / (p + 2), atol=3e-3
        )
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        # azimuthal symmetry
        assert np.abs(d[:, :2].mean(axis=0)).max() < 5e-3


def test_masked_rejection_exact():
    """The batch-level rejection must reproduce the conditional distribution:
    sample u ~ U(0,1) accepted when u < 0.3 => uniform on [0, 0.3]."""

    def propose(k):
        return jax.random.uniform(k, (N,))

    def accept(c):
        return c < 0.3

    value, done = sampling.masked_rejection(
        propose, accept, KEY, (N,), jnp.zeros((N,))
    )
    v = np.asarray(value)
    assert np.asarray(done).all()
    assert (v < 0.3).all()
    np.testing.assert_allclose(v.mean(), 0.15, atol=2e-3)


def test_coned_cosine_theta_range():
    """theta stays inside the cone (ref: rayReflection.hpp:86-94)."""
    max_angle = 0.5
    theta = np.asarray(
        sampling.coned_cosine_theta(KEY, (N // 10,), max_angle)
    )
    assert (theta >= 0).all() and (theta <= max_angle + 1e-6).all()
    # distribution matches the reference's scalar rejection sampler
    # (measured mean 0.2593 * ... for max_angle=0.5)
    np.testing.assert_allclose(theta.mean(), 0.2593, atol=0.01)
