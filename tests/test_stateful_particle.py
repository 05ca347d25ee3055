"""Stateful custom particle: per-ray energy carried through bounces.

The analog of the reference's stateful rayParticle subclasses (initNew sets
energy, surfaceReflection reduces it, surfaceCollision deposits
energy-weighted flux — the usage pattern ViennaPS builds on)."""

import jax
import jax.numpy as jnp
import numpy as np

import viennaray_tpu as vrt
from viennaray_tpu.config import (
    TraceConfig,
    adjust_bounding_box,
    get_trace_settings,
)
from viennaray_tpu.io import fixtures
from viennaray_tpu.physics.source import RandomSource
from viennaray_tpu.trace.kernel import trace_batch


def test_energy_carrying_ion():
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geometry = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    particle = vrt.DiffuseParticle(0.2, "flux")
    config = TraceConfig(
        dim=2, num_rays_fixed=4096, rng_seed=9, use_random_seed=False,
        ray_batch_size=4096,
        source_direction=vrt.TraceDirection.POS_Y,
        boundary_conditions=(vrt.BoundaryCondition.PERIODIC,) * 3,
    )
    bbox = adjust_bounding_box(
        np.asarray(geometry.bbox), config.source_direction,
        geometry.disk_radius, 2,
    )
    s = get_trace_settings(config.source_direction)
    source = RandomSource(
        bbox=jnp.asarray(bbox, jnp.float32),
        cosine_power=particle.cosine_exponent,
        ray_dir=s[0], first_dir=s[1], second_dir=s[2], min_max=s[3],
        pos_neg=float(s[4]), dim=2, num_points=geometry.num_primitives,
    )
    R = 4096
    idx = jnp.arange(R, dtype=jnp.int32)
    valid = jnp.ones((R,), bool)

    # initNew: sample an initial ion energy ~ N(100, 10) (rayParticle.hpp:30)
    def aux_init(key, ray_indices):
        e = 100.0 + 10.0 * jax.random.normal(key, (ray_indices.shape[0],))
        return e[:, None]

    # surfaceCollision: deposit energy-weighted flux
    def collision(flux, ids, weights, dirn, normal, mat, key, aux):
        energy = jnp.clip(aux[:, 0:1], 0.0, None)
        return flux.at[ids.reshape(-1)].add(
            (weights * energy).reshape(-1)
        )

    # surfaceReflection: lose 30% energy per bounce, diffuse out
    def reflect(key, dirn, normal, prim, mat, weight, aux):
        from viennaray_tpu.physics import reflection

        new_dir = reflection.diffuse(key, normal, 2)
        sticking = jnp.full(dirn.shape[:1], 0.2)
        return sticking, new_dir, aux * 0.7

    flux, counters = jax.jit(
        lambda: trace_batch(
            geometry, source, particle, jnp.asarray(bbox, jnp.float32),
            jax.random.PRNGKey(1), idx, valid, config, "disk",
            collision_fn=collision, reflection_fn=reflect,
            aux_init_fn=aux_init,
        )
    )()
    flux = np.asarray(flux)
    assert np.isfinite(flux).all()
    # flux is energy-weighted: mean deposit per hit near the initial energy
    geo_hits = int(counters.geometry_hits)
    assert geo_hits > 0
    per_hit = flux.sum() / geo_hits
    assert 40.0 < per_hit < 140.0  # energy decays with bounces but stays O(100)


def test_aux_state_survives_compaction():
    """Aux must be permuted together with ray state across compaction
    stages (batch > min_stage forces a compaction)."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geometry = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    particle = vrt.DiffuseParticle(0.2, "flux")
    config = TraceConfig(
        dim=2, num_rays_fixed=32768, rng_seed=9, use_random_seed=False,
        ray_batch_size=32768,
        source_direction=vrt.TraceDirection.POS_Y,
        boundary_conditions=(vrt.BoundaryCondition.PERIODIC,) * 3,
    )
    bbox = adjust_bounding_box(
        np.asarray(geometry.bbox), config.source_direction,
        geometry.disk_radius, 2,
    )
    s = get_trace_settings(config.source_direction)
    source = RandomSource(
        bbox=jnp.asarray(bbox, jnp.float32),
        cosine_power=particle.cosine_exponent,
        ray_dir=s[0], first_dir=s[1], second_dir=s[2], min_max=s[3],
        pos_neg=float(s[4]), dim=2, num_points=geometry.num_primitives,
    )
    R = 32768
    idx = jnp.arange(R, dtype=jnp.int32)
    valid = jnp.ones((R,), bool)

    def aux_init(key, ray_indices):
        return jnp.ones((ray_indices.shape[0], 1), jnp.float32) * 5.0

    def collision(flux, ids, weights, dirn, normal, mat, key, aux):
        # constant aux (5.0): flux should be exactly 5x the hit weights
        return flux.at[ids.reshape(-1)].add(
            (weights * aux[:, 0:1]).reshape(-1)
        )

    def reflect(key, dirn, normal, prim, mat, weight, aux):
        from viennaray_tpu.physics import reflection

        return (
            jnp.full(dirn.shape[:1], 0.5),
            reflection.diffuse(key, normal, 2),
            aux,  # unchanged: any compaction mix-up shows as wrong flux
        )

    flux, _ = jax.jit(
        lambda: trace_batch(
            geometry, source, particle, jnp.asarray(bbox, jnp.float32),
            jax.random.PRNGKey(1), idx, valid, config, "disk",
            collision_fn=collision, reflection_fn=reflect,
            aux_init_fn=aux_init,
        )
    )()
    plain, _ = jax.jit(
        lambda: trace_batch(
            geometry, source, particle, jnp.asarray(bbox, jnp.float32),
            jax.random.PRNGKey(1), idx, valid, config, "disk",
            reflection_fn=lambda key, dirn, normal, prim, mat, weight: (
                jnp.full(dirn.shape[:1], 0.5),
                __import__(
                    "viennaray_tpu.physics.reflection", fromlist=["diffuse"]
                ).diffuse(key, normal, 2),
            ),
        )
    )()
    np.testing.assert_allclose(
        np.asarray(flux), 5.0 * np.asarray(plain), rtol=1e-5
    )
