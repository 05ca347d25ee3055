"""Sharded tracing tests on the virtual 8-device CPU mesh (net-new vs the
reference, which had no distributed tests — SURVEY §4)."""

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
from viennaray_tpu.parallel.mesh import make_ray_mesh, trace_sharded
from viennaray_tpu.physics.source import RandomSource


def _setup(rays_per_point=50):
    grid_delta = 0.5
    pts, nrm = fixtures.create_plane_grid(grid_delta, 2.0, (0, 1, 2))
    geometry = vrt.DiskGeometry.build(pts, nrm, grid_delta, dim=3)
    particle = vrt.DiffuseParticle(1.0, "flux")
    config = TraceConfig(
        dim=3,
        num_rays_per_point=rays_per_point,
        rng_seed=5,
        use_random_seed=False,
        ray_batch_size=2048,
        boundary_conditions=(vrt.BoundaryCondition.REFLECTIVE,) * 3,
    )
    bbox = adjust_bounding_box(
        np.asarray(geometry.bbox), config.source_direction,
        geometry.disk_radius, 3,
    )
    s = get_trace_settings(config.source_direction)
    source = RandomSource(
        bbox=jnp.asarray(bbox, jnp.float32),
        cosine_power=particle.cosine_exponent,
        ray_dir=s[0], first_dir=s[1], second_dir=s[2], min_max=s[3],
        pos_neg=float(s[4]), dim=3, num_points=geometry.num_primitives,
    )
    return geometry, source, particle, jnp.asarray(bbox, jnp.float32), config


def test_sharded_trace_matches_physics():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    geometry, source, particle, bbox, config = _setup()
    mesh = make_ray_mesh()
    total = config.total_rays(geometry.num_primitives)
    flux, totals = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(5), total, mesh,
    )
    flux = np.asarray(flux)
    # physics: nearly all rays land; flux per point ~ rays_per_point scaled
    geo_hits = totals[2]
    assert geo_hits > 0.99 * total
    # uniform plane -> AREA-NORMALIZED flux roughly equal (raw hit counts on
    # boundary-clipped disks are proportionally lower, which is correct)
    geometry = geometry.with_areas(
        (0, 1), (vrt.BoundaryCondition.REFLECTIVE,) * 3
    )
    norm = flux / np.asarray(geometry.areas)
    assert norm.std() / norm.mean() < 0.15


def test_sharded_determinism():
    geometry, source, particle, bbox, config = _setup(rays_per_point=20)
    mesh = make_ray_mesh()
    total = config.total_rays(geometry.num_primitives)
    f1, _ = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(5), total, mesh,
    )
    f2, _ = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(5), total, mesh,
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_sharded_vs_single_device_statistics():
    """Sharded and single-device traces agree statistically (different RNG
    partitioning, same distribution)."""
    geometry, source, particle, bbox, config = _setup(rays_per_point=100)
    mesh = make_ray_mesh()
    total = config.total_rays(geometry.num_primitives)
    f_sharded, _ = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(5), total, mesh,
    )
    mesh1 = make_ray_mesh(jax.devices()[:1])
    f_single, _ = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(5), total, mesh1,
    )
    np.testing.assert_allclose(
        np.asarray(f_sharded).sum(), np.asarray(f_single).sum(), rtol=0.02
    )
