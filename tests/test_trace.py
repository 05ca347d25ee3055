"""Full-trace integration tests (mirror tests/trace2D, traceInterface,
rngSeed, smoothing from the reference)."""

import numpy as np
import pytest

import viennaray_tpu as vrt
from viennaray_tpu.io import fixtures

BATCH = 8192


def _plane_tracer(dim=3, grid_delta=0.5, extent=2.0, sticking=1.0,
                  rays_per_point=200):
    if dim == 3:
        pts, nrm = fixtures.create_plane_grid(grid_delta, extent, (0, 1, 2))
        src = vrt.TraceDirection.POS_Z
    else:
        xs = np.arange(-extent, extent + 1e-9, grid_delta)
        pts = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=1)
        nrm = np.tile([0.0, 1.0, 0.0], (len(xs), 1))
        src = vrt.TraceDirection.POS_Y
    t = vrt.TraceDisk(dim=dim)
    t.set_geometry(pts.astype(np.float32), nrm.astype(np.float32), grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.REFLECTIVE] * dim)
    t.set_particle_type(vrt.DiffuseParticle(sticking, "flux"))
    t.set_source_direction(src)
    t.set_number_of_rays_per_point(rays_per_point)
    t.set_rng_seed(12345)
    t.set_ray_batch_size(BATCH)
    return t, pts


def test_trace3d_plane_uniform_flux():
    """Uniform cosine illumination of a full plane -> normalized flux ~ 1
    everywhere (the analytic contract behind tests/trace2D)."""
    t, pts = _plane_tracer(dim=3, rays_per_point=500)
    flux = t.apply()
    info = t.get_ray_trace_info()
    assert info.num_rays == len(pts) * 500
    # with sticking 1 and reflective walls nearly every ray lands
    assert info.geometry_hits > 0.99 * info.num_rays
    norm = t.normalize_flux(flux)
    np.testing.assert_allclose(norm.mean(), 1.0, rtol=0.03)
    assert norm.std() < 0.06


def test_trace2d_plane_uniform_flux():
    """2D line geometry under cosine source (BASELINE config 1 analog)."""
    t, pts = _plane_tracer(dim=2, grid_delta=0.1, rays_per_point=2000)
    flux = t.apply()
    info = t.get_ray_trace_info()
    assert info.geometry_hits > 0.99 * info.num_rays
    norm = t.normalize_flux(flux)
    np.testing.assert_allclose(norm.mean(), 1.0, rtol=0.03)
    assert norm.std() < 0.08


def test_ray_count_contract():
    """numRays = numPoints * raysPerPoint
    (ref: tests/traceInterface/traceInterface.cpp:68 asserts 4410)."""
    grid_delta, extent = 0.5, 5.0
    pts, nrm = fixtures.create_plane_grid(grid_delta, extent, (0, 1, 2))
    assert len(pts) == 441  # same fixture as the reference test
    t = vrt.TraceDisk(dim=3)
    t.set_geometry(pts, nrm, grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.REFLECTIVE] * 3)
    t.set_particle_type(vrt.DiffuseParticle(1.0, "hitFlux"))
    t.set_number_of_rays_per_point(10)
    t.set_rng_seed(1)
    t.set_ray_batch_size(BATCH)
    t.apply()
    assert t.get_ray_trace_info().num_rays == 4410
    flux = t.get_local_data().get_vector_data("hitFlux")
    assert len(flux) == len(pts)


def test_rng_seed_determinism():
    """Fixed seed => bitwise-identical flux across runs
    (ref: tests/rngSeed/rngSeed.cpp:46-50)."""
    fluxes = []
    for _ in range(2):
        t, _ = _plane_tracer(dim=3, rays_per_point=50)
        fluxes.append(t.apply())
    np.testing.assert_array_equal(fluxes[0], fluxes[1])


def test_rng_seed_changes_with_run_number():
    """Repeated apply() accumulates with a different seed per run
    (ref: rayTraceDisk.hpp:54, rayTraceKernel.hpp:100)."""
    t, _ = _plane_tracer(dim=3, rays_per_point=50)
    f1 = t.apply()
    f2 = t.apply()
    assert not np.array_equal(f1, f2)
    # accumulation in local data: two runs -> roughly double flux
    acc = t.get_local_data().get_vector_data("flux")
    np.testing.assert_allclose(acc, f1 + f2, rtol=1e-6)


def test_smoothing_no_bleed_across_orthogonal_normals():
    """Smoothing must not mix flux between points whose normals are
    orthogonal (ref: tests/smoothing/smoothing.cpp:38-51)."""
    pts = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0], [1, 1, 0], [2, 1, 0]],
        np.float32,
    )
    nrm = np.array(
        [[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 1, 0], [0, 1, 0], [0, 1, 0]],
        np.float32,
    )
    flux = np.array([1, 1, 1, 0, 0, 0], np.float32)
    t = vrt.TraceDisk(dim=3)
    t.set_geometry(pts, nrm, 1.0)
    out = t.smooth_flux(flux, 1)
    np.testing.assert_allclose(out[:3], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[3:], 0.0, atol=1e-6)


def test_sticking_below_one_reflects():
    """sticking 0.1 -> rays bounce; total absorbed weight equals emitted
    weight on a closed plane (flux conservation)."""
    t, pts = _plane_tracer(dim=3, sticking=0.1, rays_per_point=200)
    flux = t.apply()
    info = t.get_ray_trace_info()
    # every ray reflects at least once off the plane (then mostly escapes
    # upward — the same outcome the reference's open-top boundary box gives)
    assert info.reflections >= info.num_rays
    # on a closed flat plane every ray eventually deposits its full weight,
    # so the area-normalized flux is ~1 regardless of sticking
    norm = t.normalize_flux(flux)
    np.testing.assert_allclose(norm.mean(), 1.0, rtol=0.05)


def test_max_reflections_cap():
    t, pts = _plane_tracer(dim=3, sticking=0.0, rays_per_point=20)
    t.set_max_reflections(3)
    t.apply()
    info = t.get_ray_trace_info()
    assert info.reflections <= 4 * info.num_rays


def test_trace_triangle_3d_plane():
    """Triangle geometry normalized flux ~ 1 on a flat plane."""
    grid_delta, extent = 0.5, 2.0
    xs = np.arange(-extent, extent + 1e-9, grid_delta)
    n = len(xs)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([uu.ravel(), vv.ravel(), np.zeros(n * n)], axis=1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            tris.append([a, a + 1, a + n])
            tris.append([a + 1, a + n + 1, a + n])
    tris = np.array(tris, np.uint32)
    t = vrt.TraceTriangle(dim=3)
    t.set_geometry(verts.astype(np.float32), tris, grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.REFLECTIVE] * 3)
    t.set_particle_type(vrt.DiffuseParticle(1.0, "flux"))
    t.set_number_of_rays_fixed(100_000)
    t.set_rng_seed(99)
    t.set_ray_batch_size(BATCH)
    flux = t.apply()
    info = t.get_ray_trace_info()
    assert info.geometry_hits > 0.99 * info.num_rays
    norm = t.normalize_flux(flux)
    np.testing.assert_allclose(norm.mean(), 1.0, rtol=0.03)
    assert norm.std() < 0.1
