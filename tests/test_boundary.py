"""Boundary-condition behavior tests (mirror tests/boundaryHit,
tests/boundaryHit2D semantics at the trace level)."""

import numpy as np

import viennaray_tpu as vrt
from viennaray_tpu.io import fixtures

BATCH = 8192


def _trench_tracer(bc, dim=2, sticking=1.0, rays=100):
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    t = vrt.TraceDisk(dim=2)
    t.set_geometry(pts, nrm, 0.1)
    t.set_boundary_conditions([bc, bc])
    t.set_particle_type(vrt.DiffuseParticle(sticking, "flux"))
    t.set_source_direction(vrt.TraceDirection.POS_Y)
    t.set_number_of_rays_per_point(rays)
    t.set_rng_seed(77)
    t.set_ray_batch_size(BATCH)
    return t


def test_reflective_and_periodic_conserve_rays():
    """With reflective or periodic side walls and sticking 1, (almost) every
    ray must land on the geometry — walls never eat rays."""
    for bc in (vrt.BoundaryCondition.REFLECTIVE, vrt.BoundaryCondition.PERIODIC):
        t = _trench_tracer(bc)
        t.apply()
        info = t.get_ray_trace_info()
        assert info.geometry_hits >= 0.98 * info.num_rays, bc
        assert info.boundary_hits > 0


def test_ignore_boundary_kills_rays():
    """IGNORE walls terminate rays (ref: rayBoundary.hpp:66-69)."""
    t = _trench_tracer(vrt.BoundaryCondition.IGNORE)
    t.apply()
    info = t.get_ray_trace_info()
    killed = info.num_rays - info.geometry_hits
    assert killed > 0.001 * info.num_rays
    assert info.boundary_hits > 0


def test_periodic_symmetry():
    """Periodic boundaries on a symmetric trench give symmetric flux."""
    t = _trench_tracer(vrt.BoundaryCondition.PERIODIC, rays=2000)
    flux = t.apply()
    norm = t.normalize_flux(flux)
    pts = np.asarray(t.geometry.points)
    # compare mirrored pairs on the top surface
    top = np.abs(pts[:, 1]) < 1e-6
    xs = pts[top, 0]
    f = norm[top]
    order = np.argsort(xs)
    f_sorted = f[order]
    asym = np.abs(f_sorted - f_sorted[::-1]).mean() / f_sorted.mean()
    assert asym < 0.1


def test_max_boundary_hits_cap():
    t = _trench_tracer(vrt.BoundaryCondition.REFLECTIVE, sticking=0.0, rays=20)
    t.set_max_boundary_hits(2)
    t.apply()
    assert t.get_ray_trace_info().boundary_hits > 0
