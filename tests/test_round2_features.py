"""Round-2 parity features: AVERAGE merge, particle-controlled initial
directions (initNewWithDirection analog), and in-trace per-ray DataLog."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viennaray_tpu as vrt
from viennaray_tpu.data import MergeType, TracingData
from viennaray_tpu.io import fixtures

BATCH = 8192


def _plane3d(rays=100):
    grid_delta = 0.5
    pts, nrm = fixtures.create_plane_grid(grid_delta, 2.0, (0, 1, 2))
    t = vrt.TraceDisk(dim=3)
    t.set_geometry(pts, nrm, grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.REFLECTIVE] * 3)
    t.set_number_of_rays_per_point(rays)
    t.set_rng_seed(21)
    t.set_ray_batch_size(BATCH)
    return t, pts


def test_scalar_average_merge():
    """Scalar AVERAGE merge keeps the mean over contributions
    (ref: rayTraceKernel.hpp:385-405 sum/numThreads)."""
    d = TracingData()
    d.set_number_of_scalar_data(2)
    d.set_scalar_merge_type(0, MergeType.AVERAGE)
    d.set_scalar_merge_type(1, MergeType.SUM)
    for v in (1.0, 2.0, 6.0):
        d.accumulate_scalar(0, v)
        d.accumulate_scalar(1, v)
    assert d.get_scalar_data(0) == pytest.approx(3.0)
    assert d.get_scalar_data(1) == pytest.approx(9.0)


def test_vector_average_merge_warns_and_skips():
    """AVERAGE is invalid for vector data: the reference warns and skips the
    merge (rayTraceKernel.hpp:371-375)."""
    d = TracingData()
    d.set_number_of_vector_data(1)
    d.set_vector_data(0, np.ones(4), label="flux")
    d.set_vector_merge_type(0, MergeType.AVERAGE)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        d.accumulate_vector(0, np.full(4, 5.0))
        assert any("Invalid merge type" in str(x.message) for x in w)
    np.testing.assert_array_equal(d.get_vector_data(0), np.ones(4))


def test_particle_fixed_direction():
    """A particle with a fixed direction overrides the source distribution
    (ref: rayParticle.hpp:31,92,217). A 45-degree tilted ion on a 2D trench
    must strike one wall preferentially."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    wall_left = np.abs(pts[:, 0] + 2.0) < 1e-6
    wall_right = np.abs(pts[:, 0] - 2.0) < 1e-6

    def run(direction):
        t = vrt.TraceDisk(dim=2)
        t.set_geometry(pts, nrm, 0.1)
        t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 2)
        p = vrt.SpecularParticle(1.0, 1.0, direction=direction)
        t.set_particle_type(p)
        t.set_source_direction(vrt.TraceDirection.POS_Y)
        t.set_number_of_rays_per_point(300)
        t.set_rng_seed(8)
        t.set_ray_batch_size(BATCH)
        return t.apply()

    straight = run(None)
    tilted = run([0.7, -0.7, 0.0])  # leaning +x -> strikes the right wall
    l_gain = tilted[wall_left].sum() / max(straight[wall_left].sum(), 1e-9)
    r_gain = tilted[wall_right].sum() / max(straight[wall_right].sum(), 1e-9)
    assert r_gain > 1.5 * l_gain, (l_gain, r_gain)


def test_init_dir_fn_zero_rows_keep_source():
    """init_dir_fn rows that are exactly zero keep the source direction
    (the reference's isZero check, rayTraceKernel.hpp:133-139)."""
    t, pts = _plane3d(rays=50)
    t.set_particle_type(vrt.DiffuseParticle(1.0, "flux"))

    def init_dir(key, ray_indices):
        # half the rays: fixed 60-degree tilt; other half: zeros (source)
        tilt = jnp.where(
            (ray_indices % 2 == 0)[:, None],
            jnp.asarray([0.866, 0.0, -0.5]),
            jnp.zeros(3),
        )
        return jnp.broadcast_to(tilt, (ray_indices.shape[0], 3))

    t.set_custom_functions(init_dir_fn=init_dir)
    t.apply()
    info = t.get_ray_trace_info()
    # plane geometry: every ray still lands (reflective walls)
    assert info.geometry_hits >= 0.99 * info.num_rays

    # all-zero hook must reproduce the unhooked trace bitwise
    t2, _ = _plane3d(rays=50)
    t2.set_particle_type(vrt.DiffuseParticle(1.0, "flux"))
    t2.set_custom_functions(
        init_dir_fn=lambda key, idx: jnp.zeros((idx.shape[0], 3))
    )
    f2 = t2.apply()
    t3, _ = _plane3d(rays=50)
    t3.set_particle_type(vrt.DiffuseParticle(1.0, "flux"))
    f3 = t3.apply()
    np.testing.assert_array_equal(f2, f3)


def test_in_trace_data_log_energy_histogram():
    """Per-ray DataLog from inside the launch (ref: rayUtil.hpp:49-63,
    rayTraceKernel.hpp:132): histogram the per-ray init energies sampled by
    aux_init_fn; the summed histogram must count every valid ray."""
    t, pts = _plane3d(rays=40)
    t.set_particle_type(vrt.DiffuseParticle(0.5, "flux"))
    n_bins = 8

    def aux_init(key, ray_indices):
        e = jax.random.uniform(
            key, (ray_indices.shape[0], 1), minval=10.0, maxval=90.0
        )
        return e

    def log_fn(key, aux, ray_indices, valid):
        bins = jnp.clip((aux[:, 0] / 100.0 * n_bins).astype(jnp.int32), 0,
                        n_bins - 1)
        one_hot = jax.nn.one_hot(bins, n_bins) * valid[:, None]
        return [jnp.sum(one_hot, axis=0)]

    t.set_custom_functions(aux_init_fn=aux_init)
    t.set_data_log_fn(log_fn)
    t.apply()
    log = t.get_data_log()
    total_rays = t.get_ray_trace_info().num_rays
    assert len(log.data) == 1
    assert log.data[0].shape == (n_bins,)
    assert log.data[0].sum() == pytest.approx(total_rays)
    # energies are uniform in [10, 90) -> first and last bins sparsely filled
    assert log.data[0][1:7].min() > 0

    # second apply() accumulates additively (ref DataLog::merge)
    t.apply()
    assert log.data[0].sum() == pytest.approx(2 * total_rays)
