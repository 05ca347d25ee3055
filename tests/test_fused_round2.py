"""Round-2 fused-megakernel coverage: triangle pipeline, coned-cosine
reflection, gas-phase scattering, and the neighbor-list flux model — all in
interpret mode on CPU (the real-TPU runs are validated in bench).

Parity strategy: ``trace_batch`` is called EAGERLY (unjitted) so the fused
eligibility re-evaluates per call; with n_sub forced to 1 the fused kernel
reproduces the unfused key schedule, so fused-vs-unfused differences are
pure f32 op-order noise (budget well under the 0.5% rel-L2 contract from
the round-1 verdict).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viennaray_tpu as vrt
from viennaray_tpu.config import (
    BoundaryCondition,
    ReflectionKind,
    TraceConfig,
    TraceDirection,
)
from viennaray_tpu.io import fixtures
from viennaray_tpu.config import adjust_bounding_box, get_trace_settings
from viennaray_tpu.ops import pallas_bounce, sampling, vec
from viennaray_tpu.physics.source import RandomSource
from viennaray_tpu.trace.kernel import trace_batch


def _force_fused(monkeypatch, on: bool):
    monkeypatch.setenv("VIENNARAY_TPU_FUSED_INTERPRET", "1" if on else "0")
    for v in ("WIDE", "MID", "TAIL"):
        monkeypatch.setenv(f"VIENNARAY_TPU_NSUB_{v}", "1")


def _trace_once(geometry, geo_type, config, particle, seed=3, R=2048):
    """Eager (unjitted) trace so the fused-vs-unfused env toggle takes
    effect per call (jit would cache the first path)."""
    ray_dir, first_dir, second_dir, min_max, pos_neg = get_trace_settings(
        config.source_direction
    )
    margin = (
        geometry.disk_radius if geo_type == "disk" else geometry.grid_delta
    )
    bbox = adjust_bounding_box(
        np.asarray(geometry.bbox), config.source_direction, margin,
        config.dim,
    )
    source = RandomSource(
        bbox=jnp.asarray(bbox, jnp.float32),
        cosine_power=particle.cosine_exponent,
        ray_dir=ray_dir,
        first_dir=first_dir,
        second_dir=second_dir,
        min_max=min_max,
        pos_neg=float(pos_neg),
        dim=config.dim,
    )
    key = jax.random.PRNGKey(seed)
    idx = jnp.arange(R, dtype=jnp.int32)
    valid = jnp.ones((R,), bool)
    flux, counters = trace_batch(
        geometry, source, particle, jnp.asarray(bbox, jnp.float32), key,
        idx, valid, config, geo_type,
    )
    return np.asarray(flux), counters


def _trench_tri():
    """Small 2D trench polyline extruded to triangles (the reference's
    LineMesh -> convertLinesToTriangles path, rayTraceTriangle.hpp:76-81)."""
    seg = 0.15
    pts = []
    # top-left shelf, left wall down, bottom, right wall up, top-right shelf
    for x in np.arange(-2.0, -1.0 + 1e-9, seg):
        pts.append([x, 0.0])
    for y in np.arange(0.0 - seg, -1.5 - 1e-9, -seg):
        pts.append([-1.0, y])
    for x in np.arange(-1.0 + seg, 1.0 - 1e-9, seg):
        pts.append([x, -1.5])
    for y in np.arange(-1.5, 0.0 + 1e-9, seg):
        pts.append([1.0, y])
    for x in np.arange(1.0 + seg, 2.0 + 1e-9, seg):
        pts.append([x, 0.0])
    nodes = np.array(
        [[p[0], p[1], 0.0] for p in pts], np.float32
    )
    n = len(nodes)
    lines = np.stack(
        [np.arange(n - 1), np.arange(1, n)], axis=1
    ).astype(np.uint32)
    mesh = vrt.LineMesh(nodes=nodes, lines=lines, grid_delta=seg)
    return vrt.TriangleGeometry.from_line_mesh(mesh)


@pytest.fixture
def cfg2d():
    return TraceConfig(
        dim=2,
        source_direction=TraceDirection.POS_Y,
        boundary_conditions=(
            BoundaryCondition.PERIODIC,
            BoundaryCondition.PERIODIC,
            BoundaryCondition.PERIODIC,
        ),
        rng_seed=5,
        use_random_seed=False,
    )


def test_triangle_fused_matches_unfused(monkeypatch, cfg2d):
    """Triangle trace through the fused megakernel == the unfused XLA path
    (single-hit deposit, backface kill; rayTraceKernel.hpp:243-307)."""
    geo = _trench_tri()
    p = vrt.DiffuseParticle(0.2)
    _force_fused(monkeypatch, False)
    f_ref, c_ref = _trace_once(geo, "triangle", cfg2d, p)
    _force_fused(monkeypatch, True)
    f_fused, c_fused = _trace_once(geo, "triangle", cfg2d, p)
    assert f_ref.sum() > 0
    rel = np.linalg.norm(f_fused - f_ref) / np.linalg.norm(f_ref)
    assert rel < 5e-3, rel
    # counters track the same events (hit flips at f32 edges allowed)
    assert abs(int(c_fused.geometry_hits) - int(c_ref.geometry_hits)) <= max(
        2, 0.002 * int(c_ref.geometry_hits)
    )


def test_disk_neighbor_flux_model_fused_matches_unfused(monkeypatch, cfg2d):
    """Fused neighbor-list deposits == the unfused check_local_intersection
    path (the CPU reference contract, rayTraceKernel.hpp:255-300)."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geo = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    p = vrt.DiffuseParticle(0.1)
    _force_fused(monkeypatch, False)
    f_ref, _ = _trace_once(geo, "disk", cfg2d, p)
    _force_fused(monkeypatch, True)
    f_fused, _ = _trace_once(geo, "disk", cfg2d, p)
    rel = np.linalg.norm(f_fused - f_ref) / np.linalg.norm(f_ref)
    assert rel < 5e-3, rel


def test_gas_scattering_fused_matches_unfused(monkeypatch, cfg2d):
    """mean_free_path > 0 runs fused with the same key schedule as the
    unfused path (rayTraceKernel.hpp:179-203)."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geo = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    p = vrt.DiffuseParticle(0.3).replace(mean_free_path=5.0)
    _force_fused(monkeypatch, False)
    f_ref, c_ref = _trace_once(geo, "disk", cfg2d, p)
    assert int(c_ref.particle_hits) > 0  # scattering actually happened
    _force_fused(monkeypatch, True)
    f_fused, c_fused = _trace_once(geo, "disk", cfg2d, p)
    assert int(c_fused.particle_hits) > 0
    rel = np.linalg.norm(f_fused - f_ref) / np.linalg.norm(f_ref)
    assert rel < 5e-3, rel
    # scatter counts statistically equal (same draws, edge flips only)
    assert abs(int(c_fused.particle_hits) - int(c_ref.particle_hits)) <= max(
        2, 0.01 * int(c_ref.particle_hits)
    )


def test_coned_cosine_fused_matches_unfused(monkeypatch, cfg2d):
    """CONED_COSINE traces through the fused kernel with theta fed from
    ops/sampling.coned_cosine_theta (rayReflection.hpp:54-122)."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geo = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    p = vrt.SpecularParticle(0.5, 100.0).replace(
        reflection_kind=int(ReflectionKind.CONED_COSINE),
        cone_angle=jnp.asarray(np.pi / 6, jnp.float32),
    )
    _force_fused(monkeypatch, False)
    f_ref, _ = _trace_once(geo, "disk", cfg2d, p)
    _force_fused(monkeypatch, True)
    f_fused, _ = _trace_once(geo, "disk", cfg2d, p)
    rel = np.linalg.norm(f_fused - f_ref) / np.linalg.norm(f_ref)
    assert rel < 5e-3, rel


def test_coned_cosine_kernel_arithmetic_exact():
    """One fused coned-cosine bounce on a flat plane reproduces the
    reference combine d = sinT (cosP t + sinP b) + cosT w for the exact
    (theta, phi) uniforms fed in (rayReflection.hpp:86-120)."""
    pts, nrm = fixtures.create_plane_grid(0.5, 3.0, (0, 1, 2))
    geo = vrt.DiskGeometry.build(pts, nrm, 0.5, dim=3)
    R = 256
    org = jnp.stack(
        [
            jnp.linspace(-2.0, 2.0, R),
            jnp.zeros((R,)),
            jnp.full((R,), 2.0),
        ],
        axis=1,
    ).astype(jnp.float32)
    dirn = jnp.tile(
        jnp.asarray([[0.3, 0.1, -0.9486833]], jnp.float32), (R, 1)
    )
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    w = jnp.ones((R, 1), jnp.float32)
    flags = jnp.concatenate(
        [jnp.ones((R, 1)), jnp.zeros((R, 3))], axis=1
    ).astype(jnp.float32)
    key = jax.random.PRNGKey(9)
    theta = sampling.coned_cosine_theta(key, (R,), jnp.float32(np.pi / 5))
    u_phi = jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    uni = jnp.stack([theta, u_phi, jnp.zeros((R,))], axis=1).astype(
        jnp.float32
    )
    walls = jnp.asarray(
        [[-3.5, 3.5, -3.5, 3.5, -0.5, 2.5, 0.55, 0.75]], jnp.float32
    )
    stick = jnp.asarray([[0.0]], jnp.float32)
    o2, d2, w2, f2, st, fl = pallas_bounce.fused_bounce(
        org, dirn, w, w, flags, uni, geo.prims_soa, geo.soa_chunk_bbs,
        walls, stick,
        t_near=1e-4, dim=3, first_dir=0, second_dir=1, ray_axis=2,
        bc1=BoundaryCondition.REFLECTIVE, bc2=BoundaryCondition.REFLECTIVE,
        refl_kind=ReflectionKind.CONED_COSINE, roulette=False,
        interpret=True, n_sub=1,
    )
    collided = np.asarray(st)[:, 0] > 0.5
    assert collided.sum() > 200
    # expected: the XLA-side combine with the same theta/phi
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wvec = vec.normalize(vec.reflect_specular(dirn, n), eps=1e-12)
    t_b, b_b = vec.frisvad_basis(wvec)
    phi = 2.0 * jnp.pi * u_phi
    st_ = jnp.sin(theta)[:, None]
    ct_ = jnp.cos(theta)[:, None]
    d_exp = st_ * (
        jnp.cos(phi)[:, None] * t_b + jnp.sin(phi)[:, None] * b_b
    ) + ct_ * wvec
    dp = jnp.sum(d_exp * n, axis=-1, keepdims=True)
    d_exp = jnp.where(dp <= 0.0, d_exp - 2.0 * dp * n, d_exp)
    d_exp = vec.normalize(d_exp, eps=1e-12)
    np.testing.assert_allclose(
        np.asarray(d2)[collided], np.asarray(d_exp)[collided], atol=2e-5
    )


def test_line_fused_matches_unfused(monkeypatch, cfg2d):
    """2D line segments through the fused megakernel == the unfused XLA
    path (the GPU line pipeline's cross-product test,
    GeneralPipelineLine.cu:19-49; single-hit deposit, backface kill)."""
    seg = 0.15
    xs = np.arange(-2.0, 2.0 + 1e-9, seg)
    nodes = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], axis=1)
    lines = np.stack(
        [np.arange(len(xs) - 1), np.arange(1, len(xs))], axis=1
    ).astype(np.uint32)
    mesh = vrt.LineMesh(
        nodes=nodes.astype(np.float32), lines=lines, grid_delta=seg
    )
    from viennaray_tpu.geometry.line_geometry import LineGeometry

    geo = LineGeometry.from_mesh(mesh)
    p = vrt.DiffuseParticle(0.4)
    _force_fused(monkeypatch, False)
    f_ref, c_ref = _trace_once(geo, "line", cfg2d, p)
    assert f_ref.sum() > 0
    _force_fused(monkeypatch, True)
    f_fused, c_fused = _trace_once(geo, "line", cfg2d, p)
    rel = np.linalg.norm(f_fused - f_ref) / np.linalg.norm(f_ref)
    assert rel < 5e-3, rel


def test_window_flux_model_optin(monkeypatch, cfg2d):
    """flux_model='window' selects the GPU candidate-window deposits
    (GeneralPipelineDisk.cu:51-59,86-93) — more deposits than neighbor mode
    on curved geometry, identical on an isolated flat plane."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    geo = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    p = vrt.DiffuseParticle(0.1)
    _force_fused(monkeypatch, True)
    import dataclasses

    cfg_w = dataclasses.replace(cfg2d, flux_model="window")
    f_nb, _ = _trace_once(geo, "disk", cfg2d, p)
    f_w, _ = _trace_once(geo, "disk", cfg_w, p)
    assert f_w.sum() > 0 and f_nb.sum() > 0
    assert not np.array_equal(f_w, f_nb)


def test_flux_model_validation():
    with pytest.raises(ValueError):
        TraceConfig(flux_model="bogus")


def test_streamed_kernel_matches_resident_bitwise():
    """HBM-streamed geometry (stream=True: chunks DMA'd into VMEM scratch on
    demand) must be BITWISE equal to the VMEM-resident kernel — same
    arithmetic, different data movement."""
    pts, nrm = fixtures.create_trench_grid_3d(
        grid_delta=0.5, extent=3.0, trench_width=2.0, trench_depth=2.0
    )
    geo = vrt.DiskGeometry.build(pts, nrm, grid_delta=0.5)
    R = 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    org = jnp.stack(
        [
            jax.random.uniform(k1, (R,), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (R,), minval=-2.0, maxval=2.0),
            jnp.full((R,), 3.5),
        ],
        axis=1,
    )
    dirn = jnp.tile(jnp.asarray([[0.1, 0.0, -0.99]]), (R, 1))
    dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
    w = jnp.ones((R, 1), jnp.float32)
    flags = jnp.concatenate(
        [jnp.ones((R, 1)), jnp.zeros((R, 3))], axis=1
    ).astype(jnp.float32)
    uni = jax.random.uniform(k3, (R, 3), dtype=jnp.float32)
    walls = jnp.asarray(
        [[-3.25, 3.25, -3.25, 3.25, -2.0, 3.6, 0.55, 0.75]], jnp.float32
    )
    stick = jnp.asarray([[0.3]], jnp.float32)
    kw = dict(
        t_near=1e-4, dim=3, first_dir=0, second_dir=1, ray_axis=2,
        bc1=BoundaryCondition.PERIODIC, bc2=BoundaryCondition.PERIODIC,
        refl_kind=ReflectionKind.DIFFUSE, interpret=True, n_sub=1,
    )
    args = (org, dirn, w, w, flags, uni, geo.prims_soa, geo.soa_chunk_bbs,
            walls, stick)
    out_res = pallas_bounce.fused_bounce(*args, stream=False, **kw)
    out_str = pallas_bounce.fused_bounce(*args, stream=True, **kw)
    for i, (a, b) in enumerate(zip(out_res, out_str)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"output {i}"
        )
    assert float(np.asarray(out_res[5]).sum()) > 0.0


def test_light_geometry_build_runs_fused(monkeypatch, cfg2d):
    """pack_neighbors=False / accel=False (the Embree-scale build) still
    traces through the fused path and matches the full build's flux."""
    pts, nrm = fixtures.create_trench_grid_2d(grid_delta=0.1)
    full = vrt.DiskGeometry.build(pts, nrm, 0.1, dim=2)
    light = vrt.DiskGeometry.build(
        pts, nrm, 0.1, dim=2, accel=False, pack_neighbors=False
    )
    assert light.neighbor_pack is None and light.grid is None
    p = vrt.DiffuseParticle(0.1)
    _force_fused(monkeypatch, True)
    f_full, _ = _trace_once(full, "disk", cfg2d, p, R=1024)
    f_light, _ = _trace_once(light, "disk", cfg2d, p, R=1024)
    np.testing.assert_array_equal(f_full, f_light)
