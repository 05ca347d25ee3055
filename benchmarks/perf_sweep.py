#!/usr/bin/env python
"""Perf sweep across the headline configs, sync-correct.

Timing rule (BASELINE.md gotcha): ``block_until_ready`` does NOT synchronize
through the axon tunnel, so every timed region ends with a forced HOST FETCH
of the flux array (np.asarray), which cannot complete before the device work
does. One warm apply() first so compilation never lands in the timed run.

Configs:
  disk2d     — reference examples/disk2D (trenchGrid2D.dat shape), 478k rays
  disk3d     — flagship 3D trench (bench.py config), 5.99M rays
  tri3d      — 3D triangle trench (reference examples/triangle3D shape)
  disk18k    — fine-grid 3D trench, 18k disks (VMEM-resident ceiling probe)
  disk1m     — 1M-disk trench: the HBM-streamed megakernel path
  ion        — coned-cosine ion on the 3D trench (BASELINE config 5 physics)

Usage: python benchmarks/perf_sweep.py [config ...]  (default: all)
Writes one JSON line per config to stdout and benchmarks/perf_sweep.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trench3d(grid_delta, extent=5.0, width=4.0, depth=4.0):
    from viennaray_tpu.io import fixtures

    return fixtures.create_trench_grid_3d(
        grid_delta=grid_delta, extent=extent, trench_width=width,
        trench_depth=depth,
    )


def _run_disk(pts, nrm, grid_delta, dim, rays_per_point, particle=None,
              seed=42):
    import viennaray_tpu as vrt

    t = vrt.TraceDisk(dim=dim)
    t.set_geometry(pts, nrm, grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * dim)
    t.set_particle_type(particle or vrt.DiffuseParticle(0.1, "flux"))
    if dim == 2:
        t.set_source_direction(vrt.TraceDirection.POS_Y)
    t.set_number_of_rays_per_point(rays_per_point)
    t.set_rng_seed(seed)
    t.apply()  # warm (compile)
    t0 = time.perf_counter()
    flux = t.apply()
    host = np.asarray(flux)  # forced fetch = true sync
    dt = time.perf_counter() - t0
    info = t.get_ray_trace_info()
    return info.num_rays / dt, dt, info, float(host.sum())


def bench_disk2d():
    from viennaray_tpu.io import dat

    path = "/root/reference/examples/disk2D/trenchGrid2D.dat"
    if os.path.exists(path):
        gd, pts, nrm = dat.read_grid_from_file(path)
    else:
        from viennaray_tpu.io import fixtures

        gd = 0.023
        pts, nrm = fixtures.create_trench_grid_2d(grid_delta=gd)
    return _run_disk(pts, nrm, gd, 2, 2000)


def bench_disk3d():
    pts, nrm = _trench3d(0.25)
    return _run_disk(pts, nrm, 0.25, 3, 2000)


def bench_disk18k():
    pts, nrm = _trench3d(0.1)
    return _run_disk(pts, nrm, 0.1, 3, 200)


def bench_disk1m():
    # fine grid -> ~1M disks: the HBM-streamed megakernel path. Skip the
    # host-side neighbor pack (~600 MB) and grid accel — only the unfused
    # path consumes them.
    import jax.numpy as jnp

    import viennaray_tpu as vrt
    from viennaray_tpu.geometry.disk_geometry import DiskGeometry

    gd = 0.016
    pts, nrm = _trench3d(gd, extent=5.0, width=4.0, depth=4.0)
    t = vrt.TraceDisk(dim=3)
    t.geometry = DiskGeometry.build(
        pts, nrm, gd, dim=3, accel=False, pack_neighbors=False
    )
    t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    t.set_particle_type(vrt.DiffuseParticle(0.1, "flux"))
    t.set_number_of_rays_per_point(4)
    t.set_rng_seed(42)
    t.apply()
    t0 = time.perf_counter()
    flux = t.apply()
    host = np.asarray(flux)
    dt = time.perf_counter() - t0
    info = t.get_ray_trace_info()
    return info.num_rays / dt, dt, info, float(host.sum())


def bench_ion():
    import jax.numpy as jnp

    import viennaray_tpu as vrt
    from viennaray_tpu.config import ReflectionKind

    pts, nrm = _trench3d(0.25)
    ion = vrt.SpecularParticle(0.5, 100.0).replace(
        reflection_kind=int(ReflectionKind.CONED_COSINE),
        cone_angle=jnp.asarray(np.pi / 6, jnp.float32),
    )
    return _run_disk(pts, nrm, 0.25, 3, 2000, particle=ion)


def bench_tri3d():
    import viennaray_tpu as vrt
    from viennaray_tpu.geometry.mesh import TriangleMesh
    from viennaray_tpu.io import dat

    path = "/root/reference/examples/triangle3D/trenchMesh.dat"
    if os.path.exists(path):
        gd, nodes, elems = dat.read_mesh_from_file(path, 3)
        mesh = TriangleMesh(nodes=nodes, triangles=elems, grid_delta=gd)
    else:
        # synthetic trench surface triangulated from the disk grid's extent
        n = 40
        xs = np.linspace(-5.0, 5.0, n + 1)
        vv, uu = np.meshgrid(xs, xs, indexing="ij")
        verts = np.stack(
            [uu.ravel(), vv.ravel(), np.zeros((n + 1) ** 2)], axis=1
        ).astype(np.float32)
        tris = []
        for i in range(n):
            for j in range(n):
                a = i * (n + 1) + j
                tris.append([a, a + 1, a + n + 1])
                tris.append([a + 1, a + n + 2, a + n + 1])
        mesh = TriangleMesh(
            nodes=verts, triangles=np.array(tris, np.int32), grid_delta=0.25
        )
    t = vrt.TraceTriangle(dim=3)
    t.set_geometry(mesh)
    t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    t.set_particle_type(vrt.DiffuseParticle(0.1, "flux"))
    t.set_number_of_rays_per_point(2000)
    t.set_rng_seed(42)
    t.apply()
    t0 = time.perf_counter()
    flux = t.apply()
    host = np.asarray(flux)
    dt = time.perf_counter() - t0
    info = t.get_ray_trace_info()
    return info.num_rays / dt, dt, info, float(host.sum())


def bench_line2d():
    """Native 2D line segments through the fused line megakernel
    (the reference GPU line tracer's config, gpu/examples/trenchLines.cpp
    shape: per-material sticking over the triangle2D lineMesh trench)."""
    import viennaray_tpu as vrt
    from viennaray_tpu.io import dat

    path = "/root/reference/examples/triangle2D/lineMesh.dat"
    if os.path.exists(path):
        gd, nodes, elements = dat.read_mesh_from_file(path, 2)
    else:
        from viennaray_tpu.io import fixtures

        gd = 0.023
        pts, nrm = fixtures.create_trench_grid_2d(grid_delta=gd)
        nodes = pts[:, :2]
        order = np.argsort(nodes[:, 0], kind="stable")
        nodes = nodes[order]
        elements = np.stack(
            [np.arange(len(nodes) - 1), np.arange(1, len(nodes))], axis=1
        ).astype(np.int32)
    mesh = vrt.LineMesh(nodes=nodes, lines=elements, grid_delta=gd)
    n = len(mesh.lines)
    material_ids = np.zeros((n,), np.int32)
    material_ids[n // 2:] = 1
    t = vrt.TraceLine()
    t.set_geometry(mesh, material_ids=material_ids)
    t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 2)
    t.set_particle_type(
        vrt.DiffuseParticle(0.5, "flux", material_sticking=[0.5, 0.1])
    )
    t.set_number_of_rays_per_point(2000)
    t.set_rng_seed(42)
    t.apply()
    t0 = time.perf_counter()
    flux = t.apply()
    host = np.asarray(flux)
    dt = time.perf_counter() - t0
    info = t.get_ray_trace_info()
    return info.num_rays / dt, dt, info, float(host.sum())


BENCHES = {
    "disk2d": bench_disk2d,
    "line2d": bench_line2d,
    "disk3d": bench_disk3d,
    "tri3d": bench_tri3d,
    "disk18k": bench_disk18k,
    "disk1m": bench_disk1m,
    "ion": bench_ion,
}


def main():
    names = sys.argv[1:] or list(BENCHES)
    results = {}
    for name in names:
        rps, dt, info, fsum = BENCHES[name]()
        row = {
            "rays_per_s": round(rps, 1),
            "seconds": round(dt, 3),
            "num_rays": int(info.num_rays),
            "geometry_hits": int(info.geometry_hits),
            "flux_sum": fsum,
            # traversal diagnostics (BVH nodes-visited analog): chunks whose
            # pass-1 / deposit wake test fired, per tile-sub-bounce totals
            "chunks_swept": int(info.chunks_swept),
            "chunks_deposited": int(info.chunks_deposited),
            "tile_bounces": int(info.tile_bounces),
            "total_traces": int(info.total_rays_traced),
        }
        results[name] = row
        print(json.dumps({"config": name, **row}), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "perf_sweep.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    existing["recorded"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)


if __name__ == "__main__":
    main()
