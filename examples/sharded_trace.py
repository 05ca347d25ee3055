"""Sharded large-ray-count trace (BASELINE config 5 shape): rays sharded over
all available devices with psum'd flux. On a pod slice, call
``initialize_distributed()`` first and run one process per host.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

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


def main(total_rays=10_000_000):
    grid_delta = 0.25
    pts, nrm = fixtures.create_trench_grid_3d(grid_delta=grid_delta)
    geometry = vrt.DiskGeometry.build(pts, nrm, grid_delta, dim=3)
    particle = vrt.DiffuseParticle(0.1, "flux")
    config = TraceConfig(
        dim=3,
        num_rays_fixed=total_rays,
        rng_seed=9,
        use_random_seed=False,
        boundary_conditions=(vrt.BoundaryCondition.PERIODIC,) * 3,
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

    mesh = make_ray_mesh()
    print(f"devices: {mesh.devices.size}, rays: {total_rays:.2e}")
    t0 = time.perf_counter()
    flux, totals = trace_sharded(
        geometry, source, particle, jnp.asarray(bbox, jnp.float32), config,
        "disk", jax.random.PRNGKey(9), total_rays, mesh,
    )
    np.asarray(flux)
    dt = time.perf_counter() - t0
    print(f"{total_rays / dt:.3e} rays/s over {mesh.devices.size} devices "
          f"({dt:.1f}s); geometry hits {totals[2]:.3e}")


if __name__ == "__main__":
    main()
