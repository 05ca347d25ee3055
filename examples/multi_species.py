"""Multi-species etch flux: ion (specular, per-material sticking) + neutral
(diffuse) — the configuration of gpu/examples/trenchDisks.cpp:28-56 and
BASELINE config 5 (without the pod sharding, see examples/sharded_trace.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import viennaray_tpu as vrt
from viennaray_tpu.io import fixtures
from viennaray_tpu.trace.multi import apply_particles


def main():
    grid_delta = 0.25
    points, normals = fixtures.create_trench_grid_3d(grid_delta=grid_delta)

    # materials: 0 = mask (top surface), 1 = substrate (walls + bottom)
    material_ids = np.where(points[:, 2] >= -1e-6, 0, 1).astype(np.int32)

    tracer = vrt.TraceDisk(dim=3)
    tracer.set_geometry(points, normals, grid_delta)
    tracer.set_material_ids(material_ids)
    tracer.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    tracer.set_number_of_rays_per_point(500)
    tracer.set_rng_seed(3)

    ion = vrt.SpecularParticle(
        sticking_probability=0.2,
        source_power=100.0,  # highly directional ion source
        data_label="ionFlux",
        material_sticking=[0.1, 0.3],  # mask vs substrate
    )
    neutral = vrt.DiffuseParticle(
        sticking_probability=0.05, data_label="neutralFlux"
    )

    flux, infos = apply_particles(tracer, [ion, neutral])
    for name, f, info in zip(["ion", "neutral"], flux, infos):
        norm = tracer.normalize_flux(f)
        print(
            f"{name}: rays={info.num_rays} hits={info.geometry_hits} "
            f"time={info.time:.2f}s mean_flux={norm.mean():.3f}"
        )
    td = tracer.get_local_data()
    print("channels:", [td.get_vector_data_label(i)
                        for i in range(td.num_vector_data)])


if __name__ == "__main__":
    main()
