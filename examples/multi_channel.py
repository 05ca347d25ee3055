"""Two-channel particle: ion flux + deposited-energy flux in ONE trace.

The ViennaPS pattern the reference supports through surfaceCollision writing
distinct values into distinct labelled TracingData rows
(rayParticle.hpp:60-66; GPU result buffer numElements x sum(dataLabels),
gpu/raygTrace.hpp:97-99). Here the particle declares two data labels and a
custom collision_fn fills both channels: channel 0 counts weight, channel 1
deposits weight scaled by the incidence cosine (an energy-transfer proxy).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import viennaray_tpu as vrt
from viennaray_tpu.io import fixtures


def main():
    grid_delta = 0.25
    points, normals = fixtures.create_trench_grid_3d(grid_delta=grid_delta)

    tracer = vrt.TraceDisk(dim=3)
    tracer.set_geometry(points, normals, grid_delta)
    tracer.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    particle = vrt.SpecularParticle(0.4, 100.0).replace(
        data_labels=("ionFlux", "energyFlux")
    )
    tracer.set_particle_type(particle)

    def collision_fn(flux, ids, w, dirn, normal, mat, key):
        # incidence cosine at the PRIMARY hit scales the energy channel
        cosi = jnp.abs(jnp.sum(dirn * normal, axis=1, keepdims=True))
        f_ion = flux[0].at[ids.reshape(-1)].add(w.reshape(-1))
        f_en = flux[1].at[ids.reshape(-1)].add((w * cosi).reshape(-1))
        return jnp.stack([f_ion, f_en])

    tracer.set_custom_functions(collision_fn=collision_fn)
    tracer.set_number_of_rays_per_point(500)
    tracer.set_rng_seed(12)
    tracer.apply()

    ion = tracer.get_local_data().get_vector_data("ionFlux")
    en = tracer.get_local_data().get_vector_data("energyFlux")
    norm_ion = tracer.normalize_flux(ion)
    norm_en = tracer.normalize_flux(en)
    print(
        f"ionFlux sum={ion.sum():.1f}, energyFlux sum={en.sum():.1f}, "
        f"energy/ion ratio={en.sum() / ion.sum():.3f}"
    )
    from viennaray_tpu.io.vtk import write_vtk

    write_vtk("trenchIonFlux.vtk", points, np.asarray(norm_ion))
    write_vtk("trenchEnergyFlux.vtk", points, np.asarray(norm_en))
    print("wrote trenchIonFlux.vtk + trenchEnergyFlux.vtk")


if __name__ == "__main__":
    main()
