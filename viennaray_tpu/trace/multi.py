"""Multi-particle (species) tracing.

The reference GPU tracer launches one OptiX pipeline per particle species on
its own CUDA stream with a species x label flux buffer
(gpu/raygTrace.hpp:97-99, 228-248). Here each species is one jitted trace
call (compile-cached per reflection kind); the flux comes back stacked
(S, N). Species with identical static behavior could also be vmapped over
the particle pytree axis — sequential launches keep per-species counters,
matching the reference's per-launch bookkeeping.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import TraceInfo


def apply_particles(tracer, particles: Sequence) -> Tuple[np.ndarray, List[TraceInfo]]:
    """Run ``tracer.apply()`` once per species.

    tracer: a TraceDisk/TraceTriangle with geometry + settings configured.
    Returns (flux (S, N), [TraceInfo per species]); also accumulates each
    species' labelled channels into the tracer's TracingData.
    """
    fluxes = []
    infos = []
    for particle in particles:
        tracer.set_particle_type(particle)
        flux = tracer.apply()
        fluxes.append(np.asarray(flux))
        infos.append(tracer.get_ray_trace_info())
    return np.stack(fluxes), infos
