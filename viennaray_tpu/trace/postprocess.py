"""Flux post-processing: normalization and neighborhood smoothing.

Ports of the numerical contract in SURVEY §3.4:
- ``normalize_flux_source``: flux[i] *= (sourceArea / numTotalRays) / area[i]
  (ref: rayTraceDisk.hpp:120-137, rayTraceTriangle.hpp:108-125,
  gpu/kernels/normKernels.cu:58-74)
- ``normalize_flux_max`` (disk): flux[i] *= (fullDiskArea / area[i]) / max
  (ref: rayTraceDisk.hpp:110-118); (triangle): flux[i] /= max * area[i]
  (ref: rayTraceTriangle.hpp:99-105)
- ``smooth_flux``: normal-dot-weighted neighborhood average
  (ref: rayTraceDisk.hpp:146-193)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_flux_source(flux, areas, source_area, num_total_rays):
    norm_factor = source_area / num_total_rays
    return flux * norm_factor / jnp.maximum(areas, 1e-30)


def normalize_flux_max_disk(flux, areas, disk_radius):
    total_disk_area = jnp.pi * disk_radius * disk_radius
    maxv = jnp.max(flux)
    return flux * (total_disk_area / jnp.maximum(areas, 1e-30)) / jnp.maximum(
        maxv, 1e-30
    )


def normalize_flux_max_triangle(flux, areas):
    maxv = jnp.max(flux)
    return flux / (jnp.maximum(maxv, 1e-30) * jnp.maximum(areas, 1e-30))


@jax.jit
def smooth_flux(flux, normals, neighbors):
    """Normal-dot-weighted neighborhood average (ref: rayTraceDisk.hpp:173-192).

    flux: (N,); normals: (N, 3); neighbors: (N, K) padded with -1.
    vv = flux[i] + sum_{j in nbrs, w>0} flux[j] * w;  w = n_i . n_j
    out = vv / (1 + sum w)
    """
    n_prims = flux.shape[0]
    nb_valid = neighbors >= 0
    nb_c = jnp.clip(neighbors, 0, n_prims - 1)
    w = jnp.sum(normals[:, None, :] * normals[nb_c], axis=-1)  # (N, K)
    w = jnp.where(nb_valid & (w > 0.0), w, 0.0)
    vv = flux + jnp.sum(flux[nb_c] * w, axis=1)
    return vv / (1.0 + jnp.sum(w, axis=1))
