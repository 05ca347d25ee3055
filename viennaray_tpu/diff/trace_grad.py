"""Differentiable flux tracing (net-new vs the reference, SURVEY §7 M6).

``trace_flux`` is a pure jittable, reverse-differentiable function of the
continuous parameters: surface point positions, normals, sticking
probabilities (incl. per-material tables), and cosine exponents. The bounce
loop runs as a fixed-length ``lax.scan``; gradients flow through

- the deposited weights (w_k = w0 * prod_j (1 - s_j)) -> exact d flux / d s,
- hit positions/times t(org, points, normals) -> geometry sensitivities,

while discrete events (hit selection, roulette, boundary branch) are
piecewise-constant and treated straight-through. Russian roulette is disabled
(config.roulette=False) because its weight renewal zeroes d w / d s; the
bounded bounce count replaces it as the termination rule. Finite-difference
validation only holds for smooth parameters away from visibility changes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import TraceConfig
from ..trace.kernel import trace_batch


def trace_flux(
    geometry,
    source,
    particle,
    bbox,
    key,
    ray_indices,
    valid,
    config: TraceConfig,
    geo_type: str = "disk",
    num_bounces: int = 16,
):
    """Differentiable raw flux (N,). Same semantics as the standard kernel
    with roulette off and a fixed bounce budget."""
    config = (
        config
        if not config.roulette
        else TraceConfig(**{**config.__dict__, "roulette": False})
    )
    flux, _ = trace_batch(
        geometry, source, particle, bbox, key, ray_indices, valid, config,
        geo_type, differentiable=True, num_bounces=num_bounces,
    )
    return flux


def flux_and_grad_sticking(
    geometry, source, particle, bbox, key, ray_indices, valid, config,
    geo_type="disk", num_bounces=16,
):
    """(flux, d sum(flux)/d sticking) — the simplest gradient entry point."""

    def loss_fn(sticking):
        p = particle.replace(sticking=sticking)
        flux = trace_flux(
            geometry, source, p, bbox, key, ray_indices, valid, config,
            geo_type, num_bounces,
        )
        return jnp.sum(flux), flux

    (total, flux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
        particle.sticking
    )
    return flux, grad


def flux_and_grad_sticking_batched(
    geometry, source, particle, bbox, base_key, total_rays, config,
    geo_type="disk", num_bounces=16,
):
    """Gradient of a LARGE-ray-count flux w.r.t. sticking, accumulated over
    mega-batches of ``config.ray_batch_size`` rays — the gradient analog of
    the tracer's launch-clamp loop (gpu/raygTrace.hpp:132-160). The scan
    path's memory is O(batch x bounces), so this is how 1e7+-ray gradients
    run on a chip (BASELINE config 5). Both flux and the scalar gradient are
    plain sums over batches; batch b uses fold_in(base_key, b), matching the
    tracer's per-batch key schedule.

    Returns (flux (N,) float64 host sum, d sum(flux)/d sticking float).
    """
    import numpy as np

    batch = config.ray_batch_size
    num_batches = max(1, -(-total_rays // batch))

    @jax.jit
    def one_batch(batch_key, ray_indices, valid):
        def loss_fn(sticking):
            p = particle.replace(sticking=sticking)
            flux = trace_flux(
                geometry, source, p, bbox, batch_key, ray_indices, valid,
                config, geo_type, num_bounces,
            )
            return jnp.sum(flux), flux

        (_, flux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            particle.sticking
        )
        return flux, grad

    flux_acc = np.zeros((geometry.num_primitives,), np.float64)
    grad_acc = 0.0
    for b in range(num_batches):
        ray_indices = jnp.arange(
            b * batch, (b + 1) * batch, dtype=jnp.int32
        )
        valid = ray_indices < total_rays
        f, g = one_batch(jax.random.fold_in(base_key, b), ray_indices, valid)
        flux_acc += np.asarray(f, np.float64)
        grad_acc += float(g)
    return flux_acc, grad_acc


def _flux_and_grad_geom_batched(
    geometry, source, particle, bbox, base_key, total_rays, config,
    field, geo_type="disk", num_bounces=16, loss_weights=None,
):
    """Shared mega-batch driver for geometry-parameter gradients.

    ``field``: "points" or "normals" — the DiskGeometry leaf differentiated.
    Gradients accumulate over batches exactly like the sticking driver
    (batch b uses fold_in(base_key, b)); the loss is sum(flux) by default or
    dot(loss_weights, flux). Returns (flux (N,) f64, grad (N, 3) f64).
    """
    import numpy as np

    batch = config.ray_batch_size
    num_batches = max(1, -(-total_rays // batch))

    @jax.jit
    def one_batch(batch_key, ray_indices, valid):
        def loss_fn(leaf):
            g = geometry.replace(**{field: leaf})
            flux = trace_flux(
                g, source, particle, bbox, batch_key, ray_indices, valid,
                config, geo_type, num_bounces,
            )
            if loss_weights is not None:
                return jnp.vdot(loss_weights, flux), flux
            return jnp.sum(flux), flux

        (_, flux), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            getattr(geometry, field)
        )
        return flux, grad

    flux_acc = np.zeros((geometry.num_primitives,), np.float64)
    grad_acc = np.zeros(np.asarray(getattr(geometry, field)).shape,
                        np.float64)
    for b in range(num_batches):
        ray_indices = jnp.arange(b * batch, (b + 1) * batch, dtype=jnp.int32)
        valid = ray_indices < total_rays
        f, g = one_batch(jax.random.fold_in(base_key, b), ray_indices, valid)
        flux_acc += np.asarray(f, np.float64)
        grad_acc += np.asarray(g, np.float64)
    return flux_acc, grad_acc


def flux_and_grad_points_batched(
    geometry, source, particle, bbox, base_key, total_rays, config,
    geo_type="disk", num_bounces=16, loss_weights=None,
):
    """d loss / d surface point positions, mega-batched (the geometry
    analog of ``flux_and_grad_sticking_batched``)."""
    return _flux_and_grad_geom_batched(
        geometry, source, particle, bbox, base_key, total_rays, config,
        "points", geo_type, num_bounces, loss_weights,
    )


def flux_and_grad_normals_batched(
    geometry, source, particle, bbox, base_key, total_rays, config,
    geo_type="disk", num_bounces=16, loss_weights=None,
):
    """d loss / d surface normals, mega-batched."""
    return _flux_and_grad_geom_batched(
        geometry, source, particle, bbox, base_key, total_rays, config,
        "normals", geo_type, num_bounces, loss_weights,
    )
