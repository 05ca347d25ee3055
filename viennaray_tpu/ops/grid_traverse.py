"""Batched 3-D DDA traversal of the uniform grid.

Wavefront replacement for per-ray BVH descent (SURVEY §7): all rays step
through grid cells in lockstep inside a ``lax.while_loop``; each step gathers
the current cell's padded candidate list (K prim ids) and runs the analytic
primitive test on the (R, K) tile — regular gathers + VPU elementwise math,
no data-dependent shapes.

Correctness rule (classic grid marching): a candidate hit is only final once
``t_best <= t_exit`` of the current cell, because a primitive inserted in this
cell can extend into later cells and a *nearer* primitive may live there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .intersect import BIG


def _disk_test(org, dirn, centers, normals, radii, t_near):
    """Analytic oriented-disk test on an (R, K) candidate tile.

    Double-sided (Embree RTC_ORIENTED_DISC_POINT semantics); elementwise f32
    (no cancellation-prone matmul expansion needed here).
    """
    o = org[:, None, :]
    d = dirn[:, None, :]
    denom = jnp.sum(normals * d, axis=-1)
    ndc = jnp.sum(normals * centers, axis=-1)
    ndo = jnp.sum(normals * o, axis=-1)
    t = (ndc - ndo) / jnp.where(denom == 0, 1e-30, denom)
    hitp = o + t[..., None] * d
    diff = hitp - centers
    dist2 = jnp.sum(diff * diff, axis=-1)
    valid = (denom != 0) & (t > t_near) & (dist2 < radii * radii)
    return t, valid


def _triangle_test(org, dirn, v0, e1, e2, t_near):
    """Moller-Trumbore on an (R, K) candidate tile (double-sided)."""
    eps = jnp.float32(1e-9)
    d = dirn[:, None, :]
    o = org[:, None, :]
    h = jnp.cross(jnp.broadcast_to(d, v0.shape), e2)
    det = jnp.sum(h * e1, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, 1e-30, det)
    s = o - v0
    u = jnp.sum(s * h, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(q * d, axis=-1) * inv_det
    t = jnp.sum(q * e2, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) >= eps)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_near)
    )
    return t, valid


def grid_nearest_hit(
    org,
    dirn,
    grid_cells,
    grid_origin,
    cell_size,
    dims,
    t_near,
    prim_test,
    max_steps=None,
):
    """Closest hit via DDA marching.

    org/dirn: (R, 3); grid_cells: (C, K) padded -1; dims: static (nx, ny, nz).
    prim_test(org, dirn, ids, pad_ok) -> (t (R, K), valid (R, K)) closes over
    the geometry arrays and gathers them by ids.
    Returns (t (R,), prim (R,) int32, hit (R,) bool).
    """
    R = org.shape[0]
    nx, ny, nz = dims
    dims_arr = jnp.array(dims, jnp.int32)
    stride = jnp.array([ny * nz, nz, 1], jnp.int32)
    if max_steps is None:
        max_steps = nx + ny + nz + 3

    eps = jnp.asarray(1e-6, org.dtype) * cell_size
    inv_d = 1.0 / jnp.where(dirn == 0, 1e-30, dirn)
    grid_hi = grid_origin + cell_size * dims_arr.astype(org.dtype)

    # slab clip to the grid box -> entry t (0 if inside)
    t0 = (grid_origin[None, :] - org) * inv_d
    t1 = (grid_hi[None, :] - org) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    # parallel components: inside slab iff org within bounds
    par = dirn == 0
    inside_slab = (org >= grid_origin[None, :]) & (org <= grid_hi[None, :])
    t_lo = jnp.where(par, jnp.where(inside_slab, -BIG, BIG), t_lo)
    t_hi = jnp.where(par, jnp.where(inside_slab, BIG, -BIG), t_hi)
    t_enter = jnp.maximum(jnp.max(t_lo, axis=1), 0.0)
    t_leave = jnp.min(t_hi, axis=1)
    misses_grid = t_enter > t_leave

    pos = org + (t_enter + eps)[:, None] * dirn
    cell = jnp.clip(
        jnp.floor((pos - grid_origin[None, :]) / cell_size).astype(jnp.int32),
        0,
        dims_arr - 1,
    )
    step = jnp.where(dirn > 0, 1, jnp.where(dirn < 0, -1, 0)).astype(jnp.int32)
    # t of next crossing per axis
    next_bound = grid_origin[None, :] + (
        cell + (step > 0).astype(jnp.int32)
    ).astype(org.dtype) * cell_size
    t_max = jnp.where(
        step == 0, BIG, (next_bound - org) * inv_d
    )
    t_delta = jnp.where(step == 0, BIG, cell_size * jnp.abs(inv_d))

    active = ~misses_grid
    t_best = jnp.full((R,), BIG)
    prim_best = jnp.zeros((R,), jnp.int32)

    def cond(state):
        i, _, _, active, _, _ = state
        return jnp.logical_and(i < max_steps, jnp.any(active))

    def body(state):
        i, cell, t_max, active, t_best, prim_best = state
        lin = jnp.sum(cell * stride[None, :], axis=1)
        ids = grid_cells[lin]  # (R, K)
        pad_ok = ids >= 0
        t_c, valid = prim_test(org, dirn, jnp.clip(ids, 0, None), pad_ok)
        valid = valid & pad_ok & active[:, None]
        t_c = jnp.where(valid, t_c, BIG)
        k_best = jnp.argmin(t_c, axis=1).astype(jnp.int32)
        t_k = jnp.take_along_axis(t_c, k_best[:, None], axis=1)[:, 0]
        improve = t_k < t_best
        t_best = jnp.where(improve, t_k, t_best)
        prim_best = jnp.where(
            improve,
            jnp.take_along_axis(ids, k_best[:, None], axis=1)[:, 0],
            prim_best,
        )

        t_exit = jnp.min(t_max, axis=1)
        finished = t_best <= t_exit

        # advance the DDA along the axis with the nearest crossing
        axis = jnp.argmin(t_max, axis=1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_new = cell + onehot * step
        t_max_new = t_max + onehot.astype(t_max.dtype) * t_delta
        out = jnp.any(
            (cell_new < 0) | (cell_new >= dims_arr[None, :]), axis=1
        )
        adv = active & (~finished)
        cell = jnp.where(adv[:, None], cell_new, cell)
        t_max = jnp.where(adv[:, None], t_max_new, t_max)
        active = adv & (~out)
        return (i + 1, cell, t_max, active, t_best, prim_best)

    state = (jnp.int32(0), cell, t_max, active, t_best, prim_best)
    _, _, _, _, t_best, prim_best = jax.lax.while_loop(cond, body, state)
    hit = t_best < BIG
    return t_best, prim_best, hit


def disk_grid_nearest_hit(org, dirn, points, normals, radii, grid, t_near):
    """Disk-cloud nearest hit through a GridData pytree (see
    geometry/disk_geometry.py)."""

    def prim_test(o, d, ids, pad_ok):
        c = points[ids]
        n = normals[ids]
        r = radii[ids]
        return _disk_test(o, d, c, n, r, t_near)

    return grid_nearest_hit(
        org, dirn, grid.cells, grid.origin, grid.cell_size, grid.dims,
        t_near, prim_test,
    )


def triangle_grid_nearest_hit(org, dirn, vertices, triangles, grid, t_near):
    def prim_test(o, d, ids, pad_ok):
        tri = triangles[ids]
        v0 = vertices[tri[..., 0]]
        e1 = vertices[tri[..., 1]] - v0
        e2 = vertices[tri[..., 2]] - v0
        return _triangle_test(o, d, v0, e1, e2, t_near)

    return grid_nearest_hit(
        org, dirn, grid.cells, grid.origin, grid.cell_size, grid.dims,
        t_near, prim_test,
    )
