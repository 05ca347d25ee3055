"""Fused Pallas nearest-hit kernels.

The XLA brute-force path (ops/intersect.py) materializes four (R, P) matmul
outputs in HBM per bounce — measured ~12 ms per 65k-ray iteration on v5e,
entirely memory-bound. This kernel fuses the whole test: geometry lives in
VMEM (struct-of-arrays, revisited block so Pallas never re-DMAs it), each ray
tile computes t / hit-distance / validity in registers and keeps a running
(t_min, argmin); only the (R,) results ever touch HBM.

Candidate reduction (the BVH-flavored part): primitives are spatially sorted
source-side-first along the trace axis, each PT-chunk carries an AABB, and the
kernel slab-tests the ray tile against the chunk box before paying for the
full primitive test (``lax.cond`` skip). Rays sorted by origin keep tiles
coherent so whole chunks drop out once a tile has found nearer hits
(measured ~30% on the trench; grows with geometry depth).

Numerics: hit distance is |o + t d - c| per pair (exact f32 on the VPU, no
cancellation) with a Newton-refined fast reciprocal for 1/denom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# numpy scalar, NOT jnp: a module-level jnp constant would
# initialize the XLA backend at import time, breaking
# jax.distributed.initialize() (must run before any backend use)
BIG = np.float32(3.4e38)

# prims row layout (SoA): cx cy cz nx ny nz r2 ndc  -> (8, Npad)
PRIM_ROWS = 8
import os as _os

# prim-chunk width (lanes per SoA chunk). Smaller chunks give the megakernel
# finer skip/early-break granularity at more loop iterations; must be a
# multiple of 128 (TPU lane width).
DEFAULT_PT = int(_os.environ.get("VIENNARAY_TPU_PT", "512"))


def auto_pt(n_prims: int) -> int:
    """Chunk width for a geometry of ``n_prims``: fewer, wider chunks once
    the chunk count is large — each chunk-loop iteration costs ~1.4us of
    Mosaic loop overhead (measured r3), so large geometries amortize it
    (disk18k 253k -> 279k -> 296k rays/s at pt 512 -> 1024 -> 2048) while
    small ones keep the finer skip granularity (the 3k-disk flagship loses
    ~5% above 512). VIENNARAY_TPU_PT overrides."""
    env = _os.environ.get("VIENNARAY_TPU_PT")
    if env:
        return int(env)
    if n_prims <= 8192:
        return 512
    # 1024 measured faster than 2048 on the 18k trench (604.5k vs 573.8k
    # rays/s, r4): (rt, 2048) pair intermediates pressure VMEM into spills,
    # outweighing the halved chunk-loop iteration count. HBM-streamed
    # scales (> SOA budget) keep 2048 so each chunk DMA stays large.
    if n_prims * 32 <= 8 * 1024 * 1024:  # SOA_VMEM_BUDGET
        return 1024
    return 2048


def _morton3(c):
    """Interleave 3 x 21-bit cell coordinates into a 63-bit Morton code —
    chunks of consecutive codes are spatially COMPACT blocks, so a ray's
    slab test prunes all but O(N^(1/3)) chunk AABBs for ANY direction
    (z-slab ordering only pruned well for near-vertical rays)."""
    c = c - c.min(axis=0, keepdims=True)
    c = np.clip(c, 0, (1 << 21) - 1).astype(np.uint64)

    def spread(v):
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return (
        spread(c[:, 0])
        | (spread(c[:, 1]) << np.uint64(1))
        | (spread(c[:, 2]) << np.uint64(2))
    )


def _block_order(centers, cell, pad_to, sort_axis):
    """Morton-compact blocks of ``pad_to`` prims, blocks iterated
    source-side-first (descending block-max along ``sort_axis`` so early
    chunks establish t_min for the skip test).

    Returns the permutation original -> packed order.
    """
    n = len(centers)
    if n == 0:
        return np.zeros((0,), np.int32)
    c = np.floor(centers / cell).astype(np.int64)
    order = np.argsort(_morton3(c), kind="stable")
    n_chunks = -(-n // pad_to)
    # order blocks by descending max coordinate along the trace axis
    block_key = np.full((n_chunks,), -np.inf)
    for b in range(n_chunks):
        seg = order[b * pad_to : (b + 1) * pad_to]
        block_key[b] = centers[seg, sort_axis].max()
    blocks = np.argsort(-block_key, kind="stable")
    out = np.concatenate(
        [order[b * pad_to : (b + 1) * pad_to] for b in blocks]
    )
    return out.astype(np.int32)


def pack_disk_prims(points, normals, radii, pad_to=None, sort_axis=2):
    """Host-side SoA packing: Morton-compact chunks, source-side-first.

    Returns (prims (8, Npad) f32, perm (Npad,) int32 sorted->original,
             chunk_bboxes (n_chunks, 8) f32 [xmin ymin zmin xmax ymax zmax 0 0]).
    """
    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    radii = np.asarray(radii, np.float32)
    n = len(points)
    if pad_to is None:
        pad_to = auto_pt(n)

    if n > 0:
        cell = max(float(radii.max()) * 8.0, 1e-6)
        order = _block_order(points, cell, pad_to, sort_axis)
    else:
        order = np.zeros((0,), np.int32)

    pts_s = points[order]
    nrm_s = normals[order]
    rad_s = radii[order]

    npad = -(-max(n, 1) // pad_to) * pad_to
    out = np.zeros((PRIM_ROWS, npad), np.float32)
    out[0:3, :n] = pts_s.T
    out[3:6, :n] = nrm_s.T
    out[6, :n] = rad_s * rad_s
    out[7, :n] = np.sum(nrm_s * pts_s, axis=1)
    # padding prims: zero normal -> denom==0 -> never valid
    out[0:3, n:] = 1e18

    perm = np.zeros((npad,), np.int32)
    perm[:n] = order

    n_chunks = npad // pad_to
    bbs = np.full((n_chunks, 8), 1e18, np.float32)
    for ci in range(n_chunks):
        lo = ci * pad_to
        hi = min(lo + pad_to, n)
        if hi <= lo:
            continue
        p = pts_s[lo:hi]
        r = rad_s[lo:hi, None]
        bbs[ci, 0:3] = (p - r).min(axis=0)
        bbs[ci, 3:6] = (p + r).max(axis=0)
        bbs[ci, 6:8] = 0.0
    return out, perm, bbs


def _kernel(org_ref, dir_ref, prims_ref, bb_ref, tmin_ref, idx_ref, *, pt,
            t_near, use_skip=True):
    o = org_ref[:]  # (RT, 3)
    d = dir_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    rt = o.shape[0]
    npad = prims_ref.shape[1]

    inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

    def body(i, carry):
        tmin, idx = carry

        # chunk AABB slab test: can ANY ray in this tile still hit the box
        # nearer than its current best? (skipped statically for few-chunk
        # geometries where the test costs more than it saves)
        t0x = (bb_ref[i, 0] - ox) * inv_x
        t1x = (bb_ref[i, 3] - ox) * inv_x
        t0y = (bb_ref[i, 1] - oy) * inv_y
        t1y = (bb_ref[i, 4] - oy) * inv_y
        t0z = (bb_ref[i, 2] - oz) * inv_z
        t1z = (bb_ref[i, 5] - oz) * inv_z
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        need = jnp.any((thi >= tlo) & (thi > 0.0) & (tlo < tmin))

        def full(carry):
            tmin, idx = carry
            sl = pl.ds(i * pt, pt)
            cx = prims_ref[0, sl][None, :]
            cy = prims_ref[1, sl][None, :]
            cz = prims_ref[2, sl][None, :]
            nx = prims_ref[3, sl][None, :]
            ny = prims_ref[4, sl][None, :]
            nz = prims_ref[5, sl][None, :]
            r2 = prims_ref[6, sl][None, :]
            ndc = prims_ref[7, sl][None, :]

            denom = dx * nx + dy * ny + dz * nz  # (RT, PT)
            ndo = ox * nx + oy * ny + oz * nz
            dsafe = jnp.where(denom == 0.0, 1e-30, denom)
            r0 = pl.reciprocal(dsafe, approx=True)
            r0 = r0 * (2.0 - dsafe * r0)  # one Newton step -> ~f32 exact
            t = (ndc - ndo) * r0
            hx = ox + t * dx - cx
            hy = oy + t * dy - cy
            hz = oz + t * dz - cz
            dist2 = hx * hx + hy * hy + hz * hz
            valid = (denom != 0.0) & (t > t_near) & (dist2 < r2)
            tt = jnp.where(valid, t, 3.4e38)

            cmin = jnp.min(tt, axis=1, keepdims=True)
            carg = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None] + i * pt
            take = cmin < tmin
            return (jnp.where(take, cmin, tmin), jnp.where(take, carg, idx))

        return jax.lax.cond(need, full, lambda c: c, carry)

    init = (
        jnp.full((rt, 1), 3.4e38, jnp.float32),
        jnp.zeros((rt, 1), jnp.int32),
    )
    tmin, idx = jax.lax.fori_loop(0, npad // pt, body, init)
    tmin_ref[:] = tmin
    idx_ref[:] = idx


TRI_ROWS = 12


def pack_triangle_prims(vertices, triangles, normals=None, pad_to=None,
                        sort_axis=2):
    """SoA triangle packing: rows [v0(3) e1(3) e2(3) n(3)] -> (12, Npad),
    spatially sorted source-side-first like the disk packing. Rows 9-11 carry
    the STORED unit normals (user orientation may differ from cross(e1,e2));
    when ``normals`` is None they are computed from the edge cross product
    (the geometry builder's default, rayGeometryTriangle.hpp:57-75).

    Returns (prims (12, Npad), perm (Npad,) int32, chunk_bboxes (n_chunks, 8)).
    """
    vertices = np.asarray(vertices, np.float32)
    triangles = np.asarray(triangles, np.int64)
    n = len(triangles)
    if pad_to is None:
        pad_to = auto_pt(n)
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    if normals is None:
        cr = np.cross(v1 - v0, v2 - v0)
        ln = np.linalg.norm(cr, axis=1, keepdims=True)
        normals = cr / np.where(ln > 0, ln, 1.0)
    else:
        normals = np.asarray(normals, np.float32).reshape(-1, 3)

    if n > 0:
        centroid = (v0 + v1 + v2) / 3.0
        scale = max(float(np.abs(v1 - v0).max()), 1e-6) * 4.0
        order = _block_order(centroid, scale, pad_to, sort_axis)
    else:
        order = np.zeros((0,), np.int32)

    v0s, v1s, v2s = v0[order], v1[order], v2[order]
    npad = -(-max(n, 1) // pad_to) * pad_to
    out = np.zeros((TRI_ROWS, npad), np.float32)
    out[0:3, :n] = v0s.T
    out[3:6, :n] = (v1s - v0s).T
    out[6:9, :n] = (v2s - v0s).T
    out[9:12, :n] = normals[order].T
    out[0:3, n:] = 1e18  # far-away padding; zero edges -> det==0 -> invalid

    perm = np.zeros((npad,), np.int32)
    perm[:n] = order

    n_chunks = npad // pad_to
    bbs = np.full((n_chunks, 8), 1e18, np.float32)
    for ci in range(n_chunks):
        lo = ci * pad_to
        hi = min(lo + pad_to, n)
        if hi <= lo:
            continue
        allv = np.concatenate([v0s[lo:hi], v1s[lo:hi], v2s[lo:hi]])
        bbs[ci, 0:3] = allv.min(axis=0)
        bbs[ci, 3:6] = allv.max(axis=0)
        bbs[ci, 6:8] = 0.0
    return out, perm, bbs


LINE_ROWS = 6


def pack_line_prims(p0, p1, normals, pad_to=None, sort_axis=1):
    """SoA 2D line-segment packing: rows [p0x p0y ldx ldy nx ny] -> (6, Npad)
    in Morton-compact source-side-first chunk order (parity with the GPU
    line pipeline's custom prims, gpu/raygLineGeometry.hpp).

    Returns (prims (6, Npad), perm (Npad,), chunk_bboxes (n_chunks, 8)); the
    chunk boxes are z-inflated by +-1 so the 3D slab test never sees a
    degenerate interval (line geometry is strictly 2D, z = 0).
    """
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    normals = np.asarray(normals, np.float32)
    n = len(p0)
    if pad_to is None:
        pad_to = auto_pt(n)

    if n > 0:
        mid = 0.5 * (p0 + p1)
        seg = max(float(np.linalg.norm((p1 - p0)[:, :2], axis=1).max()), 1e-6)
        order = _block_order(mid, seg * 8.0, pad_to, sort_axis)
    else:
        order = np.zeros((0,), np.int32)

    p0s, p1s, nrm_s = p0[order], p1[order], normals[order]
    npad = -(-max(n, 1) // pad_to) * pad_to
    out = np.zeros((LINE_ROWS, npad), np.float32)
    out[0, :n] = p0s[:, 0]
    out[1, :n] = p0s[:, 1]
    out[2, :n] = (p1s - p0s)[:, 0]
    out[3, :n] = (p1s - p0s)[:, 1]
    out[4, :n] = nrm_s[:, 0]
    out[5, :n] = nrm_s[:, 1]
    out[0:2, n:] = 1e18  # far padding; zero line dir -> denom == 0 -> invalid

    perm = np.zeros((npad,), np.int32)
    perm[:n] = order

    n_chunks = npad // pad_to
    bbs = np.full((n_chunks, 8), 1e18, np.float32)
    for ci in range(n_chunks):
        lo = ci * pad_to
        hi = min(lo + pad_to, n)
        if hi <= lo:
            continue
        allv = np.concatenate([p0s[lo:hi], p1s[lo:hi]])
        bbs[ci, 0:3] = allv.min(axis=0)
        bbs[ci, 3:6] = allv.max(axis=0)
        bbs[ci, 2] -= 1.0
        bbs[ci, 5] += 1.0
        bbs[ci, 6:8] = 0.0
    return out, perm, bbs


def _tri_kernel(org_ref, dir_ref, prims_ref, bb_ref, tmin_ref, idx_ref, *,
                pt, t_near, use_skip=True):
    o = org_ref[:]
    d = dir_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    rt = o.shape[0]
    npad = prims_ref.shape[1]

    inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

    def body(i, carry):
        tmin, idx = carry
        t0x = (bb_ref[i, 0] - ox) * inv_x
        t1x = (bb_ref[i, 3] - ox) * inv_x
        t0y = (bb_ref[i, 1] - oy) * inv_y
        t1y = (bb_ref[i, 4] - oy) * inv_y
        t0z = (bb_ref[i, 2] - oz) * inv_z
        t1z = (bb_ref[i, 5] - oz) * inv_z
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        need = jnp.any((thi >= tlo) & (thi > 0.0) & (tlo < tmin))

        def full(carry):
            tmin, idx = carry
            sl = pl.ds(i * pt, pt)
            ax = prims_ref[0, sl][None, :]
            ay = prims_ref[1, sl][None, :]
            az = prims_ref[2, sl][None, :]
            e1x = prims_ref[3, sl][None, :]
            e1y = prims_ref[4, sl][None, :]
            e1z = prims_ref[5, sl][None, :]
            e2x = prims_ref[6, sl][None, :]
            e2y = prims_ref[7, sl][None, :]
            e2z = prims_ref[8, sl][None, :]

            # Moller-Trumbore, double-sided
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = hx * e1x + hy * e1y + hz * e1z
            dsafe = jnp.where(jnp.abs(det) < 1e-9, 1e-30, det)
            r0 = pl.reciprocal(dsafe, approx=True)
            r0 = r0 * (2.0 - dsafe * r0)
            sx = ox - ax
            sy = oy - ay
            sz = oz - az
            u = (sx * hx + sy * hy + sz * hz) * r0
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (qx * dx + qy * dy + qz * dz) * r0
            t = (qx * e2x + qy * e2y + qz * e2z) * r0
            valid = (
                (jnp.abs(det) >= 1e-9)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_near)
            )
            tt = jnp.where(valid, t, 3.4e38)
            cmin = jnp.min(tt, axis=1, keepdims=True)
            carg = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None] + i * pt
            take = cmin < tmin
            return (jnp.where(take, cmin, tmin), jnp.where(take, carg, idx))

        if use_skip:
            return jax.lax.cond(need, full, lambda c: c, carry)
        return full(carry)

    init = (
        jnp.full((rt, 1), 3.4e38, jnp.float32),
        jnp.zeros((rt, 1), jnp.int32),
    )
    tmin, idx = jax.lax.fori_loop(0, npad // pt, body, init)
    tmin_ref[:] = tmin
    idx_ref[:] = idx


@functools.partial(
    jax.jit, static_argnames=("t_near", "rt", "pt", "interpret")
)
def triangle_nearest_hit_pallas(
    org, dirn, prims, perm=None, chunk_bbs=None, t_near=1e-4, rt=512,
    pt=None, interpret=False,
):
    """Closest triangle hit via the fused kernel; same contract as the disk
    variant. prims: (9, Npad) from pack_triangle_prims."""
    if pt is None:
        pt = (
            prims.shape[1] // chunk_bbs.shape[0]
            if chunk_bbs is not None
            else DEFAULT_PT
        )
    R = org.shape[0]
    grid = (R // rt,)
    if chunk_bbs is None:
        n_chunks = prims.shape[1] // pt
        chunk_bbs = jnp.concatenate(
            [
                jnp.full((n_chunks, 3), -3.0e38, jnp.float32),
                jnp.full((n_chunks, 3), 3.0e38, jnp.float32),
                jnp.zeros((n_chunks, 2), jnp.float32),
            ],
            axis=1,
        )
    kernel = functools.partial(
        _tri_kernel, pt=pt, t_near=float(t_near),
        use_skip=prims.shape[1] // pt >= 24,
    )
    tmin, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (prims.shape[0], prims.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                chunk_bbs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(org, dirn, prims, chunk_bbs)
    tmin = tmin[:, 0]
    idx = idx[:, 0]
    if perm is not None:
        idx = perm[idx]
    return tmin, idx, tmin < BIG


@functools.partial(
    jax.jit, static_argnames=("t_near", "rt", "pt", "interpret")
)
def disk_nearest_hit_pallas(
    org, dirn, prims, perm=None, chunk_bbs=None, t_near=1e-4, rt=512,
    pt=None, interpret=False,
):
    """Closest disk hit; org/dirn (R, 3) with R % rt == 0; prims (8, Npad).

    perm: optional (Npad,) sorted->original index map (from pack_disk_prims);
    chunk_bbs: optional (Npad/pt, 8) chunk AABBs enabling the skip test.
    Returns (t (R,), prim (R,) int32 in ORIGINAL numbering, hit (R,) bool).
    """
    if pt is None:
        pt = (
            prims.shape[1] // chunk_bbs.shape[0]
            if chunk_bbs is not None
            else DEFAULT_PT
        )
    R = org.shape[0]
    grid = (R // rt,)
    if chunk_bbs is None:
        n_chunks = prims.shape[1] // pt
        chunk_bbs = jnp.concatenate(
            [
                jnp.full((n_chunks, 3), -3.0e38, jnp.float32),
                jnp.full((n_chunks, 3), 3.0e38, jnp.float32),
                jnp.zeros((n_chunks, 2), jnp.float32),
            ],
            axis=1,
        )
    kernel = functools.partial(
        _kernel, pt=pt, t_near=float(t_near),
        use_skip=prims.shape[1] // pt >= 24,
    )
    tmin, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # whole geometry, same block every step -> fetched once
            pl.BlockSpec(
                (PRIM_ROWS, prims.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                chunk_bbs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(org, dirn, prims, chunk_bbs)
    tmin = tmin[:, 0]
    idx = idx[:, 0]
    if perm is not None:
        idx = perm[idx]
    return tmin, idx, tmin < BIG
