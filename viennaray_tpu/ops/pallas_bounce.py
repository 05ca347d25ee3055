"""Fused multi-bounce megakernel with in-kernel flux deposits.

One Pallas kernel advances a ray tile through ``n_sub`` full bounce
iterations: nearest-hit search (disks or triangles), gas-phase scattering,
finite-wall boundary event, backface pass/kill, **flux deposits**, sticking +
reflection sampling (diffuse / specular / coned-cosine), Russian roulette,
and the state update. Nothing per-bounce remains on the XLA side except the
uniform draws and counter sums — the whole bounce costs ~2 device launches
regardless of geometry size (within the VMEM prim budget).

Hit selection is EXACT: pass 1 keeps a per-ray running (t_min, lane) with a
deterministic tie-break (lowest sorted-lane index; across chunks the earliest
chunk wins), and the hit prim's normal / center / sticking are selected from
that unique lane — no averaging.

Flux models (disks):

- ``"neighbor"`` (default) — the CPU reference contract
  (rayTraceKernel.hpp:255-300 + checkLocalIntersection :462-507): the hit
  prim always deposits the pre-sticking ray weight, and so does every disk
  that (a) lies within the neighborhood radius 2*diskRadius of the hit
  prim's center (the PointNeighborhood membership rule,
  rayGeometryDisk.hpp:97-98, ||c_p - c_hit|| <= 2r), and (b) passes the
  front-face re-test: dot(n, dir) <= -1e-6, plane t > 0, in-plane distance
  strictly < radius. Implemented as a second chunk sweep gated by a
  sphere/chunk-AABB distance test around the hit center — no per-lane
  gathers, no neighbor-list indirection, identical semantics because the
  neighbor LIST is by construction exactly the 2r ball.
- ``"window"`` — the GPU pipeline's candidate-window semantics
  (GeneralPipelineDisk.cu:51-59,86-93): deposit onto every disk the ray
  intersects with t <= t_hit + tau, tau = 1.1*gridDelta
  (gpu/raygTrace.hpp:116), no facing test, no adjacency.

Triangles deposit onto the single closest hit only (single
surfaceCollision, rayTraceKernel.hpp:301-307); backface hits kill the ray
(rayTraceKernel.hpp:243-248) instead of the disk pass-through.

Gas-phase scattering (mean_free_path > 0): P = 1 - exp(-t_event/lambda)
preempting the event; scatter point org + dir * u with u the probability
draw (the reference's exact arithmetic, rayTraceKernel.hpp:179-203); new
direction uniform on the sphere (z = 1-2u, phi uniform — the polar form of
the Marsaglia sampler, rayUtil.hpp:266-283).

Coned-cosine reflection (rayReflection.hpp:54-122): the polar angle theta is
accept-reject sampled OUTSIDE the kernel (ops/sampling.coned_cosine_theta —
the distribution depends only on the static cone angle, not on the hit) and
arrives through the uniforms buffer; the kernel does the Frisvad ONB +
combine + hemisphere fix-up.

Why fused: the XLA bounce body lowers to ~15-20 device kernels; inside the
``lax.while_loop`` each iteration pays their launch overhead (~4 ms measured
at tiny widths), which dominates long boundary ping-pong tails, plus
neighbor gather + scatter flux costs per bounce at full width. The
megakernel eliminates all of it; n_sub > 1 amortizes the remaining launches
across several bounces.

Constraints (the trace body falls back otherwise):
- geometry SoA fits the VMEM budget (disks 8 rows, triangles 12 rows);
- no custom collision/reflection fns, no distance weighting (use_wdist),
  non-differentiable path.

Randomness comes in as precomputed uniforms (R, n_uni*n_sub) so the sampling
arithmetic mirrors physics/reflection.py exactly. Per sub-bounce the columns
are [u_refl1(or theta), u_refl2, u_roulette] (+ [u_scatter, u_z, u_phi] when
scattering is enabled).

Stats output (8 f32): per-lane sums over sub-bounces of
[collide, wall, exit, traces(alive-at-start), scatter, 0, 0, 0].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BoundaryCondition, ReflectionKind

BIG = 3.4e38
BIGLANE = 1.0e9
TWO_PI = 6.2831853071795864769

# VMEM budget for the resident geometry SoA (bytes). 8 MiB leaves room for
# the flux block, ray tiles and compiler scratch in ~16 MiB of VMEM.
SOA_VMEM_BUDGET = 8 * 1024 * 1024


def _disk_chunk(block, i, pt, ox, oy, oz, dx, dy, dz, stick_ref, per_mat):
    """Analytic ray/disk test for chunk i (ref: GeneralPipelineDisk.cu:33-47).

    ``block``: the chunk's (8, pt) SoA slice (VMEM-resident view or a
    streamed scratch copy). Returns
    (t, denom, dist2, r2, nx, ny, nz, cx, cy, cz, stk).
    """
    cx = block[0:1, :]
    cy = block[1:2, :]
    cz = block[2:3, :]
    nx = block[3:4, :]
    ny = block[4:5, :]
    nz = block[5:6, :]
    r2 = block[6:7, :]
    ndc = block[7:8, :]
    sl = pl.ds(i * pt, pt)

    denom = dx * nx + dy * ny + dz * nz
    ndo = ox * nx + oy * ny + oz * nz
    dsafe = jnp.where(denom == 0.0, 1e-30, denom)
    r0 = pl.reciprocal(dsafe, approx=True)
    r0 = r0 * (2.0 - dsafe * r0)  # one Newton step -> ~f32 exact
    t = (ndc - ndo) * r0
    hx = ox + t * dx - cx
    hy = oy + t * dy - cy
    hz = oz + t * dz - cz
    dist2 = hx * hx + hy * hy + hz * hz
    stk = stick_ref[0, sl][None, :] if per_mat else None
    return t, denom, dist2, r2, nx, ny, nz, cx, cy, cz, stk


def _tri_chunk(block, i, pt, ox, oy, oz, dx, dy, dz, stick_ref, per_mat,
               t_near):
    """Moller-Trumbore for chunk i, double-sided (Embree reports both
    facings; backface kill happens in the bounce logic,
    rayTraceKernel.hpp:243-248). Rows 9-11 carry the STORED unit normals
    (user-provided orientation, rayGeometryTriangle.hpp:57-75).

    ``block``: the chunk's (12, pt) SoA slice. Returns
    (t, valid, nx, ny, nz, stk).
    """
    ax = block[0:1, :]
    ay = block[1:2, :]
    az = block[2:3, :]
    e1x = block[3:4, :]
    e1y = block[4:5, :]
    e1z = block[5:6, :]
    e2x = block[6:7, :]
    e2y = block[7:8, :]
    e2z = block[8:9, :]
    nx = block[9:10, :]
    ny = block[10:11, :]
    nz = block[11:12, :]
    sl = pl.ds(i * pt, pt)

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
    stk = stick_ref[0, sl][None, :] if per_mat else None
    return t, valid, nx, ny, nz, stk


def _line_chunk(block, i, pt, ox, oy, dx, dy, stick_ref, per_mat, t_near):
    """2D ray/segment cross-product test with endpoint eps clip
    (ref: GeneralPipelineLine.cu:19-49). ``block``: (6, pt) rows
    [p0x p0y ldx ldy nx ny]. Returns (t, valid, nx, ny, stk)."""
    p0x = block[0:1, :]
    p0y = block[1:2, :]
    lx = block[2:3, :]
    ly = block[3:4, :]
    nx = block[4:5, :]
    ny = block[5:6, :]
    sl = pl.ds(i * pt, pt)

    denom = dx * ly - dy * lx
    dsafe = jnp.where(denom == 0.0, 1e-30, denom)
    r0 = pl.reciprocal(dsafe, approx=True)
    r0 = r0 * (2.0 - dsafe * r0)
    wx = p0x - ox
    wy = p0y - oy
    t = (wx * ly - wy * lx) * r0
    s = (wx * dy - wy * dx) * r0
    valid = (
        (denom != 0.0)
        & (t > t_near)
        & (s > 1e-5)
        & (s < 1.0 - 1e-5)
    )
    stk = stick_ref[0, sl][None, :] if per_mat else None
    return t, valid, nx, ny, stk


def _one_bounce(
    state, u, get_block, bb_ref, walls_ref, stick_ref, flux_ref,
    *, pt, npad, t_near, dim, first_dir, second_dir, ray_axis, bc1, bc2,
    refl_kind, use_skip, max_bounces_cfg, max_bdry, wthresh, wrenew, roulette,
    per_mat, geo_kind, flux_model, mfp, mxu_pick=True,
    ordered=False, precand=False, order_ref=None, dbound_ref=None, o0=None,
    sub_k=0, sweep_fetch=None, dep_fetch=None, xla_deposit=False, eaux=None,
):
    """One full bounce on column-vector state; returns (state', stats).

    ``get_block(i)`` yields chunk i's (rows, pt) SoA slice — a VMEM view for
    resident geometry, or a DMA-fetched scratch copy for HBM-streamed
    geometry (the >VMEM-budget path, the Embree-scale capability).

    When ``ordered``, pass 1 walks chunks in per-tile distance order
    (``order_ref``/``dbound_ref``, computed on the XLA side from the tile's
    entry origins) with a conservative early break — the TPU analog of
    Embree's front-to-back BVH descent (rayTraceKernel.hpp:163-167): chunk
    j's Euclidean distance lower bound ``dbound[j] - drift`` (drift = max
    live-lane movement since kernel entry, exact for sub-bounces > 0) is
    nondecreasing in j, so once it exceeds every live lane's current search
    bound no remaining chunk can improve any hit. ``sweep_fetch`` /
    ``dep_fetch`` (streamed only) provide (start, wait, block_of) triples
    for double-buffered chunk DMA in the pass-1 sweep and the deposit
    pass."""
    (ox, oy, oz, dx, dy, dz, weight, w0, alive, hfb, n_refl, n_bdry) = state
    rt = ox.shape[0]
    # Mosaic requires integer iota; cast after (f32 holds lanes exactly
    # up to 2^24 — far above the VMEM prim budget)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rt, pt), 1).astype(
        jnp.float32
    )

    inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

    cols = [ox, oy, oz]
    dcols = [dx, dy, dz]
    invs = [inv_x, inv_y, inv_z]
    lo1 = walls_ref[0, 0]
    hi1 = walls_ref[0, 1]
    lo2 = walls_ref[0, 2]
    hi2 = walls_ref[0, 3]
    lor = walls_ref[0, 4]
    hir = walls_ref[0, 5]
    tau = walls_ref[0, 6]
    nbr2 = walls_ref[0, 7]

    def chunk_slab(i):
        """Ray/chunk-AABB slab interval (the skip test)."""
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
        return tlo, thi

    is_disk = geo_kind == "disk"

    # perf-ablation knobs (debug only; read at trace time like the deposit
    # ablation below — run ablations in fresh processes, the jit cache key
    # does not include the env var)
    import os as _os_abl

    _ablate = _os_abl.environ.get("VIENNARAY_TPU_ABLATE", "")

    def hit_test_block(i, block):
        """(tt, nx, ny, nz, cx, cy, cz, stk) with tt = BIG where invalid."""
        if is_disk:
            t, denom, dist2, r2, nx, ny, nz, cx, cy, cz, stk = _disk_chunk(
                block, i, pt, ox, oy, oz, dx, dy, dz, stick_ref,
                per_mat,
            )
            valid = (denom != 0.0) & (t > t_near) & (dist2 < r2)
        elif geo_kind == "line":
            t, valid, nx, ny, stk = _line_chunk(
                block, i, pt, ox, oy, dx, dy, stick_ref, per_mat,
                t_near,
            )
            nz = jnp.zeros_like(nx)
            cx = cy = cz = None
        else:
            t, valid, nx, ny, nz, stk = _tri_chunk(
                block, i, pt, ox, oy, oz, dx, dy, dz, stick_ref,
                per_mat, t_near,
            )
            cx = cy = cz = None
        tt = jnp.where(valid, t, BIG)
        return tt, nx, ny, nz, cx, cy, cz, stk

    # ---- pass 1: nearest hit with unique-lane selection ------------------
    # Tie-break: lowest GLOBAL sorted-lane index (lexicographic on (t, lane)),
    # so the result is independent of chunk visit order. Deterministic;
    # matches the reference's "one hit prim" contract (Embree picks one
    # primID per closest hit).
    # NOTE: selection stays fused into the sweep — a deferred two-pass
    # variant (min-only sweep + 1-2 chunk re-select) measured SLOWER on v5e
    # (112.5k vs 136.5k rays/s on the 18k trench) despite fewer nominal ops.
    # All loop carries are f32 (+ one i32 scalar) — Mosaic cannot legalize
    # loops with i1 vector carries.
    n_chunks = npad // pt

    # Search bound: every primitive lies inside the walls box inflated by the
    # disk radius, so no hit can lie beyond the ray's exit of that box. This
    # caps every lane's pass-1 bound (escaping rays stop waking chunks) and
    # makes the ordered early break effective. Real hits satisfy
    # t <= texit < tmin0 strictly, so the found-hit set is unchanged.
    # ---- wall crossings (finite rectangles) -----------------------------
    if eaux is not None:
        # Entry-state aux precomputed on the XLA side (_entry_bound twin,
        # same arithmetic op-for-op so hit selection is unchanged): skips
        # ~40 column-vector ops per sub-bounce of wall/box-exit math on the
        # poorly-utilized (rt, 1) layout. Valid only for sub_k == 0
        # (precand), where the in-kernel state still IS the entry state.
        tmin0 = eaux[:, 0:1]
        t_w1 = eaux[:, 1:2]
        t_w2 = eaux[:, 2:3]
    else:
        def wall_t(axis, lo, hi, other_axis, other_lo, other_hi):
            dax = dcols[axis]
            oax = cols[axis]
            t = jnp.where(
                dax > 0.0,
                (hi - oax) * invs[axis],
                jnp.where(dax < 0.0, (lo - oax) * invs[axis], BIG),
            )
            t = jnp.where(t > t_near, t, BIG)
            hp_r = cols[ray_axis] + dcols[ray_axis] * t
            ok = (hp_r >= lor) & (hp_r <= hir)
            if dim == 3:
                hp_o = cols[other_axis] + dcols[other_axis] * t
                ok &= (hp_o >= other_lo) & (hp_o <= other_hi)
            return jnp.where(ok, t, BIG)

        t_w1 = wall_t(first_dir, lo1, hi1, second_dir, lo2, hi2)
        if dim == 3:
            t_w2 = wall_t(second_dir, lo2, hi2, first_dir, lo1, hi1)
        else:
            t_w2 = jnp.full((rt, 1), BIG, jnp.float32)

        r_inf = walls_ref[0, 8] + t_near
        lows = {first_dir: lo1, second_dir: lo2, ray_axis: lor}
        highs = {first_dir: hi1, second_dir: hi2, ray_axis: hir}
        texit = None
        for ax in range(3):
            e = jnp.maximum(
                (highs[ax] + r_inf - cols[ax]) * invs[ax],
                (lows[ax] - r_inf - cols[ax]) * invs[ax],
            )
            texit = e if texit is None else jnp.minimum(texit, e)
        # ...and by the wall-crossing time: a geometry hit beyond the
        # nearest wall event never wins (t_geo <= t_ev decides; ties go to
        # geometry, so the bound sits a hair ABOVE the wall t). Sideways
        # lanes then stop waking chunks across the domain, which is what
        # lets the ordered early break fire on direction-decoherent tiles.
        tmin0 = (
            jnp.minimum(jnp.maximum(texit, 0.0), jnp.minimum(t_w1, t_w2))
            * (1.0 + 1e-4)
            + t_near
        )

    def pick(sel, x):
        return jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)

    def full(i, block, carry):
        tmin, hlane, nbx, nby, nbz, hcx, hcy, hcz, stk_c = carry
        tt, nx, ny, nz, cx, cy, cz, stk = hit_test_block(i, block)
        cmin = jnp.min(tt, axis=1, keepdims=True)
        eq = tt == cmin
        lmin = jnp.min(
            jnp.where(eq, lane_iota, BIGLANE), axis=1, keepdims=True
        )
        sel = eq & (lane_iota == lmin)
        glane = lmin + (i * pt).astype(jnp.float32)
        take = (cmin < tmin) | ((cmin == tmin) & (glane < hlane))
        upd = lambda new, old: jnp.where(take, new, old)
        if mxu_pick:
            # ONE one-hot MXU contraction selects every per-prim field of
            # the winning lane at once, replacing 2 full-width VPU ops per
            # field (where + lane reduction). Each sel row has exactly one
            # nonzero (the lexicographic (t, lane) winner), so the
            # contraction's sum reconstructs the f32 value — validated
            # BITWISE in interpret mode (tests/test_round3_features.py,
            # plain f32 dot there) and ARGUED exact on the real MXU: the
            # Precision.HIGHEST bf16x6 decomposition of x against a 1.0
            # one-hot yields disjoint-mantissa pieces whose f32 accumulation
            # is rounding-free, unless a low-order split piece flushes as a
            # bf16 subnormal. Run a hardware bitwise check before ever
            # flipping the default ON.
            selm = jnp.where(sel, 1.0, 0.0)
            picks = jax.lax.dot_general(
                selm, block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (rt, rows): the block's SoA rows, hit-lane selected
            if is_disk:
                p_nx, p_ny, p_nz = (
                    picks[:, 3:4], picks[:, 4:5], picks[:, 5:6]
                )
                if xla_deposit:
                    p_cx = p_cy = p_cz = None  # dead (see VPU branch note)
                else:
                    p_cx, p_cy, p_cz = (
                        picks[:, 0:1], picks[:, 1:2], picks[:, 2:3]
                    )
            elif geo_kind == "line":
                p_nx, p_ny = picks[:, 4:5], picks[:, 5:6]
                p_nz = jnp.zeros((rt, 1), jnp.float32)
                p_cx = p_cy = p_cz = None
            else:  # triangle: stored unit normals in rows 9-11
                p_nx, p_ny, p_nz = (
                    picks[:, 9:10], picks[:, 10:11], picks[:, 11:12]
                )
                p_cx = p_cy = p_cz = None
        else:
            p_nx, p_ny, p_nz = pick(sel, nx), pick(sel, ny), pick(sel, nz)
            if is_disk and not xla_deposit:
                p_cx, p_cy, p_cz = pick(sel, cx), pick(sel, cy), pick(sel, cz)
            else:
                # hit centers feed ONLY the in-kernel neighbor-deposit ball
                # test; under xla_deposit they are dead — skip the 6
                # full-width pick ops per chunk visit (flux unchanged: the
                # XLA deposit re-derives the center from the hit prim id)
                p_cx = p_cy = p_cz = None
        out = (
            upd(cmin, tmin),
            upd(glane, hlane),
            upd(p_nx, nbx),
            upd(p_ny, nby),
            upd(p_nz, nbz),
        )
        if is_disk and p_cx is not None:
            out += (
                upd(p_cx, hcx),
                upd(p_cy, hcy),
                upd(p_cz, hcz),
            )
        else:
            out += (hcx, hcy, hcz)
        if per_mat:
            out += (upd(pick(sel, stk), stk_c),)
        else:
            out += (stk_c,)
        return out

    zeros = jnp.zeros((rt, 1), jnp.float32)
    init = (
        tmin0,  # search bound; shrinks to the nearest hit
        jnp.full((rt, 1), BIGLANE, jnp.float32),  # hit lane (sorted, global)
        zeros, zeros, zeros,  # normal
        zeros, zeros, zeros,  # center (disk only)
        zeros,  # sticking (per_mat only)
    )

    if "sweep" in _ablate:
        # perf-ablation only: skip pass 1 entirely (no hits -> no deposits);
        # what remains is the bounce logic + per-tile fixed costs
        n_swept = jnp.float32(0.0)
        (t_geo, h_lane, nhx, nhy, nhz, hcx, hcy, hcz, stk_hit) = init
    elif precand:
        # Precomputed-candidate sweep (the XLA side already ran this tile's
        # per-ray slab wake test against the ENTRY state — valid because
        # sub_k == 0 — and encoded the result in order/dbound: candidates
        # sorted by distance, non-candidates pushed to dbound = BIG). The
        # loop body is UNCONDITIONAL: no per-chunk wake test, no lax.cond —
        # the break IS the loop condition. Visiting a chunk the dynamic
        # shrinking-tmin test would have skipped never changes the result
        # (hit selection is lexicographic on (t, global lane)), so flux is
        # bitwise identical to the in-kernel-wake path.
        assert sub_k == 0, "precand sweep requires entry-state wake tests"
        any_alive = jnp.any(alive)

        def p_cond(c):
            j, tmax_live = c[0], c[1]
            jc = jnp.minimum(j, jnp.int32(n_chunks - 1))
            return (j < n_chunks) & (dbound_ref[0, 0, jc] <= tmax_live)

        def p_body(c):
            j, tmax_live, nt = c[0], c[1], c[2]
            carry = c[3:]
            idx = order_ref[0, 0, j]
            if sweep_fetch is not None:
                start, wait, block_of, depth = sweep_fetch

                @pl.when(j + depth - 1 < n_chunks)
                def _():
                    # blind prefetch keeping depth-1 DMAs in flight;
                    # drained post-loop
                    start(j + depth - 1)

                wait(j)
                blk_fn = lambda: block_of(j)
            else:
                blk_fn = lambda: get_block(idx)
            carry = full(idx, blk_fn(), carry)
            tmax2 = jnp.max(jnp.where(alive, carry[0], 0.0))
            return (j + 1, tmax2, nt + 1.0) + carry

        j0 = jnp.where(any_alive, jnp.int32(0), jnp.int32(n_chunks))
        tmax0 = jnp.max(jnp.where(alive, tmin0, 0.0))
        if sweep_fetch is not None:
            depth_s = sweep_fetch[3]

            @pl.when(any_alive & (dbound_ref[0, 0, 0] <= tmax0))
            def _():
                # warm-up: fill the ring with the first depth-1 chunks
                for jj in range(min(depth_s - 1, n_chunks)):
                    sweep_fetch[0](jnp.int32(jj))
        out = jax.lax.while_loop(
            p_cond, p_body, (j0, tmax0, jnp.float32(0.0)) + init
        )
        if sweep_fetch is not None:
            # the loop body blind-prefetches up to depth-1 chunks ahead; on
            # early break (or a 0-iteration loop after the warm-up) those
            # DMAs are still in flight — drain them so the scratch slots
            # are quiescent before the next use
            jf = out[0]
            ran_any = any_alive & (dbound_ref[0, 0, 0] <= tmax0)
            for k in range(depth_s - 1):
                @pl.when(ran_any & (jf + k < n_chunks))
                def _(k=k):
                    sweep_fetch[1](jf + k)
        n_swept = out[2]
        (t_geo, h_lane, nhx, nhy, nhz, hcx, hcy, hcz, stk_hit) = out[3:]
    elif ordered:
        any_alive = jnp.any(alive)
        if sub_k == 0:
            drift = jnp.float32(0.0)
        else:
            # max live-lane displacement since kernel entry: restores the
            # validity of the entry-time distance bounds for later
            # sub-bounces (dist_now >= dbound[j] - drift for ALL remaining
            # chunks since dbound is sorted ascending)
            o0x, o0y, o0z = o0
            dsp = jnp.sqrt(
                (ox - o0x) ** 2 + (oy - o0y) ** 2 + (oz - o0z) ** 2
            )
            drift = jnp.max(jnp.where(alive, dsp, 0.0))

        def s_cond(c):
            return c[0] < n_chunks

        def s_body(c):
            j, tmax_live, nt = c[0], c[1], c[2]
            carry = c[3:]
            tmin = carry[0]
            idx = order_ref[0, 0, j]
            brk = dbound_ref[0, 0, j] - drift > tmax_live
            if sweep_fetch is not None:
                start, wait, block_of, depth = sweep_fetch

                @pl.when((~brk) & (j + depth - 1 < n_chunks))
                def _():
                    start(j + depth - 1)  # prefetch depth-1 chunks ahead

                wait(j)  # drain the in-flight DMA even on break
                if depth > 2:
                    # on break the ring still holds the deeper prefetches
                    # (j+1 .. j+depth-2) — drain them before exiting
                    @pl.when(brk)
                    def _():
                        for k in range(1, depth - 1):
                            @pl.when(j + k < n_chunks)
                            def _(k=k):
                                wait(j + k)
            tlo, thi = chunk_slab(idx)
            need = (
                jnp.any((thi >= tlo) & (thi > 0.0) & (tlo < tmin) & alive)
                & (~brk)
            )
            if sweep_fetch is not None:
                blk_fn = lambda: block_of(j)
            else:
                blk_fn = lambda: get_block(idx)
            carry = jax.lax.cond(
                need, lambda cc: full(idx, blk_fn(), cc), lambda cc: cc,
                carry,
            )
            # the break bound only tightens when a chunk was tested
            tmax2 = jnp.where(
                need, jnp.max(jnp.where(alive, carry[0], 0.0)), tmax_live
            )
            j2 = jnp.where(brk, jnp.int32(n_chunks), j + 1)
            return (j2, tmax2, nt + jnp.where(need, 1.0, 0.0)) + carry

        j0 = jnp.where(any_alive, jnp.int32(0), jnp.int32(n_chunks))
        tmax0 = jnp.max(jnp.where(alive, tmin0, 0.0))
        if sweep_fetch is not None:
            @pl.when(any_alive)
            def _():
                # warm-up: fill the ring with the first depth-1 chunks.
                # NOTE: the first body iteration waits chunk 0 before its
                # own break test, so even a break-at-0 drains slot 0; the
                # deeper slots are drained by the in-body break drain.
                for jj in range(min(sweep_fetch[3] - 1, n_chunks)):
                    sweep_fetch[0](jnp.int32(jj))
        out = jax.lax.while_loop(
            s_cond, s_body, (j0, tmax0, jnp.float32(0.0)) + init
        )
        n_swept = out[2]
        (t_geo, h_lane, nhx, nhy, nhz, hcx, hcy, hcz, stk_hit) = out[3:]
    else:

        def body(i, c):
            nt = c[0]
            carry = c[1:]
            tmin = carry[0]
            tlo, thi = chunk_slab(i)
            need = jnp.any(
                (thi >= tlo) & (thi > 0.0) & (tlo < tmin) & alive
            )

            def run(cc):
                return full(i, get_block(i), cc)

            if use_skip:
                carry = jax.lax.cond(need, run, lambda c: c, carry)
                return (nt + jnp.where(need, 1.0, 0.0),) + carry
            return (nt + 1.0,) + run(carry)

        out = jax.lax.fori_loop(
            0, n_chunks, body, (jnp.float32(0.0),) + init
        )
        n_swept = out[0]
        (t_geo, h_lane, nhx, nhy, nhz, hcx, hcy, hcz, stk_hit) = out[1:]
    hit_geo = h_lane < BIGLANE

    t_geo_m = jnp.where(hit_geo, t_geo, BIG)
    t_ev = jnp.minimum(jnp.minimum(t_geo_m, t_w1), t_w2)
    is_geo = t_geo_m <= t_ev
    is_w1 = (~is_geo) & (t_w1 <= t_ev)
    is_w2 = (~is_geo) & (~is_w1) & (t_w2 <= t_ev)
    is_exit = alive & (t_ev >= BIG)

    # ---- gas-phase scattering (ref: rayTraceKernel.hpp:179-203) ---------
    if mfp > 0.0:
        u_scat, u_z, u_phi = u[3], u[4], u[5]
        p_scat = 1.0 - jnp.exp(-t_ev * (1.0 / mfp))
        scat = alive & (~is_exit) & (u_scat < p_scat)
        # scatter point = org + dir * u with u the probability draw — the
        # reference's exact arithmetic (rayTraceKernel.hpp:190-193)
        scx = ox + dx * u_scat
        scy = oy + dy * u_scat
        scz = oz + dz * u_scat
        z = 1.0 - 2.0 * u_z
        phi_s = TWO_PI * u_phi
        rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        sdx = rxy * jnp.cos(phi_s)
        sdy = rxy * jnp.sin(phi_s)
        sdz = z
        if dim == 2:
            nrm = jnp.sqrt(sdx * sdx + sdy * sdy)
            inv_n = 1.0 / jnp.maximum(nrm, 1e-12)
            sdx, sdy, sdz = sdx * inv_n, sdy * inv_n, jnp.zeros_like(sdz)
    else:
        scat = jnp.zeros((rt, 1), bool)

    is_w1 = alive & (~scat) & is_w1 & (~is_exit)
    is_w2 = alive & (~scat) & is_w2 & (~is_exit)
    is_wall = is_w1 | is_w2
    is_geo_ev = alive & (~scat) & is_geo & (~is_exit)

    hpx = ox + dx * t_ev
    hpy = oy + dy * t_ev
    hpz = oz + dz * t_ev

    # ---- boundary processing -------------------------------------------
    n_bdry_new = n_bdry + jnp.where(is_wall, 1.0, 0.0)
    bdry_over = is_wall & (n_bdry_new > max_bdry)
    live_w1 = is_w1 & (~bdry_over)
    live_w2 = is_w2 & (~bdry_over)

    new_cols = [hpx, hpy, hpz]
    new_d = [dx, dy, dz]
    dead = jnp.zeros((rt, 1), bool)

    def apply_wall(mask, axis, lo, hi, bc, new_cols, new_d, dead):
        if bc == BoundaryCondition.REFLECTIVE:
            new_d = list(new_d)
            new_d[axis] = jnp.where(mask, -new_d[axis], new_d[axis])
        elif bc == BoundaryCondition.PERIODIC:
            new_cols = list(new_cols)
            tele = jnp.where(dcols[axis] > 0.0, lo, hi)
            new_cols[axis] = jnp.where(mask, tele, new_cols[axis])
        else:
            dead = dead | mask
        return new_cols, new_d, dead

    new_cols, new_d, dead = apply_wall(
        live_w1, first_dir, lo1, hi1, bc1, new_cols, new_d, dead
    )
    if dim == 3:
        new_cols, new_d, dead = apply_wall(
            live_w2, second_dir, lo2, hi2, bc2, new_cols, new_d, dead
        )

    # ---- surface interaction -------------------------------------------
    backface = (dx * nhx + dy * nhy + dz * nhz) > 0.0
    if is_disk:
        # disk backface: first hit passes through, second kills
        # (rayTraceKernel.hpp:225-241)
        bf_kill = is_geo_ev & backface & hfb
        bf_pass = is_geo_ev & backface & (~hfb)
    else:
        # triangle backface kills (rayTraceKernel.hpp:243-248)
        bf_kill = is_geo_ev & backface
        bf_pass = jnp.zeros((rt, 1), bool)
    collide = is_geo_ev & (~backface)

    # ---- pass 2: flux deposits ------------------------------------------
    import os as _os_abl

    _ablate = _os_abl.environ.get("VIENNARAY_TPU_ABLATE", "")
    wdep = jnp.where(collide, weight, 0.0)  # pre-sticking weight
    h_lane_m = jnp.where(collide, h_lane, -1.0)

    # loop iterations cost ~1.4us each in Mosaic (measured: fori overhead
    # dominates small-array bodies), so skip the whole deposit sweep on
    # collision-free iterations (wall ping-pong / escape-only rounds)
    any_collide = jnp.any(collide)

    def run_deposit(dep_chunk, dep_bound):
        """Run ``dep_chunk(idx, blk_fn) -> woke`` over every chunk that can
        receive a deposit; returns the number of chunks whose wake test
        fired. Ordered mode walks the pass-1 distance order and breaks
        once ``dbound[j] > dep_bound`` — chunks at least that far from
        every entry origin are unreachable by this bounce's deposits (each
        chunk's flux row is accumulated independently, so visit order never
        changes the result bitwise). Unordered mode is the full Morton
        sweep. On the streamed ordered path chunk DMA is double-buffered
        (``dep_fetch``): chunk order[j+1]'s fetch runs behind chunk
        order[j]'s wake test + deposit. NOTE (streamed): the prefetch
        cannot see the wake test, so every ordered chunk up to the break is
        DMA'd even when few deposit — which is why the per-bounce
        (n_sub == 1) default moves deposits to the XLA side entirely
        (xla_deposit: no deposit pass, no deposit DMA); this in-kernel
        pass remains for the n_sub > 1 tail stages and the window
        model — extra HBM traffic on sparse-deposit
        tiles, hidden only while compute covers it."""
        if ordered:

            def db_cond(c):
                return c[0] < n_chunks

            def db_body(c):
                j, nd = c
                idx = order_ref[0, 0, j]
                brk = dbound_ref[0, 0, j] > dep_bound
                if dep_fetch is not None:
                    start, wait, block_of = dep_fetch

                    @pl.when((~brk) & (j + 1 < n_chunks))
                    def _():
                        start(j + 1)  # prefetch the next chunk in order

                    wait(j)  # drain the in-flight DMA even on break
                    blk_fn = lambda: block_of(j)
                else:
                    blk_fn = lambda: get_block(idx)

                nd = jax.lax.cond(
                    brk, lambda: nd, lambda: nd + dep_chunk(idx, blk_fn)
                )
                return (jnp.where(brk, jnp.int32(n_chunks), j + 1), nd)

            if dep_fetch is not None:
                @pl.when(any_collide)
                def _():
                    dep_fetch[0](0)  # warm-up: fetch order[0] into slot 0

            jd0 = jnp.where(any_collide, jnp.int32(0), jnp.int32(n_chunks))
            out = jax.lax.while_loop(
                db_cond, db_body, (jd0, jnp.float32(0.0))
            )
            return out[1]
        else:

            def fb(i, nd):
                return nd + dep_chunk(i, lambda: get_block(i))

            return jax.lax.cond(
                any_collide,
                lambda: jax.lax.fori_loop(
                    0, n_chunks, fb, jnp.float32(0.0)
                ),
                lambda: jnp.float32(0.0),
            )

    if xla_deposit or "deposit" in _ablate:
        # xla_deposit: the deposit pass moves OUT of the kernel — the kernel
        # returns each lane's (hit lane, pre-sticking weight) and the XLA
        # side lands the neighbor/single-hit deposits via the precomputed
        # neighbor lists + a histogram (see trace/kernel.py). flux_ref stays
        # zero. ("deposit" ablation: debug-only, flux intentionally dropped.)
        n_dep = jnp.float32(0.0)
    elif is_disk and flux_model == "neighbor":
        # CPU neighbor-list contract; hit centers masked to far away for
        # non-colliding rays so their sphere test never wakes a chunk
        qx = jnp.where(collide, hcx, BIG)
        qy = jnp.where(collide, hcy, BIG)
        qz = jnp.where(collide, hcz, BIG)

        def dep_chunk(i, blk_fn):
            # chunk wake-up: does the 2r ball around any hit center touch
            # this chunk's (radius-inflated) AABB?
            ddx = jnp.maximum(
                jnp.maximum(bb_ref[i, 0] - qx, qx - bb_ref[i, 3]), 0.0
            )
            ddy = jnp.maximum(
                jnp.maximum(bb_ref[i, 1] - qy, qy - bb_ref[i, 4]), 0.0
            )
            ddz = jnp.maximum(
                jnp.maximum(bb_ref[i, 2] - qz, qz - bb_ref[i, 5]), 0.0
            )
            need = jnp.any(ddx * ddx + ddy * ddy + ddz * ddz <= nbr2)

            @pl.when(need)
            def _():
                t, denom, dist2, r2, _, _, _, cx, cy, cz, _ = _disk_chunk(
                    blk_fn(), i, pt, ox, oy, oz, dx, dy, dz, stick_ref,
                    False,
                )
                cdx = cx - qx
                cdy = cy - qy
                cdz = cz - qz
                cd2 = cdx * cdx + cdy * cdy + cdz * cdz
                # checkLocalIntersection: front-face (dot <= -eps), plane
                # t > 0 (strict 0, not t_near), in-plane distance < radius
                nb_ok = (
                    (denom <= -1e-6)
                    & (t > 0.0)
                    & (dist2 < r2)
                    & (cd2 <= nbr2)
                )
                depm = nb_ok | (lane_iota + i * pt == h_lane_m)
                dep = jnp.sum(depm.astype(jnp.float32) * wdep, axis=0)
                flux_ref[pl.ds(i, 1), :] += dep[None, :]

            return jnp.where(need, 1.0, 0.0)

        if ordered:
            # deposits reach at most nbr past the hit centers; each center
            # sits within ||q - o0|| of its lane's ENTRY origin, which the
            # dbound distances are measured against
            o0x, o0y, o0z = o0
            qdisp = jnp.sqrt(
                (qx - o0x) ** 2 + (qy - o0y) ** 2 + (qz - o0z) ** 2
            )
            dep_bound = jnp.max(
                jnp.where(collide, qdisp, 0.0)
            ) + jnp.sqrt(nbr2)
        else:
            dep_bound = None
        n_dep = run_deposit(dep_chunk, dep_bound)
    elif is_disk:  # "window" (GPU candidate-window semantics)
        tlim = jnp.where(collide, t_geo + tau, -BIG)

        def dep_chunk(i, blk_fn):
            tlo, thi = chunk_slab(i)
            need = jnp.any((thi >= tlo) & (thi > 0.0) & (tlo <= tlim))

            @pl.when(need)
            def _():
                tt, *_ = hit_test_block(i, blk_fn())
                # inclusive: the primary hit (t == t_geo) always deposits,
                # even with a zero window
                depm = tt <= tlim
                dep = jnp.sum(depm.astype(jnp.float32) * wdep, axis=0)
                flux_ref[pl.ds(i, 1), :] += dep[None, :]

            return jnp.where(need, 1.0, 0.0)

        if ordered:
            # window deposits lie within tlim of the CURRENT origin, which
            # has drifted at most ``drift`` from the entry origin
            dep_bound = jnp.max(jnp.where(collide, tlim, 0.0)) + drift
        else:
            dep_bound = None
        n_dep = run_deposit(dep_chunk, dep_bound)
    else:  # triangle: single closest hit (rayTraceKernel.hpp:301-307)

        def dep_body(i, nd):
            lo = i * pt
            need = jnp.any((h_lane_m >= lo) & (h_lane_m < lo + pt))

            @pl.when(need)
            def _():
                depm = lane_iota + lo == h_lane_m
                dep = jnp.sum(depm.astype(jnp.float32) * wdep, axis=0)
                flux_ref[pl.ds(i, 1), :] += dep[None, :]

            return nd + jnp.where(need, 1.0, 0.0)

        # deposits land only on hit lanes: the loop need only span the
        # chunk-index range of this tile's hits (usually 1-3 chunks)
        hl = jnp.where(collide, h_lane, BIGLANE)
        c_lo = (jnp.min(hl) / pt).astype(jnp.int32)
        hl2 = jnp.where(collide, h_lane, -1.0)
        c_hi = (jnp.max(hl2) / pt).astype(jnp.int32) + 1

        n_dep = jax.lax.cond(
            any_collide,
            lambda: jax.lax.fori_loop(
                jnp.minimum(c_lo, npad // pt),
                jnp.minimum(c_hi, npad // pt),
                dep_body, jnp.float32(0.0),
            ),
            lambda: jnp.float32(0.0),
        )

    # ---- reflection direction (uniforms mirror physics/reflection.py) ----
    u1, u2, u3 = u[0], u[1], u[2]
    if refl_kind == ReflectionKind.DIFFUSE:
        z = 1.0 - 2.0 * u1
        phi = TWO_PI * u2
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        sx = r * jnp.cos(phi) + nhx
        sy = r * jnp.sin(phi) + nhy
        sz = (z + nhz) if dim == 3 else jnp.zeros((rt, 1), jnp.float32)
        norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        inv_n = 1.0 / jnp.maximum(norm, 1e-12)
        rdx, rdy, rdz = sx * inv_n, sy * inv_n, sz * inv_n
    elif refl_kind == ReflectionKind.SPECULAR:
        # d' = 2 (n . -d) n + d
        dp = -(dx * nhx + dy * nhy + dz * nhz)
        rdx = 2.0 * dp * nhx + dx
        rdy = 2.0 * dp * nhy + dy
        rdz = 2.0 * dp * nhz + dz
        if dim == 2:
            rdz = jnp.zeros((rt, 1), jnp.float32)
            nrm2 = jnp.sqrt(rdx * rdx + rdy * rdy)
            inv_n = 1.0 / jnp.maximum(nrm2, 1e-12)
            rdx, rdy = rdx * inv_n, rdy * inv_n
    else:  # CONED_COSINE (ref: rayReflection.hpp:54-122); u1 = theta
        theta = u1
        # specular direction w, normalized
        dp = -(dx * nhx + dy * nhy + dz * nhz)
        wx = 2.0 * dp * nhx + dx
        wy = 2.0 * dp * nhy + dy
        wz = 2.0 * dp * nhz + dz
        wn = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        inv_wn = 1.0 / jnp.maximum(wn, 1e-12)
        wx, wy, wz = wx * inv_wn, wy * inv_wn, wz * inv_wn
        # Frisvad ONB (matches ops/vec.frisvad_basis)
        degen = wz < -0.999999
        a = 1.0 / jnp.where(degen, 1.0, 1.0 + wz)
        fbx = -wx * wy * a
        tx = jnp.where(degen, 0.0, 1.0 - wx * wx * a)
        ty = jnp.where(degen, -1.0, fbx)
        tz = jnp.where(degen, 0.0, -wx)
        bx = jnp.where(degen, -1.0, fbx)
        by = jnp.where(degen, 0.0, 1.0 - wy * wy * a)
        bz = jnp.where(degen, 0.0, -wy)
        sin_t = jnp.sin(theta)
        cos_t = jnp.cos(theta)
        phi = TWO_PI * u2
        sin_p = jnp.sin(phi)
        cos_p = jnp.cos(phi)
        rdx = sin_t * (cos_p * tx + sin_p * bx) + cos_t * wx
        rdy = sin_t * (cos_p * ty + sin_p * by) + cos_t * wy
        rdz = sin_t * (cos_p * tz + sin_p * bz) + cos_t * wz
        # hemisphere fix-up (rayReflection.hpp:108-111)
        dpn = rdx * nhx + rdy * nhy + rdz * nhz
        flip = dpn <= 0.0
        rdx = jnp.where(flip, rdx - 2.0 * dpn * nhx, rdx)
        rdy = jnp.where(flip, rdy - 2.0 * dpn * nhy, rdy)
        rdz = jnp.where(flip, rdz - 2.0 * dpn * nhz, rdz)
        if dim == 2:
            rdz = jnp.zeros((rt, 1), jnp.float32)
        nrm = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        inv_n = 1.0 / jnp.maximum(nrm, 1e-12)
        rdx, rdy, rdz = rdx * inv_n, rdy * inv_n, rdz * inv_n

    sticking = stk_hit if per_mat else stick_ref[0, 0]
    new_weight = weight - weight * sticking
    died_absorb = collide & (new_weight <= 0.0)
    n_refl_new = n_refl + jnp.where(collide, 1.0, 0.0)
    died_max_refl = collide & (n_refl_new > max_bounces_cfg)

    if roulette:
        low = wthresh * w0
        renew = wrenew * w0
        needs = collide & (new_weight < low)
        kill_p = 1.0 - new_weight / jnp.maximum(renew, 1e-30)
        died_roul = needs & (u3 < kill_p)
        renewed = needs & (~died_roul)
        new_weight = jnp.where(renewed, renew, new_weight)
    else:
        died_roul = jnp.zeros((rt, 1), bool)

    survived = collide & (~died_absorb) & (~died_max_refl) & (~died_roul)

    # ---- state update ---------------------------------------------------
    geo_move = bf_pass | survived
    fx = jnp.where(geo_move, hpx, new_cols[0])
    fy = jnp.where(geo_move, hpy, new_cols[1])
    fz = jnp.where(geo_move, hpz, new_cols[2])
    gdx = jnp.where(survived, rdx, new_d[0])
    gdy = jnp.where(survived, rdy, new_d[1])
    gdz = jnp.where(survived, rdz, new_d[2])
    if mfp > 0.0:
        fx = jnp.where(scat, scx, fx)
        fy = jnp.where(scat, scy, fy)
        fz = jnp.where(scat, scz, fz)
        gdx = jnp.where(scat, sdx, gdx)
        gdy = jnp.where(scat, sdy, gdy)
        gdz = jnp.where(scat, sdz, gdz)

    weight_out = jnp.where(collide, new_weight, weight)
    hfb_out = hfb | bf_pass
    dead = (
        dead | is_exit | bdry_over | bf_kill | died_absorb | died_max_refl
        | died_roul
    )
    alive_out = alive & (~dead)

    # Traversal diagnostics (slots 5/6): chunks whose pass-1 sweep wake test
    # fired / whose deposit wake test fired, per tile-sub-bounce — the
    # quantities the hierarchy/early-break machinery exists to minimize.
    # Broadcast scaled by 1/rt so the XLA-side per-lane sum recovers the
    # count exactly (rt is a power of two; counts < 2^24).
    inv_rt = 1.0 / rt
    stats = (
        jnp.where(collide, 1.0, 0.0),
        jnp.where(is_wall, 1.0, 0.0),
        jnp.where(is_exit, 1.0, 0.0),
        jnp.where(alive, 1.0, 0.0),
        jnp.where(scat, 1.0, 0.0),
        jnp.full((rt, 1), n_swept * inv_rt),
        jnp.full((rt, 1), n_dep * inv_rt),
        # slot 7: tile-sub-bounce count (1 per tile per sub-bounce after the
        # XLA-side lane sum) — the denominator for per-tile-bounce
        # attribution of the sweep/deposit wake counters
        jnp.full((rt, 1), inv_rt),
    )
    new_state = (
        fx, fy, fz, gdx, gdy, gdz, weight_out, w0, alive_out, hfb_out,
        n_refl_new, n_bdry_new,
    )
    return new_state, stats, h_lane_m, wdep


def _bounce_kernel(
    org_ref, dir_ref, w_ref, w0_ref, flags_ref, uni_ref, prims_ref, bb_ref,
    walls_ref, stick_ref,
    *rest, n_sub, n_uni, pt, stream=False, ordered=False, entry_aux=False,
    xla_deposit=False, stream_buf=2, **kw,
):
    # pallas_call passes inputs, then outputs, then scratch positionally;
    # order/dbound are two extra inputs present only on the ordered path,
    # and the entry-state aux ([tmin0, t_w1, t_w2]) one more under entry_aux
    if ordered:
        order_ref, dbound_ref = rest[0], rest[1]
        rest = rest[2:]
    else:
        order_ref = dbound_ref = None
    if entry_aux:
        eaux_ref = rest[0]
        rest = rest[1:]
    else:
        eaux_ref = None
    (org_out, dir_out, w_out, flags_out, stats_out, flux_out) = rest[:6]
    rest = rest[6:]
    if xla_deposit:
        hit_out, wdep_out = rest[0], rest[1]
        rest = rest[2:]
    scratch = rest
    o = org_ref[:]  # (RT, 3)
    d = dir_ref[:]
    rt = o.shape[0]

    sweep_fetch = dep_fetch = None
    if stream:
        # HBM-resident geometry: fetch chunks into VMEM scratch on demand.
        # The chunk loops only touch geometry when the slab/sphere wake-up
        # test passes, so coherent ray tiles DMA only the few chunks around
        # their hits — the streaming analog of BVH descent.
        if ordered:
            # double-buffered sweep AND deposit: chunk order[j+1]'s DMA runs
            # behind chunk order[j]'s test in both passes (no deposit slots
            # under xla_deposit — the deposit pass runs on the XLA side)
            if xla_deposit:
                sweep_scratch, sweep_sems = scratch
            else:
                sweep_scratch, sweep_sems, dep_scratch, dep_sems = scratch

            def _sweep_dma(j):
                idx = order_ref[0, 0, j]
                return pltpu.make_async_copy(
                    prims_ref.at[:, pl.ds(idx * pt, pt)],
                    sweep_scratch.at[j % stream_buf],
                    sweep_sems.at[j % stream_buf],
                )

            sweep_fetch = (
                lambda j: _sweep_dma(j).start(),
                lambda j: _sweep_dma(j).wait(),
                lambda j: sweep_scratch[j % stream_buf],
                stream_buf,
            )

            if not xla_deposit:
                def _dep_dma(j):
                    idx = order_ref[0, 0, j]
                    return pltpu.make_async_copy(
                        prims_ref.at[:, pl.ds(idx * pt, pt)],
                        dep_scratch.at[j % 2],
                        dep_sems.at[j % 2],
                    )

                dep_fetch = (
                    lambda j: _dep_dma(j).start(),
                    lambda j: _dep_dma(j).wait(),
                    lambda j: dep_scratch[j % 2],
                )

            def get_block(i):
                # Unreachable by construction: pass 1 rides sweep_fetch and
                # deposits ride dep_fetch on the ordered-streamed path. A
                # blocking fetch here would race the double-buffered
                # dep_scratch slots, so fail the trace instead.
                raise AssertionError(
                    "ordered-streamed get_block must not be called"
                )

        else:
            dep_scratch, dep_sem = scratch

            def get_block(i):
                dma = pltpu.make_async_copy(
                    prims_ref.at[:, pl.ds(i * pt, pt)], dep_scratch, dep_sem
                )
                dma.start()
                dma.wait()
                return dep_scratch[:]

    else:

        def get_block(i):
            return prims_ref[:, pl.ds(i * pt, pt)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        flux_out[:] = jnp.zeros_like(flux_out)

    state = (
        o[:, 0:1], o[:, 1:2], o[:, 2:3],
        d[:, 0:1], d[:, 1:2], d[:, 2:3],
        w_ref[:, 0:1], w0_ref[:, 0:1],
        flags_ref[:, 0:1] > 0.5,  # alive
        flags_ref[:, 1:2] > 0.5,  # hfb
        flags_ref[:, 2:3],  # n_refl
        flags_ref[:, 3:4],  # n_bdry
    )
    o0 = (o[:, 0:1], o[:, 1:2], o[:, 2:3])
    st = [jnp.zeros((rt, 1), jnp.float32) for _ in range(8)]
    for k in range(n_sub):
        u = tuple(
            uni_ref[:, n_uni * k + j : n_uni * k + j + 1]
            for j in range(n_uni)
        )
        state, stats, h_lane_m, wdep = _one_bounce(
            state, u, get_block, bb_ref, walls_ref, stick_ref,
            flux_out, pt=pt, ordered=ordered, order_ref=order_ref,
            dbound_ref=dbound_ref, o0=o0, sub_k=k, sweep_fetch=sweep_fetch,
            dep_fetch=dep_fetch, xla_deposit=xla_deposit,
            eaux=eaux_ref[:] if eaux_ref is not None else None,
            **kw
        )
        st = [a + b for a, b in zip(st, stats)]
    if xla_deposit:
        hit_out[:, 0:1] = h_lane_m
        wdep_out[:, 0:1] = wdep

    (fx, fy, fz, gdx, gdy, gdz, weight_out, _, alive_out, hfb_out,
     n_refl_new, n_bdry_new) = state
    org_out[:, 0:1] = fx
    org_out[:, 1:2] = fy
    org_out[:, 2:3] = fz
    dir_out[:, 0:1] = gdx
    dir_out[:, 1:2] = gdy
    dir_out[:, 2:3] = gdz
    w_out[:, 0:1] = weight_out
    flags_out[:, 0:1] = jnp.where(alive_out, 1.0, 0.0)
    flags_out[:, 1:2] = jnp.where(hfb_out, 1.0, 0.0)
    flags_out[:, 2:3] = n_refl_new
    flags_out[:, 3:4] = n_bdry_new
    for j in range(8):
        stats_out[:, j : j + 1] = st[j]


def _entry_bound(org, dirn, walls, *, dim, first_dir, second_dir, ray_axis,
                 t_near):
    """XLA twin of the in-kernel pass-1 search bound ``tmin0`` (box-exit ∧
    wall-crossing times): no geometry hit can lie beyond it, so a chunk
    whose slab entry exceeds it can never matter. Used by the precand wake
    test (the caller inflates the comparison so f32 rounding differences
    between this and the Mosaic twin stay conservative) and, under
    ``entry_aux``, fed straight into the kernel as [tmin0, t_w1, t_w2] —
    replacing the in-kernel twin op-for-op. Returns (tmin0, t_w1, t_w2)."""
    lo1, hi1 = walls[0, 0], walls[0, 1]
    lo2, hi2 = walls[0, 2], walls[0, 3]
    lor, hir = walls[0, 4], walls[0, 5]
    r_inf = walls[0, 8] + t_near
    inv = 1.0 / jnp.where(dirn == 0.0, 1e-30, dirn)
    lows = {first_dir: lo1, second_dir: lo2, ray_axis: lor}
    highs = {first_dir: hi1, second_dir: hi2, ray_axis: hir}
    texit = None
    for ax in range(3):
        e = jnp.maximum(
            (highs[ax] + r_inf - org[:, ax]) * inv[:, ax],
            (lows[ax] - r_inf - org[:, ax]) * inv[:, ax],
        )
        texit = e if texit is None else jnp.minimum(texit, e)

    def wall_t(axis, lo, hi, other_axis, other_lo, other_hi):
        d = dirn[:, axis]
        t = jnp.where(
            d > 0.0,
            (hi - org[:, axis]) * inv[:, axis],
            jnp.where(d < 0.0, (lo - org[:, axis]) * inv[:, axis], BIG),
        )
        t = jnp.where(t > t_near, t, BIG)
        hp_r = org[:, ray_axis] + dirn[:, ray_axis] * t
        ok = (hp_r >= lor) & (hp_r <= hir)
        if dim == 3:
            hp_o = org[:, other_axis] + dirn[:, other_axis] * t
            ok &= (hp_o >= other_lo) & (hp_o <= other_hi)
        return jnp.where(ok, t, BIG)

    t_w1 = wall_t(first_dir, lo1, hi1, second_dir, lo2, hi2)
    if dim == 3:
        t_w2 = wall_t(second_dir, lo2, hi2, first_dir, lo1, hi1)
    else:
        t_w2 = jnp.full_like(t_w1, BIG)
    tmin0 = (
        jnp.minimum(jnp.maximum(texit, 0.0), jnp.minimum(t_w1, t_w2))
        * (1.0 + 1e-4)
        + t_near
    )
    return tmin0, t_w1, t_w2


def fused_bounce(org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs,
                 walls, sticking, rt=None, mxu_pick=None, precand=None,
                 slice_w=None, **kw):
    """Thin wrapper around ``_fused_bounce`` (see it for the contract).

    ``rt``/``mxu_pick``/``precand``/``slice_w`` fall back to env vars when
    None — but NOTE this wrapper usually runs inside an outer jitted trace,
    so env fallbacks resolve at trace time and an env change mid-process
    silently reuses the stale outer compile. The production path passes
    them explicitly from ``trace.kernel.EnvKnobs`` (resolved per ``apply()``
    outside jit); the fallbacks exist for direct/standalone callers only
    (fresh process required after env changes)."""
    import os as _os

    if rt is None:
        # ray-tile width: VPU-register/VMEM-pressure tradeoff, env-tunable
        rt = int(_os.environ.get("VIENNARAY_TPU_RT", "256"))
    if precand is None:
        precand = _os.environ.get("VIENNARAY_TPU_PRECAND", "1") == "1"
    if mxu_pick is None:
        # default OFF: measured a PESSIMIZATION on v5e (disk3d 1.376M ->
        # 1.230M, disk18k 572k -> 489k rays/s) — the (rt,pt)x(rows,pt)
        # transposed-rhs contraction schedules worse under Mosaic than the
        # 12 VPU ops it replaces, same pattern as the deferred hit-selection
        # (NOTES.md round 2). Kept behind the flag: it is bitwise-exact in
        # interpret mode and argued exact on the MXU
        # (tests/test_round3_features.py); future Mosaic versions may
        # schedule it better.
        mxu_pick = _os.environ.get("VIENNARAY_TPU_MXU_PICK", "0") == "1"
    rt = min(int(rt), org.shape[0])

    # Compile hygiene: cap the Pallas launch width and lax.map over slices,
    # so every wider stage of the compaction ladder — and every mega-batch
    # size — reuses ONE compiled Mosaic kernel instead of recompiling per
    # width (r3 NOTES: each new (batch, npad, pt, rt) tuple cost 10-60 min
    # of remote Mosaic compiles through the tunnel). Slices run
    # sequentially on device like grid steps; flux is summed across slices
    # in fixed order (deterministic, but a different f32 accumulation order
    # than a single-launch sweep — goldens regenerated with it).
    # 2^19: slicing at 2^17 cost 17% on the flagship (8 sequential lax.map
    # steps of XLA glue per bounce); at 2^19 only the 2^20 top stage splits
    # in two while every batch size >= 2^19 still reuses the same kernels
    if slice_w is None:
        slice_w = int(_os.environ.get("VIENNARAY_TPU_SLICE", str(1 << 19)))
    slice_w = int(slice_w)
    R = org.shape[0]
    # streamed (HBM-resident geometry) launches never slice: XLA fuses the
    # lax.map output stacking into a >16M scoped-VMEM allocation around the
    # custom call (disk1m at 2x2^19: OOM by 845K)
    if R > slice_w and R % slice_w == 0 and not kw.get("stream", False):
        n_sl = R // slice_w

        def one(sl):
            o, d, w, w0s, fl, un = sl
            return _fused_bounce(
                o, d, w, w0s, fl, un, prims, chunk_bbs, walls, sticking,
                rt=rt, mxu_pick=bool(mxu_pick), precand=bool(precand), **kw
            )

        cut = lambda a: a.reshape(n_sl, slice_w, *a.shape[1:])
        outs = jax.lax.map(
            one,
            (cut(org), cut(dirn), cut(weight), cut(w0), cut(flags),
             cut(uniforms)),
        )
        joi = lambda a: a.reshape(R, *a.shape[2:])
        org2, dir2, w2, flags2, stats, flux_sl = outs[:6]
        return (
            joi(org2), joi(dir2), joi(w2), joi(flags2), joi(stats),
            jnp.sum(flux_sl, axis=0),
            # xla_deposit extras (hit lane / deposit weight), per-ray
            *(joi(a) for a in outs[6:]),
        )
    return _fused_bounce(
        org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs, walls,
        sticking, rt=rt, mxu_pick=bool(mxu_pick),
        precand=bool(precand), **kw
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_near", "rt", "pt", "dim", "first_dir", "second_dir", "ray_axis",
        "bc1", "bc2", "refl_kind", "max_bounces_cfg", "max_bdry", "wthresh",
        "wrenew", "roulette", "interpret", "n_sub", "per_mat", "geo_kind",
        "flux_model", "mfp", "stream", "ordered", "mxu_pick", "precand",
        "xla_deposit", "entry_aux", "stream_buf",
    ),
)
def _fused_bounce(
    org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs, walls, sticking,
    t_near=1e-4, rt=256, pt=512, dim=3, first_dir=0, second_dir=1,
    ray_axis=2, bc1=BoundaryCondition.REFLECTIVE,
    bc2=BoundaryCondition.REFLECTIVE,
    refl_kind=ReflectionKind.DIFFUSE, max_bounces_cfg=2**30, max_bdry=1000,
    wthresh=0.1, wrenew=0.3, roulette=True, interpret=False, n_sub=1,
    per_mat=False, geo_kind="disk", flux_model="neighbor", mfp=-1.0,
    stream=False, ordered=True, mxu_pick=False, precand=True,
    xla_deposit=False, entry_aux=False, stream_buf=2,
):
    """Run ``n_sub`` fused bounces for all rays.

    org/dirn (R,3); weight/w0 (R,1); flags (R,4) [alive,hfb,n_refl,n_bdry];
    uniforms (R, n_uni*n_sub) with n_uni = 3 (+3 when mfp > 0), columns per
    sub-bounce [u_refl1|theta, u_refl2, u_roul (, u_scat, u_z, u_phi)];
    prims (8,Npad) disk SoA or (12,Npad) triangle SoA; chunk_bbs (C,8);
    walls (1,9) [lo1 hi1 lo2 hi2 lo_r hi_r tau nbr2 r_over] with tau the
    window deposit width 1.1*gridDelta, nbr2 = (2*diskRadius)^2 the
    neighborhood radius squared, and r_over the geometry overhang beyond the
    walls box (8-column input gets r_over = sqrt(nbr2)/2 appended);
    sticking (1,1) scalar, or (1,Npad) per-prim in SORTED
    order when ``per_mat`` (the GPU per-material sticking map,
    rayParticle.hpp:213, resolved per prim on the host side).

    For refl_kind CONED_COSINE the first uniform column per sub-bounce must
    carry theta samples from ops/sampling.coned_cosine_theta (the limit
    cases angle<=0 / >=pi/2 must be resolved to SPECULAR/DIFFUSE upstream).

    Returns (org', dirn', weight', flags', stats (R,8),
    flux (C, pt) f32 in SORTED prim order summed over all rays and bounces).

    ``xla_deposit`` (requires n_sub == 1; disk-neighbor / triangle / line
    only): the kernel skips its deposit pass — flux comes back zero — and
    two extra outputs are appended: hit_lane (R,1) f32 (global SORTED lane
    of the colliding hit, -1 otherwise) and wdep (R,1) f32 (the
    pre-sticking deposit weight). The caller lands the deposits with the
    precomputed neighbor lists + a histogram (trace/kernel.py).

    ``entry_aux`` (requires precand): feed the XLA-computed
    [tmin0, t_w1, t_w2] entry-state columns into the kernel, skipping the
    in-kernel wall/box-exit math (same arithmetic op-for-op).
    """
    R = org.shape[0]
    xla_deposit = bool(xla_deposit)
    if xla_deposit:
        assert n_sub == 1, "xla_deposit requires n_sub == 1"
        assert not (geo_kind == "disk" and flux_model == "window"), (
            "xla_deposit has no XLA twin for the window flux model"
        )
    if walls.shape[1] == 8:
        # col 8 = geometry overhang beyond the walls box (disks stick out by
        # their radius; bbox covers centers only) — needed by the pass-1
        # box-exit search bound. Default: the uniform disk radius
        # sqrt(nbr2)/2; callers with per-prim radii pass 9 columns.
        walls = jnp.concatenate(
            [walls, jnp.sqrt(walls[:, 7:8]) * 0.5], axis=1
        )
    grid = (R // rt,)
    npad = prims.shape[1]
    n_chunks = npad // pt
    ordered = bool(ordered) and n_chunks >= 2
    # precand (precomputed candidate lists) applies only when the kernel's
    # sweep tests the ENTRY state: single sub-bounce (n_sub>1 mutates state
    # in-kernel where the XLA wake test cannot see it)
    precand = bool(precand) and ordered and n_sub == 1
    # the entry-state aux is only valid when the kernel sweep tests the
    # ENTRY state, i.e. under precand
    entry_aux = bool(entry_aux) and precand
    n_uni = 3 + (3 if mfp > 0.0 else 0)
    kernel = functools.partial(
        _bounce_kernel, n_sub=n_sub, n_uni=n_uni, pt=pt, npad=npad,
        stream=bool(stream), ordered=ordered, precand=precand,
        entry_aux=entry_aux, xla_deposit=xla_deposit,
        stream_buf=int(stream_buf),
        t_near=float(t_near),
        dim=dim,
        first_dir=first_dir, second_dir=second_dir, ray_axis=ray_axis,
        bc1=BoundaryCondition(bc1), bc2=BoundaryCondition(bc2),
        refl_kind=ReflectionKind(refl_kind),
        # skip threshold: triangle chunks cost ~2.4x a disk chunk (12 rows,
        # Moller-Trumbore), so the cheap slab test pays off at fewer chunks
        use_skip=npad // pt >= (8 if str(geo_kind) != "disk" else 24),
        max_bounces_cfg=float(max_bounces_cfg), max_bdry=float(max_bdry),
        wthresh=float(wthresh), wrenew=float(wrenew), roulette=bool(roulette),
        per_mat=bool(per_mat), geo_kind=str(geo_kind),
        flux_model=str(flux_model), mfp=float(mfp),
        mxu_pick=bool(mxu_pick),
    )
    vspec = lambda c: pl.BlockSpec(
        (rt, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    if stream:
        # geometry stays in HBM
        prims_spec = pl.BlockSpec(memory_space=pl.ANY)
        if ordered:
            # ring-buffered sweep slots (depth stream_buf, default 2) +
            # double-buffered deposit slots (deposit slots only when the
            # deposit pass runs in-kernel)
            scratch_shapes = [
                pltpu.VMEM((int(stream_buf), prims.shape[0], pt),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((int(stream_buf),)),
            ]
            if not xla_deposit:
                scratch_shapes += [
                    pltpu.VMEM((2, prims.shape[0], pt), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
        else:
            scratch_shapes = [
                pltpu.VMEM((prims.shape[0], pt), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
    else:
        prims_spec = whole(prims)
        scratch_shapes = []

    in_specs = [
        vspec(3), vspec(3), vspec(1), vspec(1), vspec(4),
        vspec(n_uni * n_sub),
        prims_spec, whole(chunk_bbs), whole(walls), whole(sticking),
    ]
    args = [org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs, walls,
            sticking]
    if ordered:
        # Per-tile front-to-back chunk schedule (the Embree BVH-descent
        # analog): chunks sorted by Euclidean distance from the tile's
        # live-origin centroid to the chunk AABB; dbound = that distance
        # minus the tile radius is a valid lower bound on ANY live lane's
        # distance to the chunk, so the kernel can stop the sweep once
        # dbound exceeds every live lane's current search bound.
        n_tiles = R // rt
        a_t = (flags[:, 0] > 0.5).reshape(n_tiles, rt, 1)
        o_t = org.reshape(n_tiles, rt, 3)
        cnt = jnp.maximum(jnp.sum(a_t, axis=1).astype(jnp.float32), 1.0)
        cen = jnp.sum(jnp.where(a_t, o_t, 0.0), axis=1) / cnt
        r2_t = jnp.sum((o_t - cen[:, None, :]) ** 2, axis=-1)
        r_tile = jnp.sqrt(jnp.max(jnp.where(a_t[..., 0], r2_t, 0.0), axis=1))
        lo_c = chunk_bbs[None, :, 0:3]
        hi_c = chunk_bbs[None, :, 3:6]
        dd = jnp.maximum(
            jnp.maximum(lo_c - cen[:, None, :], cen[:, None, :] - hi_c), 0.0
        )
        dist = jnp.sqrt(jnp.sum(dd * dd, axis=-1))  # (n_tiles, C)
        if precand:
            # XLA-side wake test (BVH-candidate analog): per tile, which
            # chunks can possibly contain a hit for its ENTRY state? The
            # kernel then sweeps exactly these, unconditionally, in distance
            # order — no in-kernel per-chunk wake test or lax.cond. The test
            # is the exact per-ray slab test the kernel used to run
            # in-kernel (tlo < tmin0, segment forward, alive), inflated so
            # f32 divergence from the Mosaic twin stays conservative; at
            # HBM-streamed chunk counts the chunk axis is processed in
            # 64-chunk blocks via lax.map (bounding the (R, CB, 3) slab
            # intermediates) — same arithmetic, so the candidate set is the
            # same superset of the true set in both regimes and flux is
            # bitwise unchanged.
            tmin0, t_w1x, t_w2x = _entry_bound(
                org, dirn, walls, dim=dim, first_dir=first_dir,
                second_dir=second_dir, ray_axis=ray_axis,
                t_near=float(t_near),
            )
            alive_r = flags[:, 0] > 0.5
            # Deposit-reach inflation: the DEPOSIT loop walks the same
            # candidate order, but deposits land within reach of the hit
            # point, and a chunk within that reach of the segment need not
            # be INTERSECTED by it — candidate wake therefore tests chunk
            # AABBs inflated by rho so no deposit-reachable chunk is ever
            # excluded. Under the neighbor model the in-kernel deposit wake
            # is a 2*diskRadius ball around the hit prim's CENTER, which
            # sits up to r_hit <= r_over off the ray's pierce point — rho
            # must cover nbr + that center offset, or a chunk whose slab
            # entry lands just past ``bound`` (a wall crossing right behind
            # the hit) could be excluded while still receiving deposits
            # (silently dropping them). rho = nbr + 2*r_over: one r_over
            # for the center offset, one as margin for f32 slab rounding.
            # An AABB inflated by rho also moves the slab entry >= rho
            # earlier along a unit ray, so the t-test needs no extra slack.
            if geo_kind == "disk":
                rho = (
                    jnp.sqrt(walls[0, 7]) + 2.0 * walls[0, 8]
                    if flux_model == "neighbor"
                    else walls[0, 6]
                )
            else:
                rho = jnp.float32(0.0)
            inv = 1.0 / jnp.where(dirn == 0.0, 1e-30, dirn)
            bound = tmin0 * 1.001 + 1e-3

            def _wake_block(bbs_blk):
                """(CB, 8) chunk AABBs -> (n_tiles, CB) tile wake flags via
                the exact per-ray slab test (same arithmetic as the old
                in-kernel wake, rho-inflated)."""
                t0 = (bbs_blk[None, :, 0:3] - rho - org[:, None, :]) * inv[
                    :, None, :
                ]
                t1 = (bbs_blk[None, :, 3:6] + rho - org[:, None, :]) * inv[
                    :, None, :
                ]
                tlo = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (R, CB)
                thi = jnp.min(jnp.maximum(t0, t1), axis=-1)
                wake_r = (
                    (thi >= tlo)
                    & (thi > 0.0)
                    & (tlo < bound[:, None])
                    & alive_r[:, None]
                )
                return jnp.any(
                    wake_r.reshape(n_tiles, rt, bbs_blk.shape[0]), axis=1
                )

            if R * n_chunks <= (1 << 25):
                wake = _wake_block(chunk_bbs)
            else:
                # HBM-streamed chunk counts: process the chunk axis in
                # blocks of 64 (lax.map) so the (R, CB, 3) slab
                # intermediates stay bounded; exactness unchanged —
                # a 344-chunk disk1m tile woke 162 chunks/bounce under the
                # old conservative tile-cone test vs the per-ray truth
                cb = 64
                n_blk = -(-n_chunks // cb)
                pad = n_blk * cb - n_chunks
                bbs_p = jnp.concatenate(
                    [
                        chunk_bbs,
                        jnp.tile(
                            jnp.asarray(
                                [[BIG, BIG, BIG, -BIG, -BIG, -BIG, 0.0,
                                  0.0]],
                                jnp.float32,
                            ),
                            (pad, 1),
                        ),
                    ],
                    axis=0,
                ) if pad else chunk_bbs
                wake_b = jax.lax.map(
                    _wake_block, bbs_p.reshape(n_blk, cb, 8)
                )  # (n_blk, n_tiles, cb)
                wake = jnp.moveaxis(wake_b, 0, 1).reshape(
                    n_tiles, n_blk * cb
                )[:, :n_chunks]
            key = jnp.where(wake, dist, BIG)
            order = jnp.argsort(key, axis=1).astype(jnp.int32)
            dbound = jnp.where(
                jnp.take_along_axis(wake, order, axis=1),
                jnp.take_along_axis(dist - r_tile[:, None], order, axis=1),
                BIG,
            ).astype(jnp.float32)
        else:
            order = jnp.argsort(dist, axis=1).astype(jnp.int32)
            dbound = jnp.take_along_axis(
                dist - r_tile[:, None], order, axis=1
            ).astype(jnp.float32)
        # 3-D (n_tiles, 1, C) with block (1, 1, C): Mosaic requires the last
        # two block dims to equal the array dims (or be (8,128)-divisible)
        order = order[:, None, :]
        dbound = dbound[:, None, :]
        smem_spec = pl.BlockSpec(
            (1, 1, n_chunks), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        in_specs += [smem_spec, smem_spec]
        args += [order, dbound]
        if entry_aux:
            eaux = jnp.stack([tmin0, t_w1x, t_w2x], axis=1).astype(
                jnp.float32
            )
            in_specs += [vspec(3)]
            args += [eaux]

    out_specs = [
        vspec(3), vspec(3), vspec(1), vspec(4), vspec(8),
        pl.BlockSpec(
            (npad // pt, pt), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((R, 3), jnp.float32),
        jax.ShapeDtypeStruct((R, 3), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, 4), jnp.float32),
        jax.ShapeDtypeStruct((R, 8), jnp.float32),
        jax.ShapeDtypeStruct((npad // pt, pt), jnp.float32),
    ]
    if xla_deposit:
        out_specs += [vspec(1), vspec(1)]
        out_shape += [
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        scratch_shapes=scratch_shapes,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return out
