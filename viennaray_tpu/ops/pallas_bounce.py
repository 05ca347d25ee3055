"""Fused multi-bounce megakernel with in-kernel flux deposits (disk path).

One Pallas kernel advances a ray tile through ``n_sub`` full bounce
iterations: nearest-disk hit, finite-wall boundary event, backface
pass/kill, **flux deposits**, sticking + reflection sampling, Russian
roulette, and the state update. Nothing per-bounce remains on the XLA side
except the uniform draws and counter sums — the whole bounce costs ~2
device launches regardless of geometry size (within the VMEM prim budget).

Flux model: the OptiX pipeline's candidate-window semantics
(GeneralPipelineDisk.cu:51-59,86-93): when the closest hit is a front-face
collision, the pre-sticking ray weight is deposited onto EVERY disk the ray
intersects with t < t_hit + tau, tau = 1.1*gridDelta (set at
gpu/raygTrace.hpp:116) — the GPU twin of the CPU neighbor re-test
(rayTraceKernel.hpp:255-300), without the MAX_NEIGHBORS=8 cap. Deposits are
accumulated into a VMEM flux block (sorted prim order, one lane per prim)
by a second chunk sweep that reuses the slab skip, so coherent ray tiles
touch only the few chunks around their hits. The caller unpermutes once per
bounce with ``soa_inv_perm``.

Why: the XLA bounce body lowers to ~15-20 device kernels; inside the
`lax.while_loop` each iteration pays their launch overhead (~4 ms measured
at tiny widths), which dominates long boundary ping-pong tails (NOTES.md),
plus ~2.6 ms neighbor gather + 2.5-10 ms one-hot/scatter flux per bounce at
full width. The megakernel eliminates all of it; n_sub > 1 amortizes the
remaining launches across several bounces (tail stage runs 16 bounces per
round trip).

Constraints (the trace body falls back otherwise):
- disk geometry in VMEM (the standard prims SoA);
- no gas scattering (mean_free_path <= 0), no custom fns, no material
  sticking table, no distance weighting, non-differentiable path;
- DIFFUSE or SPECULAR reflection (coned-cosine needs an accept-reject loop).

Randomness comes in as precomputed uniforms (R, 3*n_sub) so the sampling
arithmetic mirrors physics/reflection.py exactly.

Hit-prim normals are recovered without per-lane gathers by a masked average
over the argmin lanes: coplanar ties share a plane (equal normals), so the
average is exact there; distinct-plane exact-t ties are measure-zero in f32.

Stats output (8 f32): per-lane sums over sub-bounces of
[collide, wall, exit, traces(alive-at-start), 0, 0, 0, 0].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BoundaryCondition, ReflectionKind

BIG = 3.4e38


def _one_bounce(
    state, u1, u2, u3, prims_ref, bb_ref, walls_ref, stick_ref, flux_ref,
    *, pt, t_near, dim, first_dir, second_dir, ray_axis, bc1, bc2,
    refl_kind, use_skip, max_bounces_cfg, max_bdry, wthresh, wrenew, roulette,
    per_mat=False,
):
    """One full bounce on column-vector state; returns state'."""
    (ox, oy, oz, dx, dy, dz, weight, w0, alive, hfb, n_refl, n_bdry) = state
    rt = ox.shape[0]
    npad = prims_ref.shape[1]

    inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

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

    def chunk_ts(i):
        """Analytic disk hits for chunk i: (t, valid, nx, ny, nz, stick)."""
        sl = pl.ds(i * pt, pt)
        cx = prims_ref[0, sl][None, :]
        cy = prims_ref[1, sl][None, :]
        cz = prims_ref[2, sl][None, :]
        nx = prims_ref[3, sl][None, :]
        ny = prims_ref[4, sl][None, :]
        nz = prims_ref[5, sl][None, :]
        r2 = prims_ref[6, sl][None, :]
        ndc = prims_ref[7, sl][None, :]

        denom = dx * nx + dy * ny + dz * nz
        ndo = ox * nx + oy * ny + oz * nz
        dsafe = jnp.where(denom == 0.0, 1e-30, denom)
        r0 = pl.reciprocal(dsafe, approx=True)
        r0 = r0 * (2.0 - dsafe * r0)
        t = (ndc - ndo) * r0
        hx = ox + t * dx - cx
        hy = oy + t * dy - cy
        hz = oz + t * dz - cz
        dist2 = hx * hx + hy * hy + hz * hz
        valid = (denom != 0.0) & (t > t_near) & (dist2 < r2)
        stk = stick_ref[0, sl][None, :] if per_mat else None
        return t, valid, nx, ny, nz, stk

    # ---- pass 1: nearest disk hit ----------------------------------------
    def body(i, carry):
        tmin = carry[0]
        tlo, thi = chunk_slab(i)
        need = jnp.any((thi >= tlo) & (thi > 0.0) & (tlo < tmin))

        def full(carry):
            tmin, nbx, nby, nbz, stk_c = carry
            t, valid, nx, ny, nz, stk = chunk_ts(i)
            tt = jnp.where(valid, t, BIG)
            cmin = jnp.min(tt, axis=1, keepdims=True)
            take = cmin < tmin
            # hit normal via masked average over argmin-equal lanes (coplanar
            # ties share the normal; see module docstring) — same recovery
            # for per-prim sticking (materials agree on coplanar same-material
            # overlaps; distinct-plane exact ties are measure-zero in f32)
            eq = (tt == cmin) & valid
            cnt = jnp.maximum(
                jnp.sum(eq.astype(jnp.float32), axis=1, keepdims=True), 1.0
            )
            anx = jnp.sum(jnp.where(eq, nx, 0.0), axis=1, keepdims=True) / cnt
            any_ = jnp.sum(jnp.where(eq, ny, 0.0), axis=1, keepdims=True) / cnt
            anz = jnp.sum(jnp.where(eq, nz, 0.0), axis=1, keepdims=True) / cnt
            if per_mat:
                astk = (
                    jnp.sum(jnp.where(eq, stk, 0.0), axis=1, keepdims=True)
                    / cnt
                )
                stk_c = jnp.where(take, astk, stk_c)
            return (
                jnp.where(take, cmin, tmin),
                jnp.where(take, anx, nbx),
                jnp.where(take, any_, nby),
                jnp.where(take, anz, nbz),
                stk_c,
            )

        if use_skip:
            return jax.lax.cond(need, full, lambda c: c, carry)
        return full(carry)

    init = (
        jnp.full((rt, 1), BIG, jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
    )
    t_geo, nhx, nhy, nhz, stk_hit = jax.lax.fori_loop(
        0, npad // pt, body, init
    )
    hit_geo = t_geo < BIG

    # ---- wall crossings (finite rectangles) -----------------------------
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

    t_geo_m = jnp.where(hit_geo, t_geo, BIG)
    t_ev = jnp.minimum(jnp.minimum(t_geo_m, t_w1), t_w2)
    is_geo = t_geo_m <= t_ev
    is_w1 = (~is_geo) & (t_w1 <= t_ev)
    is_w2 = (~is_geo) & (~is_w1) & (t_w2 <= t_ev)
    is_exit = t_ev >= BIG

    is_exit = alive & is_exit
    is_w1 = alive & is_w1 & (~is_exit)
    is_w2 = alive & is_w2 & (~is_exit)
    is_wall = is_w1 | is_w2
    is_geo_ev = alive & is_geo & (~is_exit)

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
    bf_kill = is_geo_ev & backface & hfb
    bf_pass = is_geo_ev & backface & (~hfb)
    collide = is_geo_ev & (~backface)

    # ---- pass 2: flux deposits (candidate-window neighbor model) --------
    wdep = jnp.where(collide, weight, 0.0)  # pre-sticking weight
    tlim = jnp.where(collide, t_geo + tau, -BIG)

    def dep_body(i, carry):
        tlo, thi = chunk_slab(i)
        need = jnp.any((thi >= tlo) & (thi > 0.0) & (tlo <= tlim))

        @pl.when(need)
        def _():
            t, valid, _, _, _, _ = chunk_ts(i)
            # inclusive: the primary hit (t == t_geo) always deposits,
            # even with a zero window
            depm = (valid & (t <= tlim)).astype(jnp.float32)
            dep = jnp.sum(depm * wdep, axis=0)  # (pt,)
            flux_ref[pl.ds(i, 1), :] += dep[None, :]

        return carry

    jax.lax.fori_loop(0, npad // pt, dep_body, 0)

    # reflection direction (uniforms mirror physics/reflection.py)
    if refl_kind == ReflectionKind.DIFFUSE:
        z = 1.0 - 2.0 * u1
        phi = 6.2831853071795864769 * u2
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        sx = r * jnp.cos(phi) + nhx
        sy = r * jnp.sin(phi) + nhy
        sz = (z + nhz) if dim == 3 else jnp.zeros((rt, 1), jnp.float32)
        norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        inv_n = 1.0 / jnp.maximum(norm, 1e-12)
        rdx, rdy, rdz = sx * inv_n, sy * inv_n, sz * inv_n
    else:  # SPECULAR: d' = 2 (n . -d) n - (-d)
        dp = -(dx * nhx + dy * nhy + dz * nhz)
        rdx = 2.0 * dp * nhx + dx
        rdy = 2.0 * dp * nhy + dy
        rdz = 2.0 * dp * nhz + dz
        if dim == 2:
            rdz = jnp.zeros((rt, 1), jnp.float32)
            nrm2 = jnp.sqrt(rdx * rdx + rdy * rdy)
            inv_n = 1.0 / jnp.maximum(nrm2, 1e-12)
            rdx, rdy = rdx * inv_n, rdy * inv_n

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

    weight_out = jnp.where(collide, new_weight, weight)
    hfb_out = hfb | bf_pass
    dead = (
        dead | is_exit | bdry_over | bf_kill | died_absorb | died_max_refl
        | died_roul
    )
    alive_out = alive & (~dead)

    stats = (
        jnp.where(collide, 1.0, 0.0),
        jnp.where(is_wall, 1.0, 0.0),
        jnp.where(is_exit, 1.0, 0.0),
        jnp.where(alive, 1.0, 0.0),
    )
    new_state = (
        fx, fy, fz, gdx, gdy, gdz, weight_out, w0, alive_out, hfb_out,
        n_refl_new, n_bdry_new,
    )
    return new_state, stats


def _bounce_kernel(
    org_ref, dir_ref, w_ref, w0_ref, flags_ref, uni_ref, prims_ref, bb_ref,
    walls_ref, stick_ref,
    org_out, dir_out, w_out, flags_out, stats_out, flux_out,
    *, n_sub, **kw,
):
    o = org_ref[:]  # (RT, 3)
    d = dir_ref[:]
    rt = o.shape[0]

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
    st = [jnp.zeros((rt, 1), jnp.float32) for _ in range(4)]
    for k in range(n_sub):
        u1 = uni_ref[:, 3 * k : 3 * k + 1]
        u2 = uni_ref[:, 3 * k + 1 : 3 * k + 2]
        u3 = uni_ref[:, 3 * k + 2 : 3 * k + 3]
        state, stats = _one_bounce(
            state, u1, u2, u3, prims_ref, bb_ref, walls_ref, stick_ref,
            flux_out, **kw
        )
        st = [a + b for a, b in zip(st, stats)]

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
    zero = st[0] * 0.0
    for j in range(4):
        stats_out[:, j : j + 1] = st[j]
        stats_out[:, 4 + j : 5 + j] = zero


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_near", "rt", "pt", "dim", "first_dir", "second_dir", "ray_axis",
        "bc1", "bc2", "refl_kind", "max_bounces_cfg", "max_bdry", "wthresh",
        "wrenew", "roulette", "interpret", "n_sub", "per_mat",
    ),
)
def fused_bounce(
    org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs, walls, sticking,
    t_near=1e-4, rt=256, pt=512, dim=3, first_dir=0, second_dir=1,
    ray_axis=2, bc1=BoundaryCondition.REFLECTIVE,
    bc2=BoundaryCondition.REFLECTIVE,
    refl_kind=ReflectionKind.DIFFUSE, max_bounces_cfg=2**30, max_bdry=1000,
    wthresh=0.1, wrenew=0.3, roulette=True, interpret=False, n_sub=1,
    per_mat=False,
):
    """Run ``n_sub`` fused bounces for all rays.

    org/dirn (R,3); weight/w0 (R,1); flags (R,4) [alive,hfb,n_refl,n_bdry];
    uniforms (R,3*n_sub); prims (8,Npad); chunk_bbs (C,8); walls (1,8)
    [lo1 hi1 lo2 hi2 lo_r hi_r tau 0] with tau the deposit window
    1.1*gridDelta; sticking (1,1) scalar, or (1,Npad) per-prim in SORTED
    order when ``per_mat`` (the GPU per-material sticking map,
    rayParticle.hpp:213, resolved per prim on the host side).
    Returns (org', dirn', weight', flags', stats (R,8),
    flux (C, pt) f32 in SORTED prim order summed over all rays and bounces).
    """
    R = org.shape[0]
    rt = min(rt, R)
    grid = (R // rt,)
    npad = prims.shape[1]
    kernel = functools.partial(
        _bounce_kernel, n_sub=n_sub, pt=pt, t_near=float(t_near), dim=dim,
        first_dir=first_dir, second_dir=second_dir, ray_axis=ray_axis,
        bc1=BoundaryCondition(bc1), bc2=BoundaryCondition(bc2),
        refl_kind=ReflectionKind(refl_kind),
        use_skip=npad // pt >= 24,
        max_bounces_cfg=float(max_bounces_cfg), max_bdry=float(max_bdry),
        wthresh=float(wthresh), wrenew=float(wrenew), roulette=bool(roulette),
        per_mat=bool(per_mat),
    )
    vspec = lambda c: pl.BlockSpec(
        (rt, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec(3), vspec(3), vspec(1), vspec(1), vspec(4),
            vspec(3 * n_sub),
            whole(prims), whole(chunk_bbs), whole(walls), whole(sticking),
        ],
        out_specs=[
            vspec(3), vspec(3), vspec(1), vspec(4), vspec(8),
            pl.BlockSpec(
                (npad // pt, pt), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 4), jnp.float32),
            jax.ShapeDtypeStruct((R, 8), jnp.float32),
            jax.ShapeDtypeStruct((npad // pt, pt), jnp.float32),
        ],
        interpret=interpret,
    )(org, dirn, weight, w0, flags, uniforms, prims, chunk_bbs, walls,
      sticking)
    return out
