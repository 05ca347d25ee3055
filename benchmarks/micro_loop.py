"""Microbenchmark: per-iteration fixed cost of Mosaic chunk loops.

The megakernel's pass-1 sweep is a while/fori loop over geometry chunks;
round-3 notes measured ~1.4 us per iteration "regardless of body size",
which forced wide (pt=2048) chunks at >8k prims. This bench decomposes that
cost on the real chip:

  empty       — fori over N iters, scalar carry only (pure loop machinery)
  slab_col    — + ray/AABB slab test on (rt, 1) column state (current layout)
  slab_row    — + slab test on (1, rt) row state (transposed layout)
  cond_skip   — + lax.cond whose predicate is always False (wake-test miss)
  disk_col    — + full disk chunk test (rt, pt) pair math, current layout
  disk_row    — + full disk chunk test (pt, rt) pair math, transposed

Each variant runs ITERS loop iterations per grid step over TILES grid steps;
report is us per loop iteration (per tile). Decides chunk width + whether
the transposed kernel refactor pays.

Run: python benchmarks/micro_loop.py [pt]   (real TPU)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
RT = 256
ITERS = int(_os.environ.get("ML_ITERS", "64"))
TILES = int(_os.environ.get("ML_TILES", "256"))
PT = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def _mk_kernel(variant, pt):
    def kernel(state_ref, bb_ref, prims_ref, prims_t_ref, o_ref):
        col = variant.endswith("_col") or variant == "empty"
        if col:
            ox = state_ref[:, 0:1]
            oy = state_ref[:, 1:2]
            oz = state_ref[:, 2:3]
            dx = state_ref[:, 3:4]
            dy = state_ref[:, 4:5]
            dz = state_ref[:, 5:6]
        else:
            ox = state_ref[0:1, :]
            oy = state_ref[1:2, :]
            oz = state_ref[2:3, :]
            dx = state_ref[3:4, :]
            dy = state_ref[4:5, :]
            dz = state_ref[5:6, :]
        inv_x = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        inv_y = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        inv_z = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

        def slab(i):
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

        def disk_col(i, tmin):
            blk = prims_ref[:, pl.ds(i * pt, pt)]
            cx, cy, cz = blk[0:1, :], blk[1:2, :], blk[2:3, :]
            nx, ny, nz = blk[3:4, :], blk[4:5, :], blk[5:6, :]
            r2, ndc = blk[6:7, :], blk[7:8, :]
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
            valid = (denom != 0.0) & (t > 1e-4) & (dist2 < r2)
            tt = jnp.where(valid, t, 3.4e38)
            return jnp.minimum(tmin, jnp.min(tt, axis=1, keepdims=True))

        def disk_row(i, tmin):
            blk = prims_t_ref[pl.ds(i * pt, pt), :]
            cx, cy, cz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            nx, ny, nz = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
            r2, ndc = blk[:, 6:7], blk[:, 7:8]
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
            valid = (denom != 0.0) & (t > 1e-4) & (dist2 < r2)
            tt = jnp.where(valid, t, 3.4e38)
            return jnp.minimum(tmin, jnp.min(tt, axis=0, keepdims=True))

        if col:
            acc0 = jnp.full((RT, 1), 3.4e38, jnp.float32)
        else:
            acc0 = jnp.full((1, RT), 3.4e38, jnp.float32)

        def body(i, acc):
            if variant == "empty":
                return acc * 1.0
            if variant.startswith("slab"):
                tlo, thi = slab(i % 8)
                return jnp.minimum(acc, jnp.where(thi >= tlo, tlo, 3.4e38))
            if variant.startswith("cond"):
                tlo, thi = slab(i % 8)
                need = jnp.any((thi >= tlo) & (thi > acc[0, 0] * 2.0))
                fn = disk_col if col else disk_row
                return jax.lax.cond(need, lambda a: fn(i % 8, a),
                                    lambda a: a, acc)
            fn = disk_col if col else disk_row
            return fn(i % 8, acc)

        out = jax.lax.fori_loop(0, ITERS, body, acc0)
        if col:
            o_ref[:, 0:1] = out
        else:
            o_ref[0:1, :] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "pt"))
def run(state, bbs, prims, prims_t, variant, pt):
    col = variant.endswith("_col") or variant == "empty"
    sshape = (RT, 8) if col else (8, RT)
    sspec = pl.BlockSpec(sshape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    whole = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mk_kernel(variant if variant != "empty" else "empty", pt),
        grid=(TILES,),
        in_specs=[sspec, whole(bbs), whole(prims), whole(prims_t)],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct(sshape, jnp.float32),
    )(state, bbs, prims, prims_t)


def main():
    pt = PT
    npad = pt * 8
    rng = np.random.default_rng(0)
    prims = jnp.asarray(rng.normal(size=(8, npad)), jnp.float32)
    prims_t = jnp.asarray(np.asarray(prims).T.copy(), jnp.float32)
    bbs = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    results = {}
    for variant in ("empty", "slab_col", "slab_row", "cond_col", "cond_row",
                    "disk_col", "disk_row"):
        col = variant.endswith("_col") or variant == "empty"
        sshape = (RT, 8) if col else (8, RT)
        state = jnp.asarray(rng.normal(size=sshape), jnp.float32) + 2.0
        np.asarray(run(state, bbs, prims, prims_t, variant, pt))  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(state, bbs, prims, prims_t, variant, pt))
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        per_iter = sec / (ITERS * TILES) * 1e6
        results[variant] = per_iter
        print(f"pt={pt} {variant:9s}: {sec*1e3:8.2f} ms total, "
              f"{per_iter:7.3f} us/loop-iter", flush=True)
    return results



# ---- follow-up: decompose the 1.9us/iter loop-machinery cost ------------
# Hypotheses: (a) scf.for scalar overhead, (b) per-iteration relayout/spill
# of the (rt,1) vector carries, (c) trip-count-dependent. Variants:
#   scalar   — fori with a single f32 scalar carry
#   vreg     — fori with one (8,128) aligned-vreg carry
#   col1/col4/col9 — fori with 1/4/9 (rt,1) column carries
#   unroll4/unroll8 — col9 with lax.fori_loop(..., unroll=N)
#   while9   — col9 as a lax.while_loop (the megakernel's actual form)

def _mk_kernel2(variant):
    def kernel(state_ref, o_ref):
        x0 = state_ref[:, 0:1]

        if variant == "scalar":
            def body(i, c):
                return c * 1.0000001 + 1e-9
            out = jax.lax.fori_loop(0, ITERS, body, jnp.float32(1.0))
            o_ref[0:1, 0:1] = jnp.full((1, 1), out, jnp.float32)
            return
        if variant == "vreg":
            def body(i, c):
                return c * 1.0000001 + 1e-9
            out = jax.lax.fori_loop(
                0, ITERS, body, jnp.full((8, 128), 1.0, jnp.float32)
            )
            o_ref[0:8, 0:1] = out[:, 0:1] * 0.0 + jnp.sum(out[0:8, 0:1])
            return

        ncar = {"col1": 1, "col4": 4}.get(variant, 9)
        unroll = ITERS if variant == "unrollF" else 1

        def body_t(c):
            return tuple(v * 1.0000001 + 1e-9 for v in c)

        init = tuple(x0 + float(k) for k in range(ncar))
        if variant == "while9":
            def cond(c):
                return c[0] < ITERS
            def wbody(c):
                return (c[0] + 1,) + body_t(c[1:])
            out = jax.lax.while_loop(cond, wbody, (jnp.int32(0),) + init)
            acc = out[1]
        elif variant == "condF":
            # fully-unrolled chain of ITERS false-predicate conds (the
            # unrolled-sweep design: per-chunk lax.cond gating, no scf.for)
            c = init
            for k in range(ITERS):
                pred = c[0][0, 0] > 1e30  # False for the +2.0-offset input
                c = jax.lax.cond(pred, body_t, lambda v: v, c)
            acc = c[0]
        else:
            out = jax.lax.fori_loop(
                0, ITERS, lambda i, c: body_t(c), init, unroll=unroll
            )
            acc = out[0]
        o_ref[:, 0:1] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run2(state, variant):
    sspec = pl.BlockSpec((RT, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mk_kernel2(variant),
        grid=(TILES,),
        in_specs=[sspec],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct((RT, 8), jnp.float32),
    )(state)


def main2():
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.normal(size=(RT, 8)), jnp.float32) + 2.0
    for variant in ("col9", "unrollF", "condF", "while9"):
        np.asarray(run2(state, variant))  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run2(state, variant))
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        per_iter = sec / (ITERS * TILES) * 1e6
        print(f"carry {variant:8s}: {sec*1e3:8.2f} ms total, "
              f"{per_iter:7.3f} us/loop-iter", flush=True)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 2 and _s.argv[2] == "carry":
        main2()
    else:
        main()
