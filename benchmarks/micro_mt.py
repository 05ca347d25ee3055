"""Microbenchmark: VPU pair-math Moller-Trumbore vs MXU multilinear form.

The triangle chunk test costs ~45 VPU ops on (rt, pt) intermediates
(ops/pallas_bounce._tri_chunk). The scalar triple products are bilinear in
(d ⊗ o), so the four decision quantities reduce to ONE (rt, 10) x (10, 4*pt)
contraction per chunk against precomputed per-prim vectors
(VERDICT r4 item 7 — profile BEFORE committing; two prior MXU reworks lost
to Mosaic scheduling):

  F = [d, c = d x o, o, 1]              (per-ray, 10 features)
  det    = (-ng) . d                     ng = e1 x e2
  u*det  = e2 . c + (a x e2) . d
  v*det  = e1 . c - (a x e1) . d
  t*det  = ng . o - (a . ng)

after which ~12 VPU ops (one Newton reciprocal, 3 scalings, 5 compares,
select) finish the test. Both variants run ITERS chunk iterations per tile
over TILES grid steps (>> the 25 ms axon dispatch floor, NOTES r4) and
carry a running min so nothing is dead code.

Run: python benchmarks/micro_mt.py [pt]   (real TPU)
"""

import functools
import os as _os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

RT = 256
ITERS = int(_os.environ.get("MT_ITERS", "64"))
TILES = int(_os.environ.get("MT_TILES", "256"))
PT = int(sys.argv[1]) if len(sys.argv) > 1 else 512
T_NEAR = 1e-4


def _mk_kernel(variant, pt):
    def kernel(state_ref, prims_ref, mt_ref, o_ref):
        ox = state_ref[:, 0:1]
        oy = state_ref[:, 1:2]
        oz = state_ref[:, 2:3]
        dx = state_ref[:, 3:4]
        dy = state_ref[:, 4:5]
        dz = state_ref[:, 5:6]
        rt = ox.shape[0]

        if variant == "mt_mxu":
            cx = dy * oz - dz * oy
            cy = dz * ox - dx * oz
            cz = dx * oy - dy * ox
            ones = jnp.ones((rt, 1), jnp.float32)
            F = jnp.concatenate(
                [dx, dy, dz, cx, cy, cz, ox, oy, oz, ones], axis=1
            )  # (rt, 10)

        def body_vpu(i, tmin):
            block = prims_ref[:, pl.ds(i * pt, pt)]
            ax = block[0:1, :]
            ay = block[1:2, :]
            az = block[2:3, :]
            e1x = block[3:4, :]
            e1y = block[4:5, :]
            e1z = block[5:6, :]
            e2x = block[6:7, :]
            e2y = block[7:8, :]
            e2z = block[8:9, :]
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
                & (t > T_NEAR)
            )
            tt = jnp.where(valid, t, 3.4e38)
            return jnp.minimum(tmin, jnp.min(tt, axis=1, keepdims=True))

        def body_mxu(i, tmin):
            blk = mt_ref[:, pl.ds(i * 4 * pt, 4 * pt)]  # (10, 4pt)
            out = jax.lax.dot_general(
                F, blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (rt, 4pt)
            det = out[:, 0 * pt:1 * pt]
            sh = out[:, 1 * pt:2 * pt]
            qd = out[:, 2 * pt:3 * pt]
            qe2 = out[:, 3 * pt:4 * pt]
            dsafe = jnp.where(jnp.abs(det) < 1e-9, 1e-30, det)
            r0 = pl.reciprocal(dsafe, approx=True)
            r0 = r0 * (2.0 - dsafe * r0)
            u = sh * r0
            v = qd * r0
            t = qe2 * r0
            valid = (
                (jnp.abs(det) >= 1e-9)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > T_NEAR)
            )
            tt = jnp.where(valid, t, 3.4e38)
            return jnp.minimum(tmin, jnp.min(tt, axis=1, keepdims=True))

        body = body_mxu if variant == "mt_mxu" else body_vpu
        tmin = jnp.full((rt, 1), 3.4e38, jnp.float32)
        tmin = jax.lax.fori_loop(0, ITERS, body, tmin)
        o_ref[:, 0:1] = tmin

    return kernel


def run(variant, pt):
    key = jax.random.PRNGKey(0)
    state = jax.random.uniform(key, (TILES * RT, 6), jnp.float32) + 0.1
    npad = ITERS * pt
    prims = jax.random.uniform(key, (12, npad), jnp.float32)
    mt = jax.random.uniform(key, (10, 4 * npad), jnp.float32)

    f = pl.pallas_call(
        _mk_kernel(variant, pt),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((RT, 6), lambda i: (i, 0)),
            pl.BlockSpec((12, npad), lambda i: (0, 0)),
            pl.BlockSpec((10, 4 * npad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RT, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * RT, 1), jnp.float32),
    )
    jf = jax.jit(f)
    np.asarray(jf(state, prims, mt))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(jf(state, prims, mt))
    dt = time.perf_counter() - t0
    per_iter = dt / (TILES * ITERS) * 1e6
    print(
        f"{variant:8s} pt={pt:5d} total={dt * 1e3:8.2f} ms  "
        f"{per_iter:7.3f} us/chunk-iter  "
        f"({per_iter / pt * 1e3:6.2f} ns/prim)",
        flush=True,
    )
    return per_iter


if __name__ == "__main__":
    for v in ("mt_vpu", "mt_mxu"):
        run(v, PT)
