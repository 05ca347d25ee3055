"""Microbenchmark: Mosaic vreg utilization of (rt,1) column vs (1,rt) row
state vectors.

The megakernel carries per-ray state as (rt, 1) columns so it broadcasts
naturally against (1, pt) prim rows — but a (256, 1) f32 array occupies 32
native (8, 128) vregs with ONE live lane each (1/128 utilization), so every
elementwise op on the bounce state costs ~32 VPU issue slots instead of 2.
This kernel chains K dependent elementwise ops on either layout over a grid
of tiles and reports ns/op-per-element to decide whether flipping the tile
orientation (rays on lanes) is worth the refactor.

Run: python benchmarks/micro_layout.py  (real TPU; ~2 small compiles)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 256
K = 4  # chained elementwise ops per iteration
ITERS = 64  # fori iterations inside the kernel (~bounce count)
TILES = 512


def _kernel(x_ref, o_ref, *, k, iters):
    def body(i, v):
        for j in range(k // 4):
            v = v * 1.0000001 + 0.0000001
            v = jnp.maximum(v, 0.0)
            v = v - 0.0000001
            v = jnp.minimum(v, 2.0)
        return v

    o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])


@functools.partial(jax.jit, static_argnames=("shape",))
def run(x, shape):
    spec = pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, k=K, iters=ITERS),
        grid=(TILES,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )(x)


def time_shape(shape):
    x = jnp.ones(shape, jnp.float32)
    np.asarray(run(x, shape))  # compile + warm
    reps = 5
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(x, shape))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    n_ops = K * ITERS * TILES * RT
    return sec, sec / n_ops * 1e9


if __name__ == "__main__":
    col_s, col_ns = time_shape((RT, 1))
    row_s, row_ns = time_shape((1, RT))
    print(f"column (rt,1): {col_s*1e3:8.3f} ms  {col_ns:7.4f} ns/elem-op")
    print(f"row    (1,rt): {row_s*1e3:8.3f} ms  {row_ns:7.4f} ns/elem-op")
    print(f"ratio col/row: {col_s/row_s:.2f}x")
