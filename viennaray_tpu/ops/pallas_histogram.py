"""Pallas weighted-histogram kernel (flux accumulation).

The trace loop's flux step is a weighted histogram: scatter-add E deposit
weights into n_prims bins (ref: the per-thread ``surfaceCollision`` flux
adds merged by SUM, rayTraceKernel.hpp:343-407 / atomicAdd on GPU,
Particle.cuh:16-23). XLA's options on TPU are both poor:
- ``.at[].add`` scatter: ~9.4 ms for 786k entries (serialized windows);
- one-hot matmul: fast on the MXU but materializes the (E, n_prims)
  one-hot in HBM — bandwidth-bound above a few thousand bins.

This kernel factorizes bin = hi*128 + lo and, per tile of ``ec`` entries,
builds the two small one-hots (ec, n_hi) and (ec, 128) **in VMEM** and
contracts them on the MXU: flux2d[h, l] = sum_e w_e 1[hi_e=h] 1[lo_e=l].
Nothing E-sized ever touches HBM except the (ids, w) inputs themselves.

Accuracy: the one-hots are exact in bf16 (entries are 0/1) and the weight
is folded in as a bf16 high + bf16 residual pair (two MXU passes), giving
~f32 fidelity; accumulation across tiles is f32. Deterministic: tiles
reduce in fixed grid order on a single core.

FLOP cost is the same 2*E*n_prims as the one-hot matmul, but in bf16 on
the MXU with zero one-hot HBM traffic: ~0.3 ms at E=1.5M, n=18k
(vs 9.4 ms scatter). Practical ceiling n_prims <= 65536 (VMEM for the
(ec, n_hi) tile); larger geometries fall back to scatter in the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LO = 128  # lane-width factor of the bin split


def _hist_kernel(ids_ref, w_ref, out_ref, *, n_hi, ec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (ec, 1) int32
    w = w_ref[:]  # (ec, 1) f32
    hi = ids // N_LO
    lo = ids - hi * N_LO

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (ec, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (ec, N_LO), 1)
    # 0/1 one-hots as bf16 via multiply (mosaic dislikes broadcast selects)
    eq_hi = (hi == iota_hi).astype(jnp.bfloat16)  # (ec, n_hi)
    oh_lo = (lo == iota_lo).astype(jnp.bfloat16)

    # bf16 x 2 weight split: w = w_hi + w_res to ~f32 fidelity
    w_hi = w.astype(jnp.bfloat16)
    w_res = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    a_hi = eq_hi * w_hi
    a_res = eq_hi * w_res

    dn = (((0,), (0,)), ((), ()))  # contract over entries
    acc = jax.lax.dot_general(
        a_hi, oh_lo, dn, preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        a_res, oh_lo, dn, preferred_element_type=jnp.float32
    )
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("n_prims", "ec", "interpret"))
def flux_histogram(ids, w, n_prims, ec=2048, interpret=False):
    """sum_e w[e] into bin ids[e]; returns (n_prims,) f32.

    ids (E,) int32 in [0, n_prims); w (E,) f32. E is padded internally.
    """
    E = ids.shape[0]
    # lane-align the hi factor (Mosaic needs 128-multiple trailing dims)
    n_hi = -(-n_prims // N_LO)
    n_hi = -(-n_hi // 128) * 128
    ec = min(ec, max(512, 1 << (E - 1).bit_length()))
    pad = (-E) % ec
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    Ep = E + pad

    out = pl.pallas_call(
        functools.partial(_hist_kernel, n_hi=n_hi, ec=ec),
        grid=(Ep // ec,),
        in_specs=[
            pl.BlockSpec((ec, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_hi, N_LO), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_hi, N_LO), jnp.float32),
        interpret=interpret,
    )(ids.reshape(-1, 1), w.reshape(-1, 1))
    return out.reshape(-1)[:n_prims]
