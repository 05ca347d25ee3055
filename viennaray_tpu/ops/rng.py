"""Counter-based per-ray RNG streams.

The reference hashes (ray index, seed) with ``tea<3>`` into an independent
generator per ray (rayTraceKernel.hpp:120-121, gpu/raygPerRayData.hpp:69-74).
The TPU-native equivalent uses threefry ``jax.random.fold_in``: every ray gets
``fold_in(base_key, global_ray_index)``; per-event sub-streams fold in a
monotonically increasing event counter. This preserves:

- independent streams per ray,
- bitwise determinism for a fixed seed (tests/rngSeed contract),
- shard-count invariance: the global ray index (shard_offset + lane) keys the
  stream, so resharding does not change any ray's randomness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_keys(base_key, global_ray_indices):
    """Vectorized fold_in: one key per ray from its global index."""
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(global_ray_indices)


def event_keys(keys, counter):
    """Derive per-ray sub-keys for an event round.

    keys: (R, 2) uint32 ray keys; counter: scalar int (bounce number, etc.).
    """
    return jax.vmap(lambda k: jax.random.fold_in(k, counter))(keys)


def uniform(key, shape=(), dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype)


def base_key(seed: int, run_number: int = 1):
    """Per-apply() base key: seed perturbed by run number
    (ref: rayTraceKernel.hpp:100 ``config_.runNumber + config_.rngSeed``)."""
    return jax.random.PRNGKey(jnp.uint32(seed + run_number))
