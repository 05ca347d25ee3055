#!/usr/bin/env python
"""Capture a jax.profiler device trace of a trace run and print a per-op
time summary (the round-2 verdict's "profile properly" item).

Works through the axon tunnel (verified on v5e). Usage:

    python benchmarks/profile_trace.py [outdir]

Writes the raw trace (xplane + trace.json.gz, viewable in Perfetto /
TensorBoard) and prints the top ops by accumulated duration.

Round-2 capture of the 18k-disk config (909k rays, 7 batches):
  while.18 (wide stage)             5.06 s   — 92% of device time
  fused_bounce.21 x54               4.99 s   — the megakernel IS the trace
  while.19/20 (compacted tails)     0.39 s
i.e. per-bounce XLA overhead is negligible; the wide-stage megakernel
dominates, and the dead-lane padding it carries motivated the finer
compaction ladder (VIENNARAY_TPU_STAGE_SHRINK=4 default: 137k -> 210k
rays/s on this config).
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    # optional: grid_delta + rays/point (default = the 18k-disk config;
    # `0.25 2000` profiles the flagship bench config)
    grid_delta = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    rays_pp = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    import jax

    import viennaray_tpu as vrt
    from viennaray_tpu.io import fixtures

    pts, nrm = fixtures.create_trench_grid_3d(
        grid_delta=grid_delta, extent=5.0, trench_width=4.0, trench_depth=4.0
    )
    t = vrt.TraceDisk(dim=3)
    t.set_geometry(pts, nrm, grid_delta)
    t.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    t.set_particle_type(vrt.DiffuseParticle(0.1, "flux"))
    t.set_number_of_rays_per_point(rays_pp)
    t.set_rng_seed(42)
    t.apply()  # warm (compile outside the trace)
    with jax.profiler.trace(outdir):
        flux = t.apply()
        np.asarray(flux)  # forced fetch = sync inside the trace window

    traces = sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            agg[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    print(f"trace: {traces[-1]}")
    for name, dur in agg.most_common(20):
        print(f"{dur / 1e6:9.3f}s  x{cnt[name]:<6} {name[:90]}")


if __name__ == "__main__":
    main()
