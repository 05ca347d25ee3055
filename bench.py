#!/usr/bin/env python
"""Flagship benchmark: 3D disk trench flux trace on real TPU hardware.

Config mirrors the reference's examples/disk3D (trench geometry, diffuse
particle sticking=0.1, periodic boundaries, 2000 rays/point,
examples/disk3D/disk3D.cpp:33-52) — the reference's own headline timing
printout ("Tracing time: X s").

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": ratio}
vs_baseline compares against benchmarks/baseline_local.json (recorded on
first run; the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import viennaray_tpu as vrt
    from viennaray_tpu.io import fixtures

    rays_per_point = int(os.environ.get("BENCH_RAYS_PER_POINT", 2000))
    grid_delta = float(os.environ.get("BENCH_GRID_DELTA", 0.25))

    pts, nrm = fixtures.create_trench_grid_3d(
        grid_delta=grid_delta, extent=5.0, trench_width=4.0, trench_depth=4.0
    )

    tracer = vrt.TraceDisk(dim=3)
    tracer.set_geometry(pts, nrm, grid_delta)
    tracer.set_boundary_conditions([vrt.BoundaryCondition.PERIODIC] * 3)
    tracer.set_particle_type(vrt.DiffuseParticle(0.1, "flux"))
    tracer.set_number_of_rays_per_point(rays_per_point)
    tracer.set_rng_seed(42)

    # warmup: identical static config (changing the ray-count MODE changes the
    # jit key and would push compilation into the timed run)
    tracer.apply()

    # median of 3 timed applies: single-run tunnel variance is +-10%
    # (NOTES.md), which produced the round-2 driver-vs-builder discrepancy
    # (501.8k vs 576.5k) — the median is the reported number
    reps = int(os.environ.get("BENCH_REPS", 3))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        flux = tracer.apply()
        np.asarray(flux)  # forced host fetch — block_until_ready does not
        # synchronize through the axon tunnel (BASELINE.md timing discipline)
        times.append(time.perf_counter() - t0)
    elapsed = float(np.median(times))
    info = tracer.get_ray_trace_info()
    rays_per_s = info.num_rays / elapsed

    # physics certification (VERDICT r3 item 2): normalized flux must match
    # the CPU-generated golden (benchmarks/make_bench_golden.py — the
    # UNFUSED XLA path with an independent RNG schedule) within a
    # Monte-Carlo-sized rel-L2 tolerance. Two independent 2000-rays/pt runs
    # differ by ~1-2% rel-L2; 5% catches any real physics break while
    # leaving MC-noise headroom. ok = finite AND positive AND parity.
    norm = np.asarray(tracer.normalize_flux(flux), np.float64)
    golden_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "golden",
    )
    # two independent goldens (VERDICT r4 item 4): the repo's own unfused
    # CPU path (independent RNG schedule) AND the scalar C++ oracle
    # (independent codebase AND RNG — tests/oracle_ref.cpp), so a shared
    # semantics misreading between this repo's paths cannot pass
    parity = parity_oracle = None
    if not os.environ.get("BENCH_SKIP_GOLDEN"):
        p = os.path.join(golden_dir, "bench_disk3d.npy")
        if os.path.exists(p):
            g = np.asarray(np.load(p), np.float64)
            parity = float(
                np.linalg.norm(norm - g) / max(np.linalg.norm(g), 1e-12)
            )
        p = os.path.join(golden_dir, "bench_disk3d_oracle.npy")
        if os.path.exists(p):
            g = np.asarray(np.load(p), np.float64)
            parity_oracle = float(
                np.linalg.norm(norm - g) / max(np.linalg.norm(g), 1e-12)
            )
    ok = bool(
        np.isfinite(norm).all()
        and norm.max() > 0
        and (parity is None or parity < 0.05)
        and (parity_oracle is None or parity_oracle < 0.05)
    )

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "baseline_local.json",
    )
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("rays_per_s"):
            vs_baseline = rays_per_s / base["rays_per_s"]
    else:
        os.makedirs(os.path.dirname(baseline_path), exist_ok=True)
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "rays_per_s": rays_per_s,
                    "num_rays": info.num_rays,
                    "num_points": len(pts),
                    "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
                },
                f,
                indent=2,
            )

    fingerprint = (
        f"median_of={reps} runs={['%.2f' % t for t in times]}s "
        f"batch={tracer._ray_batch_size} "
        f"ordered={os.environ.get('VIENNARAY_TPU_ORDERED', '1')} "
        f"rt={os.environ.get('VIENNARAY_TPU_RT', 'auto')} "
        f"flux_sum={float(np.asarray(flux, np.float64).sum()):.6g} "
        f"golden_rel_l2={'%.4f' % parity if parity is not None else 'n/a'} "
        f"oracle_rel_l2="
        f"{'%.4f' % parity_oracle if parity_oracle is not None else 'n/a'}"
    )
    print(
        json.dumps(
            {
                "metric": "rays/s single-chip (3D disk trench, sticking 0.1, "
                f"{rays_per_point} rays/pt, {len(pts)} disks, ok={ok}, "
                f"{fingerprint})",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
