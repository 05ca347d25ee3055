"""Worker for the 2-process multi-host test (tests/test_distributed.py).

Each process owns ONE virtual CPU device; ``initialize_distributed`` (the
jax.distributed bootstrap, SURVEY §2.9/§5.8's net-new communication
backend) joins them into a single 2-device global mesh. The worker runs
``trace_sharded`` over the global ``rays`` mesh — cross-process psum over
the distributed CPU backend — and process 0 writes the flux out.

Usage: python distributed_worker.py <proc_id> <n_procs> <coord_addr> <out>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    proc_id = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    coord = sys.argv[3]
    out = sys.argv[4]

    from viennaray_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=coord, num_processes=n_procs, process_id=proc_id
    )
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == n_procs  # global device view
    assert len(jax.local_devices()) == 1

    import numpy as np

    from viennaray_tpu.parallel.mesh import make_ray_mesh, trace_sharded
    from test_parallel import _setup

    geometry, source, particle, bbox, config = _setup(rays_per_point=50)
    mesh = make_ray_mesh()  # spans both processes' devices
    total = config.total_rays(geometry.num_primitives)
    flux, totals = trace_sharded(
        geometry, source, particle, bbox, config, "disk",
        jax.random.PRNGKey(config.rng_seed), total, mesh,
    )
    if proc_id == 0:
        np.save(out, np.asarray(flux, np.float64))
        np.save(out + ".counters.npy", totals)
    # all processes reach the barrier before exit so the psum completes
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("trace_done")


if __name__ == "__main__":
    main()
