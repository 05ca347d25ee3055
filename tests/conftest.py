import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. NOTE: in this environment the JAX_PLATFORMS env var is
# not honored (a TPU platform plugin claims the backend first), so we must use
# jax.config.update before any backend is initialized.

# CPU compiles are cheap; keep the test processes OUT of the shared
# persistent compilation cache — concurrent writers (a TPU bench + pytest)
# have corrupted entries, and a corrupted zstd entry ABORTS the reader
# (observed: jax compilation_cache get/put segfaults mid-suite).
os.environ.setdefault("VIENNARAY_TPU_NO_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
