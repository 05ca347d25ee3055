import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. NOTE: in this environment the JAX_PLATFORMS env var is
# not honored (a TPU platform plugin claims the backend first), so we must use
# jax.config.update before any backend is initialized.

# --- vm.max_map_count guard (root cause of the round-2 mid-suite SEGV) ----
# Every XLA:CPU executable JIT-loads several anonymous mappings that are NOT
# released while the jit cache holds the executable. The full suite compiles
# ~1500 executables; at the Linux default vm.max_map_count=65530 the process
# hits the per-process mapping ceiling ~90 tests in, the next mmap inside
# backend_compile_and_load fails, and LLVM's JIT memory manager segfaults
# (reproduced deterministically: maps==65530 at crash, 2/2 runs; passes at
# a raised limit). Raise the limit when we can; otherwise the CI fallback is
# per-file pytest shards (see .github/workflows/test.yml).
def _raise_map_count(target=262144):
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            cur = int(f.read().strip())
        if cur < target:
            with open(path, "w") as f:
                f.write(str(target))
    except (OSError, PermissionError, ValueError):
        pass  # not root / no procfs: CI runs per-file shards instead


_raise_map_count()

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
