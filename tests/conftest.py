"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run anywhere (SURVEY.md §4: same-output invariance across
device configs is the multi-chip test strategy)."""
import os
import sys

# hard override (not setdefault): the driver environment exports
# JAX_PLATFORMS=axon, and a wedged tunnel would hang every test
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin ignores JAX_PLATFORMS; pin device kernels to host
os.environ["DAV1D_TPU_DEVICE"] = "cpu"
# tests never use the tunneled TPU, and a wedged tunnel hangs plugin
# discovery for EVERY jax import — unregister the plugin path entirely
# so the suite is immune to tunnel state (observed mid-round)
if "jax" not in sys.modules:
    sys.path[:] = [p for p in sys.path if "axon" not in p]
    pp = os.environ.get("PYTHONPATH", "")
    if "axon" in pp:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in pp.split(os.pathsep) if "axon" not in p)
# the fused single-program Stage B (production default) compiles a
# large two-program pipeline per frame geometry (~85s on host XLA) —
# prohibitive across the suite's hundreds of tiny streams. The broad
# suite exercises the per-group launch path; tests/test_fused.py runs
# the fused path against the oracle across the inter tool matrix.
os.environ.setdefault("DAV1D_TPU_FUSED", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

ORACLE = "/root/repo/oracle-build/dav1d"


def oracle_available() -> bool:
    return os.path.exists(ORACLE)


# --- JIT-mapping guard -----------------------------------------------------
# Every XLA:CPU executable is loaded as an in-memory JIT dylib costing
# ~17 VM mappings that are only released by jax.clear_caches(). A long
# pytest session compiles thousands of programs (each e2e stream shape
# instantiates its own whole-plane filter programs), and once the
# process crosses vm.max_map_count (default 65530) the next LLVM
# mmap fails and jaxlib segfaults inside backend_compile_and_load
# (observed reproducibly at ~10 e2e tests). Dropping the caches when
# the map count gets high keeps the suite immune at the cost of
# recompiling shared programs.

def _n_maps():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


_MAPS_LIMIT = int(os.environ.get("DAV1D_TPU_TEST_MAPS_LIMIT", "30000"))

import pytest


@pytest.fixture(autouse=True)
def _jax_map_guard():
    yield
    if "jax" in sys.modules and _n_maps() > _MAPS_LIMIT:
        import jax
        jax.clear_caches()
