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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

ORACLE = "/root/repo/oracle-build/dav1d"


def oracle_available() -> bool:
    return os.path.exists(ORACLE)
