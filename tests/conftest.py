"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run anywhere (SURVEY.md §4: same-output invariance across
device configs is the multi-chip test strategy)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the axon TPU plugin ignores JAX_PLATFORMS; pin device kernels to host
os.environ.setdefault("DAV1D_TPU_DEVICE", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

ORACLE = "/root/repo/oracle-build/dav1d"


def oracle_available() -> bool:
    return os.path.exists(ORACLE)
