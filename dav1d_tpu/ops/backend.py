"""Device backend plumbing for the Stage-B tensor program.

The production decode path runs every pixel kernel as a jitted XLA/Pallas
program (TPU when available); the vectorized-numpy *_ref modules remain
the checkasm-style golden references (SURVEY.md §4 tier 1) and the
fallback when the backend is forced off.

Backend selection:
  DAV1D_TPU_BACKEND=numpy  -> force the golden host path everywhere
  (default)                -> device path
  DAV1D_TPU_DEVICE=<name>  -> pin jax work to a platform (tests use cpu)
"""
from __future__ import annotations

import os
from functools import lru_cache

_JAX = None


def device_enabled() -> bool:
    return os.environ.get("DAV1D_TPU_BACKEND", "device") not in (
        "numpy", "ref", "off")


def jax_mod():
    """Import jax lazily (keeps pure-host uses import-light) and enable
    64-bit integers (SGR intermediates exceed int32; reference
    looprestoration_tmpl.c uses 64-bit accumulation on the same path).
    A persistent compilation cache amortizes jit compiles across
    processes (test runs, CLI invocations, bench)."""
    global _JAX
    if _JAX is None:
        import jax
        jax.config.update("jax_enable_x64", True)
        plat = os.environ.get("DAV1D_TPU_DEVICE", "default")
        # persistent cache only for the (slow-compiling, tunnel-remote)
        # TPU. On CPU the cache write path has been observed to
        # SEGFAULT (jax compilation_cache put_executable_and_time /
        # zstd) under concurrent writers, and cache entries AOT-built
        # on a different microarch load with feature-mismatch warnings
        # ("could lead to SIGILL") — recompiling is cheaper than
        # crashing.
        cache = os.environ.get("DAV1D_TPU_JIT_CACHE",
                               "" if plat == "cpu" else
                               f"/tmp/dav1d_tpu_jit_cache_{plat}")
        if cache:
            try:
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs",
                    float(os.environ.get("DAV1D_TPU_JIT_CACHE_MIN",
                                         "0.5")))
            except Exception:
                pass
        _JAX = jax
    return _JAX


@lru_cache(maxsize=None)
def _pinned_device(name: str):
    jax = jax_mod()
    try:
        return jax.devices(name)[0]
    except RuntimeError:
        return None


def default_device():
    """Honor DAV1D_TPU_DEVICE (tests pin to cpu; the axon TPU plugin
    ignores JAX_PLATFORMS so an explicit pin is needed there)."""
    name = os.environ.get("DAV1D_TPU_DEVICE")
    if name:
        return _pinned_device(name)
    return None


def fetch_all(arrs):
    """Device->host for a list of arrays with overlapped transfers.

    The TPU sits behind a tunnel with ~30ms per-transfer latency;
    sequential np.asarray calls pay it serially. copy_to_host_async
    queues every transfer before the first blocking read, so the round
    trips pipeline (measured on 3 picture planes: 213ms sequential ->
    140ms async+read; a thread pool measures the same but showed a
    pathological first-dispatch stall on the tunnel)."""
    import numpy as np
    arrs = list(arrs)
    if not arrs:
        return []
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return [np.asarray(a) for a in arrs]


def pack_fetch_enabled(bpc: int) -> bool:
    """HBD output planes cross the tunnel bit-packed (10-bit: low byte
    + four 2-bit highs per byte = 1.25 B/px; 12-bit: low byte + two
    4-bit highs per byte = 1.5 B/px) instead of as uint16 — the output
    download is the single largest per-frame transfer at 4K 10-bit
    (~25 MB -> ~15.6 MB on a ~30-65 MB/s link). Plane widths are
    128-aligned (picture.py plane_shapes) so the 4/2 grouping is exact.
    DAV1D_TPU_PACK_FETCH=0 restores plain uint16 downloads."""
    return bpc > 8 and os.environ.get("DAV1D_TPU_PACK_FETCH", "1") != "0"


def queue_plane_fetch(planes_dev, host_planes, bpc, jnp):
    """Cast/pack device int planes for download and queue the async
    device->host copies. Returns the pending_fetch payload: one entry
    per plane — either a device array in the host dtype, or a tuple
    ("p10"|"p12", lo_u8, hi_u8) for packed HBD planes."""
    pending = []
    packed = pack_fetch_enabled(bpc)
    for hp, pl in zip(host_planes, planes_dev):
        if not packed:
            pending.append(pl.astype(hp.dtype))
            continue
        lo = (pl & 0xFF).astype(jnp.uint8)
        hi = (pl >> 8).astype(jnp.uint8)
        H, W = hp.shape
        if bpc == 10:
            h = hi.reshape(H, W // 4, 4)
            hi = (h[..., 0] | (h[..., 1] << 2) | (h[..., 2] << 4)
                  | (h[..., 3] << 6))
            pending.append(("p10", lo, hi))
        else:
            h = hi.reshape(H, W // 2, 2)
            hi = h[..., 0] | (h[..., 1] << 4)
            pending.append(("p12", lo, hi))
    for ent in pending:
        arrs = ent[1:] if isinstance(ent, tuple) else (ent,)
        for a in arrs:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
    return pending


def _materialize_fetch(hp, ent):
    import numpy as np
    if not isinstance(ent, tuple):
        hp[:] = np.asarray(ent)
        return
    mode, lo, hi = ent
    lo = np.asarray(lo).astype(np.uint16)
    hi = np.asarray(hi)
    H, W = hp.shape
    if mode == "p10":
        bits = ((hi[:, :, None] >> np.array([0, 2, 4, 6], np.uint8))
                & 3).astype(np.uint16)
    else:
        bits = ((hi[:, :, None] >> np.array([0, 4], np.uint8))
                & 15).astype(np.uint16)
    hp[:] = lo | (bits.reshape(H, W) << 8)


def fetch_pic_host(pic):
    """Materialize a device-resident picture back into its host planes.
    Prefers the in-flight async transfer (Picture.pending_fetch, queued
    by the filter chain right after dispatch); falls back to a fresh
    cast+download of Picture.dev."""
    pending = getattr(pic, "pending_fetch", None)
    if pending is not None:
        for hp, ent in zip(pic.planes, pending):
            _materialize_fetch(hp, ent)
        pic.pending_fetch = None
        pic.host_stale = False
        return
    if getattr(pic, "dev", None) is None or not pic.host_stale:
        pic.host_stale = False
        return
    jnp = jax_mod().numpy
    pending = queue_plane_fetch(pic.dev, pic.planes, pic.bpc, jnp)
    for hp, ent in zip(pic.planes, pending):
        _materialize_fetch(hp, ent)
    pic.host_stale = False


_MAPS_LIMIT = int(os.environ.get("DAV1D_TPU_MAPS_LIMIT", "55000"))


_GUARD_TICK = 0


def guard_jit_maps():
    """Segfault guard for long decodes on XLA:CPU (the TPU-wedged
    fallback): every compiled CPU executable is an in-memory JIT dylib
    costing ~17 VM mappings, released only by jax.clear_caches();
    crossing vm.max_map_count (default 65530) makes the next compile's
    mmap fail and jaxlib segfault. Called at frame boundaries; no-ops
    unless jax is loaded AND running on the CPU backend (the TPU path
    doesn't JIT-map per executable), and scans /proc/self/maps only
    every 16th frame (the scan is ~65k lines at the limit)."""
    global _GUARD_TICK
    if _JAX is None:
        return
    try:
        if _JAX.default_backend() != "cpu" and \
                os.environ.get("DAV1D_TPU_DEVICE") != "cpu":
            return
    except Exception:
        return
    _GUARD_TICK += 1
    if _GUARD_TICK % 16:
        return
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAPS_LIMIT:
        _JAX.clear_caches()


class device_scope:
    """Context manager: run jax ops on the configured device."""

    def __enter__(self):
        dev = default_device()
        self._ctx = None
        if dev is not None:
            jax = jax_mod()
            self._ctx = jax.default_device(dev)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return False
