"""Packed HBD output-fetch roundtrip: queue_plane_fetch's bit-packed
10/12-bit wire format (low byte + packed high bits) must materialize
back into exactly the uint16 host pixels a plain cast would produce.
The e2e coverage rides tests/test_device_backend.py's hbd config (pack
is the default for bpc>8); this is the focused unit tier."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from dav1d_tpu.ops import backend


def _roundtrip(bpc, shape=(64, 128)):
    jnp = backend.jax_mod().numpy
    rng = np.random.default_rng(bpc)
    vals = rng.integers(0, 1 << bpc, size=(3,) + shape).astype(np.int32)
    host = [np.zeros(shape, np.uint16) for _ in range(3)]
    dev = [jnp.asarray(v) for v in vals]
    pending = backend.queue_plane_fetch(dev, host, bpc, jnp)
    assert all(isinstance(e, tuple) for e in pending)
    for hp, ent in zip(host, pending):
        backend._materialize_fetch(hp, ent)
    for hp, v in zip(host, vals):
        np.testing.assert_array_equal(hp, v.astype(np.uint16))


def test_pack10_roundtrip():
    _roundtrip(10)


def test_pack12_roundtrip():
    _roundtrip(12)


def test_pack_disabled_plain_cast(monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_PACK_FETCH", "0")
    jnp = backend.jax_mod().numpy
    vals = np.arange(64 * 128, dtype=np.int32).reshape(64, 128) & 1023
    host = [np.zeros((64, 128), np.uint16)]
    pending = backend.queue_plane_fetch([jnp.asarray(vals)], host, 10,
                                        jnp)
    assert not isinstance(pending[0], tuple)
    backend._materialize_fetch(host[0], pending[0])
    np.testing.assert_array_equal(host[0], vals.astype(np.uint16))


def test_pack8_stays_plain():
    jnp = backend.jax_mod().numpy
    vals = (np.arange(32 * 128, dtype=np.int32).reshape(32, 128)) & 255
    host = [np.zeros((32, 128), np.uint8)]
    pending = backend.queue_plane_fetch([jnp.asarray(vals)], host, 8,
                                        jnp)
    assert not isinstance(pending[0], tuple)
    backend._materialize_fetch(host[0], pending[0])
    np.testing.assert_array_equal(host[0], vals.astype(np.uint8))
