"""DAV1D_TPU_BACKEND=jax parity: the jitted XLA itx kernels
(ops/itx.py) must produce bit-identical decodes to the numpy host
path. Pinned to host XLA (DAV1D_TPU_DEVICE=cpu) so the test is
hermetic; uses a small stream to bound compile time."""
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.utils.muxers import Md5Muxer


def _decode(data):
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    for fr in IvfReader(data):
        for _p, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
    return mux.digest()


@pytest.mark.parametrize("hbd", [0, 1])
def test_jax_backend_parity(hbd, monkeypatch):
    pytest.importorskip("jax")
    data, _ = generate_stream(64, 64, seed=5 + hbd, n_frames=2, hbd=hbd)
    base = _decode(data)
    monkeypatch.setenv("DAV1D_TPU_BACKEND", "jax")
    monkeypatch.setenv("DAV1D_TPU_DEVICE", "cpu")
    assert _decode(data) == base
