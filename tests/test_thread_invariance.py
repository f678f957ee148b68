"""Threaded-config invariance matrix: output md5 must not depend on
n_threads / max_frame_delay (the reference's CI sweeps --threads and
--framedelay the same way, .gitlab-ci.yml:674-696, as its substitute
for multi-node determinism tests)."""
import pytest

from dav1d_tpu.api import Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.utils.muxers import Md5Muxer
from tools.streamgen.gen import generate_stream


def _decode_md5(data, n_threads, max_frame_delay=0):
    dec = Decoder(Settings(n_threads=n_threads,
                           max_frame_delay=max_frame_delay))
    mux = Md5Muxer()
    for fr in IvfReader(data):
        dec.send_data(fr.data)
    for pic in dec.pictures():
        mux.write_picture(pic)
    dec.close()
    return mux._md5.hexdigest()


@pytest.fixture(scope="module")
def tiled_stream():
    data, _ = generate_stream(192, 128, n_frames=5, seed=21,
                              tile_log2_cols=1, tile_log2_rows=1)
    return data


@pytest.mark.parametrize("n_threads", [1, 2, 4])
@pytest.mark.parametrize("delay", [0, 3])
def test_md5_invariant_across_thread_configs(tiled_stream, n_threads,
                                             delay):
    base = _decode_md5(tiled_stream, 1, 0)
    assert _decode_md5(tiled_stream, n_threads, delay) == base
