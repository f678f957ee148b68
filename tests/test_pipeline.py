"""Frame-pipeline (Stage A / Stage B overlap) parity: the threaded
decoder must be bit-identical to the synchronous one across grain,
invisible frames, show_existing, metadata, and error surfacing
(reference analog: 2-pass frame threading, thread_task.c)."""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.api import Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.utils.muxers import Md5Muxer

ORACLE = "/root/repo/oracle-build/dav1d"

FG = dict(seed=77, y_points=[(0, 60), (255, 90)], ar_coeff_lag=1,
          ar_coeffs_y=[5, -3, 2, 1], uv_points=[[(0, 40)], [(0, 50)]],
          ar_coeffs_uv=[[1, 2, 3, 4, 5], [5, 4, 3, 2, 1]],
          uv_mult=[10, -10], uv_luma_mult=[60, 70], uv_offset=[20, -20])


def _decode(data, settings):
    dec = Decoder(settings)
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        dec.send_data(fr.data)
    for pic in dec.pictures():
        mux.write_picture(pic)
        n += 1
    return mux.digest(), n


@pytest.mark.parametrize("cfg", [
    dict(name="filters", n_frames=5, lf_levels=(18, 16, 10, 8),
         cdef_params=(2, 1, [9, 5], [3, 2]), lr_types=(2, 2, 2)),
    dict(name="grain", n_frames=4, film_grain=FG),
    dict(name="superres", n_frames=4, superres_denom=12),
], ids=lambda c: c["name"])
def test_pipeline_parity(cfg):
    cfg = dict(cfg)
    cfg.pop("name")
    data, _ = generate_stream(96, 96, seed=72, **cfg)
    d1, n1 = _decode(data, Settings(n_threads=1))
    d2, n2 = _decode(data, Settings(n_threads=4))
    assert (d1, n1) == (d2, n2)
    if os.path.exists(ORACLE):
        path = "/tmp/pipe_par.ivf"
        open(path, "wb").write(data)
        extra = ["--filmgrain", "1"] if cfg.get("film_grain") else []
        r = subprocess.run([ORACLE, "-q", "-i", path, "--muxer", "md5",
                            "-o", "-", *extra], capture_output=True,
                           timeout=300)
        assert d1 == r.stdout.decode().strip()


def test_pipeline_error_surfaces():
    data, _ = generate_stream(96, 96, seed=73, n_frames=3)
    # truncate the last tile group: the pipelined decoder must raise at
    # resolution, not crash the worker silently
    frames = [fr.data for fr in IvfReader(data)]
    dec = Decoder(Settings(n_threads=2))
    dec.send_data(frames[0])
    dec.send_data(frames[1][: len(frames[1]) // 2])
    with pytest.raises(Exception):
        for _pic in dec.pictures():
            pass
