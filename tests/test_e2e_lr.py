"""End-to-end loop-restoration validation: decoded plane md5 vs the
reference on streams with LR enabled (Wiener / SGR / switchable),
composed with deblock + CDEF. Covers unit-size shifts, uv shift,
10-bit, sb128, odd sizes."""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream, generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.utils.muxers import Md5Muxer

ORACLE = "/root/repo/oracle-build/dav1d"
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle not built")

# lr_types bitstream values: 1=switchable, 2=wiener, 3=sgrproj
INTRA = [
    dict(name="wiener", w=96, h=96, qidx=120, seed=20, n_frames=2,
         lr_types=(2, 2, 2)),
    dict(name="sgr", w=96, h=96, qidx=120, seed=21, n_frames=2,
         lr_types=(3, 3, 3)),
    dict(name="switchable", w=128, h=96, qidx=150, seed=22, n_frames=2,
         lr_types=(1, 1, 1)),
    dict(name="all-filters", w=128, h=96, qidx=120, seed=23, n_frames=2,
         lr_types=(1, 2, 3), lf_levels=(24, 20, 18, 16),
         cdef_params=(2, 1, [9, 25], [5, 13])),
    dict(name="unit-shift", w=200, h=140, qidx=120, seed=24, n_frames=2,
         lr_types=(1, 1, 1), lr_unit_shift=1),
    dict(name="uv-shift", w=200, h=140, qidx=120, seed=25, n_frames=2,
         lr_types=(2, 3, 3), lr_uv_shift=1),
]

INTER = [
    dict(name="base", w=96, h=96, n_frames=4, seed=90,
         lr_types=(1, 1, 1), lf_levels=(20, 20, 14, 14)),
    dict(name="odd-size", w=70, h=50, n_frames=3, seed=91,
         lr_types=(1, 1, 1)),
    dict(name="hbd", w=96, h=96, n_frames=3, seed=92, hbd=1,
         lr_types=(1, 1, 1), lf_levels=(18, 18, 12, 12)),
    dict(name="sb128", w=192, h=128, n_frames=3, seed=93, sb128=1,
         lr_types=(1, 1, 1)),
    dict(name="big-all-filters", w=320, h=180, n_frames=3, seed=94,
         lr_types=(1, 1, 1), lf_levels=(24, 20, 18, 16),
         cdef_params=(2, 1, [9, 25], [5, 13])),
]


def _check(data, tmp_path, n_expected):
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
            n += 1
    assert n == n_expected
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()


@pytest.mark.parametrize("cfg", INTRA, ids=[c["name"] for c in INTRA])
def test_lr_intra(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_intra_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])


@pytest.mark.parametrize("cfg", INTER, ids=[c["name"] for c in INTER])
def test_lr_inter(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])
