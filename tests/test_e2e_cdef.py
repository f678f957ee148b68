"""End-to-end CDEF validation: decoded plane md5 vs the reference on
streams with CDEF (and optionally deblock) enabled. Covers primary/
secondary strengths, strength tables (n_bits 0-3), damping range,
direction search, skip masking, 10-bit, sb128, tiles, odd sizes."""
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


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)

INTRA = [
    dict(name="basic", w=96, h=96, qidx=120, seed=11, n_frames=2,
         cdef_params=(2, 0, [9], [5])),
    dict(name="with-deblock", w=96, h=96, qidx=120, seed=12, n_frames=2,
         cdef_params=(1, 1, [9, 20], [5, 13]),
         lf_levels=(24, 20, 18, 16)),
    dict(name="max-strengths", w=128, h=96, qidx=200, seed=13, n_frames=2,
         cdef_params=(3, 3, list(range(2, 58, 7)), list(range(3, 59, 7)))),
    dict(name="sec-only", w=96, h=96, qidx=150, seed=14, n_frames=2,
         cdef_params=(2, 0, [2], [1])),
]

INTER = [
    dict(name="basic", w=96, h=96, n_frames=4, seed=80,
         cdef_params=(2, 2, [9, 0, 33, 12], [5, 0, 17, 9]),
         lf_levels=(20, 20, 14, 14)),
    dict(name="hbd", w=96, h=96, n_frames=4, seed=81, hbd=1,
         cdef_params=(2, 1, [13, 29], [9, 21]),
         lf_levels=(18, 18, 12, 12)),
    dict(name="odd-size", w=70, h=50, n_frames=4, seed=82,
         cdef_params=(2, 1, [9, 25], [5, 13])),
    dict(name="sb128", w=128, h=128, n_frames=4, seed=83, sb128=1,
         cdef_params=(0, 2, [9, 17, 25, 33], [5, 9, 13, 17]),
         lf_levels=(22, 22, 16, 16)),
    dict(name="pyramid", w=96, h=96, n_frames=5, seed=84,
         cdef_params=(2, 1, [9, 41], [5, 29]),
         lf_levels=(24, 20, 18, 16), **PYR),
    dict(name="tiles", w=128, h=128, n_frames=4, seed=85,
         tile_log2_cols=1, tile_log2_rows=1,
         cdef_params=(2, 1, [9, 25], [5, 13]),
         lf_levels=(20, 20, 20, 20), **PYR),
    dict(name="big", w=320, h=180, n_frames=3, seed=86,
         cdef_params=(2, 2, [9, 0, 33, 12], [5, 0, 17, 9]),
         lf_levels=(24, 28, 18, 16)),
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
def test_cdef_intra(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_intra_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])


@pytest.mark.parametrize("cfg", INTER, ids=[c["name"] for c in INTER])
def test_cdef_inter(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])
