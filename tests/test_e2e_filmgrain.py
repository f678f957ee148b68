"""End-to-end film grain validation vs the reference (with grain forced
on; the reference CLI disables grain for the md5 muxer by default).
Covers AR lags 1-3, chroma-from-luma, uv mults/offsets, overlap,
restricted range, 10-bit, odd sizes, inter streams."""
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

FG_FULL = dict(seed=1234, y_points=[(0, 64), (128, 96), (255, 48)],
               ar_coeff_lag=2,
               ar_coeffs_y=[3, -2, 5, 1, -4, 2, 0, 6, -1, 2, 4, -3],
               scaling_shift=9,
               uv_points=[[(0, 32), (255, 80)], [(16, 48), (200, 64)]],
               ar_coeffs_uv=[[1, -1, 2, 0, 3, -2, 1, 0, 2, -1, 0, 1, 5],
                             [0, 2, -3, 1, 0, 4, -1, 2, 0, 1, -2, 3, 7]],
               uv_mult=[20, -10], uv_luma_mult=[60, 80],
               uv_offset=[30, -40], overlap_flag=1,
               clip_to_restricted_range=0)
FG_CSFL = dict(seed=999, y_points=[(0, 40), (255, 120)], ar_coeff_lag=1,
               ar_coeffs_y=[10, -5, 3, 2], chroma_scaling_from_luma=1,
               ar_coeffs_uv=[[1, 2, 3, 4, 5], [5, 4, 3, 2, 1]],
               overlap_flag=0, clip_to_restricted_range=1,
               grain_scale_shift=1)
FG_LAG3 = dict(seed=5, y_points=[(0, 80), (255, 100)], ar_coeff_lag=3,
               ar_coeffs_y=list(range(-12, 12)), overlap_flag=1,
               uv_points=[[(0, 60)], [(0, 50)]],
               ar_coeffs_uv=[list(range(-12, 13)),
                             list(range(12, -13, -1))],
               uv_mult=[5, -5], uv_luma_mult=[70, 50],
               uv_offset=[10, -10])

CONFIGS = [
    dict(name="full", w=96, h=96, qidx=120, seed=30, n_frames=2,
         film_grain=FG_FULL, intra=True),
    dict(name="chroma-from-luma", w=96, h=96, qidx=120, seed=31,
         n_frames=2, film_grain=FG_CSFL, intra=True),
    dict(name="inter", w=96, h=96, n_frames=3, seed=95,
         film_grain=FG_FULL, lf_levels=(20, 20, 14, 14), intra=False),
    dict(name="hbd", w=96, h=96, qidx=120, seed=32, n_frames=2, hbd=1,
         film_grain=FG_FULL, intra=True),
    dict(name="odd-size", w=70, h=50, qidx=120, seed=33, n_frames=2,
         film_grain=FG_FULL, intra=True),
    dict(name="lag3", w=96, h=96, qidx=150, seed=34, n_frames=2,
         film_grain=FG_LAG3, intra=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_film_grain(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    intra = cfg.pop("intra")
    w, h = cfg.pop("w"), cfg.pop("h")
    gen = generate_intra_stream if intra else generate_stream
    data, _ = gen(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
            n += 1
    assert n == cfg["n_frames"]
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-", "--filmgrain", "1"],
                       capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
