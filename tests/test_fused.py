"""Fused single-program Stage B (ops/mc_fused.py): bit-exact md5 vs the
reference decoder across the inter tool matrix.

The fused path is the production default (DAV1D_TPU_FUSED=1); the rest
of the suite runs with it disabled (tests/conftest.py) because every
distinct frame geometry compiles a large two-program pipeline (~85s on
host XLA), which would multiply across the hundreds of tiny streams the
other modules decode. This module IS the fused path's oracle coverage:
every case below decodes with the fused programs and must match the
reference binary exactly (SURVEY.md §4 tier 3).
"""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.utils.muxers import Md5Muxer

ORACLE = "/root/repo/oracle-build/dav1d"
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle not built")


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    monkeypatch.setenv("DAV1D_TPU_FUSED", "1")


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)
EVERYTHING = dict(warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
                  inter_intra=1, masked_compound=1, dual_filter=1,
                  ref_frame_mvs=1, use_ref_frame_mvs=1, allow_skip_mode=1)

# curated to cover every fused kernel family (put classes, bilin, warp,
# wedge/seg/jnt compounds, OBMC, WHT lossless, 10-bit, 4:4:4 + 4:2:2
# chroma, multi-tile) while reusing a small set of frame geometries
# (every distinct geometry is a fresh ~85s two-program compile)
CONFIGS = [
    dict(name="base", w=64, h=64, n_frames=6, seed=2),
    dict(name="everything", w=128, h=128, n_frames=6, seed=44,
         gmv_types=lambda fi, rng: [0, 2, 0, 1, 0, 3, 0],
         **EVERYTHING, **PYR),
    dict(name="maskedcomp", w=96, h=96, n_frames=5, seed=27,
         masked_compound=1, inter_intra=1, jnt_comp=1, **PYR),
    dict(name="obmc-warp", w=96, h=96, n_frames=5, seed=41,
         warped_motion=1, switchable_motion_mode=1, **PYR),
    dict(name="multitile", w=128, h=128, n_frames=4, seed=46,
         tile_log2_cols=1, tile_log2_rows=1, ref_frame_mvs=1,
         use_ref_frame_mvs=1, **PYR),
    dict(name="hbd-everything", w=96, h=96, n_frames=5, seed=51, hbd=1,
         **EVERYTHING, **PYR),
    dict(name="lossless-wht", w=96, h=96, n_frames=3, seed=61, qidx=0),
    dict(name="i444", w=96, h=96, n_frames=4, seed=301, layout=3,
         masked_compound=1, jnt_comp=1, **PYR),
    dict(name="i422", w=96, h=96, n_frames=4, seed=311, layout=2,
         masked_compound=1, **PYR),
    dict(name="filters", w=96, h=96, n_frames=4, seed=73,
         lf_levels=(28, 28, 16, 16),
         cdef_params=(2, 1, [9, 25], [5, 13]), lr_types=(1, 2, 2),
         **PYR),
    # regression: an OBMC blend whose padded class window starts past
    # W - win_w (right-edge chroma, 256-wide frame) needs the 7-bit
    # column shift in cur_gather — the 6-bit version read 64 columns
    # left of the job (24 divergent chroma px on this stream shape)
    dict(name="obmc-right-edge", w=256, h=128, n_frames=4, seed=5,
         tile_log2_cols=1, tile_log2_rows=1, warped_motion=1,
         switchable_motion_mode=1, jnt_comp=1, inter_intra=1,
         masked_compound=1, allow_skip_mode=1,
         lf_levels=(32, 32, 20, 20),
         cdef_params=(2, 1, [9, 25], [5, 13]), lr_types=(1, 2, 2)),
]

IDS = [c["name"] for c in CONFIGS]


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_fused_md5(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)

    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
            n += 1
    assert n == cfg.get("n_frames", 4)

    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr, \
        r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
