"""End-to-end inter decode: bit-exact md5 of all decoded planes vs the
reference decoder on self-generated streams (SURVEY.md §4 tier 3).

Covers the full inter reconstruction path: 8-tap/bilin MC with
emu-edge, compound (avg / distance-weighted / wedge / segmentation
masks), OBMC, warped + global motion, interintra, sub-8x8 chroma,
temporal MVs, multi-tile, 8- and 10-bit.
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


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)
EVERYTHING = dict(warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
                  inter_intra=1, masked_compound=1, dual_filter=1,
                  ref_frame_mvs=1, use_ref_frame_mvs=1, allow_skip_mode=1)

CONFIGS = [
    dict(name="base", w=64, h=64, n_frames=6, seed=2),
    dict(name="odd-size", w=70, h=50, n_frames=4, seed=8),
    dict(name="q60", w=192, h=128, n_frames=4, seed=4, qidx=60),
    dict(name="pyramid", w=96, h=96, n_frames=5, seed=21, **PYR),
    dict(name="skipmode", w=96, h=96, n_frames=5, seed=22,
         allow_skip_mode=1, **PYR),
    dict(name="tmvs", w=96, h=96, n_frames=5, seed=23, ref_frame_mvs=1,
         use_ref_frame_mvs=1, **PYR),
    dict(name="jnt", w=96, h=96, n_frames=5, seed=24, jnt_comp=1, **PYR),
    dict(name="interintra", w=96, h=96, n_frames=5, seed=25,
         inter_intra=1, **PYR),
    dict(name="maskedcomp", w=96, h=96, n_frames=5, seed=27,
         masked_compound=1, inter_intra=1, jnt_comp=1, **PYR),
    dict(name="obmc", w=96, h=96, n_frames=5, seed=40,
         switchable_motion_mode=1, **PYR),
    dict(name="warp", w=96, h=96, n_frames=5, seed=41, warped_motion=1,
         switchable_motion_mode=1, **PYR),
    dict(name="gmv", w=96, h=96, n_frames=4, seed=42, warped_motion=1,
         gmv_types=lambda fi, rng: [2, 0, 1, 0, 3, 0, 0]),
    dict(name="everything", w=128, h=128, n_frames=6, seed=44,
         gmv_types=lambda fi, rng: [0, 2, 0, 1, 0, 3, 0],
         **EVERYTHING, **PYR),
    dict(name="everything-sb128", w=128, h=128, n_frames=6, seed=45,
         sb128=1, **EVERYTHING, **PYR),
    dict(name="multitile", w=128, h=128, n_frames=4, seed=46,
         tile_log2_cols=1, tile_log2_rows=1, ref_frame_mvs=1,
         use_ref_frame_mvs=1, **PYR),
    dict(name="hbd", w=96, h=96, n_frames=4, seed=50, hbd=1),
    dict(name="hbd-everything", w=96, h=96, n_frames=5, seed=51, hbd=1,
         **EVERYTHING, **PYR),
    dict(name="lossless", w=96, h=64, n_frames=3, seed=61, qidx=0),
    # regression: tl_4x4_filter must be restored around BL_8X8 4-way
    # splits (reference decode.c:2191-2200) — the bottom-right 4x4's
    # sub-8x8 chroma MC reads the top-left block's filter state, not
    # the bottom-left's. Triggers on dual_filter + dense 4x4 content.
    dict(name="tl4x4-quad", w=320, h=240, n_frames=6, seed=42,
         lf_levels=(28, 28, 16, 16), cdef_params=(2, 1, [9, 25], [5, 13]),
         lr_types=(1, 2, 2)),
    # regression: in the device leftover scheduler, a CFL block's
    # residual can be emitted at max(U,V) pred level — above its own
    # plane's pred mark — and a dependent unit between those levels
    # read the pred-only (pre-residual) edge. Triggers on multi-tile +
    # masked compound content with CDF-skewed (low uniform_mix) mode
    # sampling; _res_unit must bump the level map for its rect.
    dict(name="cfl-res-level", w=640, h=384, n_frames=6, seed=21,
         qidx=100, uniform_mix=0.08, tile_log2_cols=1, tile_log2_rows=1,
         masked_compound=1, lf_levels=(28, 28, 16, 16),
         cdef_params=(2, 1, [9, 25], [5, 13]), lr_types=(1, 2, 2)),
]

IDS = [c["name"] for c in CONFIGS]


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_e2e_inter_md5(cfg, tmp_path):
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
    assert r.returncode == 0 and b"Error" not in r.stderr, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
