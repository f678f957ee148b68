"""Encoder-shaped conformance streams (VERDICT r2 item 7; the Argon
suite analog, reference tests/dav1d_argon.bash:133-186 semantics):
long GOPs, dense tile grids, low-qindex dense-eob content, and
saturated tool mixes at >=1080p, md5-checked against the locally built
reference binary.

These decode minutes of synthetic 1080p+ video, so they are gated
behind DAV1D_TPU_SLOW=1 (nightly-style), like the reference keeps the
Argon run out of the default `meson test` target.
"""
import os
import subprocess

import pytest

from tools.streamgen.gen import generate_stream

ORACLE = "/root/repo/oracle-build/dav1d"
SLOW = os.environ.get("DAV1D_TPU_SLOW") == "1"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not SLOW, reason="set DAV1D_TPU_SLOW=1"),
    pytest.mark.skipif(not os.path.exists(ORACLE),
                       reason="oracle not built"),
]


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)
EVERYTHING = dict(warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
                  inter_intra=1, masked_compound=1, dual_filter=1,
                  ref_frame_mvs=1, use_ref_frame_mvs=1, allow_skip_mode=1)
FILTERS = dict(lf_levels=(28, 28, 16, 16),
               cdef_params=(2, 1, [9, 25], [5, 13]), lr_types=(1, 2, 2))

CONFIGS = [
    # long GOP (>=64 frames), realistic ref rotation
    dict(name="gop64-1080p", w=1920, h=1080, n_frames=64, seed=101,
         qidx=120, **PYR, **FILTERS),
    # 8x8 tile grid (64 tiles)
    dict(name="tiles8x8-1080p", w=1920, h=1080, n_frames=6, seed=102,
         tile_log2_cols=3, tile_log2_rows=3, qidx=100, **FILTERS),
    # dense eobs: low qindex keeps many coefficients alive
    dict(name="dense-q20-1080p", w=1920, h=1080, n_frames=6, seed=103,
         qidx=20, **FILTERS),
    dict(name="dense-q8-1080p", w=1920, h=1080, n_frames=4, seed=113,
         qidx=8, **FILTERS),
    # saturated tool mix
    dict(name="everything-1080p", w=1920, h=1080, n_frames=8, seed=104,
         qidx=100, gmv_types=lambda fi, rng: [0, 2, 0, 1, 0, 3, 0],
         **EVERYTHING, **PYR, **FILTERS),
    dict(name="everything-sb128-1080p", w=1920, h=1080, n_frames=8,
         seed=105, sb128=1, qidx=90, **EVERYTHING, **PYR, **FILTERS),
    # 10-bit at 1080p with the full chain + grain
    dict(name="hbd10-grain-1080p", w=1920, h=1080, n_frames=6, seed=106,
         hbd=1, qidx=100,
         film_grain=dict(seed=1234,
                         y_points=[(0, 64), (128, 96), (255, 48)],
                         ar_coeff_lag=2,
                         ar_coeffs_y=[3, -2, 5, 1, -4, 2, 0, 6, -1, 2,
                                      4, -3],
                         scaling_shift=9,
                         uv_points=[[(0, 32), (255, 80)],
                                    [(16, 48), (200, 64)]],
                         ar_coeffs_uv=[[1, -1, 2, 0, 3, -2, 1, 0, 2,
                                        -1, 0, 1, 5],
                                       [0, 2, -3, 1, 0, 4, -1, 2, 0,
                                        1, -2, 3, 7]],
                         overlap_flag=1), **FILTERS),
    # 12-bit 4:4:4
    dict(name="hbd12-444-1080p", w=1920, h=1080, n_frames=4, seed=107,
         hbd=2, layout=3, qidx=100, **FILTERS),
    # super-res + warp at scale
    dict(name="superres-warp-1080p", w=1920, h=1080, n_frames=6,
         seed=108, superres_denom=12, warped_motion=1,
         switchable_motion_mode=1, qidx=100,
         lf_levels=(28, 28, 16, 16), lr_types=(1, 1, 1), **PYR),
    # 4K 10-bit, the BASELINE's second metric class
    dict(name="4k-hbd10", w=3840, h=2160, n_frames=3, seed=109, hbd=1,
         qidx=90, tile_log2_cols=1, tile_log2_rows=1, **FILTERS),
    # screen content (palette + intrabc) at 1080p
    dict(name="screen-1080p", w=1920, h=1080, n_frames=4, seed=110,
         screen_content=1, qidx=80, **FILTERS),
    # 4x1 tile columns + segmentation + delta-q
    dict(name="seg-dq-tiles-1080p", w=1920, h=1080, n_frames=6,
         seed=111, tile_log2_cols=2, qidx=100, delta_q=1, delta_lf=1,
         segmentation=[dict(delta_q=-20), dict(delta_q=30),
                       dict(delta_lf_u=-8), dict(delta_q=50)],
         **FILTERS),
    # 8K multi-tile + super-res + warp: the BASELINE config-5 stream
    # class (reference's largest profile point), decoded once vs oracle
    dict(name="8k-tiles-superres-warp", w=7680, h=4320, n_frames=2,
         seed=112, tile_log2_cols=2, tile_log2_rows=1,
         superres_denom=12, warped_motion=1, switchable_motion_mode=1,
         qidx=140, lf_levels=(28, 28, 16, 16), lr_types=(1, 1, 1)),
]

IDS = [c["name"] for c in CONFIGS]


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_e2e_big_md5(cfg, tmp_path):
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.utils.muxers import Md5Muxer

    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)

    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=1200)
    assert r.returncode == 0 and b"Error" not in r.stderr, \
        r.stderr.decode()

    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            if pic is not None:
                mux.write_picture(pic)
    assert str(mux.digest()) == r.stdout.decode().strip()
