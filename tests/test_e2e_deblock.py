"""End-to-end deblocking-filter validation: decoded plane md5 vs the
reference decoder on streams with loop filtering enabled (SURVEY.md §4
tier 3). Covers wd 4/8/16 luma + 4/6 chroma paths, sharpness, mode/ref
deltas, per-sb delta-lf, tiles, sb128, 10-bit, odd sizes."""
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

INTRA_CONFIGS = [
    dict(name="levels", w=96, h=96, qidx=120, seed=5, n_frames=2,
         lf_levels=(24, 20, 30, 16), lf_sharpness=2),
    dict(name="max-levels", w=128, h=96, qidx=60, seed=6, n_frames=2,
         lf_levels=(63, 63, 63, 63)),
    dict(name="mode-ref-delta", w=96, h=96, qidx=150, seed=7, n_frames=2,
         lf_levels=(32, 28, 20, 24), mode_ref_delta=1),
    dict(name="delta-lf", w=96, h=96, qidx=100, seed=8, n_frames=2,
         lf_levels=(24, 24, 24, 24), delta_q=1, delta_lf=1),
    dict(name="sb128", w=128, h=128, qidx=100, seed=9, n_frames=2,
         sb128=1, lf_levels=(18, 22, 10, 12)),
    dict(name="hbd", w=96, h=96, qidx=100, seed=10, n_frames=2, hbd=1,
         lf_levels=(26, 30, 22, 18)),
]

INTER_CONFIGS = [
    dict(name="base", w=96, h=96, n_frames=5, seed=70,
         lf_levels=(24, 20, 30, 16), **PYR),
    dict(name="mode-ref-delta", w=96, h=96, n_frames=5, seed=71,
         lf_levels=(28, 24, 18, 20), mode_ref_delta=1, **PYR),
    dict(name="sharpness", w=128, h=96, n_frames=4, seed=72,
         lf_levels=(40, 36, 30, 28), lf_sharpness=5),
    dict(name="delta-lf", w=96, h=96, n_frames=4, seed=73,
         lf_levels=(20, 20, 20, 20), delta_q=1, delta_lf=1),
    dict(name="tiles", w=128, h=128, n_frames=4, seed=74,
         lf_levels=(30, 26, 22, 24), tile_log2_cols=1, tile_log2_rows=1,
         **PYR),
    dict(name="hbd", w=96, h=96, n_frames=4, seed=75, hbd=1,
         lf_levels=(26, 22, 18, 20)),
    dict(name="odd-size", w=70, h=50, n_frames=4, seed=76,
         lf_levels=(24, 24, 24, 24)),
    dict(name="big", w=320, h=180, n_frames=3, seed=78,
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


@pytest.mark.parametrize("cfg", INTRA_CONFIGS,
                         ids=[c["name"] for c in INTRA_CONFIGS])
def test_deblock_intra(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_intra_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])


@pytest.mark.parametrize("cfg", INTER_CONFIGS,
                         ids=[c["name"] for c in INTER_CONFIGS])
def test_deblock_inter(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    _check(data, tmp_path, cfg["n_frames"])
