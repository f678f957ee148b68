"""End-to-end screen-content tools validation: palette mode and intra
block copy vs the reference decoder."""
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

CONFIGS = [
    dict(name="palette", w=64, h=64, qidx=100, seed=40, n_frames=2,
         screen_content=1, intra=True),
    dict(name="palette-q150", w=96, h=96, qidx=150, seed=41, n_frames=2,
         screen_content=1, intra=True),
    dict(name="palette-hbd", w=96, h=96, qidx=120, seed=42, n_frames=2,
         hbd=1, screen_content=1, intra=True),
    dict(name="palette-odd", w=70, h=50, qidx=100, seed=43, n_frames=2,
         screen_content=1, intra=True),
    dict(name="palette-deblock", w=96, h=96, qidx=120, seed=44,
         n_frames=2, screen_content=1, lf_levels=(24, 20, 18, 16),
         intra=True),
    dict(name="intrabc", w=96, h=96, qidx=100, seed=50, n_frames=2,
         screen_content=1, allow_intrabc=1, intra=True),
    dict(name="intrabc-q150", w=128, h=96, qidx=150, seed=51, n_frames=2,
         screen_content=1, allow_intrabc=1, intra=True),
    dict(name="intrabc-hbd", w=96, h=96, qidx=120, seed=52, n_frames=2,
         hbd=1, screen_content=1, allow_intrabc=1, intra=True),
    dict(name="intrabc-sb128", w=128, h=128, qidx=100, seed=53,
         n_frames=2, sb128=1, screen_content=1, allow_intrabc=1,
         intra=True),
    dict(name="intrabc-odd", w=70, h=50, qidx=100, seed=54, n_frames=2,
         screen_content=1, allow_intrabc=1, intra=True),
    dict(name="sct-inter", w=96, h=96, n_frames=4, seed=96,
         screen_content=1, intra=False),
    dict(name="sct-inter-deblock", w=128, h=96, n_frames=4, seed=97,
         screen_content=1, lf_levels=(22, 20, 16, 18), intra=False),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_screen_content(cfg, tmp_path):
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
                        "-o", "-"], capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
