"""End-to-end segmentation validation vs the reference: per-segment
q/lf deltas, ref/skip/globalmv features, spatial + temporal prediction,
map inheritance (update_map=0), data inheritance (update_data=0)."""
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

SEG = [dict(delta_q=-20), dict(delta_q=30, delta_lf_y_v=10),
       dict(delta_lf_u=-8), dict(), dict(delta_q=50), dict(),
       dict(delta_q=-40), dict(delta_lf_y_h=12)]
SEG_INTER = SEG[:5] + [dict(skip=1), dict(ref=3), dict(globalmv=1)]

CONFIGS = [
    dict(name="intra", w=96, h=96, qidx=120, seed=60, n_frames=2,
         segmentation=SEG, intra=True),
    dict(name="intra-deblock", w=96, h=96, qidx=120, seed=61, n_frames=2,
         segmentation=SEG, lf_levels=(24, 20, 18, 16), intra=True),
    dict(name="inter-features", w=96, h=96, n_frames=4, seed=100,
         segmentation=SEG_INTER, intra=False),
    dict(name="temporal-pred", w=96, h=96, n_frames=4, seed=101,
         segmentation=SEG_INTER, seg_temporal=1, intra=False),
    dict(name="map-inherit", w=96, h=96, n_frames=4, seed=102,
         segmentation=SEG_INTER, seg_update_map=0, intra=False),
    dict(name="data-inherit", w=96, h=96, n_frames=4, seed=103,
         segmentation=SEG_INTER, seg_update_data=0, intra=False),
    dict(name="inter-deblock", w=128, h=96, n_frames=4, seed=104,
         segmentation=SEG_INTER, lf_levels=(22, 20, 16, 18),
         seg_temporal=1, intra=False),
    dict(name="hbd", w=96, h=96, qidx=120, seed=62, n_frames=2, hbd=1,
         segmentation=SEG, intra=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_segmentation(cfg, tmp_path):
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
