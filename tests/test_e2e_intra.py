"""End-to-end bit-exactness: full decode (Stage A + reconstruction) of
synthesized intra streams must match the reference decoder's md5
(SURVEY.md §4 tier 2 conformance-style oracle)."""
import os
import subprocess

import numpy as np
import pytest

from tools.streamgen.gen import generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.utils.muxers import Md5Muxer

ORACLE = "/root/repo/oracle-build/dav1d"

CONFIGS = [
    dict(w=64, h=64, seed=1, qidx=100, force_skip=1),
    dict(w=64, h=64, seed=2, qidx=100),
    dict(w=64, h=64, seed=4, qidx=100, sb128=1),
    dict(w=64, h=64, seed=5, qidx=250, n_frames=3),
    dict(w=64, h=64, seed=6, qidx=100, qm=1),
    dict(w=192, h=128, seed=11, qidx=100),
    dict(w=70, h=50, seed=12, qidx=100),
    dict(w=320, h=180, seed=14, qidx=150),
    dict(w=128, h=128, seed=15, qidx=100, tile_log2_cols=1, tile_log2_rows=1),
    dict(w=65, h=65, seed=16, qidx=100),
    dict(w=320, h=180, seed=17, qidx=30, delta_q=1, delta_lf=1),
    dict(w=96, h=64, seed=19, qidx=0),          # lossless / WHT
    dict(w=256, h=192, seed=21, qidx=100, sb128=1),
    dict(w=128, h=96, seed=70, qidx=120, hbd=1),
    dict(w=96, h=128, seed=71, qidx=40, hbd=1, sb128=1),
    dict(w=64, h=64, seed=20, qidx=100, reduced_txtp=1),
]


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"{c['w']}x{c['h']}-s{c['seed']}" for c in CONFIGS])
def test_bit_exact_vs_oracle(cfg, tmp_path):
    cfg = dict(cfg)
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_intra_stream(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    oracle_md5 = r.stdout.decode().strip().split()[0]
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
    assert mux.digest() == oracle_md5
