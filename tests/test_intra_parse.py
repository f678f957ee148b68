"""End-to-end Stage-A validation on synthesized intra streams.

Strategy (SURVEY.md §4): our generator drives TileParser with a GenCoder
to synthesize real AV1 bitstreams; the reference oracle binary must
accept them (validating our syntax model against dav1d), and our decoder
must recover the exact symbols the generator chose (validating the
decode path bit-for-bit through real msac bytes).
"""
import os
import subprocess

import numpy as np
import pytest

from tools.streamgen.gen import generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder

ORACLE = "/root/repo/oracle-build/dav1d"

CONFIGS = [
    dict(w=64, h=64, seed=1, qidx=100, force_skip=1),
    dict(w=64, h=64, seed=2, qidx=100),
    dict(w=64, h=64, seed=3, qidx=50),
    dict(w=64, h=64, seed=4, qidx=100, sb128=1),
    dict(w=64, h=64, seed=5, qidx=250, n_frames=3),
    dict(w=64, h=64, seed=6, qidx=100, qm=1),
    dict(w=64, h=64, seed=7, qidx=20, txfm_switchable=0),
    dict(w=192, h=128, seed=11, qidx=100),
    dict(w=70, h=50, seed=12, qidx=100),
    dict(w=128, h=128, seed=13, qidx=100, sb128=1),
    dict(w=320, h=180, seed=14, qidx=150),
    dict(w=128, h=128, seed=15, qidx=100, tile_log2_cols=1, tile_log2_rows=1),
    dict(w=65, h=65, seed=16, qidx=100),
    dict(w=320, h=180, seed=17, qidx=30, delta_q=1, delta_lf=1),
    dict(w=160, h=96, seed=18, qidx=100, disable_cdf_update=1),
    dict(w=96, h=64, seed=19, qidx=0),          # lossless
    dict(w=64, h=64, seed=20, qidx=100, reduced_txtp=1),
]


def _gen(cfg):
    cfg = dict(cfg)
    w, h = cfg.pop("w"), cfg.pop("h")
    return generate_intra_stream(w, h, **cfg)


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"{c['w']}x{c['h']}-s{c['seed']}" for c in CONFIGS])
def test_self_decode_recovers_plan(cfg, tmp_path):
    data, results = _gen(cfg)
    dec = ObuStreamDecoder(do_recon=False)
    nplan = 0
    for fr in IvfReader(data):
        for p in dec.decode_temporal_unit(fr.data):
            gp = results[nplan][2]
            for attr in ("b4_bs", "b4_ymode", "b4_uvmode", "b4_skip",
                         "b4_seg"):
                np.testing.assert_array_equal(
                    getattr(p, attr), getattr(gp, attr), err_msg=attr)
            assert len(p.coefs) == len(gp.coefs)
            for c1, c2 in zip(p.coefs, gp.coefs):
                assert (c1.plane, c1.x4, c1.y4, c1.tx, c1.txtp, c1.eob) == \
                    (c2.plane, c2.x4, c2.y4, c2.tx, c2.txtp, c2.eob)
                if c1.cf is not None:
                    np.testing.assert_array_equal(c1.cf, c2.cf)
            nplan += 1
    assert nplan == len(results)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[f"{c['w']}x{c['h']}-s{c['seed']}" for c in CONFIGS])
def test_oracle_accepts_stream(cfg, tmp_path):
    data, _ = _gen(cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert b"No data decoded" not in r.stderr
    # md5 line present for each config
    assert len(r.stdout.strip()) >= 32
