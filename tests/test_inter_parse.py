"""Inter-frame Stage-A validation on synthesized streams.

Same strategy as test_intra_parse (SURVEY.md §4): the generator drives
OUR decoder's frame pipeline with a GenCoder, so generator state ==
decoder state by construction; the reference oracle must then accept the
streams (validating header + symbol syntax against dav1d), and — when
the DEBUG_BLOCK_INFO oracle build is available — the full symbol trace
(partitions, modes, refmvs candidate stacks + contexts, MVs, tx trees,
coefficients, with msac range at every step) must match dav1d's exactly.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder

ORACLE = "/root/repo/oracle-build/dav1d"
BLK = "/tmp/dav1d_blk"

def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


# backward-ref pyramid: distinct POCs in every slot, fwd+bwd refs
PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)
# all coding tools on
EVERYTHING = dict(warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
                  inter_intra=1, masked_compound=1, dual_filter=1,
                  ref_frame_mvs=1, use_ref_frame_mvs=1, allow_skip_mode=1)

CONFIGS = [
    dict(w=64, h=64, seed=2, n_frames=6),
    dict(w=128, h=96, seed=3, n_frames=4),
    dict(w=192, h=128, seed=4, n_frames=4, qidx=60),
    dict(w=128, h=128, seed=5, n_frames=5, qidx=150),
    dict(w=96, h=64, seed=6, n_frames=8),
    dict(w=128, h=128, seed=7, n_frames=4, sb128=1),
    dict(w=70, h=50, seed=8, n_frames=4),
    dict(w=64, h=64, seed=9, n_frames=4, qidx=250),
    dict(w=320, h=180, seed=10, n_frames=3),
    # multi-POC ref structures + coding tools
    dict(w=96, h=96, seed=20, n_frames=8,
         refidx_fn=lambda fi: tuple(max(0, fi - 1 - i) % 8 for i in range(7)),
         refresh_fn=lambda fi: 1 << (fi % 8)),
    dict(w=96, h=96, seed=21, n_frames=5, **PYR),
    dict(w=96, h=96, seed=22, n_frames=5, allow_skip_mode=1, **PYR),
    dict(w=96, h=96, seed=23, n_frames=5, ref_frame_mvs=1,
         use_ref_frame_mvs=1, **PYR),
    dict(w=96, h=96, seed=24, n_frames=5, jnt_comp=1, **PYR),
    dict(w=96, h=96, seed=25, n_frames=5, inter_intra=1, **PYR),
    dict(w=96, h=96, seed=26, n_frames=5, dual_filter=1, **PYR),
    dict(w=96, h=96, seed=27, n_frames=5, masked_compound=1, inter_intra=1,
         jnt_comp=1, **PYR),
    dict(w=96, h=96, seed=40, n_frames=5, switchable_motion_mode=1, **PYR),
    dict(w=96, h=96, seed=41, n_frames=5, warped_motion=1,
         switchable_motion_mode=1, **PYR),
    dict(w=96, h=96, seed=42, n_frames=4, warped_motion=1,
         gmv_types=lambda fi, rng: [2, 0, 1, 0, 3, 0, 0]),
    dict(w=128, h=128, seed=44, n_frames=6,
         gmv_types=lambda fi, rng: [0, 2, 0, 1, 0, 3, 0],
         **EVERYTHING, **PYR),
    dict(w=128, h=128, seed=45, n_frames=5, sb128=1, **EVERYTHING, **PYR),
    dict(w=128, h=128, seed=46, n_frames=4, tile_log2_cols=1,
         tile_log2_rows=1, ref_frame_mvs=1, use_ref_frame_mvs=1, **PYR),
]

IDS = [f"{c['w']}x{c['h']}-s{c['seed']}" for c in CONFIGS]


def _gen(cfg):
    cfg = dict(cfg)
    w, h = cfg.pop("w"), cfg.pop("h")
    return generate_stream(w, h, **cfg)


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_self_decode_recovers_plan(cfg):
    data, results = _gen(cfg)
    dec = ObuStreamDecoder(do_recon=False)
    n = 0
    for fr in IvfReader(data):
        for p in dec.decode_temporal_unit(fr.data):
            gp = results[n][2]
            for attr in ("b4_bs", "b4_ymode", "b4_skip", "b4_intra"):
                np.testing.assert_array_equal(
                    getattr(p, attr), getattr(gp, attr), err_msg=attr)
            assert len(p.coefs) == len(gp.coefs)
            for c1, c2 in zip(p.coefs, gp.coefs):
                assert (c1.plane, c1.x4, c1.y4, c1.tx, c1.txtp, c1.eob) == \
                    (c2.plane, c2.x4, c2.y4, c2.tx, c2.txtp, c2.eob)
                if c1.cf is not None:
                    np.testing.assert_array_equal(c1.cf, c2.cf)
            # inter block fields
            for b1, b2 in zip(p.blocks, gp.blocks):
                assert (b1.bx, b1.by, b1.bs, b1.intra) == \
                    (b2.bx, b2.by, b2.bs, b2.intra)
                if not b1.intra:
                    assert b1.ref == b2.ref
                    assert b1.mv == b2.mv
                    assert b1.inter_mode == b2.inter_mode
            n += 1
    assert n == len(results)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_oracle_accepts_stream(cfg, tmp_path):
    data, _ = _gen(cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert b"Error" not in r.stderr, r.stderr.decode()
    assert len(r.stdout.strip()) >= 32


@pytest.mark.skipif(not os.path.exists(BLK),
                    reason="instrumented oracle not built "
                           "(tools/oracle/build_blk.sh)")
@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_trace_matches_oracle(cfg, tmp_path):
    from tools.trace_diff import diff
    data, _ = _gen(cfg)
    assert diff(data, path=str(tmp_path / "t.ivf")) is None
