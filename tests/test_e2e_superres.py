"""End-to-end super-resolution + scaled-reference validation vs the
reference decoder: SR intra/inter (horizontal upscale after CDEF,
before LR; reference recon_tmpl.c:2053-2086), LR-unit placement in
upscaled coords (reference decode.c:2683-2699), and scaled-reference
MC via frame_size_override (reference recon_tmpl.c:995-1050)."""
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
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1)}
    return m[min(fi, 3)]


PYR = dict(order_hints=[0, 8, 4, 2], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)

CONFIGS = [
    dict(name="sr-intra", w=96, h=96, qidx=120, seed=70, n_frames=2,
         superres_denom=12, intra=True),
    dict(name="sr-intra-lr", w=96, h=96, qidx=120, seed=71, n_frames=2,
         superres_denom=12, lr_types=(2, 2, 2), intra=True),
    dict(name="sr-intra-all-filters", w=128, h=96, qidx=130, seed=72,
         n_frames=2, superres_denom=10, lr_types=(1, 1, 1),
         lr_unit_shift=1, cdef_params=(1, 1, [4, 6], [2, 1]),
         lf_levels=(18, 16, 10, 8), intra=True),
    dict(name="sr-intra-hbd", w=96, h=96, qidx=120, seed=73, n_frames=2,
         hbd=1, superres_denom=16, lr_types=(2, 0, 0), intra=True),
    dict(name="sr-intra-odd", w=70, h=50, qidx=120, seed=74, n_frames=2,
         superres_denom=13, intra=True),
    dict(name="sr-inter", w=96, h=96, n_frames=3, seed=80,
         superres_denom=12, intra=False),
    dict(name="sr-inter-filters", w=96, h=96, n_frames=4, seed=81,
         superres_denom=14, lf_levels=(20, 18, 12, 10),
         cdef_params=(2, 1, [9, 5], [3, 2]), lr_types=(2, 2, 2),
         intra=False),
    dict(name="sr-inter-pyr", w=96, h=96, n_frames=4, seed=82,
         superres_denom=11, jnt_comp=1, intra=False, **PYR),
    dict(name="sr-inter-hbd", w=96, h=96, n_frames=3, seed=83, hbd=1,
         superres_denom=12, intra=False),
    dict(name="scaled-ref", w=96, h=96, n_frames=3, seed=84, intra=False,
         frame_size_fn=lambda fi: (64, 64) if fi == 1 else None),
    dict(name="scaled-ref-updown", w=96, h=96, n_frames=4, seed=85,
         intra=False,
         frame_size_fn=lambda fi: {1: (64, 48), 2: (96, 96),
                                   3: (80, 64)}.get(fi)),
    dict(name="scaled-ref-compound", w=96, h=96, n_frames=4, seed=86,
         jnt_comp=1, masked_compound=1, inter_intra=1, intra=False,
         frame_size_fn=lambda fi: {2: (64, 64), 3: (72, 56)}.get(fi),
         **PYR),
    dict(name="scaled-ref-gmv", w=96, h=96, n_frames=3, seed=87,
         warped_motion=1, intra=False,
         gmv_types=lambda fi, rng: [2, 0, 1, 0, 3, 0, 0],
         frame_size_fn=lambda fi: (64, 64) if fi == 2 else None),
    dict(name="scaled-ref-sr-mix", w=96, h=96, n_frames=4, seed=88,
         superres_denom=12, lf_levels=(16, 14, 8, 8), intra=False,
         frame_size_fn=lambda fi: (80, 80) if fi == 2 else None),
    dict(name="scaled-ref-bilin", w=96, h=96, n_frames=3, seed=89,
         subpel_filter_switchable=0, subpel_filter=3, intra=False,
         frame_size_fn=lambda fi: (64, 64) if fi == 1 else None),
    dict(name="sr-bilin", w=96, h=96, n_frames=3, seed=90,
         subpel_filter_switchable=0, subpel_filter=3,
         superres_denom=12, intra=False),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_superres(cfg, tmp_path):
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
