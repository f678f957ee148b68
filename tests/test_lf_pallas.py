"""Pallas TPU deblock kernel (ops/lf_pallas.py) validation.

Tier 1: kernel-level fuzz parity vs the XLA whole-plane formulation
(ops/lf.py, itself e2e md5-validated vs the reference binary) across
bitdepths, plane kinds and shape classes — interpret mode off-TPU.
Tier 2: full e2e decode with DAV1D_TPU_LF=pallas, md5 vs the reference
decoder (same harness as tests/test_e2e_deblock.py).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from dav1d_tpu.ops import lf, lf_pallas
from dav1d_tpu.ops.lf_ref import calc_eih

ORACLE = "/root/repo/oracle-build/dav1d"


@pytest.mark.parametrize("bd", [8, 10, 12])
@pytest.mark.parametrize("luma", [True, False], ids=["luma", "chroma"])
@pytest.mark.parametrize("h4,w4", [(16, 64), (8, 8), (20, 36)],
                         ids=["wide", "tiny", "odd"])
def test_kernel_parity(bd, luma, h4, w4):
    rng = np.random.default_rng(bd * 100 + h4 + w4 + luma)
    px_max = (1 << bd) - 1
    plane = rng.integers(0, px_max + 1, (4 * h4, 4 * w4)).astype(np.int32)
    # bias towards flat content so the wide filters actually fire
    flat = rng.integers(0, px_max + 1, (h4, w4))
    sel = rng.random((h4, w4)) < 0.5
    f4 = np.repeat(np.repeat(np.where(sel, flat, -1), 4, 0), 4, 1)
    plane = np.where(f4 >= 0,
                     np.clip(f4 + rng.integers(-2, 3, plane.shape),
                             0, px_max),
                     plane).astype(np.int32)
    cls = rng.integers(-1, 3, (h4, w4)).astype(np.int8)
    L = rng.integers(0, 64, (h4, w4)).astype(np.uint8)
    vmaps = (cls, L)
    hmaps = (np.ascontiguousarray(cls.T), np.ascontiguousarray(L.T))
    lut_e, lut_i = calc_eih(3)
    lut_e, lut_i = lut_e.astype(np.int32), lut_i.astype(np.int32)

    rx = np.asarray(lf._plane_fn(h4, w4, bd, luma)(
        plane, vmaps, hmaps, lut_e, lut_i))
    rp = np.asarray(lf_pallas.plane_fn(h4, w4, bd, luma)(
        plane, vmaps, hmaps, lut_e, lut_i))
    assert np.array_equal(rx, rp)


E2E = [
    dict(name="inter", w=96, h=96, n_frames=4, seed=70, intra=False,
         lf_levels=(24, 20, 30, 16)),
    dict(name="hbd-sharp", w=128, h=96, n_frames=2, seed=72, hbd=1,
         intra=True, lf_levels=(40, 36, 30, 28), lf_sharpness=5),
]


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
@pytest.mark.parametrize("cfg", E2E, ids=[c["name"] for c in E2E])
def test_e2e_pallas_deblock(cfg, tmp_path, monkeypatch):
    from tools.streamgen.gen import generate_stream, generate_intra_stream
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.utils.muxers import Md5Muxer

    monkeypatch.setenv("DAV1D_TPU_LF", "pallas")
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    gen = generate_intra_stream if cfg.pop("intra") else generate_stream
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
    assert r.returncode == 0, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
