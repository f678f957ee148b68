"""Device intra-leftover path (recon/ipred_device.py):

1. symbolic edge prep vs the golden prepare_intra_edges over random
   availability configs (gather-equivalence);
2. e2e md5: default (device leftovers) == DAV1D_TPU_LO=host (golden
   replay) == reference binary, and the device path actually ran.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from dav1d_tpu.ops import ipred, ipred_ref
from dav1d_tpu.recon import ipred_device
from dav1d_tpu.entropy import levels as lv

ORACLE = "/root/repo/oracle-build/dav1d"

C = ipred.C


@pytest.mark.parametrize("tw,th", [(1, 1), (2, 1), (4, 4), (8, 2),
                                   (16, 16)])
def test_edge_indices_vs_golden(tw, th):
    rng = np.random.default_rng(tw * 131 + th)
    bd = 8
    H, W = 128, 160
    plane = rng.integers(0, 256, (H, W)).astype(np.uint8)
    flat = np.concatenate([
        plane.reshape(-1).astype(np.int32),
        np.asarray([((1 << bd) >> 1) + 1, ((1 << bd) >> 1) - 1,
                    (1 << bd) >> 1, 0], np.int32)])
    w_t, h_t = W // 4, H // 4   # tile end in b4 units
    for trial in range(200):
        x = int(rng.integers(0, w_t - tw + 1))
        y = int(rng.integers(0, h_t - th + 1))
        have_left = bool(x > 0 and rng.integers(0, 2))
        have_top = bool(y > 0 and rng.integers(0, 2))
        edge_flags = int(rng.integers(0, 4))  # TR | BL bits
        mode = int(rng.integers(0, 13))
        angle = int(rng.integers(-3, 4))
        filter_edge = int(rng.integers(0, 2))
        px, py = x * 4, y * 4

        e = ipred_ref.Edge()
        gm, ga = ipred_ref.prepare_intra_edges(
            x, have_left, y, have_top, w_t, h_t, edge_flags,
            plane, px, py, None, mode, angle, tw, th, filter_edge, e, bd)
        sm, sa, idx, tlf = ipred_device.edge_indices(
            x, have_left, y, have_top, w_t, h_t, edge_flags, W, px, py,
            mode, angle, tw, th, filter_edge, H * W)
        assert (gm, ga) == (sm, sa), trial
        got = flat[idx].astype(np.int32)
        if tlf:
            got[C] = ((got[C - 1] + got[C + 1]) * 5 + got[C] * 6 + 8) >> 4
        needs_l, needs_t, needs_tl, needs_tr, needs_bl = \
            ipred_ref._EDGE_REQ[gm]
        szl, szt = th * 4, tw * 4
        segs = []
        if needs_l:
            segs.append((C - szl, C))
        if needs_bl:
            segs.append((C - 2 * szl, C - szl))
        if needs_t:
            segs.append((C + 1, C + 1 + szt))
        if needs_tr:
            segs.append((C + 1 + szt, C + 1 + 2 * szt))
        if needs_tl:
            segs.append((C, C + 1))
        for a, b in segs:
            assert np.array_equal(got[a:b], e.buf[a:b]), \
                (trial, gm, a - C, b - C)


CONFIGS = [
    # leftover-heavy inter streams: random mode sampling yields intra
    # blocks (incl. CFL + Z modes) inside inter frames
    dict(name="base", w=96, h=96, n_frames=5, seed=3),
    dict(name="dense", w=160, h=128, n_frames=5, seed=13, qidx=60),
    dict(name="444", w=96, h=96, n_frames=4, seed=7, layout=3),
    dict(name="422-hbd", w=96, h=96, n_frames=4, seed=9, layout=2,
         hbd=1),
    dict(name="multitile", w=128, h=128, n_frames=4, seed=46,
         tile_log2_cols=1, tile_log2_rows=1),
]


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_lo_device_md5(cfg, tmp_path):
    from tools.streamgen.gen import generate_stream
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.utils.muxers import Md5Muxer

    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)

    def decode(lo_env):
        old = os.environ.get("DAV1D_TPU_LO")
        os.environ["DAV1D_TPU_LO"] = lo_env
        try:
            dec = ObuStreamDecoder()
            mux = Md5Muxer()
            for fr in IvfReader(data):
                for _plan, pic in dec.decode_temporal_unit(fr.data):
                    mux.write_picture(pic)
            return str(mux.digest())
        finally:
            if old is None:
                os.environ.pop("DAV1D_TPU_LO", None)
            else:
                os.environ["DAV1D_TPU_LO"] = old

    before = dict(ipred_device.STATS)
    dev_md5 = decode("device")
    served = ipred_device.STATS["frames"] - before["frames"]
    host_md5 = decode("host")
    assert dev_md5 == host_md5
    assert served > 0, "device leftover path never engaged"

    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-"], capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr
    assert dev_md5 == r.stdout.decode().strip()
