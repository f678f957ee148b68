"""Loop-restoration kernels vs the reference oracle harness: Wiener and
SGR (box3/box5/mix) across sizes, edge-flag combinations, strengths,
8- and 10-bit."""
import io
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from dav1d_tpu.ops import restore_ref as lr

HARNESS = "/root/repo/oracle-build/lr_harness"
pytestmark = pytest.mark.skipif(not os.path.exists(HARNESS),
                                reason="lr harness not built")


def run_harness(payload):
    with open("/tmp/lr_in.bin", "wb") as f:
        f.write(payload)
    subprocess.run([HARNESS, "/tmp/lr_in.bin", "/tmp/lr_out.bin"],
                   check=True, timeout=300)
    return open("/tmp/lr_out.bin", "rb").read()


def _setup(rng, w, h, bpc):
    """Build synthetic cur/pre_cdef planes and the harness buffers.
    The unit sits at (8, 8) in a (h+16, w+48) plane."""
    cur = rng.integers(0, 1 << bpc, (h + 16, w + 48)).astype(np.uint16)
    pre = rng.integers(0, 1 << bpc, (h + 16, w + 48)).astype(np.uint16)
    stride = w + 32
    y0, x0 = 8, 8
    dst = np.zeros((h, stride), np.uint16)
    dst[:, :] = cur[y0:y0 + h, x0 - 8:x0 + w + 24]
    left = np.zeros((h, 4), np.uint16)
    left[:, 1:4] = cur[y0:y0 + h, x0 - 3:x0]
    lpf = np.zeros((8, stride), np.uint16)
    lpf[0] = pre[y0 - 2, x0 - 8:x0 + w + 24]
    lpf[1] = pre[y0 - 1, x0 - 8:x0 + w + 24]
    lpf[6] = pre[y0 + h, x0 - 8:x0 + w + 24]
    lpf[7] = pre[y0 + h + 1, x0 - 8:x0 + w + 24]
    return cur, pre, dst, left, lpf


def _roundtrip(op, bpc, edges, w, h, params_bytes, dst, left, lpf):
    buf = io.BytesIO()
    buf.write(struct.pack("<BBBHH", op, bpc, edges, w, h))
    buf.write(params_bytes)
    buf.write(dst.tobytes())
    buf.write(left.tobytes())
    buf.write(lpf.tobytes())
    out = run_harness(buf.getvalue())
    stride = w + 32
    return np.frombuffer(out, np.uint16).reshape(h, stride)[:, 8:8 + w]


EDGE_SETS = [0, 1, 2, 4, 8, 15, 5, 10, 3, 12, 7, 14, 13, 11]
SIZES = [(32, 32), (64, 64), (16, 8), (8, 16), (64, 56), (128, 28),
         (36, 17), (8, 1), (8, 2), (16, 3)]


@pytest.mark.parametrize("bpc", [8, 10])
def test_wiener(bpc):
    rng = np.random.default_rng(1000 + bpc)
    for (w, h) in SIZES:
        for edges in EDGE_SETS[:8]:
            cur, pre, dst, left, lpf = _setup(rng, w, h, bpc)
            fh = [int(rng.integers(-5, 11)), int(rng.integers(-23, 9)),
                  int(rng.integers(-17, 47))]
            fv = [int(rng.integers(-5, 11)), int(rng.integers(-23, 9)),
                  int(rng.integers(-17, 47))]
            filt = np.zeros((2, 8), np.int16)
            filt[0, 0] = filt[0, 6] = fh[0]
            filt[0, 1] = filt[0, 5] = fh[1]
            filt[0, 2] = filt[0, 4] = fh[2]
            filt[0, 3] = -(fh[0] + fh[1] + fh[2]) * 2 + (128 if bpc > 8
                                                         else 0)
            filt[1, 0] = filt[1, 6] = fv[0]
            filt[1, 1] = filt[1, 5] = fv[1]
            filt[1, 2] = filt[1, 4] = fv[2]
            filt[1, 3] = 128 - (fv[0] + fv[1] + fv[2]) * 2
            got = _roundtrip(0, bpc, edges, w, h, filt.tobytes(), dst,
                             left, lpf)
            exp = lr.wiener(cur, pre, 8, 8, w, h, fh, fv, edges, bpc)
            np.testing.assert_array_equal(
                got.astype(np.int32), exp,
                err_msg=f"wiener {w}x{h} edges={edges} bpc={bpc}")


SGR_PARAMS = None


def _sgr_params(idx):
    global SGR_PARAMS
    if SGR_PARAMS is None:
        from dav1d_tpu import tables
        SGR_PARAMS = tables.get("dav1d_sgr_params")
    return int(SGR_PARAMS[idx][0]), int(SGR_PARAMS[idx][1])


@pytest.mark.parametrize("bpc", [8, 10])
@pytest.mark.parametrize("sgr_idx", [0, 4, 9, 10, 12, 15])
def test_sgr(bpc, sgr_idx):
    rng = np.random.default_rng(2000 + bpc * 31 + sgr_idx)
    s0, s1 = _sgr_params(sgr_idx)
    for (w, h) in SIZES[:7]:
        for edges in EDGE_SETS[:6]:
            cur, pre, dst, left, lpf = _setup(rng, w, h, bpc)
            w0 = int(rng.integers(-96, 32))
            w1sig = int(rng.integers(-32, 96))
            w1 = 128 - (w0 + w1sig)
            op = 3 if (s0 and s1) else (1 if s0 else 2)
            pb = struct.pack("<HHhh", s0, s1, w0, w1)
            got = _roundtrip(op, bpc, edges, w, h, pb, dst, left, lpf)
            exp = lr.sgr(cur, pre, 8, 8, w, h, s0, s1, w0, w1, edges, bpc)
            np.testing.assert_array_equal(
                got.astype(np.int32), exp,
                err_msg=f"sgr idx={sgr_idx} {w}x{h} edges={edges} "
                        f"bpc={bpc}")
