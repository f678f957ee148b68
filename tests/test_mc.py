"""Motion-compensation kernels vs the reference oracle harness
(checkasm-style, SURVEY.md §4 tier 1): every MC op over random inputs,
all block sizes and subpel phases, 8- and 10-bit."""
import io
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from dav1d_tpu.ops import mc_ref

HARNESS = "/root/repo/oracle-build/mc_harness"
pytestmark = pytest.mark.skipif(not os.path.exists(HARNESS),
                                reason="mc harness not built")

SIZES = [(2, 2), (4, 4), (4, 8), (8, 4), (8, 8), (16, 8), (8, 16),
         (16, 16), (32, 16), (32, 32), (64, 64), (128, 128), (16, 4),
         (4, 16)]


def run_harness(payload: bytes) -> bytes:
    inp, outp = "/tmp/mc_in.bin", "/tmp/mc_out.bin"
    with open(inp, "wb") as f:
        f.write(payload)
    subprocess.run([HARNESS, inp, outp], check=True, timeout=300)
    return open(outp, "rb").read()


def _src(rng, h, w, bpc):
    return rng.integers(0, 1 << bpc, (h, w)).astype(np.uint16)


def _tmp(rng, h, w, bpc):
    # prep-domain int16 values
    lo, hi = (-5132, 9212) if bpc == 8 else (-20588, 36956 - 8192 * 2)
    return rng.integers(lo, hi, (h, w)).astype(np.int16)


@pytest.mark.parametrize("bpc", [8, 10])
def test_put_prep_8tap(bpc):
    rng = np.random.default_rng(100 + bpc)
    buf = io.BytesIO()
    cases = []
    for (w, h) in SIZES:
        for f2d in range(10):
            for mx, my in [(0, 0), (1, 0), (0, 1), (7, 9), (15, 15),
                           (8, 0), (0, 8), (4, 12)]:
                for op in (0, 1):
                    src = _src(rng, h + 7, w + 7, bpc)
                    buf.write(struct.pack("<BBHHBBB", op, bpc, w, h,
                                          f2d, mx, my))
                    buf.write(src.tobytes())
                    cases.append((op, f2d, mx, my, w, h, src))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, f2d, mx, my, w, h, src) in cases:
        got = np.frombuffer(out[pos:pos + w * h * 2],
                            np.uint16).reshape(h, w)
        pos += w * h * 2
        ft = mc_ref.FILTER2D_TO_TYPE[f2d]
        if op == 0:
            if ft < 0:
                exp = mc_ref.put_bilin(src, 3, 3, w, h, mx, my, bpc)
            else:
                exp = mc_ref.put_8tap(src, 3, 3, w, h, mx, my, ft, bpc)
            np.testing.assert_array_equal(
                got.astype(np.int32), exp,
                err_msg=f"put f2d={f2d} mx={mx} my={my} {w}x{h}")
        else:
            if ft < 0:
                exp = mc_ref.prep_bilin(src, 3, 3, w, h, mx, my, bpc)
            else:
                exp = mc_ref.prep_8tap(src, 3, 3, w, h, mx, my, ft, bpc)
            np.testing.assert_array_equal(
                got.view(np.int16).astype(np.int32), exp,
                err_msg=f"prep f2d={f2d} mx={mx} my={my} {w}x{h}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_compound_combines(bpc):
    rng = np.random.default_rng(200 + bpc)
    buf = io.BytesIO()
    cases = []
    for (w, h) in SIZES:
        t1, t2 = _tmp(rng, h, w, bpc), _tmp(rng, h, w, bpc)
        m = rng.integers(0, 65, (h, w)).astype(np.uint8)
        buf.write(struct.pack("<BBHH", 4, bpc, w, h))
        buf.write(t1.tobytes()); buf.write(t2.tobytes())
        cases.append((4, w, h, t1, t2, None, None))
        weight = int(rng.integers(0, 16))
        buf.write(struct.pack("<BBHH", 5, bpc, w, h))
        buf.write(t1.tobytes()); buf.write(t2.tobytes())
        buf.write(struct.pack("<B", weight))
        cases.append((5, w, h, t1, t2, weight, None))
        buf.write(struct.pack("<BBHH", 6, bpc, w, h))
        buf.write(t1.tobytes()); buf.write(t2.tobytes())
        buf.write(m.tobytes())
        cases.append((6, w, h, t1, t2, None, m))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, w, h, t1, t2, weight, m) in cases:
        got = np.frombuffer(out[pos:pos + w * h * 2],
                            np.uint16).reshape(h, w).astype(np.int32)
        pos += w * h * 2
        t1i, t2i = t1.astype(np.int32), t2.astype(np.int32)
        if op == 4:
            exp = mc_ref.avg(t1i, t2i, bpc)
        elif op == 5:
            exp = mc_ref.w_avg(t1i, t2i, weight, bpc)
        else:
            exp = mc_ref.mask(t1i, t2i, m, bpc)
        np.testing.assert_array_equal(got, exp,
                                      err_msg=f"op={op} {w}x{h}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_blends(bpc):
    rng = np.random.default_rng(300 + bpc)
    buf = io.BytesIO()
    cases = []
    for (w, h) in [(2, 2), (4, 4), (8, 8), (16, 16), (32, 32), (4, 8),
                   (8, 4), (16, 32), (32, 8)]:
        d = _src(rng, h, w, bpc)
        t = _src(rng, h, w, bpc)
        m = rng.integers(0, 65, (h, w)).astype(np.uint8)
        buf.write(struct.pack("<BBHH", 7, bpc, w, h))
        buf.write(d.tobytes()); buf.write(t.tobytes()); buf.write(m.tobytes())
        cases.append((7, w, h, d, t, m))
        buf.write(struct.pack("<BBHH", 8, bpc, w, h))
        buf.write(d.tobytes()); buf.write(t.tobytes())
        cases.append((8, w, h, d, t, None))
        buf.write(struct.pack("<BBHH", 9, bpc, w, h))
        buf.write(d.tobytes()); buf.write(t.tobytes())
        cases.append((9, w, h, d, t, None))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, w, h, d, t, m) in cases:
        got = np.frombuffer(out[pos:pos + w * h * 2],
                            np.uint16).reshape(h, w).astype(np.int32)
        pos += w * h * 2
        di, ti = d.astype(np.int32), t.astype(np.int32)
        if op == 7:
            exp = mc_ref.blend(di, ti, m)
        elif op == 8:
            exp = mc_ref.blend_v(di, ti, w, h)
        else:
            exp = mc_ref.blend_h(di, ti, w, h)
        np.testing.assert_array_equal(got, exp,
                                      err_msg=f"blend op={op} {w}x{h}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_w_mask(bpc):
    rng = np.random.default_rng(400 + bpc)
    buf = io.BytesIO()
    cases = []
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 32), (8, 16), (16, 8),
                   (64, 64)]:
        for op, sign in [(10, 0), (10, 1), (11, 0), (11, 1), (12, 0),
                         (12, 1)]:
            t1, t2 = _tmp(rng, h, w, bpc), _tmp(rng, h, w, bpc)
            buf.write(struct.pack("<BBHHB", op, bpc, w, h, sign))
            buf.write(t1.tobytes()); buf.write(t2.tobytes())
            cases.append((op, sign, w, h, t1, t2))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, sign, w, h, t1, t2) in cases:
        ss_hor, ss_ver = int(op >= 11), int(op == 12)
        mw, mh = w >> ss_hor, h >> ss_ver
        got = np.frombuffer(out[pos:pos + w * h * 2],
                            np.uint16).reshape(h, w).astype(np.int32)
        pos += w * h * 2
        gotm = np.frombuffer(out[pos:pos + mw * mh],
                             np.uint8).reshape(mh, mw)
        pos += mw * mh
        exp, expm = mc_ref.w_mask(t1.astype(np.int32), t2.astype(np.int32),
                                  sign, ss_hor, ss_ver, bpc)
        np.testing.assert_array_equal(got, exp,
                                      err_msg=f"wmask op={op} s={sign} {w}x{h}")
        np.testing.assert_array_equal(gotm, expm,
                                      err_msg=f"wmaskm op={op} s={sign} {w}x{h}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_warp(bpc):
    rng = np.random.default_rng(500 + bpc)
    buf = io.BytesIO()
    cases = []
    for _ in range(40):
        src = _src(rng, 15, 15, bpc)
        abcd = rng.integers(-512, 512, 4).astype(np.int16)
        mx, my = int(rng.integers(-4096, 4096)), int(rng.integers(-4096, 4096))
        for op in (13, 14):
            buf.write(struct.pack("<BBHH", op, bpc, 8, 8))
            buf.write(abcd.tobytes())
            buf.write(struct.pack("<ii", mx, my))
            buf.write(src.tobytes())
            cases.append((op, src, abcd, mx, my))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, src, abcd, mx, my) in cases:
        got = np.frombuffer(out[pos:pos + 128], np.uint16).reshape(8, 8)
        pos += 128
        a = [int(v) for v in abcd]
        if op == 13:
            exp = mc_ref.warp_affine_8x8(src, 3, 3, a, mx, my, bpc)
            np.testing.assert_array_equal(got.astype(np.int32), exp)
        else:
            exp = mc_ref.warp_affine_8x8t(src, 3, 3, a, mx, my, bpc)
            np.testing.assert_array_equal(
                got.view(np.int16).astype(np.int32), exp)


@pytest.mark.parametrize("bpc", [8, 10])
def test_emu_edge(bpc):
    rng = np.random.default_rng(600 + bpc)
    buf = io.BytesIO()
    cases = []
    iw, ih = 37, 29
    ref = _src(rng, ih, iw, bpc)
    for (bw, bh, x, y) in [(11, 11, -5, -5), (11, 11, 30, 25),
                           (11, 11, -10, 10), (19, 7, 35, -6),
                           (8, 8, 2, 3), (23, 23, -22, 28),
                           (11, 11, 40, 33), (4, 4, -3, -3)]:
        buf.write(struct.pack("<BBHH", 15, bpc, 0, 0))
        buf.write(struct.pack("<iiiiii", bw, bh, iw, ih, x, y))
        buf.write(ref.tobytes())
        cases.append((bw, bh, x, y))
    out = run_harness(buf.getvalue())
    pos = 0
    for (bw, bh, x, y) in cases:
        got = np.frombuffer(out[pos:pos + bw * bh * 2],
                            np.uint16).reshape(bh, bw)
        pos += bw * bh * 2
        exp = mc_ref.emu_edge(bw, bh, iw, ih, x, y, ref)
        np.testing.assert_array_equal(got, exp,
                                      err_msg=f"emu {bw}x{bh}@{x},{y}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_scaled_8tap(bpc):
    rng = np.random.default_rng(700 + bpc)
    buf = io.BytesIO()
    cases = []
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 16), (8, 4)]:
        for f2d in (0, 5, 8, 9):
            for (dx, dy) in [(1024, 1024), (2048, 1365), (683, 2048),
                             (1536, 1536)]:
                mx = int(rng.integers(0, 1024))
                my = int(rng.integers(0, 1024))
                # src must cover [pos_y>>10 - 3, bottom+4) etc.; mirror
                # the mc() bound computation
                right = ((mx + (w - 1) * dx) >> 10) + 1
                bottom = ((my + (h - 1) * dy) >> 10) + 1
                sw, sh = right + 7 + 1, bottom + 7 + 1
                src = _src(rng, sh, sw, bpc)
                for op in (16, 17):
                    buf.write(struct.pack("<BBHHBiiiiHH", op, bpc, w, h,
                                          f2d, mx, my, dx, dy, sw, sh))
                    buf.write(src.tobytes())
                    cases.append((op, f2d, mx, my, dx, dy, w, h, src))
    out = run_harness(buf.getvalue())
    pos = 0
    for (op, f2d, mx, my, dx, dy, w, h, src) in cases:
        got = np.frombuffer(out[pos:pos + w * h * 2],
                            np.uint16).reshape(h, w)
        pos += w * h * 2
        ft = mc_ref.FILTER2D_TO_TYPE[f2d]
        if op == 16:
            exp = mc_ref.put_bilin_scaled(src, 3, 3, w, h, mx, my, dx,
                                          dy, bpc) if ft < 0 else \
                mc_ref.put_8tap_scaled(src, 3, 3, w, h, mx, my, dx, dy,
                                       ft, bpc)
            np.testing.assert_array_equal(
                got.astype(np.int32), exp,
                err_msg=f"put_scaled f2d={f2d} {w}x{h} d={dx},{dy}")
        else:
            exp = mc_ref.prep_bilin_scaled(src, 3, 3, w, h, mx, my, dx,
                                           dy, bpc) if ft < 0 else \
                mc_ref.prep_8tap_scaled(src, 3, 3, w, h, mx, my, dx,
                                        dy, ft, bpc)
            np.testing.assert_array_equal(
                got.view(np.int16).astype(np.int32), exp,
                err_msg=f"prep_scaled f2d={f2d} {w}x{h} d={dx},{dy}")


@pytest.mark.parametrize("bpc", [8, 10])
def test_resize(bpc):
    rng = np.random.default_rng(800 + bpc)
    buf = io.BytesIO()
    cases = []
    for (src_w, dst_w, h) in [(64, 96, 8), (64, 128, 4), (80, 91, 6),
                              (32, 60, 5)]:
        step = mc_ref.scale_fac(src_w, dst_w)
        mx0 = mc_ref.get_upscale_x0(src_w, dst_w, step)
        src = _src(rng, h, src_w, bpc)
        buf.write(struct.pack("<BBHHiiii", 18, bpc, 0, h, dst_w, src_w,
                              step, mx0))
        buf.write(src.tobytes())
        cases.append((src_w, dst_w, h, step, mx0, src))
    out = run_harness(buf.getvalue())
    pos = 0
    for (src_w, dst_w, h, step, mx0, src) in cases:
        got = np.frombuffer(out[pos:pos + dst_w * h * 2],
                            np.uint16).reshape(h, dst_w)
        pos += dst_w * h * 2
        exp = mc_ref.resize_plane(src, src_w, h, dst_w, step, mx0, bpc)
        np.testing.assert_array_equal(
            got.astype(np.int32), exp,
            err_msg=f"resize {src_w}->{dst_w} h={h}")
