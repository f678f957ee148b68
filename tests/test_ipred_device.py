"""Batched device ipred kernels vs the golden model (ops/ipred_ref.py)
over random edges, modes, angles, sizes and bitdepths."""
import numpy as np
import pytest

from dav1d_tpu.ops import ipred, ipred_ref
from dav1d_tpu import tables

SPLAT_MODES = [ipred_ref.DC_PRED, ipred_ref.DC_128_PRED,
               ipred_ref.TOP_DC_PRED, ipred_ref.LEFT_DC_PRED,
               ipred_ref.VERT_PRED, ipred_ref.HOR_PRED,
               ipred_ref.PAETH_PRED, ipred_ref.SMOOTH_PRED,
               ipred_ref.SMOOTH_V_PRED, ipred_ref.SMOOTH_H_PRED]


def _rand_edges(rng, n, bd):
    e = rng.integers(0, 1 << bd, (n, ipred.EDGE_LEN)).astype(np.int32)
    return e


def _golden(mode, edges_row, w, h, angle, bd, max_w=0, max_h=0):
    e = ipred_ref.Edge()
    e.buf[:] = edges_row
    if mode == ipred_ref.Z2_PRED:
        return ipred_ref.ipred_z2(e, w, h, angle, bd, max_w, max_h)
    return ipred_ref.PREDICTORS[mode](e, w, h, angle, bd)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 4), (16, 16), (4, 16),
                                 (32, 8), (64, 64)])
@pytest.mark.parametrize("bd", [8, 10])
def test_splat_family(w, h, bd):
    rng = np.random.default_rng(hash((w, h, bd)) & 0xffff)
    n = 16
    edges = _rand_edges(rng, n, bd)
    modes = np.array([SPLAT_MODES[i % len(SPLAT_MODES)]
                      for i in range(n)], np.int32)
    fn = ipred.splat_family_fn(n, w, h, bd)
    out = np.asarray(fn(edges, modes))
    for i in range(n):
        ref = _golden(int(modes[i]), edges[i], w, h, 0, bd)
        assert np.array_equal(out[i], ref), (i, int(modes[i]))


@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (16, 8), (32, 32)])
@pytest.mark.parametrize("mode", ["z1", "z3"])
def test_z1_z3(w, h, mode):
    bd = 8
    rng = np.random.default_rng(hash((w, h, mode)) & 0xffff)
    n = 16
    edges = _rand_edges(rng, n, bd)
    deriv = tables.get("dav1d_dr_intra_derivative")
    ief = 1 << 10
    # coded AV1 angles are base + 3*delta (ipred_prepare mode_to_angle),
    # always multiples-of-3 offsets >= 3 from the axis — the derivative
    # table is only defined there (44 entries)
    raw_angles = rng.choice(np.arange(3, 88, 3), n)
    sm = rng.integers(0, 2, n)
    for upsample in (0, 1):
        dxs = np.zeros(n, np.int32)
        strs = np.zeros(n, np.int32)
        keep = []
        for i in range(n):
            a = int(raw_angles[i])
            is_sm = int(sm[i])
            up = ipred_ref._get_upsample(w + h, a, is_sm)
            if up != upsample:
                continue
            keep.append(i)
            d = int(deriv[(90 - a) >> 1]) if mode == "z1" else \
                int(deriv[(270 - (a + 180)) >> 1])
            dxs[i] = d << 1 if up else d
            strs[i] = 0 if up else \
                ipred_ref._get_filter_strength(w + h, a, is_sm)
        if not keep:
            continue
        fn = ipred.z1_fn(n, w, h, bd, upsample) if mode == "z1" else \
            ipred.z3_fn(n, w, h, bd, upsample)
        out = np.asarray(fn(edges, dxs, strs))
        for i in keep:
            a = int(raw_angles[i])
            full = (90 - a if mode == "z1" else a + 180) | \
                (int(sm[i]) << 9) | ief
            gm = ipred_ref.Z1_PRED if mode == "z1" else ipred_ref.Z3_PRED
            ref = _golden(gm, edges[i], w, h, full, bd)
            assert np.array_equal(out[i], ref), (i, a, upsample)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (32, 16)])
@pytest.mark.parametrize("bd", [8, 10])
def test_filter(w, h, bd):
    rng = np.random.default_rng(hash((w, h, bd, "f")) & 0xffff)
    n = 8
    edges = _rand_edges(rng, n, bd)
    fidx = rng.integers(0, 5, n).astype(np.int32)
    taps = np.stack([ipred.filter_taps(int(i)) for i in fidx])
    fn = ipred.filter_fn(n, w, h, bd)
    out = np.asarray(fn(edges, taps))
    for i in range(n):
        e = ipred_ref.Edge()
        e.buf[:] = edges[i]
        ref = ipred_ref.ipred_filter(e, w, h, int(fidx[i]), bd)
        assert np.array_equal(out[i], ref), i


@pytest.mark.parametrize("cw,ch,ssh,ssv", [(4, 4, 1, 1), (8, 16, 1, 1),
                                           (16, 8, 1, 0), (16, 16, 0, 0),
                                           (32, 32, 1, 1)])
@pytest.mark.parametrize("bd", [8, 10])
def test_cfl(cw, ch, ssh, ssv, bd):
    rng = np.random.default_rng(hash((cw, ch, ssh, ssv, bd)) & 0xffff)
    n = 8
    Hp, Wp = 256, 256
    y_plane = rng.integers(0, 1 << bd, (Hp, Wp)).astype(np.int32)
    edges = _rand_edges(rng, n, bd)
    jobs = np.zeros((n, 6), np.int32)
    dc_modes = [ipred_ref.DC_PRED, ipred_ref.DC_128_PRED,
                ipred_ref.TOP_DC_PRED, ipred_ref.LEFT_DC_PRED]
    for i in range(n):
        jobs[i, 0] = int(rng.integers(0, Hp - (ch << ssv)))   # ypy
        jobs[i, 1] = int(rng.integers(0, Wp - (cw << ssh)))   # ypx
        jobs[i, 2] = int(rng.integers(1, ch // 4 + 1)) * 4    # nh
        jobs[i, 3] = int(rng.integers(1, cw // 4 + 1)) * 4    # nw
        jobs[i, 4] = int(rng.integers(-16, 17)) or 1          # alpha
        jobs[i, 5] = dc_modes[i % 4]
    fn = ipred.cfl_fn(n, cw, ch, ssh, ssv, bd)
    out = np.asarray(fn(y_plane, edges, jobs))
    for i in range(n):
        ypy, ypx, nh, nw, alpha, mode = (int(v) for v in jobs[i])
        ac = ipred_ref.cfl_ac(y_plane, ypy, ypx, ssh, ssv,
                              (cw - nw) // 4, (ch - nh) // 4, cw, ch)
        e = ipred_ref.Edge()
        e.buf[:] = edges[i]
        dc = ipred_ref.cfl_dc(mode, e, cw, ch, bd)
        ref = ipred_ref.cfl_pred(dc, ac, alpha, cw, ch, bd)
        assert np.array_equal(out[i], ref), i


@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (16, 8)])
def test_z2(w, h):
    bd = 8
    rng = np.random.default_rng(hash((w, h)) & 0xffff)
    n = 16
    edges = _rand_edges(rng, n, bd)
    deriv = tables.get("dav1d_dr_intra_derivative")
    ief = 1 << 10
    angles = 90 + rng.choice(np.arange(3, 88, 3), n)  # z2 range (90, 180)
    sm = rng.integers(0, 2, n)
    max_ws = rng.integers(1, w + 1, n).astype(np.int32) * 4
    max_hs = rng.integers(1, h + 1, n).astype(np.int32) * 4
    for ua in (0, 1):
        for ul in (0, 1):
            dxs = np.zeros(n, np.int32)
            dys = np.zeros(n, np.int32)
            st = np.zeros(n, np.int32)
            sl = np.zeros(n, np.int32)
            keep = []
            for i in range(n):
                a = int(angles[i])
                is_sm = int(sm[i])
                up_a = ipred_ref._get_upsample(w + h, a - 90, is_sm)
                up_l = ipred_ref._get_upsample(w + h, 180 - a, is_sm)
                if (up_a, up_l) != (ua, ul):
                    continue
                keep.append(i)
                dy = int(deriv[(a - 90) >> 1])
                dx = int(deriv[(180 - a) >> 1])
                dxs[i] = dx << 1 if up_a else dx
                dys[i] = dy << 1 if up_l else dy
                st[i] = 0 if up_a else \
                    ipred_ref._get_filter_strength(w + h, a - 90, is_sm)
                sl[i] = 0 if up_l else \
                    ipred_ref._get_filter_strength(w + h, 180 - a, is_sm)
            if not keep:
                continue
            fn = ipred.z2_fn(n, w, h, bd, ua, ul)
            out = np.asarray(fn(edges, dxs, dys, st, sl, max_ws, max_hs))
            for i in keep:
                full = int(angles[i]) | (int(sm[i]) << 9) | ief
                ref = _golden(ipred_ref.Z2_PRED, edges[i], w, h, full,
                              bd, int(max_ws[i]), int(max_hs[i]))
                assert np.array_equal(out[i], ref), (i, int(angles[i]),
                                                     ua, ul)
