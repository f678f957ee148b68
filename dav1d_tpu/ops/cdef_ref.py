"""CDEF (constrained directional enhancement filter), scalar golden path.

Behavioral parity with the reference:
- kernel + direction search: reference src/cdef_tmpl.c:37-305
  (padding with INT16_MIN sentinels, primary/secondary taps with
  constrain(), dir search over 8 partial-sum projections)
- application: reference src/cdef_apply_tmpl.c:91-330 dav1d_cdef_brow,
  simplified to a frame-wide pass reading from a pre-CDEF copy of the
  deblocked planes (equivalent to the reference's line-buffer scheme,
  which exists to provide pre-CDEF pixels in streaming order).
"""
from __future__ import annotations

import numpy as np

from .. import tables

FILL = -32768   # INT16_MIN sentinel (cdef_tmpl.c:45-52)


def _dirs():
    # dav1d_cdef_directions[2 + 8 + 2][2]: offsets y*12+x into the
    # reference's stride-12 tmp buffer; decode to (dy, dx)
    raw = tables.get("dav1d_cdef_directions").astype(np.int32)
    out = np.zeros((12, 2, 2), np.int32)
    for i in range(12):
        for k in range(2):
            off = int(raw[i, k])
            for dy in (-2, -1, 0, 1, 2):
                dx = off - dy * 12
                if -2 <= dx <= 2:
                    out[i, k] = (dy, dx)
                    break
    return out


_DIRS = None


def cdef_dirs():
    global _DIRS
    if _DIRS is None:
        _DIRS = _dirs()
    return _DIRS


def constrain(diff, threshold, shift):
    adiff = np.abs(diff)
    v = np.minimum(adiff, np.maximum(0, threshold - (adiff >> shift)))
    return np.where(diff < 0, -v, v)


def find_dir(blk8: np.ndarray, bd: int):
    """reference cdef_tmpl.c:239-305 cdef_find_dir_c.
    blk8: (8, 8) int array of pre-CDEF pixels."""
    bdm8 = bd - 8
    px = (blk8.astype(np.int32) >> bdm8) - 128
    partial_sum_hv = np.zeros((2, 8), np.int64)
    partial_sum_diag = np.zeros((2, 15), np.int64)
    partial_sum_alt = np.zeros((4, 11), np.int64)
    for y in range(8):
        for x in range(8):
            p = int(px[y, x])
            partial_sum_diag[0][y + x] += p
            partial_sum_alt[0][y + (x >> 1)] += p
            partial_sum_hv[0][y] += p
            partial_sum_alt[1][3 + y - (x >> 1)] += p
            partial_sum_diag[1][7 + y - x] += p
            partial_sum_alt[2][3 - (y >> 1) + x] += p
            partial_sum_hv[1][x] += p
            partial_sum_alt[3][(y >> 1) + x] += p
    cost = np.zeros(8, np.uint64)
    cost[2] = (partial_sum_hv[0] ** 2).sum() * 105
    cost[6] = (partial_sum_hv[1] ** 2).sum() * 105
    div_table = [840, 420, 280, 210, 168, 140, 120]
    for n in range(7):
        d = div_table[n]
        cost[0] += (partial_sum_diag[0][n] ** 2 +
                    partial_sum_diag[0][14 - n] ** 2) * d
        cost[4] += (partial_sum_diag[1][n] ** 2 +
                    partial_sum_diag[1][14 - n] ** 2) * d
    cost[0] += partial_sum_diag[0][7] ** 2 * 105
    cost[4] += partial_sum_diag[1][7] ** 2 * 105
    for n in range(4):
        c = 0
        for m in range(5):
            c += partial_sum_alt[n][3 + m] ** 2
        c *= 105
        for m in range(3):
            d = div_table[2 * m + 1]
            c += (partial_sum_alt[n][m] ** 2 +
                  partial_sum_alt[n][10 - m] ** 2) * d
        cost[n * 2 + 1] = c
    best_dir = int(np.argmax(cost))  # first max (ties -> lowest) like C >
    # C uses strict > so first occurrence wins; argmax does the same
    var = int((int(cost[best_dir]) - int(cost[best_dir ^ 4])) >> 10)
    return best_dir, var


def adjust_strength(strength: int, var: int) -> int:
    """reference cdef_apply_tmpl.c:91-95."""
    if not var:
        return 0
    i = min((var >> 6).bit_length() - 1, 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


def _ulog2(v: int) -> int:
    return v.bit_length() - 1


def filter_block(dst: np.ndarray, src_pad: np.ndarray, pri_strength: int,
                 sec_strength: int, dir_: int, damping: int, w: int,
                 h: int, bd: int) -> None:
    """reference cdef_tmpl.c:105-216 cdef_filter_block_c.
    dst: (h, w) int32 view (modified in place);
    src_pad: (h+4, w+4) int32 with FILL sentinels, block at [2:2+h,2:2+w].
    """
    dirs = cdef_dirs()
    px = dst.copy()
    summ = np.zeros((h, w), np.int64)
    if pri_strength:
        bdm8 = bd - 8
        pri_tap = 4 - ((pri_strength >> bdm8) & 1)
        pri_shift = max(0, damping - _ulog2(pri_strength))
    if sec_strength:
        sec_shift = damping - _ulog2(sec_strength)

    if pri_strength and sec_strength:
        mn = px.copy()
        mx = px.copy()
    have_minmax = bool(pri_strength and sec_strength)

    def tap(dy, dx):
        return src_pad[2 + dy:2 + dy + h, 2 + dx:2 + dx + w]

    if pri_strength:
        pri_tap_k = pri_tap
        for k in range(2):
            dy, dx = dirs[2 + dir_, k]
            p0 = tap(dy, dx)
            p1 = tap(-dy, -dx)
            summ += pri_tap_k * constrain(p0 - px, pri_strength, pri_shift)
            summ += pri_tap_k * constrain(p1 - px, pri_strength, pri_shift)
            pri_tap_k = (pri_tap_k & 3) | 2
            if have_minmax:
                # umin: FILL (as unsigned) never lowers the minimum
                for s in (p0, p1):
                    mn[:] = np.where((s != FILL) & (s < mn), s, mn)
                    mx[:] = np.maximum(mx, s)
    if sec_strength:
        for k in range(2):
            for base in (4, 0):   # dir + 2, dir - 2
                dy, dx = dirs[base + dir_, k]
                s0 = tap(dy, dx)
                s1 = tap(-dy, -dx)
                sec_tap = 2 - k
                summ += sec_tap * constrain(s0 - px, sec_strength, sec_shift)
                summ += sec_tap * constrain(s1 - px, sec_strength, sec_shift)
                if have_minmax:
                    for s in (s0, s1):
                        mn[:] = np.where((s != FILL) & (s < mn), s, mn)
                        mx[:] = np.maximum(mx, s)

    res = px + ((summ - (summ < 0) + 8) >> 4)
    if have_minmax:
        res = np.clip(res, mn, mx)
    dst[:] = res.astype(np.int32)


UV_DIRS = ((0, 1, 2, 3, 4, 5, 6, 7), (7, 0, 2, 4, 5, 6, 6, 6))


def apply_cdef(pic, plan) -> None:
    """Frame-wide CDEF (reference cdef_apply_tmpl.c dav1d_cdef_brow)."""
    f = plan.f
    fh = f.frame_hdr
    cd = fh.cdef
    if not f.seq_hdr.cdef:
        return
    if not any(cd.y_strength[i] or cd.uv_strength[i]
               for i in range(1 << cd.n_bits)):
        return
    bd = pic.bpc
    bdm8 = bd - 8
    damping = cd.damping + bdm8
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    uv_dir = UV_DIRS[1 if (f.layout == 2) else 0]

    # noskip per (8px row pair, 4x4 col): any non-skip 4x4
    nsk = np.zeros(((f.bh + 1) >> 1, f.bw), bool)
    b4_noskip = plan.b4_skip == 0
    nsk[:, :] = b4_noskip[0::2, :]
    nsk[:f.bh >> 1, :] |= b4_noskip[1::2, :]

    # pre-CDEF copies (source for all filtering)
    srcs = [p.astype(np.int32) for p in pic.planes]
    dsts = [p.astype(np.int32) for p in pic.planes]

    for by in range(0, f.bh, 2):
        for bx in range(0, f.bw, 2):
            cdef_idx = int(plan.cdef_idx[by >> 4, bx >> 4])
            if cdef_idx == -1:
                continue
            y_lvl = cd.y_strength[cdef_idx]
            uv_lvl = cd.uv_strength[cdef_idx]
            if not y_lvl and not uv_lvl:
                continue
            if not (nsk[by >> 1, bx] or
                    (bx + 1 < f.bw and nsk[by >> 1, bx + 1])):
                continue

            y_pri = (y_lvl >> 2) << bdm8
            y_sec = y_lvl & 3
            y_sec += y_sec == 3
            y_sec <<= bdm8
            uv_pri = (uv_lvl >> 2) << bdm8
            uv_sec = uv_lvl & 3
            uv_sec += uv_sec == 3
            uv_sec <<= bdm8

            have_top = by > 0
            have_bottom = by + 2 < f.bh
            have_left = bx > 0
            have_right = bx + 2 < f.bw

            dir_ = 0
            var = 0
            if y_pri or uv_pri:
                dir_, var = find_dir(srcs[0][by * 4:by * 4 + 8,
                                             bx * 4:bx * 4 + 8], bd)

            if y_lvl:
                pad = np.full((12, 12), FILL, np.int32)
                y0, x0 = by * 4, bx * 4
                ys = 0 if have_top else 2
                ye = 12 if have_bottom else 10
                xs = 0 if have_left else 2
                xe = 12 if have_right else 10
                pad[ys:ye, xs:xe] = srcs[0][y0 - 2 + ys:y0 - 2 + ye,
                                            x0 - 2 + xs:x0 - 2 + xe]
                adj = adjust_strength(y_pri, var) if y_pri else 0
                if adj or y_sec:
                    filter_block(dsts[0][y0:y0 + 8, x0:x0 + 8], pad, adj,
                                 y_sec, dir_ if y_pri else 0, damping,
                                 8, 8, bd)
            if uv_lvl and f.layout != 0:
                w = 8 >> ss_hor
                h = 8 >> ss_ver
                uvdir = uv_dir[dir_] if uv_pri else 0
                uvdamp = damping - 1  # reference cdef_apply_tmpl.c:285
                for pl in (1, 2):
                    y0 = (by * 4) >> ss_ver
                    x0 = (bx * 4) >> ss_hor
                    pad = np.full((h + 4, w + 4), FILL, np.int32)
                    ys = 0 if have_top else 2
                    ye = h + 4 if have_bottom else h + 2
                    xs = 0 if have_left else 2
                    xe = w + 4 if have_right else w + 2
                    pad[ys:ye, xs:xe] = srcs[pl][y0 - 2 + ys:y0 - 2 + ye,
                                                 x0 - 2 + xs:x0 - 2 + xe]
                    filter_block(dsts[pl][y0:y0 + h, x0:x0 + w], pad,
                                 uv_pri, uv_sec, uvdir, uvdamp, w, h, bd)

    for i, p in enumerate(pic.planes):
        p[:] = dsts[i].astype(p.dtype)
