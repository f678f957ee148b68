"""Loop restoration (Wiener + self-guided), scalar golden path.

Behavioral parity with the reference kernels
(reference src/looprestoration_tmpl.c:44-1270): 7-tap separable Wiener
with intermediate bias/clipping, and self-guided restoration (box3 /
box5 / mix) with the x_by_x lookup. The reference's streaming row-ring
formulation is recast on padded arrays; row/column padding semantics
(lpf stripe-boundary rows, left/right edge replication) are identical
and validated against the reference DSP by tests/test_lr.py.

Padded row domain for a stripe of height h: rows -3..h+2 map to
  HAVE_TOP    ? [lpf0, lpf0, lpf1] : [s0, s0, s0]       (rows -3..-1)
  stripe rows 0..h-1 from the current (post-CDEF, pre-LR) picture
  HAVE_BOTTOM ? [lpfb0, lpfb1, lpfb1] : [last, last, last]
Columns -3..w+2 replicate at missing left/right edges.
"""
from __future__ import annotations

import numpy as np

from .. import tables

LR_HAVE_LEFT = 1
LR_HAVE_RIGHT = 2
LR_HAVE_TOP = 4
LR_HAVE_BOTTOM = 8


def _padded(src_rows, w, edges, lpad, rpad):
    """Build (n_rows, w + lpad + rpad) from full-width rows with edge
    replication per LR_HAVE_LEFT/RIGHT. src_rows: (n, w + lpad + rpad)
    candidate data where missing edge columns are garbage."""
    out = src_rows.copy()
    if not (edges & LR_HAVE_LEFT):
        out[:, :lpad] = out[:, lpad:lpad + 1]
    if not (edges & LR_HAVE_RIGHT):
        out[:, lpad + w:] = out[:, lpad + w - 1:lpad + w]
    return out


def build_stripe_rows(cur, pre_cdef, y, x, w, h, edges, pad,
                      bottom_min_h):
    """Assemble padded source rows for one stripe unit.
    cur: pre-LR (post-CDEF) plane; pre_cdef: post-deblock plane.
    bottom_min_h: the reference's streaming control flow only reaches
    the lpf bottom rows when the main loop is entered; for shorter
    stripes the bottom is replicated even with LR_HAVE_BOTTOM.
    Returns (h + 2*pad_v, w + 2*pad) int32 where pad_v = 3."""
    rows = np.zeros((h + 6, w + 2 * pad), np.int32)
    use_bottom = (edges & LR_HAVE_BOTTOM) and h >= bottom_min_h

    def grab(plane, yy):
        # index-clipped gather: out-of-plane columns only occur where
        # the edge flags exclude them (then _padded overwrites them)
        idx = np.clip(np.arange(x - pad, x + w + pad), 0,
                      plane.shape[1] - 1)
        return plane[yy, idx].astype(np.int32)

    for i in range(h):
        rows[3 + i] = grab(cur, y + i)
    if edges & LR_HAVE_TOP:
        rows[0] = rows[1] = grab(pre_cdef, y - 2)
        rows[2] = grab(pre_cdef, y - 1)
    else:
        rows[0] = rows[1] = rows[2] = rows[3]
    if use_bottom:
        rows[3 + h] = grab(pre_cdef, y + h)
        rows[4 + h] = rows[5 + h] = grab(pre_cdef, y + h + 1)
    else:
        rows[3 + h] = rows[4 + h] = rows[5 + h] = rows[2 + h]
    return _padded(rows, w, edges, pad, pad)


def wiener(cur, pre_cdef, y, x, w, h, filter_h, filter_v, edges,
           bd) -> np.ndarray:
    """reference looprestoration_tmpl.c:44-387 wiener_c."""
    S = build_stripe_rows(cur, pre_cdef, y, x, w, h, edges, 3,
                          4 if edges & LR_HAVE_TOP else 6)
    fh = np.array([filter_h[0], filter_h[1], filter_h[2],
                   128 - 2 * (filter_h[0] + filter_h[1] + filter_h[2]),
                   filter_h[2], filter_h[1], filter_h[0]], np.int32)
    fv = np.array([filter_v[0], filter_v[1], filter_v[2],
                   128 - 2 * (filter_v[0] + filter_v[1] + filter_v[2]),
                   filter_v[2], filter_v[1], filter_v[0]], np.int32)
    round_bits_h = 3 + (bd == 12) * 2
    clip_limit = 1 << (bd + 1 + 7 - round_bits_h)
    hsum = np.full((h + 6, w), 1 << (bd + 6), np.int32)
    for i in range(7):
        hsum += fh[i] * S[:, i:i + w]
    hor = np.clip((hsum + (1 << (round_bits_h - 1))) >> round_bits_h,
                  0, clip_limit - 1)
    round_bits_v = 11 - (bd == 12) * 2
    round_offset = 1 << (bd + round_bits_v - 1)
    vsum = np.full((h, w), -round_offset, np.int64)
    for i in range(7):
        vsum += fv[i].astype(np.int64) * hor[i:i + h]
    return np.clip((vsum + (1 << (round_bits_v - 1))) >> round_bits_v,
                   0, (1 << bd) - 1).astype(np.int32)


_XBYX = None


def _x_by_x():
    global _XBYX
    if _XBYX is None:
        _XBYX = tables.get("dav1d_sgr_x_by_x").astype(np.int64)
    return _XBYX


def _calc_ab(sumsq, ssum, s, bd, n, one_by_x):
    """reference looprestoration_tmpl.c:505-523 sgr_calc_row_ab.
    sumsq/ssum: int64 arrays. Returns (A, B)."""
    bdm8 = bd - 8
    a = (sumsq + ((1 << (2 * bdm8)) >> 1)) >> (2 * bdm8)
    b = (ssum + ((1 << bdm8) >> 1)) >> bdm8
    p = np.maximum(a * n - b * b, 0)
    z = (p * s + (1 << 19)) >> 20
    x = _x_by_x()[np.minimum(z, 255)]
    A = (x * ssum * one_by_x + (1 << 11)) >> 12
    return A, x


def _box_rows(S, w, r):
    """Column box sums of width (2r+1) over padded array S
    (cols -3..w+2 for pad 3): returns (n_rows, w+2) sum/sumsq for
    columns -1..w (the reference computes w+2 column positions)."""
    S64 = S.astype(np.int64)
    pad = (S.shape[1] - w) // 2
    ssum = np.zeros((S.shape[0], w + 2), np.int64)
    ssq = np.zeros((S.shape[0], w + 2), np.int64)
    # column j of output corresponds to source column (j-1); window
    # (j-1-r .. j-1+r) -> padded index (pad + j - 1 - r ..)
    for t in range(2 * r + 1):
        sl = S64[:, pad - 1 - r + t:pad - 1 - r + t + w + 2]
        ssum += sl
        ssq += sl * sl
    return ssq, ssum


def sgr(cur, pre_cdef, y, x, w, h, s0, s1, w0, w1, edges,
        bd) -> np.ndarray:
    """Self-guided restoration (reference looprestoration_tmpl.c sgr_*_c).
    s0: box5 strength (0 = off), s1: box3 strength (0 = off)."""
    pad = 3
    if s0:   # box5 (and mix) streaming thresholds; rows processed in
        # pairs, so the odd-h tail path never reaches the lpf bottom
        # rows (looprestoration_tmpl.c:992-1015 odd/output_1)
        bmin = 3 if edges & LR_HAVE_TOP else 5
        if h % 2:
            bmin = h + 1     # disable bottom for odd heights
    else:    # box3 only
        bmin = 3
    S = build_stripe_rows(cur, pre_cdef, y, x, w, h, edges, pad, bmin)
    # padded rows: index p maps to stripe row p-3 (valid -2..h+1 at 1..h+4)
    out = cur[y:y + h, x:x + w].astype(np.int64).copy()
    src = cur[y:y + h, x:x + w].astype(np.int64)

    def row(r):
        # padded-domain clamp [-2, h+1]; stripe row r lives at S[3 + r]
        return 3 + min(max(r, -2), h + 1)

    t3 = None
    t5 = None
    if s1:  # box3
        ssq, ssum = _box_rows(S, w, 1)
        A = np.zeros((h + 2, w + 2), np.int64)
        B = np.zeros((h + 2, w + 2), np.int64)
        for r in range(-1, h + 1):
            q = ssq[row(r - 1)] + ssq[row(r)] + ssq[row(r + 1)]
            m = ssum[row(r - 1)] + ssum[row(r)] + ssum[row(r + 1)]
            A[r + 1], B[r + 1] = _calc_ab(q, m, s1, bd, 9, 455)
        t3 = np.zeros((h, w), np.int64)
        for r in range(h):
            Pa = (B[r + 1, 1:w + 1] * 4 + (B[r + 1, 0:w] +
                  B[r + 1, 2:w + 2]) * 4 + B[r, 1:w + 1] * 4 +
                  B[r + 2, 1:w + 1] * 4 +
                  (B[r, 0:w] + B[r + 2, 0:w] +
                   B[r, 2:w + 2] + B[r + 2, 2:w + 2]) * 3)
            Pb = (A[r + 1, 1:w + 1] * 4 + (A[r + 1, 0:w] +
                  A[r + 1, 2:w + 2]) * 4 + A[r, 1:w + 1] * 4 +
                  A[r + 2, 1:w + 1] * 4 +
                  (A[r, 0:w] + A[r + 2, 0:w] +
                   A[r, 2:w + 2] + A[r + 2, 2:w + 2]) * 3)
            t3[r] = (Pb - Pa * src[r] + (1 << 8)) >> 9
    if s0:  # box5: A/B at odd rows r = -1, 1, 3, ...
        ssq, ssum = _box_rows(S, w, 2)
        nA = (h + 3) // 2 + 1
        A = {}
        B = {}
        r = -1
        while r <= h:
            q = sum(ssq[row(r + d)] for d in (-2, -1, 0, 1, 2))
            m = sum(ssum[row(r + d)] for d in (-2, -1, 0, 1, 2))
            A[r], B[r] = _calc_ab(q, m, s0, bd, 25, 164)
            r += 2
        t5 = np.zeros((h, w), np.int64)
        for r in range(h):
            if r % 2 == 0:
                Ba, Bb = B[r - 1], B[r + 1]
                Aa, Ab = A[r - 1], A[r + 1]
                Pa = ((Ba[1:w + 1] + Bb[1:w + 1]) * 6 +
                      (Ba[0:w] + Bb[0:w] + Ba[2:w + 2] + Bb[2:w + 2]) * 5)
                Pb = ((Aa[1:w + 1] + Ab[1:w + 1]) * 6 +
                      (Aa[0:w] + Ab[0:w] + Aa[2:w + 2] + Ab[2:w + 2]) * 5)
                t5[r] = (Pb - Pa * src[r] + (1 << 8)) >> 9
            else:
                Ba, Aa = B[r], A[r]
                Pa = Ba[1:w + 1] * 6 + (Ba[0:w] + Ba[2:w + 2]) * 5
                Pb = Aa[1:w + 1] * 6 + (Aa[0:w] + Aa[2:w + 2]) * 5
                t5[r] = (Pb - Pa * src[r] + (1 << 7)) >> 8
    if s0 and s1:
        v = w0 * t5 + w1 * t3
    elif s0:
        v = w0 * t5
    else:
        v = w1 * t3
    res = out + ((v + (1 << 10)) >> 11)
    return np.clip(res, 0, (1 << bd) - 1).astype(np.int32)


_SGRP = None


def _sgr_params_tbl():
    global _SGRP
    if _SGRP is None:
        _SGRP = tables.get("dav1d_sgr_params")
    return _SGRP


def apply_lr(pic, pre_cdef, plan) -> None:
    """Frame-wide loop restoration (reference lr_apply_tmpl.c:107-215
    lr_sbrow/dav1d_lr_sbrow). pre_cdef: post-deblock pre-CDEF plane
    copies (the stripe-boundary context rows, aka the lpf backup)."""
    f = plan.f
    fh = f.frame_hdr
    rst = fh.restoration
    if all(t == 0 for t in rst.type):
        return
    bd = pic.bpc
    sgrp = _sgr_params_tbl()
    n_sbrows = (f.bh + f.sb_step - 1) // f.sb_step

    for plane in range(3):
        if rst.type[plane] == 0 or (plane and f.layout == 0):
            continue
        ss_ver = 1 if (plane and f.layout == 1) else 0
        ss_hor = 1 if (plane and f.layout != 3) else 0
        # LR runs on the post-super-res picture (reference
        # lr_apply_tmpl.c uses f->sr_cur dims)
        w = (fh.width[1] + ss_hor) >> ss_hor
        h = (fh.height + ss_ver) >> ss_ver
        us_log2 = rst.unit_size[1 if plane else 0]
        us = 1 << us_log2
        max_us = us + (us >> 1)
        sb_log2 = 6 - ss_ver + f.sb128
        live = pic.planes[plane]
        src = live.astype(np.int32)          # pre-LR snapshot
        pre = pre_cdef[plane]

        for sby in range(n_sbrows):
            not_last = sby + 1 < n_sbrows
            next_row_y = (sby + 1) << sb_log2
            row_h = min(next_row_y - ((8 >> ss_ver) * not_last), h)
            offset = (8 >> ss_ver) * (sby > 0)
            y0 = (sby << sb_log2) - offset
            row_y = y0 + offset              # = sby << sb_log2
            aligned = row_y & ~(us - 1)
            if aligned and aligned + (us >> 1) > h:
                aligned -= us
            unit_row = plan.lr_units[plane][(aligned << ss_ver) >> 6]

            x = 0
            while x < w:
                last = x + max_us > w
                unit_w = (w - x) if last else us
                u = unit_row[(x << ss_hor) >> 6]
                if u is not None and u["type"]:
                    base = (LR_HAVE_LEFT if x > 0 else 0) | \
                           (0 if last else LR_HAVE_RIGHT)
                    y = y0
                    while y < row_h:
                        stripe_h = min((64 - 8 * (y == 0)) >> ss_ver,
                                       row_h - y)
                        e = base
                        if y > 0:
                            e |= LR_HAVE_TOP
                        if not (sby + 1 == n_sbrows and
                                y + stripe_h == row_h):
                            e |= LR_HAVE_BOTTOM
                        if u["type"] == 2:        # WIENER
                            out = wiener(src, pre, y, x, unit_w, stripe_h,
                                         u["filter_h"], u["filter_v"],
                                         e, bd)
                        else:                      # SGRPROJ + idx
                            idx = u["type"] - 3
                            s0, s1 = int(sgrp[idx][0]), int(sgrp[idx][1])
                            w0 = u["sgr_weights"][0]
                            w1 = 128 - (u["sgr_weights"][0] +
                                        u["sgr_weights"][1])
                            out = sgr(src, pre, y, x, unit_w, stripe_h,
                                      s0, s1, w0, w1, e, bd)
                        live[y:y + stripe_h, x:x + unit_w] = \
                            out.astype(live.dtype)
                        y += stripe_h
                x += unit_w
