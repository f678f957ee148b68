"""Reference-MV prediction: spatial scans + temporal projection.

Python equivalent of the reference's refmvs engine
(reference src/refmvs.c:36-940, src/env.h:462-519): candidate stack
construction (dav1d_refmvs_find), temporal MV save/load projection
(save_tmvs/load_tmvs), global-MV evaluation, and the drl/newmv/refmv/
globalmv context derivation the symbol decoder needs.

Representation: full-frame numpy arrays instead of the reference's
ring-buffered sbrow windows — identical semantics, simpler indexing.
Per 4x4: mv[y4][x4][2 refs][2 comps] int32 (x, y order matches the
reference's struct: we store (y, x)), ref[y4][x4][2] int8, bs, mf.
"""
from __future__ import annotations

import numpy as np

from . import levels as lv
from ..bitstream.obu import get_poc_diff

INVALID_MV = -32768  # both components == -32768 means invalid

DIV_MULT = np.array([
    0, 16384, 8192, 5461, 4096, 3276, 2730, 2340,
    2048, 1820, 1638, 1489, 1365, 1260, 1170, 1092,
    1024, 963, 910, 862, 819, 780, 744, 712,
    682, 655, 630, 606, 585, 564, 546, 528], np.int32)


def iclip(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def apply_sign(v, s):
    return -v if s < 0 else v


def mv_is_invalid(m):
    return m[0] == INVALID_MV and m[1] == INVALID_MV


def fix_int_mv_precision(y, x):
    x = (x - (x >> 15) + 3) & ~7
    y = (y - (y >> 15) + 3) & ~7
    # keep 16-bit two's complement semantics
    return _s16(y), _s16(x)


def _s16(v):
    v &= 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def fix_mv_precision(fh, y, x):
    if fh.force_integer_mv:
        return fix_int_mv_precision(y, x)
    if not fh.hp:
        x = (x - (x >> 15)) & ~1
        y = (y - (y >> 15)) & ~1
        return _s16(y), _s16(x)
    return y, x


def get_gmv_2d(gmv, bx4, by4, bw4, bh4, fh):
    """reference env.h:478-519. Returns (y, x)."""
    from ..bitstream.headers import WarpedMotionType
    if gmv.type == WarpedMotionType.IDENTITY:
        return (0, 0)
    if gmv.type == WarpedMotionType.TRANSLATION:
        y = gmv.matrix[0] >> 13
        x = gmv.matrix[1] >> 13
        if fh.force_integer_mv:
            y, x = fix_int_mv_precision(y, x)
        return (y, x)
    x = bx4 * 4 + bw4 * 2 - 1
    y = by4 * 4 + bh4 * 2 - 1
    xc = (gmv.matrix[2] - (1 << 16)) * x + gmv.matrix[3] * y + gmv.matrix[0]
    yc = (gmv.matrix[5] - (1 << 16)) * y + gmv.matrix[4] * x + gmv.matrix[1]
    shift = 16 - (3 - (not fh.hp))
    rnd = (1 << shift) >> 1
    ry = apply_sign(((abs(yc) + rnd) >> shift) << (not fh.hp), yc)
    rx = apply_sign(((abs(xc) + rnd) >> shift) << (not fh.hp), xc)
    ry, rx = _s16(ry), _s16(rx)
    if fh.force_integer_mv:
        ry, rx = fix_int_mv_precision(ry, rx)
    return (ry, rx)


def mv_projection(my, mx, num, den):
    """reference refmvs.c:177-192."""
    frac = num * int(DIV_MULT[den])
    y = my * frac
    x = mx * frac
    return (iclip((y + 8192 + (y >> 31)) >> 14, -0x3FFF, 0x3FFF),
            iclip((x + 8192 + (x >> 31)) >> 14, -0x3FFF, 0x3FFF))


class RefMvsFrame:
    """Per-frame refmvs state (refmvs_frame + full-frame block array)."""

    def __init__(self, seq_hdr, frm_hdr, ref_poc, ref_ref_poc, rp_ref):
        """ref_poc: list[7] frame_offsets of the refs; ref_ref_poc:
        [7][7]; rp_ref: list of 7 (temporal block arrays or None),
        each a dict {mv: (h8, w8, 2) int16-ish, ref: (h8, w8) uint8}."""
        self.frm_hdr = frm_hdr
        self.seq_hdr = seq_hdr
        self.sbsz = 16 << seq_hdr.sb128
        self.iw8 = (frm_hdr.width[0] + 7) >> 3
        self.ih8 = (frm_hdr.height + 7) >> 3
        self.iw4 = self.iw8 << 1
        self.ih4 = self.ih8 << 1
        self.stride8 = ((frm_hdr.width[0] + 127) & ~127) >> 3
        w4a = self.stride8 << 1

        # full-frame spatial block state
        h4a = (self.ih4 + 31) & ~31
        self.r_mv = np.zeros((h4a, w4a, 2, 2), np.int32)   # [..][ref][y,x]
        self.r_ref = np.zeros((h4a, w4a, 2), np.int32)
        self.r_bs = np.zeros((h4a, w4a), np.int32)
        self.r_mf = np.zeros((h4a, w4a), np.int32)

        # temporal: this frame's save target
        self.rp_mv = np.zeros((self.ih8, self.stride8, 2), np.int32)
        self.rp_ref_idx = np.zeros((self.ih8, self.stride8), np.int32)
        # projection buffer (full frame for simplicity)
        self.proj_mv = np.zeros((self.ih8, self.stride8, 2), np.int32)
        self.proj_ref = np.zeros((self.ih8, self.stride8), np.int32)

        self.sign_bias = [0] * 7
        self.mfmv_sign = [0] * 7
        self.pocdiff = [0] * 7
        poc = frm_hdr.frame_offset
        ohb = seq_hdr.order_hint_n_bits
        for i in range(7):
            d = get_poc_diff(ohb, ref_poc[i], poc)
            self.sign_bias[i] = int(d > 0)
            self.mfmv_sign[i] = int(d < 0)
            self.pocdiff[i] = iclip(get_poc_diff(ohb, poc, ref_poc[i]),
                                    -31, 31)

        # temporal mv refs selection (reference refmvs.c:857-898)
        self.n_mfmvs = 0
        self.mfmv_ref = []
        self.mfmv_ref2cur = []
        self.mfmv_ref2ref = []
        self.rp_ref = rp_ref
        if frm_hdr.use_ref_frame_mvs and ohb:
            total = 2
            if rp_ref[0] is not None and ref_ref_poc[0][6] != ref_poc[3]:
                self.mfmv_ref.append(0)
                total = 3
            if rp_ref[4] is not None and \
                    get_poc_diff(ohb, ref_poc[4], poc) > 0:
                self.mfmv_ref.append(4)
            if rp_ref[5] is not None and \
                    get_poc_diff(ohb, ref_poc[5], poc) > 0:
                self.mfmv_ref.append(5)
            if len(self.mfmv_ref) < total and rp_ref[6] is not None and \
                    get_poc_diff(ohb, ref_poc[6], poc) > 0:
                self.mfmv_ref.append(6)
            if len(self.mfmv_ref) < total and rp_ref[1] is not None:
                self.mfmv_ref.append(1)
            for n, refidx in enumerate(self.mfmv_ref):
                rpoc = ref_poc[refidx]
                diff1 = get_poc_diff(ohb, rpoc, poc)
                if abs(diff1) > 31:
                    self.mfmv_ref2cur.append(-32)   # INVALID_REF2CUR
                    self.mfmv_ref2ref.append([0] * 7)
                else:
                    self.mfmv_ref2cur.append(
                        -diff1 if refidx < 4 else diff1)
                    row = []
                    for m in range(7):
                        diff2 = get_poc_diff(ohb, rpoc,
                                             ref_ref_poc[refidx][m])
                        row.append(0 if diff2 < 0 or diff2 > 31 else diff2)
                    self.mfmv_ref2ref.append(row)
            self.n_mfmvs = len(self.mfmv_ref)
        self.use_ref_frame_mvs = self.n_mfmvs > 0

    # ------------------------------------------------------------------
    def load_tmvs(self, col_start8, col_end8, row_start8, row_end8):
        """Project temporal MVs into proj (reference refmvs.c:684-761)."""
        row_end8 = min(row_end8, self.ih8)
        col_start8i = max(col_start8 - 8, 0)
        col_end8i = min(col_end8 + 8, self.iw8)
        self.proj_mv[row_start8:row_end8, col_start8:col_end8] = INVALID_MV
        self.proj_ref[row_start8:row_end8, col_start8:col_end8] = 0
        for n in range(self.n_mfmvs):
            ref2cur = self.mfmv_ref2cur[n]
            if ref2cur == -32:
                continue
            refidx = self.mfmv_ref[n]
            ref_sign = refidx - 4
            rp = self.rp_ref[refidx]
            rmv, rref = rp["mv"], rp["ref"]
            for y in range(row_start8, row_end8):
                y_sb_align = y & ~7
                y_proj_start = max(y_sb_align, row_start8)
                y_proj_end = min(y_sb_align + 8, row_end8)
                x = col_start8i
                while x < col_end8i:
                    b_ref = int(rref[y, x])
                    if not b_ref:
                        x += 1
                        continue
                    ref2ref = self.mfmv_ref2ref[n][b_ref - 1]
                    if not ref2ref:
                        x += 1
                        continue
                    b_mvy, b_mvx = int(rmv[y, x, 0]), int(rmv[y, x, 1])
                    oy, ox = mv_projection(b_mvy, b_mvx, ref2cur, ref2ref)
                    # apply_sign(v, s): sign from (offset ^ ref_sign)
                    sx = ox if ref_sign >= 0 else -ox
                    sy = oy if ref_sign >= 0 else -oy
                    pos_x = x + apply_sign(abs(ox) >> 6,
                                           ox if ref_sign >= 0 else -ox)
                    pos_y = y + apply_sign(abs(oy) >> 6,
                                           oy if ref_sign >= 0 else -oy)
                    if y_proj_start <= pos_y < y_proj_end:
                        while True:
                            x_sb_align = x & ~7
                            if (pos_x >= max(x_sb_align - 8, col_start8) and
                                    pos_x < min(x_sb_align + 16, col_end8)):
                                self.proj_mv[pos_y, pos_x, 0] = b_mvy
                                self.proj_mv[pos_y, pos_x, 1] = b_mvx
                                self.proj_ref[pos_y, pos_x] = ref2ref
                            x += 1
                            if x >= col_end8i:
                                break
                            if (int(rref[y, x]) != b_ref or
                                    int(rmv[y, x, 0]) != b_mvy or
                                    int(rmv[y, x, 1]) != b_mvx):
                                break
                            pos_x += 1
                        x -= 1
                    else:
                        while True:
                            x += 1
                            if x >= col_end8i:
                                break
                            if (int(rref[y, x]) != b_ref or
                                    int(rmv[y, x, 0]) != b_mvy or
                                    int(rmv[y, x, 1]) != b_mvx):
                                break
                        x -= 1
                    x += 1

    # ------------------------------------------------------------------
    def save_tmvs(self, col_start8, col_end8, row_start8, row_end8):
        """reference refmvs.c:763-806 (C fallback semantics).

        Vectorized per 8x8 cell: the reference samples one odd 4x4
        position per cell and skips bw8 cells at a time, but splat
        fills every covered cell with the same (mv, ref, bs), so the
        per-cell computation is identical to the skipping walk."""
        row_end8 = min(row_end8, self.ih8)
        col_end8 = min(col_end8, self.iw8)
        if row_end8 <= row_start8 or col_end8 <= col_start8:
            return
        # samples the ODD spatial positions by4 = 2y+1 / bx4 = 2x+1
        # (reference refmvs.h:156, 771)
        ys = np.arange(row_start8, row_end8) * 2 + 1
        xs = np.arange(col_start8, col_end8) * 2 + 1
        rref = self.r_ref[np.ix_(ys, xs)].astype(np.int32)  # (H, W, 2)
        rmv = self.r_mv[np.ix_(ys, xs)].astype(np.int32)    # (H, W, 2, 2)
        # ref_sign = mfmv_sign (PAST refs; reference refmvs.h:154),
        # not sign_bias
        sg = np.asarray(self.mfmv_sign, np.int32)
        ref1 = rref[:, :, 1]
        ref0 = rref[:, :, 0]
        ok1 = (ref1 > 0) & (sg[np.maximum(ref1 - 1, 0)] != 0) & \
            ((np.abs(rmv[:, :, 1, 0]) | np.abs(rmv[:, :, 1, 1])) < 4096)
        ok0 = (ref0 > 0) & (sg[np.maximum(ref0 - 1, 0)] != 0) & \
            ((np.abs(rmv[:, :, 0, 0]) | np.abs(rmv[:, :, 0, 1])) < 4096)
        tmv_y = np.where(ok1, rmv[:, :, 1, 0],
                         np.where(ok0, rmv[:, :, 0, 0], 0))
        tmv_x = np.where(ok1, rmv[:, :, 1, 1],
                         np.where(ok0, rmv[:, :, 0, 1], 0))
        tref = np.where(ok1, ref1, np.where(ok0, ref0, 0))
        self.rp_mv[row_start8:row_end8, col_start8:col_end8, 0] = tmv_y
        self.rp_mv[row_start8:row_end8, col_start8:col_end8, 1] = tmv_x
        self.rp_ref_idx[row_start8:row_end8, col_start8:col_end8] = tref

    # ------------------------------------------------------------------
    def splat_mv(self, bx4, by4, bw4, bh4, mv_pair, ref_pair, bs, mf):
        """reference refmvs.c splat_mv_c / splat_intraref / splat_*."""
        self.r_mv[by4:by4 + bh4, bx4:bx4 + bw4, 0] = mv_pair[0]
        self.r_mv[by4:by4 + bh4, bx4:bx4 + bw4, 1] = mv_pair[1]
        self.r_ref[by4:by4 + bh4, bx4:bx4 + bw4, 0] = ref_pair[0]
        self.r_ref[by4:by4 + bh4, bx4:bx4 + bw4, 1] = ref_pair[1]
        self.r_bs[by4:by4 + bh4, bx4:bx4 + bw4] = bs
        self.r_mf[by4:by4 + bh4, bx4:bx4 + bw4] = mf


class RefMvsTile:
    """Tile view with tile bounds (refmvs_tile)."""

    def __init__(self, rf: RefMvsFrame, col_start4, col_end4,
                 row_start4, row_end4):
        self.rf = rf
        self.col_start = col_start4
        self.col_end = min(col_end4, rf.iw4)
        self.row_start = row_start4
        self.row_end = min(row_end4, rf.ih4)


def _blk(rf, by4, bx4):
    """Tuple view of a spatial block entry."""
    return (rf.r_mv[by4, bx4], rf.r_ref[by4, bx4],
            int(rf.r_bs[by4, bx4]), int(rf.r_mf[by4, bx4]))


def _add_spatial_candidate(mvstack, weight, rf, by4, bx4, ref, gmv,
                           flags):
    """reference refmvs.c:40-94. flags = [have_newmv, have_refmv]."""
    bmv = rf.r_mv[by4, bx4]
    bref = rf.r_ref[by4, bx4]
    mf = int(rf.r_mf[by4, bx4])
    if mv_is_invalid(bmv[0]):
        return
    if ref[1] == -1:
        for n in range(2):
            if int(bref[n]) == ref[0]:
                if (mf & 1) and not mv_is_invalid(gmv[0]):
                    cand = (int(gmv[0][0]), int(gmv[0][1]))
                else:
                    cand = (int(bmv[n, 0]), int(bmv[n, 1]))
                flags[1] = 1
                flags[0] |= mf >> 1
                for m in mvstack:
                    if m["mv"][0] == cand:
                        m["weight"] += weight
                        return
                if len(mvstack) < 8:
                    mvstack.append({"mv": [cand, (0, 0)], "weight": weight})
                return
    elif int(bref[0]) == ref[0] and int(bref[1]) == ref[1]:
        c0 = ((int(gmv[0][0]), int(gmv[0][1]))
              if (mf & 1) and not mv_is_invalid(gmv[0])
              else (int(bmv[0, 0]), int(bmv[0, 1])))
        c1 = ((int(gmv[1][0]), int(gmv[1][1]))
              if (mf & 1) and not mv_is_invalid(gmv[1])
              else (int(bmv[1, 0]), int(bmv[1, 1])))
        flags[1] = 1
        flags[0] |= mf >> 1
        for m in mvstack:
            if m["mv"][0] == c0 and m["mv"][1] == c1:
                m["weight"] += weight
                return
        if len(mvstack) < 8:
            mvstack.append({"mv": [c0, c1], "weight": weight})


def _scan_row(mvstack, ref, gmv, rf, by4, bx4_start, bw4, w4, max_rows,
              step, flags):
    """reference refmvs.c:96-135. Returns n_rows delta semantics."""
    x = 0
    cand_bs = int(rf.r_bs[by4, bx4_start])
    cand_bw4 = int(lv.block_dimensions[cand_bs][0])
    ln = max(step, min(bw4, cand_bw4))
    if bw4 <= cand_bw4:
        weight = 2 if bw4 == 1 else \
            max(2, min(2 * max_rows, int(lv.block_dimensions[cand_bs][1])))
        _add_spatial_candidate(mvstack, ln * weight, rf, by4, bx4_start,
                               ref, gmv, flags)
        return weight >> 1
    while True:
        _add_spatial_candidate(mvstack, ln * 2, rf, by4, bx4_start + x,
                               ref, gmv, flags)
        x += ln
        if x >= w4:
            return 1
        cand_bs = int(rf.r_bs[by4, bx4_start + x])
        cand_bw4 = int(lv.block_dimensions[cand_bs][0])
        ln = max(step, cand_bw4)


def _scan_col(mvstack, ref, gmv, rf, by4_start, bx4, bh4, h4, max_cols,
              step, flags):
    y = 0
    cand_bs = int(rf.r_bs[by4_start, bx4])
    cand_bh4 = int(lv.block_dimensions[cand_bs][1])
    ln = max(step, min(bh4, cand_bh4))
    if bh4 <= cand_bh4:
        weight = 2 if bh4 == 1 else \
            max(2, min(2 * max_cols, int(lv.block_dimensions[cand_bs][0])))
        _add_spatial_candidate(mvstack, ln * weight, rf, by4_start, bx4,
                               ref, gmv, flags)
        return weight >> 1
    while True:
        _add_spatial_candidate(mvstack, ln * 2, rf, by4_start + y, bx4,
                               ref, gmv, flags)
        y += ln
        if y >= h4:
            return 1
        cand_bs = int(rf.r_bs[by4_start + y, bx4])
        cand_bh4 = int(lv.block_dimensions[cand_bs][1])
        ln = max(step, cand_bh4)


def _add_temporal_candidate(rf, mvstack, y8, x8, ref, gmv_ctx_holder, tgmv):
    """reference refmvs.c:194-244."""
    my, mx = int(rf.proj_mv[y8, x8, 0]), int(rf.proj_mv[y8, x8, 1])
    if my == INVALID_MV and mx == INVALID_MV:
        return
    rb_ref = int(rf.proj_ref[y8, x8])
    py, px = mv_projection(my, mx, rf.pocdiff[ref[0] - 1], rb_ref)
    py, px = fix_mv_precision(rf.frm_hdr, py, px)
    if ref[1] == -1:
        if gmv_ctx_holder is not None:
            gmv_ctx_holder[0] = int(
                (abs(px - tgmv[0][1]) | abs(py - tgmv[0][0])) >= 16)
        cand = (py, px)
        for m in mvstack:
            if m["mv"][0] == cand:
                m["weight"] += 2
                return
        if len(mvstack) < 8:
            mvstack.append({"mv": [cand, (0, 0)], "weight": 2})
    else:
        qy, qx = mv_projection(my, mx, rf.pocdiff[ref[1] - 1], rb_ref)
        qy, qx = fix_mv_precision(rf.frm_hdr, qy, qx)
        c0, c1 = (py, px), (qy, qx)
        for m in mvstack:
            if m["mv"][0] == c0 and m["mv"][1] == c1:
                m["weight"] += 2
                return
        if len(mvstack) < 8:
            mvstack.append({"mv": [c0, c1], "weight": 2})


def refmvs_find(rt: RefMvsTile, ref, bs, edge_flags, by4, bx4):
    """reference refmvs.c:348-660 dav1d_refmvs_find.
    ref: (ref0, ref1) with dav1d numbering (0=intra ref for intrabc).
    Returns (mvstack list of {mv: [(y,x),(y,x)], weight}, ctx)."""
    from .intra_edge import (EDGE_I444_TOP_HAS_RIGHT,
                             EDGE_I444_LEFT_HAS_BOTTOM)
    rf = rt.rf
    b_dim = lv.block_dimensions[bs]
    bw4, bh4 = int(b_dim[0]), int(b_dim[1])
    w4 = min(min(bw4, 16), rt.col_end - bx4)
    h4 = min(min(bh4, 16), rt.row_end - by4)

    gmv = [(INVALID_MV, INVALID_MV), (INVALID_MV, INVALID_MV)]
    tgmv = [(0, 0), (0, 0)]
    from ..bitstream.headers import WarpedMotionType
    if ref[0] > 0:
        tgmv[0] = get_gmv_2d(rf.frm_hdr.gmv[ref[0] - 1], bx4, by4, bw4, bh4,
                             rf.frm_hdr)
        if rf.frm_hdr.gmv[ref[0] - 1].type > WarpedMotionType.TRANSLATION:
            gmv[0] = tgmv[0]
    if ref[1] > 0:
        tgmv[1] = get_gmv_2d(rf.frm_hdr.gmv[ref[1] - 1], bx4, by4, bw4, bh4,
                             rf.frm_hdr)
        if rf.frm_hdr.gmv[ref[1] - 1].type > WarpedMotionType.TRANSLATION:
            gmv[1] = tgmv[1]

    mvstack = []
    flags_row = [0, 0]   # [have_newmv, have_row_mvs]
    flags_col = [0, 0]
    max_rows = 0
    n_rows = None
    if by4 > rt.row_start:
        max_rows = min((by4 - rt.row_start + 1) >> 1, 2 + (bh4 > 1))
        n_rows = _scan_row(mvstack, ref, gmv, rf, by4 - 1, bx4, bw4, w4,
                           max_rows, 4 if bw4 >= 16 else 1, flags_row)
    max_cols = 0
    n_cols = None
    if bx4 > rt.col_start:
        max_cols = min((bx4 - rt.col_start + 1) >> 1, 2 + (bw4 > 1))
        n_cols = _scan_col(mvstack, ref, gmv, rf, by4, bx4 - 1, bh4, h4,
                           max_cols, 4 if bh4 >= 16 else 1, flags_col)

    if (n_rows is not None and (edge_flags & EDGE_I444_TOP_HAS_RIGHT) and
            max(bw4, bh4) <= 16 and bw4 + bx4 < rt.col_end):
        _add_spatial_candidate(mvstack, 4, rf, by4 - 1, bx4 + bw4, ref, gmv,
                               flags_row)

    have_newmv = flags_row[0] | flags_col[0]
    nearest_match = flags_col[1] + flags_row[1]
    nearest_cnt = len(mvstack)
    for m in mvstack:
        m["weight"] += 640

    # temporal
    globalmv_ctx_holder = [rf.frm_hdr.use_ref_frame_mvs]
    if rf.use_ref_frame_mvs:
        by8, bx8 = by4 >> 1, bx4 >> 1
        step_h = 2 if bw4 >= 16 else 1
        step_v = 2 if bh4 >= 16 else 1
        w8 = min((w4 + 1) >> 1, 8)
        h8 = min((h4 + 1) >> 1, 8)
        for y in range(0, h8, step_v):
            for x in range(0, w8, step_h):
                _add_temporal_candidate(
                    rf, mvstack, by8 + y, bx8 + x, ref,
                    globalmv_ctx_holder if not (x | y) else None, tgmv)
        if min(bw4, bh4) >= 2 and max(bw4, bh4) < 16:
            bh8, bw8 = bh4 >> 1, bw4 >> 1
            has_bottom = by8 + bh8 < min(rt.row_end >> 1, (by8 & ~7) + 8)
            if has_bottom and bx8 - 1 >= max(rt.col_start >> 1, bx8 & ~7):
                _add_temporal_candidate(rf, mvstack, by8 + bh8, bx8 - 1,
                                        ref, None, tgmv)
            if bx8 + bw8 < min(rt.col_end >> 1, (bx8 & ~7) + 8):
                if has_bottom:
                    _add_temporal_candidate(rf, mvstack, by8 + bh8,
                                            bx8 + bw8, ref, None, tgmv)
                if by8 + bh8 - 1 < min(rt.row_end >> 1, (by8 & ~7) + 8):
                    _add_temporal_candidate(rf, mvstack, by8 + bh8 - 1,
                                            bx8 + bw8, ref, None, tgmv)
    globalmv_ctx = globalmv_ctx_holder[0]

    # top/left corner: (n_rows | n_cols) != ~0U in the reference — OR
    # with ~0 saturates, so BOTH scans must have run (refmvs.c:457-461)
    if n_rows is not None and n_cols is not None:
        fr = [0, flags_row[1]]
        _add_spatial_candidate(mvstack, 4, rf, by4 - 1, bx4 - 1, ref,
                               gmv, fr)
        flags_row[1] = fr[1]

    # secondary rows/cols
    for n in (2, 3):
        if n_rows is not None and n > n_rows and n <= max_rows:
            by_sec = ((by4 - 2 * n + 1) | 1)
            fr = [0, flags_row[1]]
            n_rows += _scan_row(mvstack, ref, gmv, rf, by_sec, bx4 | 1,
                                bw4, w4, 1 + max_rows - n,
                                4 if bw4 >= 16 else 2, fr)
            flags_row[1] = fr[1]
        if n_cols is not None and n > n_cols and n <= max_cols:
            fc = [0, flags_col[1]]
            n_cols += _scan_col(mvstack, ref, gmv, rf, by4 | 1,
                                (bx4 - n * 2 + 1) | 1, bh4, h4,
                                1 + max_cols - n, 4 if bh4 >= 16 else 2, fc)
            flags_col[1] = fc[1]

    ref_match_count = flags_col[1] + flags_row[1]

    if nearest_match == 0:
        refmv_ctx = min(2, ref_match_count)
        newmv_ctx = int(ref_match_count > 0)
    elif nearest_match == 1:
        refmv_ctx = min(ref_match_count * 3, 4)
        newmv_ctx = 3 - have_newmv
    else:
        refmv_ctx = 5
        newmv_ctx = 5 - have_newmv

    # sort nearest then secondary by weight (stable bubble like ref)
    def _sort_range(lo, hi):
        ln = hi
        while ln > lo:
            last = lo
            for n in range(lo + 1, ln):
                if mvstack[n - 1]["weight"] < mvstack[n]["weight"]:
                    mvstack[n - 1], mvstack[n] = mvstack[n], mvstack[n - 1]
                    last = n
            ln = last

    _sort_range(0, nearest_cnt)
    _sort_range(nearest_cnt, len(mvstack))

    iw4, ih4 = rf.iw4, rf.ih4
    left = -(bx4 + bw4 + 4) * 4 * 8
    right = (iw4 - bx4 + 4) * 4 * 8
    top = -(by4 + bh4 + 4) * 4 * 8
    bottom = (ih4 - by4 + 4) * 4 * 8

    if ref[1] > 0:
        if len(mvstack) < 2:
            sign0 = rf.sign_bias[ref[0] - 1]
            sign1 = rf.sign_bias[ref[1] - 1]
            sz4 = min(w4, h4)
            same = [[None, None], [None, None]]   # same[i][comp]
            same_count = [0, 0, 0, 0]
            diff = [[None, None], [None, None]]

            def add_compound_ext(by_c, bx_c):
                bref = rf.r_ref[by_c, bx_c]
                bmv = rf.r_mv[by_c, bx_c]
                for n in range(2):
                    cand_ref = int(bref[n])
                    if cand_ref <= 0:
                        break
                    cy, cx = int(bmv[n, 0]), int(bmv[n, 1])
                    if cand_ref == ref[0]:
                        if same_count[0] < 2:
                            same[same_count[0]][0] = (cy, cx)
                            same_count[0] += 1
                        if same_count[3] < 2:
                            if sign1 ^ rf.sign_bias[cand_ref - 1]:
                                v = (-cy, -cx)
                            else:
                                v = (cy, cx)
                            diff[same_count[3]][1] = v
                            same_count[3] += 1
                    elif cand_ref == ref[1]:
                        if same_count[1] < 2:
                            same[same_count[1]][1] = (cy, cx)
                            same_count[1] += 1
                        if same_count[2] < 2:
                            if sign0 ^ rf.sign_bias[cand_ref - 1]:
                                v = (-cy, -cx)
                            else:
                                v = (cy, cx)
                            diff[same_count[2]][0] = v
                            same_count[2] += 1
                    else:
                        icand = (-cy, -cx)
                        if same_count[2] < 2:
                            diff[same_count[2]][0] = icand \
                                if sign0 ^ rf.sign_bias[cand_ref - 1] \
                                else (cy, cx)
                            same_count[2] += 1
                        if same_count[3] < 2:
                            diff[same_count[3]][1] = icand \
                                if sign1 ^ rf.sign_bias[cand_ref - 1] \
                                else (cy, cx)
                            same_count[3] += 1

            if n_rows is not None:
                x = 0
                while x < sz4:
                    bs_c = int(rf.r_bs[by4 - 1, bx4 + x])
                    add_compound_ext(by4 - 1, bx4 + x)
                    x += int(lv.block_dimensions[bs_c][0])
            if n_cols is not None:
                y = 0
                while y < sz4:
                    bs_c = int(rf.r_bs[by4 + y, bx4 - 1])
                    add_compound_ext(by4 + y, bx4 - 1)
                    y += int(lv.block_dimensions[bs_c][1])

            # merge
            for n in range(2):
                m = same_count[n]
                if m >= 2:
                    continue
                l_ = same_count[2 + n]
                if l_:
                    same[m][n] = diff[0][n]
                    m += 1
                    if m == 2:
                        continue
                    if l_ == 2:
                        same[1][n] = diff[1][n]
                        continue
                while m < 2:
                    same[m][n] = tgmv[n]
                    m += 1

            # append extended candidates (reference refmvs.c:596-605):
            # same[] lives at mvstack[cnt..]; if the only existing entry
            # equals same[0], take same[1] instead; weights forced to 2
            # same[] aliases mvstack[cnt..] in the reference: with cnt==1
            # the new slot is same[0] (same[1] is dropped), unless it
            # duplicates mvstack[0], in which case same[1] replaces it
            ext = [{"mv": [same[0][0], same[0][1]], "weight": 2},
                   {"mv": [same[1][0], same[1][1]], "weight": 2}]
            n0 = len(mvstack)
            if n0 == 1:
                if (mvstack[0]["mv"][0] == ext[0]["mv"][0] and
                        mvstack[0]["mv"][1] == ext[0]["mv"][1]):
                    mvstack.append(ext[1])
                else:
                    mvstack.append(ext[0])
            else:
                mvstack.extend(ext)
            mvstack[:] = mvstack[:2]

        for m in mvstack:
            m["mv"][0] = (iclip(m["mv"][0][0], top, bottom),
                          iclip(m["mv"][0][1], left, right))
            m["mv"][1] = (iclip(m["mv"][1][0], top, bottom),
                          iclip(m["mv"][1][1], left, right))

        rc = refmv_ctx >> 1
        if rc == 0:
            ctx = min(newmv_ctx, 1)
        elif rc == 1:
            ctx = 1 + min(newmv_ctx, 3)
        else:
            ctx = iclip(3 + newmv_ctx, 4, 7)
        return mvstack, len(mvstack), ctx

    if len(mvstack) < 2 and ref[0] > 0:
        sign = rf.sign_bias[ref[0] - 1]
        sz4 = min(w4, h4)

        def add_single_ext(by_c, bx_c):
            bref = rf.r_ref[by_c, bx_c]
            bmv = rf.r_mv[by_c, bx_c]
            for n in range(2):
                cand_ref = int(bref[n])
                if cand_ref <= 0:
                    break
                cy, cx = int(bmv[n, 0]), int(bmv[n, 1])
                if sign ^ rf.sign_bias[cand_ref - 1]:
                    cy, cx = -cy, -cx
                for m in mvstack:
                    if m["mv"][0] == (cy, cx):
                        break
                else:
                    mvstack.append({"mv": [(cy, cx), (0, 0)], "weight": 2})

        if n_rows is not None:
            x = 0
            while x < sz4 and len(mvstack) < 2:
                bs_c = int(rf.r_bs[by4 - 1, bx4 + x])
                add_single_ext(by4 - 1, bx4 + x)
                x += int(lv.block_dimensions[bs_c][0])
        if n_cols is not None:
            y = 0
            while y < sz4 and len(mvstack) < 2:
                bs_c = int(rf.r_bs[by4 + y, bx4 - 1])
                add_single_ext(by4 + y, bx4 - 1)
                y += int(lv.block_dimensions[bs_c][1])

    for m in mvstack:
        m["mv"][0] = (iclip(m["mv"][0][0], top, bottom),
                      iclip(m["mv"][0][1], left, right))

    # gmv padding entries are NOT counted (reference refmvs.c:648-649:
    # cnt is left untouched while mvstack[n<2] gets tgmv[0])
    cnt = len(mvstack)
    while len(mvstack) < 2:
        mvstack.append({"mv": [tgmv[0], (0, 0)], "weight": 2})

    ctx = (refmv_ctx << 4) | (globalmv_ctx << 3) | newmv_ctx
    return mvstack, cnt, ctx
