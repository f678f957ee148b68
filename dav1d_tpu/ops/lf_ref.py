"""Deblocking filter (scalar/numpy golden path).

Behavioral parity with the reference deblocker:
- kernel: reference src/loopfilter_tmpl.c:37-162 loop_filter (wd 4/6/8/16,
  fm / flat8in / flat8out decisions, hev narrow filter)
- mask derivation: reference src/lf_mask.c decomp_tx / mask_edges_* /
  create_lf_mask_* recast as dense per-4x4-edge class grids (-1 = no
  filter, else the strength class feeding wd); full-frame grids make the
  reference's tile-boundary strength fix-ups (lf_apply_tmpl.c:331-402)
  fall out naturally since the neighbour lookup is the true neighbour.
- apply order: all vertical edges, then all horizontal (equivalent to the
  reference's per-sbrow cols-then-rows schedule, since vertical filtering
  never reads row-filtered pixels).
"""
from __future__ import annotations

import numpy as np

from ..entropy import levels as lv


def calc_eih(sharpness: int):
    """reference lf_mask.c:385-402 dav1d_calc_eih."""
    e = np.zeros(64, np.int32)
    i_ = np.zeros(64, np.int32)
    for level in range(64):
        limit = level
        if sharpness > 0:
            limit >>= (sharpness + 3) >> 2
            limit = min(limit, 9 - sharpness)
        limit = max(limit, 1)
        i_[level] = limit
        e[level] = 2 * (level + 2) + limit
    return e, i_


WD_OFF = {4: 2, 6: 3, 8: 4, 16: 7}


def _filter_segment(seg: np.ndarray, E: int, I: int, H: int, wd: int,
                    bd: int) -> None:
    """Filter one 4-line edge segment in place.
    seg: (4, 2*off) int32 view with q0 at column off = WD_OFF[wd]."""
    off = WD_OFF[wd]
    bdm8 = bd - 8
    F = 1 << bdm8
    E <<= bdm8
    I <<= bdm8
    H <<= bdm8
    p = lambda i: seg[:, off - 1 - i]
    q = lambda i: seg[:, off + i]
    p1, p0, q0, q1 = p(1), p(0), q(0), q(1)

    fm = ((np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I) &
          (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E))
    if wd > 4:
        p2, q2 = p(2), q(2)
        fm &= (np.abs(p2 - p1) <= I) & (np.abs(q2 - q1) <= I)
        if wd > 6:
            p3, q3 = p(3), q(3)
            fm &= (np.abs(p3 - p2) <= I) & (np.abs(q3 - q2) <= I)
    if not fm.any():
        return

    flat8out = None
    if wd >= 16:
        p6, p5, p4 = p(6), p(5), p(4)
        q4, q5, q6 = q(4), q(5), q(6)
        flat8out = ((np.abs(p6 - p0) <= F) & (np.abs(p5 - p0) <= F) &
                    (np.abs(p4 - p0) <= F) & (np.abs(q4 - q0) <= F) &
                    (np.abs(q5 - q0) <= F) & (np.abs(q6 - q0) <= F))
    flat8in = None
    if wd >= 6:
        flat8in = ((np.abs(p2 - p0) <= F) & (np.abs(p1 - p0) <= F) &
                   (np.abs(q1 - q0) <= F) & (np.abs(q2 - q0) <= F))
    if wd >= 8:
        flat8in &= (np.abs(p3 - p0) <= F) & (np.abs(q3 - q0) <= F)

    out = seg.copy()

    # narrow filter (always computed; used where wider not taken)
    hev = (np.abs(p1 - p0) > H) | (np.abs(q1 - q0) > H)
    lim = 128 << bdm8
    fdiff = np.clip(p1 - q1, -lim, lim - 1)
    f_hev = np.clip(3 * (q0 - p0) + fdiff, -lim, lim - 1)
    f_nohev = np.clip(3 * (q0 - p0), -lim, lim - 1)
    f = np.where(hev, f_hev, f_nohev)
    f1 = np.minimum(f + 4, lim - 1) >> 3
    f2 = np.minimum(f + 3, lim - 1) >> 3
    px_max = (1 << bd) - 1
    n_p0 = np.clip(p0 + f2, 0, px_max)
    n_q0 = np.clip(q0 - f1, 0, px_max)
    f3 = (f1 + 1) >> 1
    n_p1 = np.where(hev, p1, np.clip(p1 + f3, 0, px_max))
    n_q1 = np.where(hev, q1, np.clip(q1 - f3, 0, px_max))
    out[:, off - 2] = n_p1
    out[:, off - 1] = n_p0
    out[:, off] = n_q0
    out[:, off + 1] = n_q1

    if wd == 6:
        m6 = flat8in
        vals = [
            (off - 2, (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3),
            (off - 1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3),
            (off, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3),
            (off + 1, (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3),
        ]
        for col, v in vals:
            out[:, col] = np.where(m6, v, out[:, col])
    elif wd >= 8:
        # wd16 path where flat8out & flat8in; wd8 where flat8in only
        m16 = (flat8out & flat8in) if wd >= 16 else np.zeros(4, bool)
        m8 = flat8in & ~m16
        vals8 = [
            (off - 3, (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3),
            (off - 2, (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3),
            (off - 1, (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3),
            (off, (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3),
            (off + 1, (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3),
            (off + 2, (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3),
        ]
        for col, v in vals8:
            out[:, col] = np.where(m8, v, out[:, col])
        if wd >= 16 and m16.any():
            vals16 = [
                (off + -6, (p6 + p6 + p6 + p6 + p6 + p6 * 2 + p5 * 2 + p4 * 2 +
                     p3 + p2 + p1 + p0 + q0 + 8) >> 4),
                (off + -5, (p6 + p6 + p6 + p6 + p6 + p5 * 2 + p4 * 2 + p3 * 2 +
                     p2 + p1 + p0 + q0 + q1 + 8) >> 4),
                (off + -4, (p6 + p6 + p6 + p6 + p5 + p4 * 2 + p3 * 2 + p2 * 2 +
                     p1 + p0 + q0 + q1 + q2 + 8) >> 4),
                (off + -3, (p6 + p6 + p6 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 +
                     p0 + q0 + q1 + q2 + q3 + 8) >> 4),
                (off + -2, (p6 + p6 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 +
                     q0 + q1 + q2 + q3 + q4 + 8) >> 4),
                (off + -1, (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 +
                     q1 + q2 + q3 + q4 + q5 + 8) >> 4),
                (off + 0, (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 +
                     q2 + q3 + q4 + q5 + q6 + 8) >> 4),
                (off + 1, (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 +
                     q3 + q4 + q5 + q6 + q6 + 8) >> 4),
                (off + 2, (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 +
                     q4 + q5 + q6 + q6 + q6 + 8) >> 4),
                (off + 3, (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 +
                      q5 + q6 + q6 + q6 + q6 + 8) >> 4),
                (off + 4, (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 +
                      q6 + q6 + q6 + q6 + q6 + 8) >> 4),
                (off + 5, (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 2 +
                      q6 + q6 + q6 + q6 + q6 + 8) >> 4),
            ]
            for col, v in vals16:
                out[:, col] = np.where(m16, v, out[:, col])

    seg[:] = np.where(fm[:, None], out, seg)


class LfMasks:
    """Dense per-4x4-edge filter classes + level cache."""

    def __init__(self, f):
        self.f = f
        w4, h4 = f.w4, f.h4
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        self.cw4 = (w4 + ss_hor) >> ss_hor
        self.ch4 = (h4 + ss_ver) >> ss_ver
        self.lvl = np.zeros((h4, w4, 4), np.uint8)
        self.vcls_y = np.full((h4, w4), -1, np.int8)
        self.hcls_y = np.full((h4, w4), -1, np.int8)
        self.vcls_uv = np.full((self.ch4, self.cw4), -1, np.int8)
        self.hcls_uv = np.full((self.ch4, self.cw4), -1, np.int8)
        # covering-leaf lpf tx classes per 4x4 (for neighbour lookups)
        self.txw = np.zeros((h4, w4), np.uint8)
        self.txh = np.zeros((h4, w4), np.uint8)
        self.ctxw = np.zeros((self.ch4, self.cw4), np.uint8)
        self.ctxh = np.zeros((self.ch4, self.cw4), np.uint8)


def _decomp_tx(txw, txh, stepw, steph, from_tx, depth, y_off, x_off,
               tx_masks, y0, x0):
    """reference lf_mask.c:39-77 decomp_tx into dense leaf arrays."""
    t_dim = lv.TXFM_INFO[from_tx]
    is_split = 0 if (from_tx == lv.TX_4X4 or depth > 1) else \
        (tx_masks[depth] >> (y_off * 4 + x_off)) & 1
    if is_split:
        sub = t_dim.sub
        htw4, hth4 = t_dim.w >> 1, t_dim.h >> 1
        _decomp_tx(txw, txh, stepw, steph, sub, depth + 1, y_off * 2,
                   x_off * 2, tx_masks, y0, x0)
        if t_dim.w >= t_dim.h:
            _decomp_tx(txw, txh, stepw, steph, sub, depth + 1, y_off * 2,
                       x_off * 2 + 1, tx_masks, y0, x0 + htw4)
        if t_dim.h >= t_dim.w:
            _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                       y_off * 2 + 1, x_off * 2, tx_masks, y0 + hth4, x0)
            if t_dim.w >= t_dim.h:
                _decomp_tx(txw, txh, stepw, steph, sub, depth + 1,
                           y_off * 2 + 1, x_off * 2 + 1, tx_masks,
                           y0 + hth4, x0 + htw4)
    else:
        lw, lh = min(2, t_dim.lw), min(2, t_dim.lh)
        txw[y0:y0 + t_dim.h, x0:x0 + t_dim.w] = lw
        txh[y0:y0 + t_dim.h, x0:x0 + t_dim.w] = lh
        stepw[y0:y0 + t_dim.h, x0] = t_dim.w
        steph[y0, x0:x0 + t_dim.w] = t_dim.h


def build_lf_masks(plan) -> LfMasks:
    """Port of dav1d_create_lf_mask_intra/inter over the decoded plan
    (reference lf_mask.c:259-383)."""
    if getattr(plan, "lazy_blocks", False):
        from ..entropy.native_tile import materialize_pending
        materialize_pending(plan)
    f = plan.f
    m = LfMasks(f)
    iw, ih = f.w4, f.h4
    ss_ver, ss_hor = f.ss_ver, f.ss_hor

    for b in plan.blocks:
        b_dim = lv.block_dimensions[b.bs]
        bw4 = min(iw - b.bx, int(b_dim[0]))
        bh4 = min(ih - b.by, int(b_dim[1]))
        bx, by = b.bx, b.by
        if bw4 > 0 and bh4 > 0:
            m.lvl[by:by + bh4, bx:bx + bw4, 0] = b.lf_lvl[0]
            m.lvl[by:by + bh4, bx:bx + bw4, 1] = b.lf_lvl[1]

            if b.intra:
                t_dim = lv.TXFM_INFO[b.tx]
                twl4c = min(2, t_dim.lw)
                thl4c = min(2, t_dim.lh)
                txw = np.full((bh4, bw4), twl4c, np.uint8)
                txh = np.full((bh4, bw4), thl4c, np.uint8)
                # noqa: dims clipped; uniform so no leaf clipping issues
                hstep, vstep = t_dim.w, t_dim.h
                # left/top block edges
                lcol = m.txw[by:by + bh4, bx - 1] if bx > 0 else \
                    np.full(bh4, twl4c, np.uint8)
                m.vcls_y[by:by + bh4, bx] = np.minimum(twl4c, lcol)
                trow = m.txh[by - 1, bx:bx + bw4] if by > 0 else \
                    np.full(bw4, thl4c, np.uint8)
                m.hcls_y[by, bx:bx + bw4] = np.minimum(thl4c, trow)
                # inner tx edges
                for x in range(hstep, bw4, hstep):
                    m.vcls_y[by:by + bh4, bx + x] = twl4c
                for y in range(vstep, bh4, vstep):
                    m.hcls_y[by + y, bx:bx + bw4] = thl4c
            else:
                maxtx = lv.TX_4X4 if \
                    f.frame_hdr.segmentation.lossless[b.seg_id] else \
                    b.max_ytx
                t_dim = lv.TXFM_INFO[maxtx]
                # full-block scratch (the reference uses 32x32); clip
                # to bw4/bh4 only when reading/writing frame grids
                fw4, fh4 = int(b_dim[0]), int(b_dim[1])
                txw = np.zeros((fh4, fw4), np.uint8)
                txh = np.zeros((fh4, fw4), np.uint8)
                stepw = np.zeros((fh4, fw4), np.int32)
                steph = np.zeros((fh4, fw4), np.int32)
                y = y_off = 0
                while y < bh4:
                    x = x_off = 0
                    while x < bw4:
                        _decomp_tx(txw, txh, stepw, steph, maxtx, 0,
                                   y_off, x_off, b.tx_split, y, x)
                        x += t_dim.w
                        x_off += 1
                    y += t_dim.h
                    y_off += 1
                txw = txw[:bh4, :bw4]
                txh = txh[:bh4, :bw4]
                stepw = stepw[:bh4, :bw4]
                steph = steph[:bh4, :bw4]
                # left/top block edges
                lcol = m.txw[by:by + bh4, bx - 1] if bx > 0 else txw[:, 0]
                m.vcls_y[by:by + bh4, bx] = np.minimum(txw[:, 0], lcol)
                trow = m.txh[by - 1, bx:bx + bw4] if by > 0 else txh[0, :]
                m.hcls_y[by, bx:bx + bw4] = np.minimum(txh[0, :], trow)
                if not b.skip:
                    for y in range(bh4):
                        ltx = int(txw[y, 0])
                        step = int(stepw[y, 0])
                        x = step
                        while x < bw4 and step:
                            rtx = int(txw[y, x])
                            m.vcls_y[by + y, bx + x] = min(rtx, ltx)
                            ltx = rtx
                            step = int(stepw[y, x])
                            x += step
                    for x in range(bw4):
                        ttx = int(txh[0, x])
                        step = int(steph[0, x])
                        y = step
                        while y < bh4 and step:
                            btx = int(txh[y, x])
                            m.hcls_y[by + y, bx + x] = min(ttx, btx)
                            ttx = btx
                            step = int(steph[y, x])
                            y += step
            m.txw[by:by + bh4, bx:bx + bw4] = txw
            m.txh[by:by + bh4, bx:bx + bw4] = txh

        # chroma
        if not b.has_chroma or f.layout == 0:
            continue
        cbw4 = min(((iw + ss_hor) >> ss_hor) - (bx >> ss_hor),
                   (int(b_dim[0]) + ss_hor) >> ss_hor)
        cbh4 = min(((ih + ss_ver) >> ss_ver) - (by >> ss_ver),
                   (int(b_dim[1]) + ss_ver) >> ss_ver)
        if cbw4 <= 0 or cbh4 <= 0:
            continue
        cbx, cby = bx >> ss_hor, by >> ss_ver
        m.lvl[cby:cby + cbh4, cbx:cbx + cbw4, 2] = b.lf_lvl[2]
        m.lvl[cby:cby + cbh4, cbx:cbx + cbw4, 3] = b.lf_lvl[3]
        uv_t = lv.TXFM_INFO[lv.TX_4X4 if
                            f.frame_hdr.segmentation.lossless[b.seg_id] and
                            not b.intra else b.uvtx]
        twl4c = int(bool(uv_t.lw))
        thl4c = int(bool(uv_t.lh))
        lcol = m.ctxw[cby:cby + cbh4, cbx - 1] if cbx > 0 else \
            np.full(cbh4, twl4c, np.uint8)
        m.vcls_uv[cby:cby + cbh4, cbx] = np.minimum(twl4c, lcol)
        trow = m.ctxh[cby - 1, cbx:cbx + cbw4] if cby > 0 else \
            np.full(cbw4, thl4c, np.uint8)
        m.hcls_uv[cby, cbx:cbx + cbw4] = np.minimum(thl4c, trow)
        skip_inter = (not b.intra) and b.skip
        if not skip_inter:
            for x in range(uv_t.w, cbw4, uv_t.w):
                m.vcls_uv[cby:cby + cbh4, cbx + x] = twl4c
            for y in range(uv_t.h, cbh4, uv_t.h):
                m.hcls_uv[cby + y, cbx:cbx + cbw4] = thl4c
        m.ctxw[cby:cby + cbh4, cbx:cbx + cbw4] = twl4c
        m.ctxh[cby:cby + cbh4, cbx:cbx + cbw4] = thl4c
    return m


def apply_deblock(pic, plan) -> None:
    """Frame-wide deblock in the reference's effective order."""
    f = plan.f
    fh = f.frame_hdr
    lflf = fh.loopfilter
    if not (lflf.level_y[0] or lflf.level_y[1]):
        return
    m = build_lf_masks(plan)
    lut_e, lut_i = calc_eih(lflf.sharpness)
    bd = pic.bpc
    w4, h4 = f.w4, f.h4
    y_plane = pic.planes[0].astype(np.int32)

    def seg_view(plane, py, px, wd, vertical):
        off = WD_OFF[wd]
        if vertical:
            return plane[py:py + 4, px - off:px + off]
        return plane[py - off:py + off, px:px + 4].T

    # luma vertical edges (cols)
    for x in range(1, w4):
        col = m.vcls_y[:, x]
        if (col < 0).all():
            continue
        for y in range(h4):
            cls = int(col[y])
            if cls < 0:
                continue
            L = int(m.lvl[y, x, 0]) or int(m.lvl[y, x - 1, 0])
            if not L:
                continue
            wd = 4 << cls
            _filter_segment(seg_view(y_plane, y * 4, x * 4, wd, True),
                            int(lut_e[L]), int(lut_i[L]), L >> 4, wd, bd)
    # luma horizontal edges (rows)
    for y in range(1, h4):
        row = m.hcls_y[y, :]
        if (row < 0).all():
            continue
        for x in range(w4):
            cls = int(row[x])
            if cls < 0:
                continue
            L = int(m.lvl[y, x, 1]) or int(m.lvl[y - 1, x, 1])
            if not L:
                continue
            wd = 4 << cls
            _filter_segment(seg_view(y_plane, y * 4, x * 4, wd, False),
                            int(lut_e[L]), int(lut_i[L]), L >> 4, wd, bd)
    dt = pic.planes[0].dtype
    pic.planes[0][:] = y_plane.astype(dt)

    if f.layout == 0 or (not lflf.level_u and not lflf.level_v):
        return
    for pl in range(2):
        plane = pic.planes[1 + pl].astype(np.int32)
        for x in range(1, m.cw4):
            col = m.vcls_uv[:, x]
            if (col < 0).all():
                continue
            for y in range(m.ch4):
                cls = int(col[y])
                if cls < 0:
                    continue
                L = int(m.lvl[y, x, 2 + pl]) or int(m.lvl[y, x - 1, 2 + pl])
                if not L:
                    continue
                wd = 4 + 2 * cls
                _filter_segment(seg_view(plane, y * 4, x * 4, wd, True),
                                int(lut_e[L]), int(lut_i[L]), L >> 4, wd, bd)
        for y in range(1, m.ch4):
            row = m.hcls_uv[y, :]
            if (row < 0).all():
                continue
            for x in range(m.cw4):
                cls = int(row[x])
                if cls < 0:
                    continue
                L = int(m.lvl[y, x, 2 + pl]) or int(m.lvl[y - 1, x, 2 + pl])
                if not L:
                    continue
                wd = 4 + 2 * cls
                _filter_segment(seg_view(plane, y * 4, x * 4, wd, False),
                                int(lut_e[L]), int(lut_i[L]), L >> 4, wd, bd)
        pic.planes[1 + pl][:] = plane.astype(pic.planes[1 + pl].dtype)
