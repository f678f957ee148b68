"""Device intra-leftover reconstruction: dependency-levelized batching.

Inter frames carry sparse intra blocks ("leftovers") whose prediction
reads the current picture. The host replay costs a mid-frame
device->host->device round trip (the last remaining one); this module
keeps those blocks on device instead:

  1. Per leftover tx unit, the exact reference edge-availability walk
     (reference src/ipred_prepare_tmpl.c:74-203) runs SYMBOLICALLY on
     the host: instead of copying pixels into an edge buffer it emits a
     (321,) int32 INDEX table into the flattened plane (plus 4
     appended constant cells for the no-neighbor fills). The device
     gathers the actual pixels at execute time, so edge prep never
     touches pixel values on the host.
  2. A level scheduler assigns each unit 1 + max(level of every pixel
     its edges read), tracked on per-plane pixel-granularity maps.
     Units in one level only read pixels produced at lower levels, so
     a level executes as a handful of batched kernel launches
     (ops/ipred.py) with no intra-level ordering.
  3. Per level: gather edges -> predict (grouped by geometry/mode
     family) -> scatter -> fused itx+add residuals straight from the
     already-uploaded Stage-A coefficient pool (ops/mc_jobs.py
     res_jobs_fn) for that level's units. Residuals land before the
     next level gathers, matching the reference's sequential
     recon_b_intra ordering (src/recon_tmpl.c:1176-1556) exactly.

Frames whose leftovers use tools without a device kernel yet (palette,
filter-intra) fall back wholesale to the host replay path in
inter_device.run_native; DAV1D_TPU_LO=host forces that path.
"""
from __future__ import annotations

import os

import numpy as np

from ..entropy import levels as lv
from ..entropy.intra_edge import (EDGE_I444_TOP_HAS_RIGHT,
                                  EDGE_I444_LEFT_HAS_BOTTOM,
                                  EDGE_I420_TOP_HAS_RIGHT,
                                  EDGE_I420_LEFT_HAS_BOTTOM)
from ..ops import ipred, ipred_ref, mc_jobs
from ..ops.backend import device_scope, jax_mod
from ..utils import timing

C = ipred.C
OOB = mc_jobs.OOB
FILTER_PRED = ipred_ref.FILTER_PRED


class Unservable(Exception):
    """A leftover block needs a tool with no device path yet."""


# observability: frames served on device / units batched / host fallbacks
STATS = {"frames": 0, "units": 0, "levels": 0, "fallbacks": 0}


def _deriv():
    from .. import tables
    return tables.get("dav1d_dr_intra_derivative")


# ---------------------------------------------------------------------------
# symbolic edge preparation
# ---------------------------------------------------------------------------

def edge_indices(x, have_left, y, have_top, w, h, edge_flags, W, px, py,
                 mode, angle, tw, th, filter_edge, base_const):
    """Symbolic twin of ipred_ref.prepare_intra_edges: same mode/angle
    remap and availability walk, but emits plane-flat indices (stride
    W; constants at base_const+0: half+1, +1: half-1, +2: half,
    +3: zero) instead of pixel values. Returns (mode, angle, idx, tlf)
    where tlf=1 requests the device-side Z2 5-6-5 topleft filter."""
    if ipred_ref.VERT_PRED <= mode <= lv.VERT_LEFT_PRED:
        angle = ipred_ref._MODE_TO_ANGLE[mode - ipred_ref.VERT_PRED] \
            + 3 * angle
        if angle <= 90:
            mode = ipred_ref.Z1_PRED if angle < 90 and have_top \
                else ipred_ref.VERT_PRED
        elif angle < 180:
            mode = ipred_ref.Z2_PRED
        else:
            mode = ipred_ref.Z3_PRED if angle > 180 and have_left \
                else ipred_ref.HOR_PRED
    elif mode == ipred_ref.DC_PRED:
        mode = (ipred_ref.DC_PRED if have_top else
                ipred_ref.LEFT_DC_PRED) if have_left else \
            (ipred_ref.TOP_DC_PRED if have_top else ipred_ref.DC_128_PRED)
    elif mode == ipred_ref.PAETH_PRED:
        mode = (ipred_ref.PAETH_PRED if have_top else
                ipred_ref.HOR_PRED) if have_left else \
            (ipred_ref.VERT_PRED if have_top else ipred_ref.DC_128_PRED)

    needs_left, needs_top, needs_topleft, needs_topright, \
        needs_bottomleft = ipred_ref._EDGE_REQ[mode]

    idx = np.full(ipred.EDGE_LEN, base_const + 3, np.int64)

    def top_i(i):
        return (py - 1) * W + px + i

    have_dst_top = have_top and (needs_top or needs_topleft or
                                 (needs_left and not have_left))

    if needs_left:
        sz = th << 2
        if have_left:
            px_have = min(sz, (h - y) << 2)
            idx[C - px_have:C] = \
                ((py + np.arange(px_have)) * W + px - 1)[::-1]
            if px_have < sz:
                idx[C - sz:C - px_have] = idx[C - px_have]
        else:
            idx[C - sz:C] = top_i(0) if have_dst_top else base_const + 0
        if needs_bottomleft:
            have_bl = 0 if (not have_left or y + th >= h) else \
                (edge_flags & EDGE_I444_LEFT_HAS_BOTTOM)
            if have_bl:
                px_have = min(sz, (h - y - th) << 2)
                idx[C - sz - px_have:C - sz] = \
                    ((py + sz + np.arange(px_have)) * W + px - 1)[::-1]
                if px_have < sz:
                    idx[C - 2 * sz:C - sz - px_have] = \
                        idx[C - sz - px_have]
            else:
                idx[C - 2 * sz:C - sz] = idx[C - sz]

    if needs_top:
        sz = tw << 2
        if have_top:
            px_have = min(sz, (w - x) << 2)
            idx[C + 1:C + 1 + px_have] = top_i(0) + np.arange(px_have)
            if px_have < sz:
                idx[C + 1 + px_have:C + 1 + sz] = idx[C + px_have]
        else:
            idx[C + 1:C + 1 + sz] = (py * W + px - 1) if have_left \
                else base_const + 1
        if needs_topright:
            have_tr = 0 if (not have_top or x + tw >= w) else \
                (edge_flags & EDGE_I444_TOP_HAS_RIGHT)
            if have_tr:
                px_have = min(sz, (w - x - tw) << 2)
                idx[C + 1 + sz:C + 1 + sz + px_have] = \
                    top_i(sz) + np.arange(px_have)
                if px_have < sz:
                    idx[C + 1 + sz + px_have:C + 1 + 2 * sz] = \
                        idx[C + sz + px_have]
            else:
                idx[C + 1 + sz:C + 1 + 2 * sz] = idx[C + sz]

    tlf = 0
    if needs_topleft:
        if have_left:
            idx[C] = top_i(-1) if have_top else py * W + px - 1
        else:
            idx[C] = top_i(0) if have_top else base_const + 2
        if mode == ipred_ref.Z2_PRED and tw + th >= 6 and filter_edge:
            tlf = 1

    return mode, angle, idx, tlf


# ---------------------------------------------------------------------------
# plan builder
# ---------------------------------------------------------------------------

class DevLeftoverPlan:
    __slots__ = ("levels", "n_units")

    def __init__(self, levels, n_units):
        self.levels = levels      # [ {groupkey: [job rows]} ] per level
        self.n_units = n_units


class _Builder:
    def __init__(self, recon):
        self.r = recon
        self.f = recon.f
        self.bd = recon.bitdepth
        self.planes = recon.pic.planes
        self.strides = [p.shape[1] for p in self.planes]
        self.nflat = [p.shape[0] * p.shape[1] for p in self.planes]
        self.lvl = [np.zeros(p.shape, np.int16) for p in self.planes]
        self.lvl_flat = [m.reshape(-1) for m in self.lvl]
        self.levels = []          # level -> {key: [rows]}
        self.n_units = 0
        self.deriv = _deriv()

    # -- level bookkeeping -------------------------------------------------
    def _read_level_idx(self, pl, idx):
        flat = self.lvl_flat[pl]
        ii = idx[idx < self.nflat[pl]]
        return int(flat[ii].max()) if ii.size else 0

    def _read_level_rect(self, pl, py, px, h, w):
        m = self.lvl[pl][py:py + h, px:px + w]
        return int(m.max()) if m.size else 0

    def _emit(self, level, key, row):
        while len(self.levels) < level:
            self.levels.append({})
        self.levels[level - 1].setdefault(key, []).append(row)
        self.n_units += 1

    def _mark_write(self, pl, py, px, h, w, level):
        self.lvl[pl][py:py + h, px:px + w] = level

    def _mark_write_max(self, pl, py, px, h, w, level):
        m = self.lvl[pl][py:py + h, px:px + w]
        np.maximum(m, level, out=m)

    # -- per-unit emitters ---------------------------------------------------
    def _pred_unit(self, pl, px, py, w_px, h_px, mode, angle, flags,
                   idx, tlf, max_w, max_h):
        """Emit one prediction unit; returns its level."""
        rl = self._read_level_idx(pl, idx)
        L = rl + 1
        is_sm = (flags >> 9) & 1
        ief = (flags >> 10) & 1
        w, h = w_px, h_px
        if mode in (ipred_ref.Z1_PRED, ipred_ref.Z3_PRED,
                    ipred_ref.Z2_PRED):
            a = angle & 511
            if mode == ipred_ref.Z1_PRED:
                dx = int(self.deriv[a >> 1])
                up = ipred_ref._get_upsample(w + h, 90 - a, is_sm) \
                    if ief else 0
                st = 0 if up else (
                    ipred_ref._get_filter_strength(w + h, 90 - a, is_sm)
                    if ief else 0)
                key = (pl, "z1", w, h, up)
                row = (idx, tlf, dx << 1 if up else dx, st, py, px)
            elif mode == ipred_ref.Z3_PRED:
                dy = int(self.deriv[(270 - a) >> 1])
                up = ipred_ref._get_upsample(w + h, a - 180, is_sm) \
                    if ief else 0
                st = 0 if up else (
                    ipred_ref._get_filter_strength(w + h, a - 180, is_sm)
                    if ief else 0)
                key = (pl, "z3", w, h, up)
                row = (idx, tlf, dy << 1 if up else dy, st, py, px)
            else:
                dy = int(self.deriv[(a - 90) >> 1])
                dx = int(self.deriv[(180 - a) >> 1])
                ua = ipred_ref._get_upsample(w + h, a - 90, is_sm) \
                    if ief else 0
                ul = ipred_ref._get_upsample(w + h, 180 - a, is_sm) \
                    if ief else 0
                st = 0 if ua else (
                    ipred_ref._get_filter_strength(w + h, a - 90, is_sm)
                    if ief else 0)
                sl = 0 if ul else (
                    ipred_ref._get_filter_strength(w + h, 180 - a, is_sm)
                    if ief else 0)
                key = (pl, "z2", w, h, ua, ul)
                row = (idx, tlf, dx << 1 if ua else dx,
                       dy << 1 if ul else dy, st, sl, max_w, max_h,
                       py, px)
        elif mode == FILTER_PRED:
            key = (pl, "f", w, h)
            row = (idx, tlf, angle & 511, py, px)
        else:
            key = (pl, "s", w, h)
            row = (idx, tlf, mode, py, px)
        self._emit(L, key, row)
        self._mark_write(pl, py, px, h_px, w_px, L)
        return L

    def _res_unit(self, cb, level):
        t = cb._tile
        if t is None:
            raise Unservable()
        key = (cb.plane, "res", cb.tx, cb.txtp)
        loff = int(t["coefs"][cb._idx, 6])
        self._emit(level, key, (cb.y4 * 4, cb.x4 * 4,
                                t["tile_idx"], loff))
        # The residual is a WRITE at `level`: a later reader of this
        # rect must schedule strictly after it. The pred usually marks
        # the rect at the same level, but the CFL path can emit the
        # residual at max(U, V) pred level — above this plane's pred
        # mark — and a reader between the two levels would gather
        # pre-residual pixels (found via a V-plane DC unit reading a
        # CFL neighbor's pred-only top edge; 188-pixel mismatch vs the
        # reference on a tiles+masked-compound stream).
        td = lv.TXFM_INFO[cb.tx]
        self._mark_write_max(cb.plane, cb.y4 * 4, cb.x4 * 4,
                             td.h * 4, td.w * 4, level)

    # -- block walk (mirrors recon/intra_ref.py _recon_block) ---------------
    def add_block(self, b, bounds):
        if b.pal_sz[0] or b.pal_sz[1]:
            raise Unservable()   # palette leftovers replay on host
        f = self.f
        col_start, col_end, row_start, row_end = bounds
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        b_dim = lv.block_dimensions[b.bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        w4 = min(bw4, f.bw - b.bx)
        h4 = min(bh4, f.bh - b.by)
        cw4 = (w4 + ss_hor) >> ss_hor
        ch4 = (h4 + ss_ver) >> ss_ver
        cbw4 = (bw4 + ss_hor) >> ss_hor
        cbh4 = (bh4 + ss_ver) >> ss_ver
        t_dim = lv.TXFM_INFO[b.tx]
        uv_t_dim = lv.TXFM_INFO[b.uvtx]
        ief = f.seq_hdr.intra_edge_filter
        sm_fl = b.sm_fl | (ief << 10)
        cbmap = {}
        for cb in b._cbs:
            cbmap.setdefault((cb.plane, cb.x4, cb.y4), cb)

        for init_y in range(0, h4, 16):
            sub_h4 = min(h4, 16 + init_y)
            sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
            for init_x in range(0, w4, 16):
                sub_w4 = min(w4, init_x + 16)
                sb_has_tr = (1 if init_x + 16 < w4 else 0 if init_y else
                             b.edge_flags & EDGE_I444_TOP_HAS_RIGHT)
                sb_has_bl = (0 if init_x else 1 if init_y + 16 < h4 else
                             b.edge_flags & EDGE_I444_LEFT_HAS_BOTTOM)
                y = init_y
                while y < sub_h4:
                    x = init_x
                    while x < sub_w4:
                        self._luma_unit(
                            b, cbmap, b.bx + x, b.by + y, x, y, init_x,
                            init_y, sub_w4, sub_h4, sb_has_tr, sb_has_bl,
                            t_dim, sm_fl, col_start, col_end, row_start,
                            row_end)
                        x += t_dim.w
                    y += t_dim.h

                if not b.has_chroma:
                    continue

                cfl_level = 0
                if b.uv_mode == lv.CFL_PRED and init_x == 0 and \
                        init_y == 0:
                    cfl_level = self._cfl_units(
                        b, cw4, ch4, cbw4, cbh4, uv_t_dim, col_start,
                        col_end, row_start, row_end)

                sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                uv_sb_has_tr = (
                    1 if ((init_x + 16) >> ss_hor) < cw4 else
                    0 if init_y else b.edge_flags &
                    (EDGE_I420_TOP_HAS_RIGHT >> (int(f.layout) - 1)))
                uv_sb_has_bl = (
                    0 if init_x else
                    1 if ((init_y + 16) >> ss_ver) < ch4 else
                    b.edge_flags &
                    (EDGE_I420_LEFT_HAS_BOTTOM >> (int(f.layout) - 1)))
                for pl in range(2):
                    y = init_y >> ss_ver
                    while y < sub_ch4:
                        x = init_x >> ss_hor
                        while x < sub_cw4:
                            self._uv_unit(
                                b, cbmap, pl, x, y, init_x, init_y,
                                sub_cw4, sub_ch4, uv_sb_has_tr,
                                uv_sb_has_bl, uv_t_dim, b.sm_uv_fl,
                                col_start, col_end, row_start, row_end,
                                cfl_level)
                            x += uv_t_dim.w
                        y += uv_t_dim.h

    def _luma_unit(self, b, cbmap, bx, by, x, y, init_x, init_y, sub_w4,
                   sub_h4, sb_has_tr, sb_has_bl, t_dim, sm_fl,
                   col_start, col_end, row_start, row_end):
        f = self.f
        px, py = bx * 4, by * 4
        edge_flags = (
            (0 if ((y > init_y or not sb_has_tr) and
                   (x + t_dim.w >= sub_w4))
             else EDGE_I444_TOP_HAS_RIGHT) |
            (0 if (x > init_x or (not sb_has_bl and y + t_dim.h >= sub_h4))
             else EDGE_I444_LEFT_HAS_BOTTOM))
        mode, angle, idx, tlf = edge_indices(
            bx, bx > col_start, by, by > row_start, col_end, row_end,
            edge_flags, self.strides[0], px, py, b.y_mode, b.y_angle,
            t_dim.w, t_dim.h, f.seq_hdr.intra_edge_filter, self.nflat[0])
        L = self._pred_unit(0, px, py, t_dim.w * 4, t_dim.h * 4, mode,
                            angle, sm_fl, idx, tlf,
                            4 * f.bw - 4 * bx, 4 * f.bh - 4 * by)
        if not b.skip:
            cb = cbmap.get((0, bx, by))
            if cb is not None and cb.eob >= 0:
                self._res_unit(cb, L)

    def _uv_unit(self, b, cbmap, pl, x, y, init_x, init_y, sub_cw4,
                 sub_ch4, uv_sb_has_tr, uv_sb_has_bl, uv_t_dim, sm_uv_fl,
                 col_start, col_end, row_start, row_end, cfl_level):
        f = self.f
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        cbx = (b.bx >> ss_hor) + x
        cby = (b.by >> ss_ver) + y
        px, py = cbx * 4, cby * 4
        is_cfl = b.uv_mode == lv.CFL_PRED
        L = cfl_level
        if not (is_cfl and b.cfl_alpha[pl]):
            edge_flags = (
                (0 if ((y > (init_y >> ss_ver) or not uv_sb_has_tr) and
                       (x + uv_t_dim.w >= sub_cw4))
                 else EDGE_I444_TOP_HAS_RIGHT) |
                (0 if (x > (init_x >> ss_hor) or
                       (not uv_sb_has_bl and y + uv_t_dim.h >= sub_ch4))
                 else EDGE_I444_LEFT_HAS_BOTTOM))
            uv_mode = lv.DC_PRED if is_cfl else b.uv_mode
            mode, angle, idx, tlf = edge_indices(
                cbx, cbx > (col_start >> ss_hor), cby,
                cby > (row_start >> ss_ver), col_end >> ss_hor,
                row_end >> ss_ver, edge_flags, self.strides[1 + pl],
                px, py, uv_mode, b.uv_angle, uv_t_dim.w, uv_t_dim.h,
                f.seq_hdr.intra_edge_filter, self.nflat[1 + pl])
            flags = (f.seq_hdr.intra_edge_filter << 10) | sm_uv_fl
            max_w = (4 * f.bw + ss_hor - 4 * (b.bx & ~ss_hor)) >> ss_hor
            max_h = (4 * f.bh + ss_ver - 4 * (b.by & ~ss_ver)) >> ss_ver
            L = self._pred_unit(1 + pl, px, py, uv_t_dim.w * 4,
                                uv_t_dim.h * 4, mode, angle, flags, idx,
                                tlf, max_w, max_h)
        if not b.skip:
            cb = cbmap.get((1 + pl, cbx, cby))
            if cb is not None and cb.eob >= 0:
                if L == 0:
                    # CFL rect: residual must follow the CFL pred
                    L = self._read_level_rect(1 + pl, py, px,
                                              uv_t_dim.h * 4,
                                              uv_t_dim.w * 4)
                    L = max(L, 1)
                self._res_unit(cb, L)

    def _cfl_units(self, b, cw4, ch4, cbw4, cbh4, uv_t_dim, col_start,
                   col_end, row_start, row_end):
        """CFL pred per chroma plane (golden _recon_cfl). Returns the
        max level used so following uv residuals order after it."""
        f = self.f
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        t_dim = lv.TXFM_INFO[b.tx]
        cw_px, ch_px = cbw4 * 4, cbh4 * 4
        if uv_t_dim.w * 4 != cw_px or uv_t_dim.h * 4 != ch_px:
            raise Unservable()   # CFL is single-tx by spec; be safe
        ypx = 4 * (b.bx & ~ss_hor)
        ypy = 4 * (b.by & ~ss_ver)
        furthest_r = ((cw4 << ss_hor) + t_dim.w - 1) & ~(t_dim.w - 1)
        furthest_b = ((ch4 << ss_ver) + t_dim.h - 1) & ~(t_dim.h - 1)
        w_pad = cbw4 - (furthest_r >> ss_hor)
        h_pad = cbh4 - (furthest_b >> ss_ver)
        nh, nw = ch_px - 4 * h_pad, cw_px - 4 * w_pad
        luma_rl = self._read_level_rect(0, ypy, ypx, nh << ss_ver,
                                        nw << ss_hor)
        out_level = 0
        for pl in range(2):
            if not b.cfl_alpha[pl]:
                continue
            cbx = b.bx >> ss_hor
            cby = b.by >> ss_ver
            px, py = cbx * 4, cby * 4
            mode, _, idx, _tlf = edge_indices(
                cbx, cbx > (col_start >> ss_hor), cby,
                cby > (row_start >> ss_ver), col_end >> ss_hor,
                row_end >> ss_ver, 0, self.strides[1 + pl], px, py,
                lv.DC_PRED, 0, uv_t_dim.w, uv_t_dim.h, 0,
                self.nflat[1 + pl])
            rl = max(self._read_level_idx(1 + pl, idx), luma_rl)
            L = rl + 1
            key = (1 + pl, "cfl", cw_px, ch_px, ss_hor, ss_ver)
            self._emit(L, key, (idx, ypy, ypx, nh, nw,
                                b.cfl_alpha[pl], mode, py, px))
            self._mark_write(1 + pl, py, px, ch_px, cw_px, L)
            out_level = max(out_level, L)
        return out_level

    def finish(self):
        return DevLeftoverPlan(self.levels, self.n_units)


# auto mode: frames with more leftover blocks than this replay on the
# host instead. Measured round 5 on the tunnel v5e at 1080p: the
# per-level launch storm costs ~0.7ms dispatch per BLOCK, so sparse
# frames (encoder-shaped streams, ~3% intra) decode fastest on device
# (no mid-frame region round trip: 1.40 vs 1.04 fps), while
# intra-heavy frames (3k+ leftovers) collapse to 0.13 fps vs 1.02 for
# the native host replay.
AUTO_LIMIT = int(os.environ.get("DAV1D_TPU_LO_LIMIT", "1200"))


def build(recon, leftovers):
    """Build a device plan for the frame's leftover blocks, or None if
    any block needs the host replay (then inter_device falls back)."""
    mode = os.environ.get("DAV1D_TPU_LO", "auto")
    if mode not in ("device", "auto"):
        return None
    if mode == "auto" and len(leftovers) > AUTO_LIMIT:
        return None
    plan = recon.plan
    if not plan.native_tiles:
        return None
    from ..entropy import native_tile as nt
    tiles_rec = plan.native_tiles
    for gi, _tlf, tidx in leftovers:
        tr = tiles_rec[tidx]
        brow = tr["blocks"][gi - tr["block_base"]]
        if not brow[nt.BF_INTRA] or brow[nt.BF_INTERINTRA_TYPE]:
            return None
    try:
        bld = _Builder(recon)
        for gi, _tlf, tidx in leftovers:
            tr = tiles_rec[tidx]
            b = nt.materialize_block(plan, tr, gi - tr["block_base"])
            bounds = (tr["col_start"], tr["col_end"],
                      tr["row_start"], tr["row_end"])
            bld.add_block(b, bounds)
        out = bld.finish()
        STATS["frames"] += 1
        STATS["units"] += out.n_units
        STATS["levels"] += len(out.levels)
        return out
    except Unservable:
        STATS["fallbacks"] += 1
        return None


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def _bucket(n):
    """Closed batch-size ladder {16, 64, 256, ...}: levels re-use the
    same compiled programs regardless of how many units they carry
    (stream-independent program set; padding lanes drop in-scatter)."""
    b = 16
    while b < n:
        b <<= 2
    return b


def _pad_rows(rows, ncols, oob_cols):
    n = len(rows)
    np2 = _bucket(n)
    arr = np.zeros((np2, ncols), np.int32)
    arr[:n] = rows
    for c in oob_cols:
        arr[n:, c] = OOB
    return arr


def execute(recon, dplan):
    """Run the device leftover plan against the device-resident planes
    (recon.pic.dev), level by level. Needs the Stage-A coefficient pool
    on device (reused from pass D when present)."""
    jax = jax_mod()
    jnp = jax.numpy
    bd = recon.bitdepth
    if recon.pic.dev is None:
        # a frame with leftovers but zero inter jobs skips _execute's
        # plane upload: materialize the device planes here (host pixels
        # if an eager replay already wrote some, zeros otherwise)
        with device_scope():
            if recon.had_eager:
                recon.pic.dev = [
                    jnp.asarray(np.asarray(p)).astype(jnp.int32)
                    for p in recon.pic.planes]
            else:
                recon.pic.dev = [jnp.zeros(p.shape, jnp.int32)
                                 for p in recon.pic.planes]
    planes = list(recon.pic.dev)
    pool = getattr(recon, "_cf_pool_dev", None)
    bases = getattr(recon, "_cf_bases", None)
    with device_scope():
        if pool is None:
            from ..ops import mc_fused
            pool_np, bases = recon._build_cf_pool()
            if bd == 8:
                # 8-bit coefs fit int16 and only the used prefix needs
                # to cross the tunnel (mc_fused._dev_pad contract)
                cf_used = min(len(pool_np), 64 * 64 + sum(
                    int(t.get("cf_used", len(t["cf_pool"])))
                    for t in recon.plan.native_tiles))
                pool = mc_fused._dev_pad(
                    pool_np[:cf_used].astype(np.int16),
                    len(pool_np), jnp).astype(jnp.int32)
            else:
                pool = jnp.asarray(pool_np)
        half = (1 << bd) >> 1
        consts = np.asarray([half + 1, half - 1, half, 0], np.int32)
        cdev = jnp.asarray(consts)

        for groups in dplan.levels:
            flats = {}

            def flat(pl):
                if pl not in flats:
                    flats[pl] = jnp.concatenate(
                        [planes[pl].reshape(-1), cdev])
                return flats[pl]

            # prediction groups first, then the level's residuals
            for key in sorted(groups, key=lambda k: k[1] == "res"):
                rows = groups[key]
                pl, kind = key[0], key[1]
                if kind == "res":
                    _tx, _txtp = key[2], key[3]
                    jobs = np.asarray(
                        [(pl, _tx, _txtp, r[0], r[1],
                          int(bases[r[2]]) + r[3]) for r in rows],
                        np.int32)
                    jobs = _pad_rows(jobs, 6, (3, 4))
                    if _txtp == lv.WHT_WHT:
                        planes[pl] = mc_jobs.res_jobs_fn(
                            len(jobs), _tx, _txtp, bd)(pool, jobs,
                                                       planes[pl])
                    else:
                        from ..ops.itx_ref import TX1D_TYPES
                        ft, st = TX1D_TYPES[_txtp]
                        rk, ck = mc_jobs.res_tx_kinds(_tx)
                        kidx = np.array([rk.index(ft), ck.index(st)],
                                        np.int32)
                        planes[pl] = mc_jobs.res_tx_fn(
                            len(jobs), _tx, bd)(pool, jobs, kidx,
                                                planes[pl])
                    continue
                n = len(rows)
                np2 = _bucket(n)
                idx = np.zeros((np2, ipred.EDGE_LEN), np.int32)
                tlf = np.zeros(np2, np.int32)
                for i, r in enumerate(rows):
                    idx[i] = r[0]
                    tlf[i] = r[1] if kind != "cfl" else 0
                fl = flat(pl)
                if kind == "cfl":
                    cw_px, ch_px = key[2], key[3]
                    jobs = np.zeros((np2, 6), np.int32)
                    pys = np.full(np2, OOB, np.int32)
                    pxs = np.full(np2, OOB, np.int32)
                    for i, r in enumerate(rows):
                        jobs[i] = (r[1], r[2], r[3], r[4], r[5], r[6])
                        pys[i], pxs[i] = r[7], r[8]
                    jobs[n:, 2] = jobs[n:, 3] = 1   # nh/nw >= 1
                    edges = ipred.edge_gather_fn(np2, int(fl.shape[0]))(
                        fl, idx, tlf)
                    preds = ipred.cfl_fn(np2, cw_px, ch_px, key[4],
                                         key[5], bd)(planes[0], edges,
                                                     jobs)
                    planes[pl] = ipred.scatter_pred_fn(
                        np2, cw_px, ch_px)(planes[pl], pys, pxs, preds)
                    continue
                w, h = key[2], key[3]
                edges = ipred.edge_gather_fn(np2, int(fl.shape[0]))(
                    fl, idx, tlf)
                pys = np.full(np2, OOB, np.int32)
                pxs = np.full(np2, OOB, np.int32)
                if kind == "s":
                    modes = np.zeros(np2, np.int32)
                    for i, r in enumerate(rows):
                        modes[i], pys[i], pxs[i] = r[2], r[3], r[4]
                    preds = ipred.splat_family_fn(np2, w, h, bd)(
                        edges, modes)
                elif kind == "f":
                    taps = np.zeros((np2, 8, 7), np.int32)
                    for i, r in enumerate(rows):
                        taps[i] = ipred.filter_taps(r[2])
                        pys[i], pxs[i] = r[3], r[4]
                    preds = ipred.filter_fn(np2, w, h, bd)(edges, taps)
                elif kind in ("z1", "z3"):
                    up = key[4]
                    d = np.zeros(np2, np.int32)
                    st = np.zeros(np2, np.int32)
                    for i, r in enumerate(rows):
                        d[i], st[i], pys[i], pxs[i] = r[2], r[3], r[4], \
                            r[5]
                    fn = ipred.z1_fn if kind == "z1" else ipred.z3_fn
                    preds = fn(np2, w, h, bd, up)(edges, d, st)
                else:   # z2
                    ua, ul = key[4], key[5]
                    cols = np.zeros((np2, 6), np.int32)
                    for i, r in enumerate(rows):
                        cols[i] = (r[2], r[3], r[4], r[5], r[6], r[7])
                        pys[i], pxs[i] = r[8], r[9]
                    preds = ipred.z2_fn(np2, w, h, bd, ua, ul)(
                        edges, cols[:, 0], cols[:, 1], cols[:, 2],
                        cols[:, 3], cols[:, 4], cols[:, 5])
                planes[pl] = ipred.scatter_pred_fn(np2, w, h)(
                    planes[pl], pys, pxs, preds)
        recon.pic.dev = planes
        recon.pic.dev_c = None
        recon.pic.host_stale = True
