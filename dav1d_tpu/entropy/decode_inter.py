"""Inter-block symbol parsing (mixin for TileParser).

Behavioral parity with the reference's inter path
(reference src/decode.c:76-173 read_mv_*, 198-330 find_matching_ref/
derive_warpmv, 445-493 read_vartx_tree, 1340-2067 decode_b inter branch,
src/recon_tmpl.c:737-823 read_coef_tree).
"""
from __future__ import annotations

import numpy as np

from ..bitstream.headers import (FilterMode, WarpedMotionParams,
                                 WarpedMotionType)
from . import env
from . import levels as lv
from . import refmvs as rmv
from . import warpmv as wmv
from .refmvs import fix_mv_precision, get_gmv_2d


class InterParserMixin:
    # -- mv residual ----------------------------------------------------
    def _read_mv_component_diff(self, comp_idx: int, mv_prec: int) -> int:
        msac = self.msac
        comp = self.cdf.mv_comp[comp_idx]
        sign = msac.decode_bool_adapt(comp.sign)
        cl = msac.decode_symbol_adapt(comp.classes, 10)
        fp, hp = 3, 1
        if not cl:
            up = msac.decode_bool_adapt(comp.class0)
            if mv_prec >= 0:
                fp = msac.decode_symbol_adapt(comp.class0_fp[up], 3)
                if mv_prec > 0:
                    hp = msac.decode_bool_adapt(comp.class0_hp)
        else:
            up = 1 << cl
            for n in range(cl):
                up |= msac.decode_bool_adapt(comp.classN[n]) << n
            if mv_prec >= 0:
                fp = msac.decode_symbol_adapt(comp.classN_fp, 3)
                if mv_prec > 0:
                    hp = msac.decode_bool_adapt(comp.classN_hp)
        diff = ((up << 3) | (fp << 1) | hp) + 1
        return -diff if sign else diff

    def _read_mv_residual(self, mv, mv_prec):
        """mv: (y, x) tuple; returns updated tuple."""
        msac = self.msac
        joint = msac.decode_symbol_adapt(self.cdf.mv_joint, 3)
        y, x = mv
        if joint & lv.MV_JOINT_V:
            y = rmv._s16(y + self._read_mv_component_diff(0, mv_prec))
        if joint & lv.MV_JOINT_H:
            x = rmv._s16(x + self._read_mv_component_diff(1, mv_prec))
        return (y, x)

    # -- tx tree --------------------------------------------------------
    def _read_tx_tree(self, from_tx, depth, masks, x_off, y_off):
        f = self.f
        bx4 = self.bx
        by4 = self.by & 31
        t_dim = lv.TXFM_INFO[from_tx]
        txw, txh = t_dim.lw, t_dim.lh
        if depth < 2 and from_tx > lv.TX_4X4:
            cat = 2 * (lv.TX_64X64 - t_dim.max) - depth
            a_ = int(int(self.a.tx[bx4]) < txw)
            l_ = int(int(self.l.tx[by4]) < txh)
            is_split = self.msac.decode_bool_adapt(
                self.cdf.m.txpart[cat][a_ + l_])
            if is_split:
                masks[depth] |= 1 << (y_off * 4 + x_off)
        else:
            is_split = 0
        if is_split and t_dim.max > lv.TX_8X8:
            sub = t_dim.sub
            sub_t = lv.TXFM_INFO[sub]
            txsw, txsh = sub_t.w, sub_t.h
            self._read_tx_tree(sub, depth + 1, masks, x_off * 2, y_off * 2)
            self.bx += txsw
            if txw >= txh and self.bx < f.bw:
                self._read_tx_tree(sub, depth + 1, masks, x_off * 2 + 1,
                                   y_off * 2)
            self.bx -= txsw
            self.by += txsh
            if txh >= txw and self.by < f.bh:
                self._read_tx_tree(sub, depth + 1, masks, x_off * 2,
                                   y_off * 2 + 1)
                self.bx += txsw
                if txw >= txh and self.bx < f.bw:
                    self._read_tx_tree(sub, depth + 1, masks, x_off * 2 + 1,
                                       y_off * 2 + 1)
                self.bx -= txsw
            self.by -= txsh
        else:
            n_w = 1 << t_dim.lw
            n_h = 1 << t_dim.lh
            self.a.tx[bx4:bx4 + n_w] = lv.TX_4X4 if is_split else txw
            self.l.tx[by4:by4 + n_h] = lv.TX_4X4 if is_split else txh

    def _read_vartx_tree(self, b, bs, bx4, by4):
        f = self.f
        b_dim = lv.block_dimensions[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        tx_split = [0, 0]
        b.max_ytx = int(lv.max_txfm_size_for_bs[bs][0])
        if not b.skip and (f.frame_hdr.segmentation.lossless[b.seg_id] or
                           b.max_ytx == lv.TX_4X4):
            b.max_ytx = b.uvtx = lv.TX_4X4
            if f.frame_hdr.txfm_mode == 2:   # SWITCHABLE
                self.a.tx[bx4:bx4 + bw4] = lv.TX_4X4
                self.l.tx[by4:by4 + bh4] = lv.TX_4X4
        elif f.frame_hdr.txfm_mode != 2 or b.skip:
            if f.frame_hdr.txfm_mode == 2:
                self.a.tx[bx4:bx4 + bw4] = b_dim[2]
                self.l.tx[by4:by4 + bh4] = b_dim[3]
            b.uvtx = int(lv.max_txfm_size_for_bs[bs][f.layout])
        else:
            ytx = lv.TXFM_INFO[b.max_ytx]
            y = 0
            y_off = 0
            while y < bh4:
                x = 0
                x_off = 0
                while x < bw4:
                    self._read_tx_tree(b.max_ytx, 0, tx_split, x_off, y_off)
                    self.bx += ytx.w
                    x += ytx.w
                    x_off += 1
                self.bx -= x
                self.by += ytx.h
                y += ytx.h
                y_off += 1
            self.by -= y
            if self.dbg:
                print(f"Post-vartxtree[{tx_split[0]:x}/{tx_split[1]:x}]: "
                      f"r={self.msac.rng}")
            b.uvtx = int(lv.max_txfm_size_for_bs[bs][f.layout])
        b.tx_split = (tx_split[0], tx_split[1])

    # -- obmc / warp helpers -------------------------------------------
    def _find_matching_ref(self, b, intra_edge_flags, bw4, bh4, w4, h4,
                           have_left, have_top, ref):
        """reference decode.c:198-262. Returns masks [top, left+corners]."""
        from .intra_edge import EDGE_I444_TOP_HAS_RIGHT
        rf = self.rt.rf
        bx, by = self.bx, self.by
        masks = [0, 0]
        count = 0
        have_topleft = have_top and have_left
        have_topright = (max(bw4, bh4) < 32 and have_top and
                         bx + bw4 < self.rt.col_end and
                         (intra_edge_flags & EDGE_I444_TOP_HAS_RIGHT))

        def matches(by_c, bx_c):
            return (int(rf.r_ref[by_c, bx_c, 0]) == ref + 1 and
                    int(rf.r_ref[by_c, bx_c, 1]) == -1)

        if have_top:
            if matches(by - 1, bx):
                masks[0] |= 1
                count = 1
            aw4 = int(lv.block_dimensions[int(rf.r_bs[by - 1, bx])][0])
            if aw4 >= bw4:
                off = bx & (aw4 - 1)
                if off:
                    have_topleft = False
                if aw4 - off > bw4:
                    have_topright = False
            else:
                mask = 1 << aw4
                x = aw4
                while x < w4:
                    if matches(by - 1, bx + x):
                        masks[0] |= mask
                        count += 1
                        if count >= 8:
                            return masks
                    aw4 = int(lv.block_dimensions[
                        int(rf.r_bs[by - 1, bx + x])][0])
                    mask <<= aw4
                    x += aw4
        if have_left:
            if matches(by, bx - 1):
                masks[1] |= 1
                count += 1
                if count >= 8:
                    return masks
            lh4 = int(lv.block_dimensions[int(rf.r_bs[by, bx - 1])][1])
            if lh4 >= bh4:
                if by & (lh4 - 1):
                    have_topleft = False
            else:
                mask = 1 << lh4
                y = lh4
                while y < h4:
                    if matches(by + y, bx - 1):
                        masks[1] |= mask
                        count += 1
                        if count >= 8:
                            return masks
                    lh4 = int(lv.block_dimensions[
                        int(rf.r_bs[by + y, bx - 1])][1])
                    mask <<= lh4
                    y += lh4
        if have_topleft and matches(by - 1, bx - 1):
            masks[1] |= 1 << 32
            count += 1
            if count >= 8:
                return masks
        if have_topright and matches(by - 1, bx + bw4):
            masks[0] |= 1 << 32
        return masks

    def _derive_warpmv(self, b, bw4, bh4, masks, mv):
        """reference decode.c:265-330. Returns WarpedMotionParams."""
        rf = self.rt.rf
        bx, by = self.bx, self.by
        pts = []

        def bdim(by_c, bx_c):
            return lv.block_dimensions[int(rf.r_bs[by_c, bx_c])]

        def add_sample(dx, dy, sx, sy, by_c, bx_c):
            bd = bdim(by_c, bx_c)
            in_x = 16 * (2 * dx + sx * int(bd[0])) - 8
            in_y = 16 * (2 * dy + sy * int(bd[1])) - 8
            out_x = in_x + int(rf.r_mv[by_c, bx_c, 0, 1])
            out_y = in_y + int(rf.r_mv[by_c, bx_c, 0, 0])
            pts.append([(in_x, in_y), (out_x, out_y)])

        if (masks[0] & 0xFFFFFFFF) == 1 and not (masks[1] >> 32):
            off = bx & (int(bdim(by - 1, bx)[0]) - 1)
            add_sample(-off, 0, 1, -1, by - 1, bx)
        else:
            xmask = masks[0] & 0xFFFFFFFF
            off = 0
            while len(pts) < 8 and xmask:
                tz = (xmask & -xmask).bit_length() - 1
                off += tz
                xmask >>= tz
                add_sample(off, 0, 1, -1, by - 1, bx + off)
                xmask &= ~1
        if len(pts) < 8 and masks[1] == 1:
            off = by & (int(bdim(by, bx - 1)[1]) - 1)
            add_sample(0, -off, -1, 1, by - off, bx - 1)
        else:
            ymask = masks[1] & 0xFFFFFFFF
            off = 0
            while len(pts) < 8 and ymask:
                tz = (ymask & -ymask).bit_length() - 1
                off += tz
                ymask >>= tz
                add_sample(0, off, -1, 1, by + off, bx - 1)
                ymask &= ~1
        if len(pts) < 8 and (masks[1] >> 32):
            add_sample(0, 0, -1, -1, by - 1, bx - 1)
        if len(pts) < 8 and (masks[0] >> 32):
            add_sample(bw4, 0, 1, -1, by - 1, bx + bw4)
        np_ = len(pts)
        assert 0 < np_ <= 8

        mvy, mvx = mv
        thresh = 4 * max(4, min(max(bw4, bh4), 28))
        mvd = []
        ret = 0
        for i in range(np_):
            d = (abs(pts[i][1][0] - pts[i][0][0] - mvx) +
                 abs(pts[i][1][1] - pts[i][0][1] - mvy))
            if d > thresh:
                mvd.append(-1)
            else:
                mvd.append(d)
                ret += 1
        if not ret:
            ret = 1
        else:
            i, j = 0, np_ - 1
            for _ in range(np_ - ret):
                while mvd[i] != -1:
                    i += 1
                while mvd[j] == -1:
                    j -= 1
                if i > j:
                    break
                mvd[i] = mvd[j]
                pts[i] = [tuple(pts[j][0]), tuple(pts[j][1])]
                i += 1
                j -= 1

        wm = WarpedMotionParams()
        if (not wmv.find_affine_int(pts, ret, bw4, bh4, mvy, mvx, wm,
                                    bx, by) and
                not wmv.get_shear_params(wm)):
            wm.type = WarpedMotionType.AFFINE
        else:
            wm.type = WarpedMotionType.IDENTITY
        return wm

    # -- inter block ----------------------------------------------------
    def _decode_b_inter(self, b, bl, bs, bp, b_dim, bx4, by4, cbx4, cby4,
                        bw4, bh4, w4, h4, cbw4, cbh4, have_top, have_left,
                        has_chroma, seg, seg_pred, edge_flags):
        f = self.f
        fh = f.frame_hdr
        msac = self.msac
        cdf = self.cdf
        a, l = self.a, self.l
        has_subpel_filter = 0
        is_comp = 0
        b.interintra_type = lv.INTER_INTRA_NONE
        b.motion_mode = lv.MM_TRANSLATION
        b.warpmv = None

        if b.skip_mode:
            is_comp = 1
        elif ((seg is None or (seg.ref == -1 and not seg.globalmv and
                               not seg.skip)) and
              fh.switchable_comp_refs and min(bw4, bh4) > 1):
            ctx = env.get_comp_ctx(a, l, by4, bx4, have_top, have_left)
            is_comp = msac.decode_bool_adapt(cdf.m.comp[ctx])
            if self.dbg:
                print(f"Post-compflag[{is_comp}]: r={msac.rng}")
        else:
            is_comp = 0

        if b.skip_mode:
            b.ref = (fh.skip_mode_refs[0], fh.skip_mode_refs[1])
            b.comp_type = lv.COMP_INTER_AVG
            b.inter_mode = lv.NEARESTMV_NEARESTMV
            b.drl_idx = 0
            has_subpel_filter = 0
            mvstack, _n, _ctx = rmv.refmvs_find(
                self.rt, (b.ref[0] + 1, b.ref[1] + 1), bs, edge_flags,
                self.by, self.bx)
            if self.dbg:
                print(f"Refmvs[n={_n},ctx={_ctx}" + "".join(
                    f",({m['mv'][0][0]},{m['mv'][0][1]}|"
                    f"{m['mv'][1][0]},{m['mv'][1][1]})"
                    for m in mvstack[:min(_n, 4)]) + f"]: r={msac.rng}")
            mv0 = fix_mv_precision(fh, *mvstack[0]["mv"][0])
            mv1 = fix_mv_precision(fh, *mvstack[0]["mv"][1])
            b.mv = (mv0, mv1)
        elif is_comp:
            dir_ctx = env.get_comp_dir_ctx(a, l, by4, bx4,
                                           have_top, have_left)
            if msac.decode_bool_adapt(cdf.m.comp_dir[dir_ctx]):
                # bidir
                ctx1 = env.av1_get_fwd_ref_ctx(a, l, by4, bx4,
                                               have_top, have_left)
                if msac.decode_bool_adapt(cdf.m.comp_fwd_ref[0][ctx1]):
                    ctx2 = env.av1_get_fwd_ref_2_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                    ref0 = 2 + msac.decode_bool_adapt(
                        cdf.m.comp_fwd_ref[2][ctx2])
                else:
                    ctx2 = env.av1_get_fwd_ref_1_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                    ref0 = msac.decode_bool_adapt(cdf.m.comp_fwd_ref[1][ctx2])
                ctx3 = env.av1_get_bwd_ref_ctx(a, l, by4, bx4,
                                               have_top, have_left)
                if msac.decode_bool_adapt(cdf.m.comp_bwd_ref[0][ctx3]):
                    ref1 = 6
                else:
                    ctx4 = env.av1_get_bwd_ref_1_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                    ref1 = 4 + msac.decode_bool_adapt(
                        cdf.m.comp_bwd_ref[1][ctx4])
            else:
                # unidir
                uctx_p = env.av1_get_uni_p_ctx(a, l, by4, bx4,
                                               have_top, have_left)
                if msac.decode_bool_adapt(cdf.m.comp_uni_ref[0][uctx_p]):
                    ref0, ref1 = 4, 6
                else:
                    uctx_p1 = env.av1_get_uni_p1_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                    ref0 = 0
                    ref1 = 1 + msac.decode_bool_adapt(
                        cdf.m.comp_uni_ref[1][uctx_p1])
                    if ref1 == 2:
                        uctx_p2 = env.av1_get_uni_p2_ctx(a, l, by4, bx4,
                                                         have_top, have_left)
                        ref1 += msac.decode_bool_adapt(
                            cdf.m.comp_uni_ref[2][uctx_p2])
            b.ref = (ref0, ref1)
            if self.dbg:
                print(f"Post-refs[{ref0}/{ref1}]: r={msac.rng}")

            mvstack, n_mvs, ctx = rmv.refmvs_find(
                self.rt, (ref0 + 1, ref1 + 1), bs, edge_flags,
                self.by, self.bx)
            if self.dbg:
                print(f"Refmvs[n={n_mvs},ctx={ctx}" + "".join(
                    f",({m['mv'][0][0]},{m['mv'][0][1]}|{m['mv'][1][0]},{m['mv'][1][1]})"
                    for m in mvstack[:min(n_mvs, 4)]) + f"]: r={msac.rng}")
            b.inter_mode = msac.decode_symbol_adapt(
                cdf.m.comp_inter_mode[ctx], lv.N_COMP_INTER_PRED_MODES - 1)
            if self.dbg:
                print(f"Post-compintermode[{b.inter_mode},ctx={ctx},"
                      f"n_mvs={n_mvs}]: r={msac.rng}")
            im = lv.comp_inter_pred_modes[b.inter_mode]
            b.drl_idx = 0
            if b.inter_mode == lv.NEWMV_NEWMV:
                if n_mvs > 1:
                    drl1 = env.get_drl_context(mvstack, 0)
                    b.drl_idx += msac.decode_bool_adapt(cdf.m.drl_bit[drl1])
                    if b.drl_idx == 1 and n_mvs > 2:
                        drl2 = env.get_drl_context(mvstack, 1)
                        b.drl_idx += msac.decode_bool_adapt(
                            cdf.m.drl_bit[drl2])
                    if self.dbg:
                        print(f"Post-drlidx[{b.drl_idx},n_mvs={n_mvs}]: "
                              f"r={msac.rng}")
            elif im[0] == lv.NEARMV or im[1] == lv.NEARMV:
                b.drl_idx = 1
                if n_mvs > 2:
                    drl2 = env.get_drl_context(mvstack, 1)
                    b.drl_idx += msac.decode_bool_adapt(cdf.m.drl_bit[drl2])
                    if b.drl_idx == 2 and n_mvs > 3:
                        drl3 = env.get_drl_context(mvstack, 2)
                        b.drl_idx += msac.decode_bool_adapt(
                            cdf.m.drl_bit[drl3])
                    if self.dbg:
                        print(f"Post-drlidx[{b.drl_idx},n_mvs={n_mvs}]: "
                              f"r={msac.rng}")
            has_subpel_filter = int(min(bw4, bh4) == 1 or
                                    b.inter_mode != lv.GLOBALMV_GLOBALMV)
            mv_out = [None, None]
            for idx in range(2):
                which = int(im[idx])
                if which in (lv.NEARMV, lv.NEARESTMV):
                    mv_out[idx] = fix_mv_precision(
                        fh, *mvstack[b.drl_idx]["mv"][idx])
                elif which == lv.GLOBALMV:
                    has_subpel_filter |= int(
                        fh.gmv[b.ref[idx]].type ==
                        WarpedMotionType.TRANSLATION)
                    mv_out[idx] = get_gmv_2d(fh.gmv[b.ref[idx]], self.bx,
                                             self.by, bw4, bh4, fh)
                else:  # NEWMV
                    base = mvstack[b.drl_idx]["mv"][idx]
                    mv_prec = fh.hp - fh.force_integer_mv
                    mv_out[idx] = self._read_mv_residual(base, mv_prec)
            b.mv = (mv_out[0], mv_out[1])
            if self.dbg:
                print(f"Post-residual_mv[1:y={b.mv[0][0]},x={b.mv[0][1]},"
                      f"2:y={b.mv[1][0]},x={b.mv[1][1]}]: r={msac.rng}")

            # jnt vs seg/wedge
            is_segwedge = 0
            if f.seq_hdr.masked_compound:
                mask_ctx = env.get_mask_comp_ctx(a, l, by4, bx4)
                is_segwedge = msac.decode_bool_adapt(
                    cdf.m.mask_comp[mask_ctx])
                if self.dbg:
                    print(f"Post-segwedge_vs_jntavg[{is_segwedge},"
                          f"ctx={mask_ctx}]: r={msac.rng}")
            if not is_segwedge:
                if f.seq_hdr.jnt_comp:
                    jnt_ctx = env.get_jnt_comp_ctx(
                        f.seq_hdr.order_hint_n_bits, fh.frame_offset,
                        f.refpoc[b.ref[0]], f.refpoc[b.ref[1]],
                        a, l, by4, bx4)
                    b.comp_type = lv.COMP_INTER_WEIGHTED_AVG + \
                        msac.decode_bool_adapt(cdf.m.jnt_comp[jnt_ctx])
                else:
                    b.comp_type = lv.COMP_INTER_AVG
            else:
                if lv.WEDGE_ALLOWED_MASK & (1 << bs):
                    wctx = int(lv.wedge_ctx_lut[bs])
                    b.comp_type = lv.COMP_INTER_WEDGE - \
                        msac.decode_bool_adapt(cdf.m.wedge_comp[wctx])
                    if b.comp_type == lv.COMP_INTER_WEDGE:
                        b.wedge_idx = msac.decode_symbol_adapt(
                            cdf.m.wedge_idx[wctx], 15)
                else:
                    b.comp_type = lv.COMP_INTER_SEG
                b.mask_sign = msac.decode_bool_equi()
        else:
            b.comp_type = lv.COMP_INTER_NONE
            if seg is not None and seg.ref > 0:
                ref0 = seg.ref - 1
            elif seg is not None and (seg.globalmv or seg.skip):
                ref0 = 0
            else:
                ctx1 = env.av1_get_ref_ctx(a, l, by4, bx4,
                                           have_top, have_left)
                if msac.decode_bool_adapt(cdf.m.ref[0][ctx1]):
                    ctx2 = env.av1_get_ref_2_ctx(a, l, by4, bx4,
                                                 have_top, have_left)
                    if msac.decode_bool_adapt(cdf.m.ref[1][ctx2]):
                        ref0 = 6
                    else:
                        ctx3 = env.av1_get_ref_6_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                        ref0 = 4 + msac.decode_bool_adapt(cdf.m.ref[5][ctx3])
                else:
                    ctx2 = env.av1_get_ref_3_ctx(a, l, by4, bx4,
                                                 have_top, have_left)
                    if msac.decode_bool_adapt(cdf.m.ref[2][ctx2]):
                        ctx3 = env.av1_get_ref_5_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                        ref0 = 2 + msac.decode_bool_adapt(cdf.m.ref[4][ctx3])
                    else:
                        ctx3 = env.av1_get_ref_4_ctx(a, l, by4, bx4,
                                                     have_top, have_left)
                        ref0 = msac.decode_bool_adapt(cdf.m.ref[3][ctx3])
                if self.dbg:
                    print(f"Post-ref[{ref0}]: r={msac.rng}")
            b.ref = (ref0, -1)

            mvstack, n_mvs, ctx = rmv.refmvs_find(
                self.rt, (ref0 + 1, -1), bs, edge_flags, self.by, self.bx)
            if self.dbg:
                print(f"Refmvs[n={n_mvs},ctx={ctx}" + "".join(
                    f",({m['mv'][0][0]},{m['mv'][0][1]}|{m['mv'][1][0]},{m['mv'][1][1]})"
                    for m in mvstack[:min(n_mvs, 4)]) + f"]: r={msac.rng}")

            if ((seg is not None and (seg.skip or seg.globalmv)) or
                    msac.decode_bool_adapt(cdf.m.newmv_mode[ctx & 7])):
                if ((seg is not None and (seg.skip or seg.globalmv)) or
                        not msac.decode_bool_adapt(
                            cdf.m.globalmv_mode[(ctx >> 3) & 1])):
                    b.inter_mode = lv.GLOBALMV
                    b.drl_idx = 0
                    b.mv = (get_gmv_2d(fh.gmv[ref0], self.bx, self.by,
                                       bw4, bh4, fh), (0, 0))
                    has_subpel_filter = int(
                        min(bw4, bh4) == 1 or
                        fh.gmv[ref0].type == WarpedMotionType.TRANSLATION)
                else:
                    has_subpel_filter = 1
                    if msac.decode_bool_adapt(
                            cdf.m.refmv_mode[(ctx >> 4) & 15]):
                        b.inter_mode = lv.NEARMV
                        b.drl_idx = 1
                        if n_mvs > 2:
                            drl2 = env.get_drl_context(mvstack, 1)
                            b.drl_idx += msac.decode_bool_adapt(
                                cdf.m.drl_bit[drl2])
                            if b.drl_idx == 2 and n_mvs > 3:
                                drl3 = env.get_drl_context(mvstack, 2)
                                b.drl_idx += msac.decode_bool_adapt(
                                    cdf.m.drl_bit[drl3])
                    else:
                        b.inter_mode = lv.NEARESTMV
                        b.drl_idx = 0
                    mv0 = mvstack[b.drl_idx]["mv"][0]
                    if b.drl_idx < 2:
                        mv0 = fix_mv_precision(fh, *mv0)
                    b.mv = (mv0, (0, 0))
                if self.dbg:
                    print(f"Post-intermode[{b.inter_mode},drl={b.drl_idx},"
                          f"mv=y:{b.mv[0][0]},x:{b.mv[0][1]},"
                          f"n_mvs={n_mvs}]: r={msac.rng}")
            else:
                has_subpel_filter = 1
                b.inter_mode = lv.NEWMV
                b.drl_idx = 0
                if n_mvs > 1:
                    drl1 = env.get_drl_context(mvstack, 0)
                    b.drl_idx += msac.decode_bool_adapt(cdf.m.drl_bit[drl1])
                    if b.drl_idx == 1 and n_mvs > 2:
                        drl2 = env.get_drl_context(mvstack, 1)
                        b.drl_idx += msac.decode_bool_adapt(
                            cdf.m.drl_bit[drl2])
                if n_mvs > 1:
                    mv0 = mvstack[b.drl_idx]["mv"][0]
                else:
                    mv0 = fix_mv_precision(fh, *mvstack[0]["mv"][0])
                if self.dbg:
                    print(f"Post-intermode[{b.inter_mode},"
                          f"drl={b.drl_idx}]: r={msac.rng}")
                mv_prec = fh.hp - fh.force_integer_mv
                mv0 = self._read_mv_residual(mv0, mv_prec)
                b.mv = (mv0, (0, 0))
                if self.dbg:
                    print(f"Post-residualmv[mv=y:{b.mv[0][0]},"
                          f"x:{b.mv[0][1]}]: r={msac.rng}")

            # interintra
            ii_sz_grp = int(lv.ymode_size_context[bs])
            if (f.seq_hdr.inter_intra and
                    (lv.INTERINTRA_ALLOWED_MASK & (1 << bs)) and
                    msac.decode_bool_adapt(cdf.m.interintra[ii_sz_grp])):
                b.interintra_mode = msac.decode_symbol_adapt(
                    cdf.m.interintra_mode[ii_sz_grp],
                    lv.N_INTER_INTRA_PRED_MODES - 1)
                wctx = int(lv.wedge_ctx_lut[bs])
                b.interintra_type = lv.INTER_INTRA_BLEND + \
                    msac.decode_bool_adapt(cdf.m.interintra_wedge[wctx])
                if b.interintra_type == lv.INTER_INTRA_WEDGE:
                    b.wedge_idx = msac.decode_symbol_adapt(
                        cdf.m.wedge_idx[wctx], 15)
            else:
                b.interintra_type = lv.INTER_INTRA_NONE

            # motion variation
            if (fh.switchable_motion_mode and
                    b.interintra_type == lv.INTER_INTRA_NONE and
                    min(bw4, bh4) >= 2 and
                    not (not fh.force_integer_mv and
                         b.inter_mode == lv.GLOBALMV and
                         fh.gmv[ref0].type > WarpedMotionType.TRANSLATION) and
                    ((have_left and self._findoddzero_l(by4 + 1, h4 >> 1)) or
                     (have_top and self._findoddzero_a(bx4 + 1, w4 >> 1)))):
                masks = self._find_matching_ref(
                    b, edge_flags, bw4, bh4, w4, h4, have_left, have_top,
                    ref0)
                allow_warp = int(not f.svc_scale[ref0] and
                                 not fh.force_integer_mv and
                                 fh.warp_motion and (masks[0] | masks[1]))
                if allow_warp:
                    b.motion_mode = msac.decode_symbol_adapt(
                        cdf.m.motion_mode[bs], 2)
                else:
                    b.motion_mode = msac.decode_bool_adapt(cdf.m.obmc[bs])
                if b.motion_mode == lv.MM_WARP:
                    has_subpel_filter = 0
                    b.warpmv = self._derive_warpmv(b, bw4, bh4, masks,
                                                   b.mv[0])
                if self.dbg:
                    print(f"Post-motionmode[{b.motion_mode}]: r={msac.rng} "
                          f"[mask: 0x{masks[0]:x}/0x{masks[1]:x}]")
            else:
                b.motion_mode = lv.MM_TRANSLATION

        # subpel filter
        if fh.subpel_filter_mode == FilterMode.SWITCHABLE:
            if has_subpel_filter:
                comp = int(b.comp_type != lv.COMP_INTER_NONE)
                ctx1 = env.get_filter_ctx(a, l, comp, 0, b.ref[0], by4, bx4)
                f0 = msac.decode_symbol_adapt(cdf.m.filter[0][ctx1],
                                              lv.N_SWITCHABLE_FILTERS - 1)
                if f.seq_hdr.dual_filter:
                    ctx2 = env.get_filter_ctx(a, l, comp, 1, b.ref[0],
                                              by4, bx4)
                    if self.dbg:
                        print(f"Post-subpel_filter1[{f0},ctx={ctx1}]: "
                              f"r={msac.rng}")
                    f1 = msac.decode_symbol_adapt(
                        cdf.m.filter[1][ctx2], lv.N_SWITCHABLE_FILTERS - 1)
                    if self.dbg:
                        print(f"Post-subpel_filter2[{f1},ctx={ctx2}]: "
                              f"r={msac.rng}")
                else:
                    f1 = f0
                    if self.dbg:
                        print(f"Post-subpel_filter[{f0},ctx={ctx1}]: "
                              f"r={msac.rng}")
            else:
                f0 = f1 = FilterMode.REGULAR
        else:
            f0 = f1 = fh.subpel_filter_mode
        b.filter = (int(f0), int(f1))
        b.filter2d = int(lv.filter_2d[f1][f0])

        self._read_vartx_tree(b, bs, bx4, by4)

        # inter coefficient parse (read_coef_blocks order)
        self._read_coef_blocks_inter(b, bs, bx4, by4, bw4, bh4, w4, h4,
                                     has_chroma)

        # refmvs splat
        rf = self.rt.rf
        if is_comp:
            mode = b.inter_mode
            mf = int(mode == lv.GLOBALMV_GLOBALMV) | \
                (2 if (1 << mode) & 0xBC else 0)
            rf.splat_mv(self.bx, self.by, bw4, bh4,
                        (b.mv[0], b.mv[1]),
                        (b.ref[0] + 1, b.ref[1] + 1), bs, mf)
        else:
            mode = b.inter_mode
            mf = int(mode == lv.GLOBALMV and min(bw4, bh4) >= 2) | \
                ((mode == lv.NEWMV) * 2)
            rf.splat_mv(self.bx, self.by, bw4, bh4,
                        (b.mv[0], (0, 0)),
                        (b.ref[0] + 1, 0 if b.interintra_type else -1),
                        bs, mf)

        # context updates (reference decode.c:1906-1934)
        filt = b.filter
        a.seg_pred[bx4:bx4 + bw4] = seg_pred
        a.skip_mode[bx4:bx4 + bw4] = b.skip_mode
        a.intra[bx4:bx4 + bw4] = 0
        a.skip[bx4:bx4 + bw4] = b.skip
        a.pal_sz[bx4:bx4 + bw4] = 0
        self.pal_sz_uv[0][bx4 & 31:min((bx4 & 31) + bw4, 32)] = 0
        a.tx_intra[bx4:bx4 + bw4] = b_dim[2]
        a.comp_type[bx4:bx4 + bw4] = b.comp_type
        a.filter[0][bx4:bx4 + bw4] = filt[0]
        a.filter[1][bx4:bx4 + bw4] = filt[1]
        self.plan.b4_filter[0, self.by:self.by + bh4,
                            self.bx:self.bx + bw4] = filt[0]
        self.plan.b4_filter[1, self.by:self.by + bh4,
                            self.bx:self.bx + bw4] = filt[1]
        a.mode[bx4:bx4 + bw4] = b.inter_mode
        a.ref[0][bx4:bx4 + bw4] = b.ref[0]
        a.ref[1][bx4:bx4 + bw4] = b.ref[1]
        l.seg_pred[by4:by4 + bh4] = seg_pred
        l.skip_mode[by4:by4 + bh4] = b.skip_mode
        l.intra[by4:by4 + bh4] = 0
        l.skip[by4:by4 + bh4] = b.skip
        l.pal_sz[by4:by4 + bh4] = 0
        self.pal_sz_uv[1][by4:by4 + bh4] = 0
        l.tx_intra[by4:by4 + bh4] = b_dim[3]
        l.comp_type[by4:by4 + bh4] = b.comp_type
        l.filter[0][by4:by4 + bh4] = filt[0]
        l.filter[1][by4:by4 + bh4] = filt[1]
        l.mode[by4:by4 + bh4] = b.inter_mode
        l.ref[0][by4:by4 + bh4] = b.ref[0]
        l.ref[1][by4:by4 + bh4] = b.ref[1]
        if has_chroma:
            a.uvmode[cbx4:cbx4 + cbw4] = lv.DC_PRED
            l.uvmode[cby4:cby4 + cbh4] = lv.DC_PRED

        # plan grids
        p = self.plan
        y0, x0 = self.by, self.bx
        p.b4_bs[y0:y0 + h4, x0:x0 + w4] = bs
        p.b4_intra[y0:y0 + h4, x0:x0 + w4] = 0
        p.b4_skip[y0:y0 + h4, x0:x0 + w4] = b.skip
        p.b4_seg[y0:y0 + h4, x0:x0 + w4] = b.seg_id
        p.b4_uvmode[y0:y0 + h4, x0:x0 + w4] = lv.DC_PRED

    def _findoddzero_l(self, off, ln):
        return any(not self.l.intra[off + n * 2] for n in range(ln))

    def _findoddzero_a(self, off, ln):
        return any(not self.a.intra[off + n * 2] for n in range(ln))

    # -- inter coefficients ---------------------------------------------
    def _read_coef_tree(self, b, bs, ytx, depth, tx_split, x_off, y_off):
        from .decode import CoefBlock
        f = self.f
        t_dim = lv.TXFM_INFO[ytx]
        txw, txh = t_dim.w, t_dim.h
        if depth < 2 and tx_split[depth] and \
                tx_split[depth] & (1 << (y_off * 4 + x_off)):
            sub = t_dim.sub
            sub_t = lv.TXFM_INFO[sub]
            txsw, txsh = sub_t.w, sub_t.h
            self._read_coef_tree(b, bs, sub, depth + 1, tx_split,
                                 x_off * 2, y_off * 2)
            self.bx += txsw
            if txw >= txh and self.bx < f.bw:
                self._read_coef_tree(b, bs, sub, depth + 1, tx_split,
                                     x_off * 2 + 1, y_off * 2)
            self.bx -= txsw
            self.by += txsh
            if txh >= txw and self.by < f.bh:
                self._read_coef_tree(b, bs, sub, depth + 1, tx_split,
                                     x_off * 2, y_off * 2 + 1)
                self.bx += txsw
                if txw >= txh and self.bx < f.bw:
                    self._read_coef_tree(b, bs, sub, depth + 1, tx_split,
                                         x_off * 2 + 1, y_off * 2 + 1)
                self.bx -= txsw
            self.by -= txsh
        else:
            bx4 = self.bx
            by4 = self.by & 31
            txtp, eob, cf, cf_ctx = self._decode_coefs(
                self.a.lcoef[bx4:], self.l.lcoef[by4:], ytx, bs, b,
                False, 0)
            if self.dbg:
                print(f"Post-y-cf-blk[tx={ytx},txtp={txtp},eob={eob}]: "
                      f"r={self.msac.rng}")
            self.plan.coefs.append(CoefBlock(0, self.bx, self.by, ytx,
                                             txtp, eob, cf))
            nw = min(txw, f.bw - self.bx)
            nh = min(txh, f.bh - self.by)
            self.a.lcoef[bx4:bx4 + nw] = cf_ctx
            self.l.lcoef[by4:by4 + nh] = cf_ctx
            # record per-4x4 luma txtp for chroma inference
            self.txtp_map[self.by & 31:(self.by & 31) + txh,
                          self.bx:self.bx + txw] = txtp

    def _read_coef_blocks_inter(self, b, bs, bx4, by4, bw4, bh4, w4, h4,
                                has_chroma):
        from .decode import CoefBlock
        f = self.f
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        a, l = self.a, self.l
        cbx4 = bx4 >> ss_hor
        cby4 = (by4 & 31) >> ss_ver

        if b.skip:
            a.lcoef[bx4:bx4 + bw4] = 0x40
            l.lcoef[by4:by4 + bh4] = 0x40
            if has_chroma:
                cbw4 = (bw4 + ss_hor) >> ss_hor
                cbh4 = (bh4 + ss_ver) >> ss_ver
                a.ccoef[0][cbx4:cbx4 + cbw4] = 0x40
                a.ccoef[1][cbx4:cbx4 + cbw4] = 0x40
                l.ccoef[0][cby4:cby4 + cbh4] = 0x40
                l.ccoef[1][cby4:cby4 + cbh4] = 0x40
            return

        cw4 = (w4 + ss_hor) >> ss_hor
        ch4 = (h4 + ss_ver) >> ss_ver
        uv_t_dim = lv.TXFM_INFO[b.uvtx]
        max_t = lv.TXFM_INFO[b.max_ytx]
        bx_outer, by_outer = self.bx, self.by

        for init_y in range(0, h4, 16):
            sub_h4 = min(h4, 16 + init_y)
            for init_x in range(0, w4, 16):
                sub_w4 = min(w4, init_x + 16)
                y = init_y
                y_off = 1 if init_y else 0
                self.by = by_outer + init_y
                while y < sub_h4:
                    x = init_x
                    x_off = 1 if init_x else 0
                    self.bx = bx_outer + init_x
                    while x < sub_w4:
                        self._read_coef_tree(b, bs, b.max_ytx, 0,
                                             b.tx_split, x_off, y_off)
                        x += max_t.w
                        self.bx += max_t.w
                        x_off += 1
                    y += max_t.h
                    self.by += max_t.h
                    y_off += 1
                self.by = by_outer
                self.bx = bx_outer

                if not has_chroma:
                    continue
                sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
                sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                for pl in range(2):
                    y = init_y >> ss_ver
                    self.by = by_outer + init_y
                    while y < sub_ch4:
                        x = init_x >> ss_hor
                        self.bx = bx_outer + init_x
                        while x < sub_cw4:
                            ytxtp = int(self.txtp_map[
                                (by_outer & 31) + (y << ss_ver),
                                bx_outer + (x << ss_hor)])
                            txtp, eob, cf, cf_ctx = self._decode_coefs(
                                a.ccoef[pl][cbx4 + x:],
                                l.ccoef[pl][cby4 + y:],
                                b.uvtx, bs, b, False, 1 + pl, ytxtp=ytxtp)
                            if self.dbg:
                                print(f"Post-uv-cf-blk[pl={pl},tx={b.uvtx},"
                                      f"txtp={txtp},eob={eob}]: "
                                      f"r={self.msac.rng}")
                            self.plan.coefs.append(CoefBlock(
                                1 + pl, self.bx >> ss_hor,
                                self.by >> ss_ver, b.uvtx, txtp, eob, cf))
                            ctw = min(uv_t_dim.w,
                                      (f.bw - self.bx + ss_hor) >> ss_hor)
                            cth = min(uv_t_dim.h,
                                      (f.bh - self.by + ss_ver) >> ss_ver)
                            a.ccoef[pl][cbx4 + x:cbx4 + x + ctw] = cf_ctx
                            l.ccoef[pl][cby4 + y:cby4 + y + cth] = cf_ctx
                            x += uv_t_dim.w
                            self.bx += uv_t_dim.w << ss_hor
                        y += uv_t_dim.h
                        self.by += uv_t_dim.h << ss_ver
                    self.by = by_outer
                    self.bx = bx_outer

    # -- intra block copy (reference decode.c:1264-1381) ----------------
    def _decode_b_intrabc(self, b, bs, b_dim, bx4, by4, bw4, bh4,
                          has_chroma, seg_pred, edge_flags,
                          cbx4, cby4, cbw4, cbh4, w4, h4):
        f = self.f
        fh = f.frame_hdr
        msac = self.msac
        a, l = self.a, self.l
        ss_ver, ss_hor = f.ss_ver, f.ss_hor

        mvstack, _n, _ctx = rmv.refmvs_find(
            self.rt, (0, -1), bs, edge_flags, self.by, self.bx)
        if mvstack[0]["mv"][0] != (0, 0):
            mv = mvstack[0]["mv"][0]
        elif len(mvstack) > 1 and mvstack[1]["mv"][0] != (0, 0):
            mv = mvstack[1]["mv"][0]
        else:
            if self.by - (16 << f.sb128) < self.row_start:
                mv = (0, -(512 << f.sb128) - 2048)
            else:
                mv = (-(512 << f.sb128), 0)
        ref_mv = mv
        mv = self._read_mv_residual(mv, -1)

        # clip to the decoded parts of the current tile
        border_left = self.col_start * 4
        border_top = self.row_start * 4
        if has_chroma:
            if bw4 < 2 and ss_hor:
                border_left += 4
            if bh4 < 2 and ss_ver:
                border_top += 4
        src_left = self.bx * 4 + (mv[1] >> 3)
        src_top = self.by * 4 + (mv[0] >> 3)
        src_right = src_left + bw4 * 4
        src_bottom = src_top + bh4 * 4
        border_right = ((self.col_end + (bw4 - 1)) & ~(bw4 - 1)) * 4

        if src_left < border_left:
            src_right += border_left - src_left
            src_left = border_left
        elif src_right > border_right:
            src_left -= src_right - border_right
            src_right = border_right
        if src_top < border_top:
            src_bottom += border_top - src_top
            src_top = border_top

        sbx = (self.bx >> (4 + f.sb128)) << (6 + f.sb128)
        sby = (self.by >> (4 + f.sb128)) << (6 + f.sb128)
        sb_size = 1 << (6 + f.sb128)
        if src_bottom > sby and src_right > sbx:
            if src_top - border_top >= src_bottom - sby:
                d = src_bottom - sby
                src_top -= d
                src_bottom -= d
            elif src_left - border_left >= src_right - sbx:
                d = src_right - sbx
                src_left -= d
                src_right -= d
        if src_bottom > sby + sb_size:
            d = src_bottom - (sby + sb_size)
            src_top -= d
            src_bottom -= d
        if src_bottom > sby and src_right > sbx:
            raise ValueError("intrabc mv overlaps current superblock")

        b.mv = ((((src_top - self.by * 4) * 8),
                 ((src_left - self.bx * 4) * 8)), (0, 0))
        b.ref = (-1, -1)
        b.filter2d = 9       # FILTER_2D_BILINEAR
        if self.dbg:
            print(f"Post-dmv[{b.mv[0][0]}/{b.mv[0][1]},"
                  f"ref={ref_mv[0]}/{ref_mv[1]}|"
                  f"{mvstack[0]['mv'][0][0]}/{mvstack[0]['mv'][0][1]}]: "
                  f"r={msac.rng}")
        self._read_vartx_tree(b, bs, bx4, by4)
        self._read_coef_blocks_inter(b, bs, bx4, by4, bw4, bh4, w4, h4,
                                     has_chroma)

        # splat_intrabc_mv (reference decode.c:530-543)
        self.rt.rf.splat_mv(self.bx, self.by, bw4, bh4,
                            (b.mv[0], (0, 0)), (0, -1), bs, 0)

        # context updates (reference decode.c:1361-1380)
        a.tx_intra[bx4:bx4 + bw4] = b_dim[2]
        a.mode[bx4:bx4 + bw4] = lv.DC_PRED
        a.pal_sz[bx4:bx4 + bw4] = 0
        self.pal_sz_uv[0][bx4 & 31:min((bx4 & 31) + bw4, 32)] = 0
        a.seg_pred[bx4:bx4 + bw4] = seg_pred
        a.skip_mode[bx4:bx4 + bw4] = 0
        a.intra[bx4:bx4 + bw4] = 0
        a.skip[bx4:bx4 + bw4] = b.skip
        l.tx_intra[by4:by4 + bh4] = b_dim[3]
        l.mode[by4:by4 + bh4] = lv.DC_PRED
        l.pal_sz[by4:by4 + bh4] = 0
        self.pal_sz_uv[1][by4:by4 + bh4] = 0
        l.seg_pred[by4:by4 + bh4] = seg_pred
        l.skip_mode[by4:by4 + bh4] = 0
        l.intra[by4:by4 + bh4] = 0
        l.skip[by4:by4 + bh4] = b.skip
        if has_chroma:
            a.uvmode[cbx4:cbx4 + cbw4] = lv.DC_PRED
            l.uvmode[cby4:cby4 + cbh4] = lv.DC_PRED
        p_ = self.plan
        y0, x0 = self.by, self.bx
        p_.b4_bs[y0:y0 + h4, x0:x0 + w4] = bs
        p_.b4_intra[y0:y0 + h4, x0:x0 + w4] = 0
        p_.b4_skip[y0:y0 + h4, x0:x0 + w4] = b.skip
        p_.b4_seg[y0:y0 + h4, x0:x0 + w4] = b.seg_id
