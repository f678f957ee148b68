"""Neighbor-context state and context derivation.

Python equivalents of the reference's BlockContext and env.h helpers
(reference src/env.h:39-120, recon_tmpl.c:59-320). The reference uses
word-sized bit tricks for the merges; we implement the plain semantics
(validated against the oracle end-to-end).

Shared by the tile symbol decoder (entropy/decode.py) and the test
stream generator (tools/streamgen) so both sides derive identical
contexts.
"""
from __future__ import annotations

import numpy as np

from . import levels as lv


class BlockContext:
    """Above/left neighbor state, 32 4px units (reference env.h:39-57)."""
    __slots__ = ("mode", "lcoef", "ccoef", "seg_pred", "skip", "skip_mode",
                 "intra", "comp_type", "ref", "filter", "tx_intra", "tx",
                 "tx_lpf_y", "tx_lpf_uv", "partition", "uvmode", "pal_sz")

    def __init__(self):
        self.mode = np.zeros(32, np.uint8)
        self.lcoef = np.zeros(32, np.uint8)
        self.ccoef = np.zeros((2, 32), np.uint8)
        self.seg_pred = np.zeros(32, np.uint8)
        self.skip = np.zeros(32, np.uint8)
        self.skip_mode = np.zeros(32, np.uint8)
        self.intra = np.zeros(32, np.uint8)
        self.comp_type = np.zeros(32, np.uint8)
        self.ref = np.zeros((2, 32), np.int8)
        self.filter = np.zeros((2, 32), np.uint8)
        self.tx_intra = np.zeros(32, np.int8)
        self.tx = np.zeros(32, np.int8)
        self.tx_lpf_y = np.zeros(32, np.uint8)
        self.tx_lpf_uv = np.zeros(32, np.uint8)
        self.partition = np.zeros(16, np.uint8)
        self.uvmode = np.zeros(32, np.uint8)
        self.pal_sz = np.zeros(32, np.uint8)

    def reset(self, keyframe: bool) -> None:
        """reference decode.c reset_context:2392-2417."""
        self.intra.fill(1 if keyframe else 0)
        self.uvmode.fill(lv.DC_PRED)
        if keyframe:
            self.mode.fill(lv.DC_PRED)
        self.partition.fill(0)
        self.skip.fill(0)
        self.skip_mode.fill(0)
        self.tx_lpf_y.fill(2)
        self.tx_lpf_uv.fill(1)
        self.tx_intra.fill(-1)
        self.tx.fill(lv.TX_64X64)
        if not keyframe:
            self.ref.fill(-1)
            self.comp_type.fill(0)
            self.mode.fill(lv.NEARESTMV)
        self.lcoef.fill(0x40)
        self.ccoef.fill(0x40)
        self.filter.fill(lv.N_SWITCHABLE_FILTERS)
        self.seg_pred.fill(0)
        self.pal_sz.fill(0)


# --- mode-level contexts ----------------------------------------------------

def get_intra_ctx(a: BlockContext, l: BlockContext, yb4: int, xb4: int,
                  have_top: bool, have_left: bool) -> int:
    if have_left:
        if have_top:
            ctx = int(l.intra[yb4]) + int(a.intra[xb4])
            return ctx + (ctx == 2)
        return int(l.intra[yb4]) * 2
    return int(a.intra[xb4]) * 2 if have_top else 0


def get_tx_ctx(a: BlockContext, l: BlockContext, max_tx: "lv.TxfmInfo",
               yb4: int, xb4: int) -> int:
    return int(int(l.tx_intra[yb4]) >= max_tx.lh) + \
        int(int(a.tx_intra[xb4]) >= max_tx.lw)


def get_partition_ctx(a: BlockContext, l: BlockContext, bl: int,
                      yb8: int, xb8: int) -> int:
    return ((int(a.partition[xb8]) >> (4 - bl)) & 1) + \
        (((int(l.partition[yb8]) >> (4 - bl)) & 1) << 1)


def gather_left_partition_prob(cdf: np.ndarray, bl: int) -> int:
    """Sum of probs of partitions with a left split edge
    (reference env.h:92-103)."""
    out = int(cdf[lv.PARTITION_H - 1]) - int(cdf[lv.PARTITION_H])
    out += int(cdf[lv.PARTITION_SPLIT - 1]) - int(cdf[lv.PARTITION_T_LEFT_SPLIT])
    if bl != lv.BL_128X128:
        out += int(cdf[lv.PARTITION_H4 - 1]) - int(cdf[lv.PARTITION_H4])
    return out


def gather_top_partition_prob(cdf: np.ndarray, bl: int) -> int:
    out = int(cdf[lv.PARTITION_V - 1]) - int(cdf[lv.PARTITION_T_TOP_SPLIT])
    out += int(cdf[lv.PARTITION_T_LEFT_SPLIT - 1])
    if bl != lv.BL_128X128:
        out += int(cdf[lv.PARTITION_V4 - 1]) - int(cdf[lv.PARTITION_T_RIGHT_SPLIT])
    return out


# --- coefficient contexts ---------------------------------------------------

def get_skip_ctx(t_dim: "lv.TxfmInfo", bs: int, a: np.ndarray, l: np.ndarray,
                 chroma: int, ss_hor: int, ss_ver: int) -> int:
    """a/l are the lcoef/ccoef slices at the tx position
    (reference recon_tmpl.c:59-140, word-trick semantics unrolled)."""
    b_dim = lv.block_dimensions[bs]
    if chroma:
        not_one_blk = (b_dim[2] - (bool(b_dim[2]) and ss_hor) > t_dim.lw or
                       b_dim[3] - (bool(b_dim[3]) and ss_ver) > t_dim.lh)
        ca = bool(np.any(a[:1 << t_dim.lw] != 0x40))
        cl = bool(np.any(l[:1 << t_dim.lh] != 0x40))
        return 7 + int(not_one_blk) * 3 + int(ca) + int(cl)
    if b_dim[2] == t_dim.lw and b_dim[3] == t_dim.lh:
        return 0
    la = int(np.bitwise_or.reduce(a[:min(1 << t_dim.lw, 16)]))
    ll = int(np.bitwise_or.reduce(l[:min(1 << t_dim.lh, 16)]))
    return int(lv.skip_ctx_tbl[min(la & 0x3F, 4)][min(ll & 0x3F, 4)])


def get_dc_sign_ctx(tx: int, a: np.ndarray, l: np.ndarray) -> int:
    """Each context byte's bits 6-7: 0 = negative dc, 1 = no dc,
    2 = positive dc (reference recon_tmpl.c:140-296 unrolled)."""
    t_dim = lv.TXFM_INFO[tx]
    w4 = min(t_dim.w, 16)
    h4 = min(t_dim.h, 16)
    s = int((a[:w4] >> 6).astype(np.int32).sum()) - w4
    s += int((l[:h4] >> 6).astype(np.int32).sum()) - h4
    return (s != 0) + (s > 0)


def get_lo_ctx(levels_buf: np.ndarray, tx_class: int, ctx_offsets,
               x: int, y: int, stride: int, pos: int):
    """Returns (ctx, hi_mag) (reference recon_tmpl.c:298-320).
    levels_buf is flat; pos is the element offset of (x, y)."""
    mag = int(levels_buf[pos + 1]) + int(levels_buf[pos + stride])
    if tx_class == lv.TX_CLASS_2D:
        mag += int(levels_buf[pos + stride + 1])
        hi_mag = mag
        mag += int(levels_buf[pos + 2]) + int(levels_buf[pos + 2 * stride])
        offset = int(ctx_offsets[min(y, 4)][min(x, 4)])
    else:
        mag += int(levels_buf[pos + 2])
        hi_mag = mag
        mag += int(levels_buf[pos + 3]) + int(levels_buf[pos + 4])
        offset = 26 + (10 if y > 1 else y * 5)
    return offset + (4 if mag > 512 else (mag + 64) >> 7), hi_mag


def get_uv_inter_txtp(uvt_dim: "lv.TxfmInfo", ytxtp: int) -> int:
    if uvt_dim.max == lv.TX_32X32:
        return lv.IDTX if ytxtp == lv.IDTX else lv.DCT_DCT
    if uvt_dim.min == lv.TX_16X16 and ytxtp in (
            lv.H_FLIPADST, lv.V_FLIPADST, lv.H_ADST, lv.V_ADST):
        return lv.DCT_DCT
    return ytxtp


def neg_deinterleave(diff: int, ref: int, mx: int) -> int:
    """reference decode.c:169-189."""
    if not ref:
        return diff
    if ref >= mx - 1:
        return mx - diff - 1
    if 2 * ref < mx:
        if diff <= 2 * ref:
            return ref + ((diff + 1) >> 1) if diff & 1 else ref - (diff >> 1)
        return diff
    if diff <= 2 * (mx - ref - 1):
        return ref + ((diff + 1) >> 1) if diff & 1 else ref - (diff >> 1)
    return mx - (diff + 1)


# --- inter-mode contexts (reference env.h:96-263, 280-445) -----------------

def get_filter_ctx(a: BlockContext, l: BlockContext, comp: int, dir_: int,
                   ref: int, yb4: int, xb4: int) -> int:
    a_filter = int(a.filter[dir_][xb4]) \
        if (a.ref[0][xb4] == ref or a.ref[1][xb4] == ref) \
        else lv.N_SWITCHABLE_FILTERS
    l_filter = int(l.filter[dir_][yb4]) \
        if (l.ref[0][yb4] == ref or l.ref[1][yb4] == ref) \
        else lv.N_SWITCHABLE_FILTERS
    if a_filter == l_filter:
        return comp * 4 + a_filter
    if a_filter == lv.N_SWITCHABLE_FILTERS:
        return comp * 4 + l_filter
    if l_filter == lv.N_SWITCHABLE_FILTERS:
        return comp * 4 + a_filter
    return comp * 4 + lv.N_SWITCHABLE_FILTERS


def get_comp_ctx(a, l, yb4, xb4, have_top, have_left):
    if have_top:
        if have_left:
            if a.comp_type[xb4]:
                if l.comp_type[yb4]:
                    return 4
                return 2 + (int(l.ref[0][yb4]) >= 4 or int(l.ref[0][yb4]) < 0)
            if l.comp_type[yb4]:
                return 2 + (int(a.ref[0][xb4]) >= 4 or int(a.ref[0][xb4]) < 0)
            return int(l.ref[0][yb4] >= 4) ^ int(a.ref[0][xb4] >= 4)
        return 3 if a.comp_type[xb4] else int(a.ref[0][xb4] >= 4)
    if have_left:
        return 3 if l.comp_type[yb4] else int(l.ref[0][yb4] >= 4)
    return 1


def _has_uni_comp(edge, off):
    return (int(edge.ref[0][off]) < 4) == (int(edge.ref[1][off]) < 4)


def get_comp_dir_ctx(a, l, yb4, xb4, have_top, have_left):
    if have_top and have_left:
        a_intra, l_intra = int(a.intra[xb4]), int(l.intra[yb4])
        if a_intra and l_intra:
            return 2
        if a_intra or l_intra:
            edge, off = (l, yb4) if a_intra else (a, xb4)
            if edge.comp_type[off] == lv.COMP_INTER_NONE:
                return 2
            return 1 + 2 * _has_uni_comp(edge, off)
        a_comp = int(a.comp_type[xb4]) != lv.COMP_INTER_NONE
        l_comp = int(l.comp_type[yb4]) != lv.COMP_INTER_NONE
        a_ref0, l_ref0 = int(a.ref[0][xb4]), int(l.ref[0][yb4])
        if not a_comp and not l_comp:
            return 1 + 2 * ((a_ref0 >= 4) == (l_ref0 >= 4))
        if not a_comp or not l_comp:
            edge, off = (a, xb4) if a_comp else (l, yb4)
            if not _has_uni_comp(edge, off):
                return 1
            return 3 + ((a_ref0 >= 4) == (l_ref0 >= 4))
        a_uni = _has_uni_comp(a, xb4)
        l_uni = _has_uni_comp(l, yb4)
        if not a_uni and not l_uni:
            return 0
        if not a_uni or not l_uni:
            return 2
        return 3 + ((a_ref0 == 4) == (l_ref0 == 4))
    if have_top or have_left:
        edge, off = (l, yb4) if have_left else (a, xb4)
        if edge.intra[off]:
            return 2
        if edge.comp_type[off] == lv.COMP_INTER_NONE:
            return 2
        return 4 * _has_uni_comp(edge, off)
    return 2


def get_jnt_comp_ctx(order_hint_n_bits, poc, ref0poc, ref1poc, a, l,
                     yb4, xb4):
    from ..bitstream.obu import get_poc_diff
    d0 = abs(get_poc_diff(order_hint_n_bits, ref0poc, poc))
    d1 = abs(get_poc_diff(order_hint_n_bits, poc, ref1poc))
    offset = int(d0 == d1)
    a_ctx = int(a.comp_type[xb4] >= lv.COMP_INTER_AVG or a.ref[0][xb4] == 6)
    l_ctx = int(l.comp_type[yb4] >= lv.COMP_INTER_AVG or l.ref[0][yb4] == 6)
    return 3 * offset + a_ctx + l_ctx


def get_mask_comp_ctx(a, l, yb4, xb4):
    a_ctx = 1 if a.comp_type[xb4] >= lv.COMP_INTER_SEG else \
        3 if a.ref[0][xb4] == 6 else 0
    l_ctx = 1 if l.comp_type[yb4] >= lv.COMP_INTER_SEG else \
        3 if l.ref[0][yb4] == 6 else 0
    return min(a_ctx + l_ctx, 5)


def _ref_cnts(a, l, yb4, xb4, have_top, have_left, fn):
    """Generic counting helper over up to 4 neighbor refs."""
    refs = []
    if have_top and not a.intra[xb4]:
        refs.append(int(a.ref[0][xb4]))
        if a.comp_type[xb4]:
            refs.append(int(a.ref[1][xb4]))
    if have_left and not l.intra[yb4]:
        refs.append(int(l.ref[0][yb4]))
        if l.comp_type[yb4]:
            refs.append(int(l.ref[1][yb4]))
    return refs


def av1_get_ref_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        cnt[r >= 4] += 1
    return 1 if cnt[0] == cnt[1] else (0 if cnt[0] < cnt[1] else 2)


def av1_get_fwd_ref_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0, 0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if 0 <= r < 4:
            cnt[r] += 1
    c0, c2 = cnt[0] + cnt[1], cnt[2] + cnt[3]
    return 1 if c0 == c2 else (0 if c0 < c2 else 2)


def av1_get_fwd_ref_1_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if 0 <= r < 2:
            cnt[r] += 1
    return 1 if cnt[0] == cnt[1] else (0 if cnt[0] < cnt[1] else 2)


def av1_get_fwd_ref_2_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if r in (2, 3):
            cnt[r - 2] += 1
    return 1 if cnt[0] == cnt[1] else (0 if cnt[0] < cnt[1] else 2)


def av1_get_bwd_ref_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if r >= 4:
            cnt[r - 4] += 1
    c1 = cnt[1] + cnt[0]
    return 1 if cnt[2] == c1 else (0 if c1 < cnt[2] else 2)


def av1_get_bwd_ref_1_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if r >= 4:
            cnt[r - 4] += 1
    return 1 if cnt[0] == cnt[1] else (0 if cnt[0] < cnt[1] else 2)


def av1_get_uni_p1_ctx(a, l, yb4, xb4, have_top, have_left):
    cnt = [0, 0, 0]
    for r in _ref_cnts(a, l, yb4, xb4, have_top, have_left, None):
        if 0 <= r - 1 < 3:
            cnt[r - 1] += 1
    c1 = cnt[1] + cnt[2]
    return 1 if cnt[0] == c1 else (0 if cnt[0] < c1 else 2)


av1_get_ref_2_ctx = av1_get_bwd_ref_ctx
av1_get_ref_3_ctx = av1_get_fwd_ref_ctx
av1_get_ref_4_ctx = av1_get_fwd_ref_1_ctx
av1_get_ref_5_ctx = av1_get_fwd_ref_2_ctx
av1_get_ref_6_ctx = av1_get_bwd_ref_1_ctx
av1_get_uni_p_ctx = av1_get_ref_ctx
av1_get_uni_p2_ctx = av1_get_fwd_ref_2_ctx


def get_drl_context(mvstack, ref_idx):
    if mvstack[ref_idx]["weight"] >= 640:
        return int(mvstack[ref_idx + 1]["weight"] < 640)
    return 2 if mvstack[ref_idx + 1]["weight"] < 640 else 0
