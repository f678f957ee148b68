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
