"""Block/transform/mode enumerations (reference src/levels.h:44-260).

These orderings are normative — symbol indices decoded from the
bitstream map directly onto them.
"""
from __future__ import annotations

import numpy as np

from .. import tables

# --- transform sizes --------------------------------------------------------
TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64 = range(5)
N_TX_SIZES = 5
(RTX_4X8, RTX_8X4, RTX_8X16, RTX_16X8, RTX_16X32, RTX_32X16, RTX_32X64,
 RTX_64X32, RTX_4X16, RTX_16X4, RTX_8X32, RTX_32X8, RTX_16X64,
 RTX_64X16) = range(5, 19)
N_RECT_TX_SIZES = 19

# --- block levels / partitions ---------------------------------------------
BL_128X128, BL_64X64, BL_32X32, BL_16X16, BL_8X8 = range(5)
N_BL_LEVELS = 5

(PARTITION_NONE, PARTITION_H, PARTITION_V, PARTITION_SPLIT,
 PARTITION_T_TOP_SPLIT, PARTITION_T_BOTTOM_SPLIT, PARTITION_T_LEFT_SPLIT,
 PARTITION_T_RIGHT_SPLIT, PARTITION_H4, PARTITION_V4) = range(10)
N_PARTITIONS = 10
N_SUB8X8_PARTITIONS = PARTITION_T_TOP_SPLIT

# --- block sizes ------------------------------------------------------------
(BS_128x128, BS_128x64, BS_64x128, BS_64x64, BS_64x32, BS_64x16, BS_32x64,
 BS_32x32, BS_32x16, BS_32x8, BS_16x64, BS_16x32, BS_16x16, BS_16x8,
 BS_16x4, BS_8x32, BS_8x16, BS_8x8, BS_8x4, BS_4x16, BS_4x8,
 BS_4x4) = range(22)
N_BS_SIZES = 22

# --- transform types --------------------------------------------------------
(DCT_DCT, ADST_DCT, DCT_ADST, ADST_ADST, FLIPADST_DCT, DCT_FLIPADST,
 FLIPADST_FLIPADST, ADST_FLIPADST, FLIPADST_ADST, IDTX, V_DCT, H_DCT,
 V_ADST, H_ADST, V_FLIPADST, H_FLIPADST) = range(16)
N_TX_TYPES = 16
WHT_WHT = 16
N_TX_TYPES_PLUS_LL = 17

TX_CLASS_2D, TX_CLASS_H, TX_CLASS_V = range(3)

# --- intra prediction modes -------------------------------------------------
(DC_PRED, VERT_PRED, HOR_PRED, DIAG_DOWN_LEFT_PRED, DIAG_DOWN_RIGHT_PRED,
 VERT_RIGHT_PRED, HOR_DOWN_PRED, HOR_UP_PRED, VERT_LEFT_PRED, SMOOTH_PRED,
 SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED) = range(13)
N_INTRA_PRED_MODES = 13
CFL_PRED = N_INTRA_PRED_MODES
N_UV_INTRA_PRED_MODES = 14
FILTER_PRED = N_INTRA_PRED_MODES
LEFT_DC_PRED, TOP_DC_PRED, DC_128_PRED, Z1_PRED, Z2_PRED, Z3_PRED = range(3, 9)

II_DC_PRED, II_VERT_PRED, II_HOR_PRED, II_SMOOTH_PRED = range(4)
N_INTER_INTRA_PRED_MODES = 4

# --- inter modes ------------------------------------------------------------
NEARESTMV, NEARMV, GLOBALMV, NEWMV = range(4)
N_INTER_PRED_MODES = 4
(NEARESTMV_NEARESTMV, NEARMV_NEARMV, NEARESTMV_NEWMV, NEWMV_NEARESTMV,
 NEARMV_NEWMV, NEWMV_NEARMV, GLOBALMV_GLOBALMV, NEWMV_NEWMV) = range(8)
N_COMP_INTER_PRED_MODES = 8

COMP_INTER_NONE, COMP_INTER_WEIGHTED_AVG, COMP_INTER_AVG, \
    COMP_INTER_SEG, COMP_INTER_WEDGE = range(5)
INTER_INTRA_NONE, INTER_INTRA_BLEND, INTER_INTRA_WEDGE = range(3)
MM_TRANSLATION, MM_OBMC, MM_WARP = range(3)

(FILTER_2D_8TAP_REGULAR, FILTER_2D_8TAP_REGULAR_SMOOTH,
 FILTER_2D_8TAP_REGULAR_SHARP, FILTER_2D_8TAP_SHARP_REGULAR,
 FILTER_2D_8TAP_SHARP_SMOOTH, FILTER_2D_8TAP_SHARP,
 FILTER_2D_8TAP_SMOOTH_REGULAR, FILTER_2D_8TAP_SMOOTH,
 FILTER_2D_8TAP_SMOOTH_SHARP, FILTER_2D_BILINEAR) = range(10)
N_2D_FILTERS = 10
N_SWITCHABLE_FILTERS = 3

MV_JOINT_ZERO, MV_JOINT_H, MV_JOINT_V, MV_JOINT_HV = range(4)

# --- mask LUTs from tables (reference src/tables.h:69-103) -------------------
CFL_ALLOWED_MASK = (
    (1 << BS_32x32) | (1 << BS_32x16) | (1 << BS_32x8) | (1 << BS_16x32) |
    (1 << BS_16x16) | (1 << BS_16x8) | (1 << BS_16x4) | (1 << BS_8x32) |
    (1 << BS_8x16) | (1 << BS_8x8) | (1 << BS_8x4) | (1 << BS_4x16) |
    (1 << BS_4x8) | (1 << BS_4x4))
WEDGE_ALLOWED_MASK = (
    (1 << BS_32x32) | (1 << BS_32x16) | (1 << BS_32x8) | (1 << BS_16x32) |
    (1 << BS_16x16) | (1 << BS_16x8) | (1 << BS_8x32) | (1 << BS_8x16) |
    (1 << BS_8x8))
INTERINTRA_ALLOWED_MASK = (
    (1 << BS_32x32) | (1 << BS_32x16) | (1 << BS_16x32) | (1 << BS_16x16) |
    (1 << BS_16x8) | (1 << BS_8x16) | (1 << BS_8x8))

# --- table views (ints for speed) -------------------------------------------
block_dimensions = tables.get("dav1d_block_dimensions").astype(np.int32)
txfm_dimensions = tables.get("dav1d_txfm_dimensions").astype(np.int32)
block_sizes = tables.get("dav1d_block_sizes").astype(np.int32)
al_part_ctx = tables.get("dav1d_al_part_ctx").astype(np.int32)
max_txfm_size_for_bs = tables.get("dav1d_max_txfm_size_for_bs").astype(np.int32)
partition_type_count = tables.get("dav1d_partition_type_count").astype(np.int32)
ymode_size_context = tables.get("dav1d_ymode_size_context").astype(np.int32)
intra_mode_context = tables.get("dav1d_intra_mode_context").astype(np.int32)
txtp_from_uvmode = tables.get("dav1d_txtp_from_uvmode").astype(np.int32)
tx_types_per_set = tables.get("dav1d_tx_types_per_set").astype(np.int32)
tx_type_class = tables.get("dav1d_tx_type_class").astype(np.int32)
filter_mode_to_y_mode = tables.get("dav1d_filter_mode_to_y_mode").astype(np.int32)
skip_ctx_tbl = tables.get("dav1d_skip_ctx").astype(np.int32)
lo_ctx_offsets = tables.get("dav1d_lo_ctx_offsets").astype(np.int32)


class TxfmInfo:
    """Unpacked row of dav1d_txfm_dimensions (reference tables.h:41-44)."""
    __slots__ = ("w", "h", "lw", "lh", "min", "max", "sub", "ctx")

    def __init__(self, row):
        (self.w, self.h, self.lw, self.lh,
         self.min, self.max, self.sub, self.ctx) = (int(x) for x in row)


TXFM_INFO = [TxfmInfo(txfm_dimensions[i]) for i in range(N_RECT_TX_SIZES)]
comp_inter_pred_modes = tables.get("dav1d_comp_inter_pred_modes").astype(np.int32)
wedge_ctx_lut = tables.get("dav1d_wedge_ctx_lut").astype(np.int32)
filter_2d = tables.get("dav1d_filter_2d").astype(np.int32)
filter_dir = tables.get("dav1d_filter_dir").astype(np.int32)
