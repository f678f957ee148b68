// Coefficient-decode context shared between the per-block ctypes entry
// (stagea.cpp) and the full native tile parser (tileparse.cpp).
#pragma once
#include <cstdint>
#include "msac.h"

struct CoefCtx {
    Msac msac;
    // CDFs (uint16, C-contiguous; shapes from dav1d_tpu/entropy/cdf.py)
    uint16_t *skip;          // (5,13,2)
    uint16_t *eob_bin[7];    // 16/32/64/128:(2,2,S) 256:(2,2,16) 512/1024:(2,16)
    int32_t eob_bin_stride[7];  // last-dim element count
    uint16_t *eob_hi_bit;    // (5,2,9,2)
    uint16_t *eob_base_tok;  // (5,2,4,4)
    uint16_t *base_tok;      // (5,2,41,4)
    uint16_t *dc_sign;       // (2,3,2)
    uint16_t *br_tok;        // (4,2,21,4)
    uint16_t *txtp_intra1;   // (2,13,8)
    uint16_t *txtp_intra2;   // (3,13,8)
    uint16_t *txtp_inter1;   // (2,16)
    uint16_t *txtp_inter2;   // (16,)
    uint16_t *txtp_inter3;   // (4,2)
    // tables
    const uint8_t *txfm_dim;           // (19,8): w,h,lw,lh,min,max,sub,ctx
    const uint16_t *scans[19];
    const uint8_t *lo_ctx_offsets;     // (3,5,5)
    const int32_t *tx_types_per_set;   // (40,)
    const uint8_t *skip_ctx_tbl;       // (5,5)
    const uint8_t *txtp_from_uvmode;   // (14,)
    const uint8_t *filter_mode_to_y_mode;  // (5,)
    const int32_t *tx_type_class;      // (17,)
    const int32_t *block_dimensions;   // (22,4)
    // frame params
    const int32_t *dq;       // (8,3,2)
    const uint8_t *qm[19 * 3];  // per (tx, plane) flattened table or null
    const uint8_t *seg_lossless;  // (8,)
    const int32_t *seg_qidx;      // (8,)
    int32_t ss_hor, ss_ver, bitdepth, reduced_txtp_set;
    uint8_t *levels_buf;     // 36*36 scratch
};

extern "C" int coef_decode(CoefCtx *c, const uint8_t *a, const uint8_t *l,
                           int tx, int bs, int intra, int plane, int ytxtp,
                           int seg_id, int uv_mode, int y_mode, int y_angle,
                           int32_t *cf, int32_t *out_txtp, int32_t *out_eob);
