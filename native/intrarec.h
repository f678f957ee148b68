// Native intra reconstruction engine (host Stage-B path).
//
// Scalar-exact port of the validated Python golden model
// (dav1d_tpu/ops/ipred_ref.py walk driver dav1d_tpu/recon/intra_ref.py;
// reference semantics: src/ipred_tmpl.c:58-782 predictors,
// src/ipred_prepare_tmpl.c:36-203 edge construction,
// src/recon_tmpl.c:1176-1556 recon_b_intra walk). Consumes the raw
// Stage-A record arrays (blockrec.h) directly — no Python-object walk.
#ifndef DAV1D_TPU_INTRAREC_H
#define DAV1D_TPU_INTRAREC_H

#include <cstdint>
#include "itxnat.h"

// Normative prediction tables resolved on the Python side
// (dav1d_tpu/tables.py; same arrays the golden model reads).
struct IpredTables {
    const uint8_t  *sm_weights;          // (128,)
    const uint16_t *dr_intra_derivative; // (44,)
    const int8_t   *filter_intra_taps;   // (5, 64) x86 interleaved layout
    const int32_t  *block_dimensions;    // (22, 4): bw4, bh4, lw, lh
};

// Per-frame geometry + one tile's bounds (4x4-block units).
struct IntraCtx {
    void    *planes[3];     // picture plane base pointers
    int64_t  stride[3];     // strides in PIXELS (may be negative)
    int32_t  bytes_pp;      // 1 or 2
    int32_t  bd;            // 8 / 10 / 12
    int32_t  bw, bh;        // frame size in 4x4 blocks (f.bw, f.bh)
    int32_t  ss_hor, ss_ver;
    int32_t  layout;        // 0=I400 1=I420 2=I422 3=I444
    int32_t  intra_edge_filter;  // seq_hdr flag
    int32_t  col_start, col_end, row_start, row_end;  // tile bounds
};

// Reconstruct intra blocks of one tile from the raw Stage-A records.
// sel == NULL: every record (keyframe walk). Otherwise sel is a list
// of n_sel record indices (leftover intra blocks inside inter frames,
// replayed in decode order). Coefficient positions are tile-relative
// (BF_COEF_START/END index into `coefs`). Returns 0 on success.
extern "C" int intra_recon_tile(
    const IntraCtx *c, const IpredTables *tb, const ItxTables *itb,
    const int32_t *blocks, int64_t n_blocks,
    const int32_t *coefs, const int32_t *cf_pool,
    const int32_t *pal_pool, const uint8_t *palidx_pool,
    const int64_t *sel, int64_t n_sel);

#endif  // DAV1D_TPU_INTRAREC_H
