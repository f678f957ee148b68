// Native inverse-transform engine (host Stage-B path).
#ifndef DAV1D_TPU_ITXNAT_H
#define DAV1D_TPU_ITXNAT_H

#include <cstdint>

// Table bundle resolved on the Python side (normative AV1 constants,
// same arrays dav1d_tpu/tables.py serves to the golden model).
struct ItxTables {
    const int32_t *txfm_info;    // (19, 4): w4, h4, lw, lh
    const int32_t *tx_shift;     // (19,)
    const int32_t *tx1d_types;   // (16, 2): first/second 1-D type per txtp
    const uint8_t *lastcol;      // concatenated lastcol_from_eob tables
    const int32_t *lastcol_off;  // (19,) offsets into lastcol
};

// 1-D type enum (matches ops/itx_core.py)
enum { ITX_DCT = 0, ITX_ADST = 1, ITX_FLIPADST = 2, ITX_IDENTITY = 3 };

// Computes the residual the decoder adds to prediction: res[h*w]
// row-major, already including the final (v+8)>>4 (or the dc-only /
// WHT special forms). cf is the decoder's transposed rc layout.
extern "C" void itx_block_residual(const ItxTables *tb, const int32_t *cf,
                                   int32_t eob, int32_t tx, int32_t txtp,
                                   int32_t bd, int32_t *res);

// res += pixels, clip to bd, store back (bytes_pp 1 or 2).
extern "C" void itx_add_block(const ItxTables *tb, void *dst,
                              int64_t stride, int32_t bytes_pp,
                              const int32_t *cf, int32_t eob, int32_t tx,
                              int32_t txtp, int32_t bd);

// Batch driver over Stage-A coef records: for every record with
// eob >= 0 writes its (h*w) residual at res_pool[res_off[i]] and the
// offset; records with eob < 0 get res_off[i] = -1. Returns the number
// of residual int32s written (<= pool capacity computed by caller).
extern "C" int64_t itx_batch_residuals(const ItxTables *tb,
                                       const int32_t *coefs, int64_t n,
                                       const int32_t *cf_pool, int32_t bd,
                                       int32_t *res_pool, int64_t *res_off);

#endif  // DAV1D_TPU_ITXNAT_H
