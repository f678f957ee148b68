// Stage-A native core: msac arithmetic decoder + coefficient block
// decoding, the hottest serial loops of the decoder.
//
// Semantics mirror the validated Python reference implementation
// (dav1d_tpu/entropy/msac.py, decode.py _decode_coefs), which is itself
// behavior-parity with the reference decoder (reference src/msac.c:41-213,
// src/recon_tmpl.c:321-737). Exposed via a C ABI for ctypes.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include "msac.h"
#include "stagea.h"

extern "C" {

// ---------------------------------------------------------------------------
// coefficient decoding context
// ---------------------------------------------------------------------------

enum { TX_CLASS_2D = 0, TX_CLASS_H = 1, TX_CLASS_V = 2 };
enum { TX_4X4 = 0, TX_16X16 = 2, TX_32X32 = 3, TX_64X64 = 4, RTX_4X8 = 5 };
enum { DCT_DCT = 0, IDTX = 9, WHT_WHT = 16, FILTER_PRED = 13 };


static int get_skip_ctx(const CoefCtx *c, const uint8_t *a, const uint8_t *l,
                        int lw, int lh, int bs, int chroma) {
    const int32_t *bd = c->block_dimensions + bs * 4;
    if (chroma) {
        const int not_one_blk =
            bd[2] - (bd[2] && c->ss_hor) > lw || bd[3] - (bd[3] && c->ss_ver) > lh;
        int ca = 0, cl = 0;
        for (int i = 0; i < (1 << lw); i++) ca |= a[i] != 0x40;
        for (int i = 0; i < (1 << lh); i++) cl |= l[i] != 0x40;
        return 7 + not_one_blk * 3 + ca + cl;
    }
    if (bd[2] == lw && bd[3] == lh) return 0;
    int la = 0, ll = 0;
    int na = (1 << lw) < 16 ? (1 << lw) : 16;
    int nl = (1 << lh) < 16 ? (1 << lh) : 16;
    for (int i = 0; i < na; i++) la |= a[i];
    for (int i = 0; i < nl; i++) ll |= l[i];
    la &= 0x3F; if (la > 4) la = 4;
    ll &= 0x3F; if (ll > 4) ll = 4;
    return c->skip_ctx_tbl[la * 5 + ll];
}

static int get_dc_sign_ctx(const uint8_t *a, const uint8_t *l, int w4,
                           int h4) {
    if (w4 > 16) w4 = 16;
    if (h4 > 16) h4 = 16;
    int s = -w4 - h4;
    for (int i = 0; i < w4; i++) s += a[i] >> 6;
    for (int i = 0; i < h4; i++) s += l[i] >> 6;
    return (s != 0) + (s > 0);
}

static inline int get_lo_ctx(const uint8_t *lv, int tx_class,
                             const uint8_t *offsets, int x, int y,
                             int stride, int pos, int *hi_mag) {
    int mag = lv[pos + 1] + lv[pos + stride];
    int offset;
    if (tx_class == TX_CLASS_2D) {
        mag += lv[pos + stride + 1];
        *hi_mag = mag;
        mag += lv[pos + 2] + lv[pos + 2 * stride];
        int yy = y < 4 ? y : 4, xx = x < 4 ? x : 4;
        offset = offsets[yy * 5 + xx];
    } else {
        mag += lv[pos + 2];
        *hi_mag = mag;
        mag += lv[pos + 3] + lv[pos + 4];
        offset = 26 + (y > 1 ? 10 : y * 5);
    }
    return offset + (mag > 512 ? 4 : (mag + 64) >> 7);
}

// Returns cf_ctx (0..255); writes *out_txtp, *out_eob, cf.
// eob == -1 => all-skip (cf untouched).
int coef_decode(CoefCtx *c, const uint8_t *a, const uint8_t *l, int tx,
                int bs, int intra, int plane, int ytxtp, int seg_id,
                int uv_mode, int y_mode, int y_angle, int32_t *cf,
                int32_t *out_txtp, int32_t *out_eob) {
    Msac *s = &c->msac;
    const int chroma = plane ? 1 : 0;
    const int lossless = c->seg_lossless[seg_id];
    const uint8_t *td = c->txfm_dim + tx * 8;
    const int tw = td[0], th = td[1], tlw = td[2], tlh = td[3];
    const int tmin = td[4], tmax = td[5], tctx = td[7];

    const int sctx = get_skip_ctx(c, a, l, tlw, tlh, bs, chroma);
    const int all_skip = msac_bool_adapt(s, c->skip + (tctx * 13 + sctx) * 2);
    if (all_skip) {
        *out_txtp = lossless ? WHT_WHT : DCT_DCT;
        *out_eob = -1;
        return 0x40;
    }

    int txtp;
    if (lossless) {
        txtp = WHT_WHT;
    } else if (tmax + intra >= TX_64X64) {
        txtp = DCT_DCT;
    } else if (chroma) {
        if (intra) {
            txtp = c->txtp_from_uvmode[uv_mode];
        } else {
            // get_uv_inter_txtp (reference recon_tmpl.c / env.py)
            if (tmax == TX_32X32)
                txtp = ytxtp == IDTX ? IDTX : DCT_DCT;
            else if (tmin == TX_16X16 && ytxtp >= 12 && ytxtp <= 15)
                // V_ADST/H_ADST/V_FLIPADST/H_FLIPADST (levels.py 12-15)
                txtp = DCT_DCT;
            else
                txtp = ytxtp;
        }
    } else if (!c->seg_qidx[seg_id]) {
        txtp = DCT_DCT;
    } else if (intra) {
        const int ymn = y_mode == FILTER_PRED ? c->filter_mode_to_y_mode[y_angle]
                                              : y_mode;
        if (c->reduced_txtp_set || tmin == TX_16X16) {
            const int idx = msac_symbol_adapt(
                s, c->txtp_intra2 + (tmin * 13 + ymn) * 8, 4);
            txtp = c->tx_types_per_set[idx + 0];
        } else {
            const int idx = msac_symbol_adapt(
                s, c->txtp_intra1 + (tmin * 13 + ymn) * 8, 6);
            txtp = c->tx_types_per_set[idx + 5];
        }
    } else {
        if (c->reduced_txtp_set || tmax == TX_32X32) {
            const int idx = msac_bool_adapt(s, c->txtp_inter3 + tmin * 2);
            txtp = idx ? DCT_DCT : IDTX;
        } else if (tmin == TX_16X16) {
            const int idx = msac_symbol_adapt(s, c->txtp_inter2, 11);
            txtp = c->tx_types_per_set[idx + 12];
        } else {
            const int idx = msac_symbol_adapt(s, c->txtp_inter1 + tmin * 16,
                                              15);
            txtp = c->tx_types_per_set[idx + 24];
        }
    }

    const int slw = tlw < TX_32X32 ? tlw : TX_32X32;
    const int slh = tlh < TX_32X32 ? tlh : TX_32X32;
    const int tx2dszctx = slw + slh;
    const int tx_class = c->tx_type_class[txtp];
    const int is_1d = tx_class != TX_CLASS_2D;

    uint16_t *eob_bin_cdf;
    if (tx2dszctx < 5)
        eob_bin_cdf = c->eob_bin[tx2dszctx] +
                      (chroma * 2 + is_1d) * c->eob_bin_stride[tx2dszctx];
    else
        eob_bin_cdf = c->eob_bin[tx2dszctx] +
                      chroma * c->eob_bin_stride[tx2dszctx];
    int eob = msac_symbol_adapt(s, eob_bin_cdf, 4 + tx2dszctx);
    if (eob > 1) {
        const int eob_bin = eob - 2;
        const int hi = msac_bool_adapt(
            s, c->eob_hi_bit + ((tctx * 2 + chroma) * 9 + eob_bin) * 2);
        eob = ((hi | 2) << eob_bin) | msac_bools(s, eob_bin);
    }

    uint16_t *eob_cdf = c->eob_base_tok + (tctx * 2 + chroma) * 4 * 4;
    const int brctx = tctx < 3 ? tctx : 3;
    uint16_t *hi_cdf = c->br_tok + (brctx * 2 + chroma) * 21 * 4;

    const int sw = (tw < 8 ? tw : 8) * 4;
    const int sh = (th < 8 ? th : 8) * 4;
    memset(cf, 0, sizeof(int32_t) * sw * sh);
    int32_t toks[32 * 32];
    int nz_rcs[32 * 32];
    int n_nz = 0;
    int dc_tok;

    if (eob) {
        uint16_t *lo_cdf = c->base_tok + (tctx * 2 + chroma) * 41 * 4;
        uint8_t *levels = c->levels_buf;

        int ctx = 1 + (eob > (2 << tx2dszctx)) + (eob > (4 << tx2dszctx));
        int eob_tok = msac_symbol_adapt(s, eob_cdf + ctx * 4, 2);
        int tok = eob_tok + 1;
        int level_tok = tok * 0x41;

        const uint8_t *ctx_offsets = nullptr;
        const uint16_t *scan = nullptr;
        int stride, shift, shift2 = 0, mask;
        if (tx_class == TX_CLASS_2D) {
            const int nonsquare_tx = tx >= RTX_4X8;
            ctx_offsets = c->lo_ctx_offsets +
                          (nonsquare_tx + (tx & nonsquare_tx)) * 25;
            scan = c->scans[tx];
            stride = 4 << slh;
            shift = slh + 2;
            mask = (4 << slh) - 1;
            memset(levels, 0, stride * ((4 << slw) + 2));
        } else if (tx_class == TX_CLASS_H) {
            stride = 16;
            shift = slh + 2;
            mask = (4 << slh) - 1;
            memset(levels, 0, stride * ((4 << slh) + 2));
        } else {
            stride = 16;
            shift = slw + 2;
            shift2 = slh + 2;
            mask = (4 << slw) - 1;
            memset(levels, 0, stride * ((4 << slw) + 2));
        }

#define RC_XY(i, rc_, x_, y_)                                         \
    do {                                                              \
        if (tx_class == TX_CLASS_2D) {                                \
            rc_ = scan[i];                                            \
            x_ = rc_ >> shift;                                        \
            y_ = rc_ & mask;                                          \
        } else if (tx_class == TX_CLASS_H) {                          \
            rc_ = i;                                                  \
            x_ = i & mask;                                            \
            y_ = i >> shift;                                          \
        } else {                                                      \
            x_ = i & mask;                                            \
            y_ = i >> shift;                                          \
            rc_ = (x_ << shift2) | y_;                                \
        }                                                             \
    } while (0)

        int rc, x, y;
        RC_XY(eob, rc, x, y);
        if (eob_tok == 2) {
            const int hctx = (tx_class == TX_CLASS_2D ? (x | y) > 1 : y != 0)
                                 ? 14 : 7;
            tok = msac_hi_tok(s, hi_cdf + hctx * 4);
            level_tok = tok + (3 << 6);
        }
        toks[rc] = tok;
        nz_rcs[n_nz++] = rc;
        int pos = tx_class == TX_CLASS_2D ? rc : x * stride + y;
        levels[pos] = level_tok & 0xFF;

        for (int i = eob - 1; i > 0; i--) {
            int rc_i;
            RC_XY(i, rc_i, x, y);
            pos = tx_class == TX_CLASS_2D ? rc_i : x * stride + y;
            int mag;
            ctx = get_lo_ctx(levels, tx_class, ctx_offsets, x, y, stride,
                             pos, &mag);
            if (tx_class == TX_CLASS_2D) y |= x;
            tok = msac_symbol_adapt(s, lo_cdf + ctx * 4, 3);
            if (tok == 3) {
                mag &= 63;
                const int hctx = ((y > (tx_class == TX_CLASS_2D)) ? 14 : 7) +
                                 (mag > 12 ? 6 : (mag + 1) >> 1);
                tok = msac_hi_tok(s, hi_cdf + hctx * 4);
                levels[pos] = (tok + (3 << 6)) & 0xFF;
                toks[rc_i] = tok;
                nz_rcs[n_nz++] = rc_i;
            } else {
                levels[pos] = tok * 0x41;
                if (tok) {
                    toks[rc_i] = tok;
                    nz_rcs[n_nz++] = rc_i;
                }
            }
        }

        // dc
        int mag;
        if (tx_class == TX_CLASS_2D) {
            ctx = 0;
            mag = 0;
        } else {
            ctx = get_lo_ctx(levels, tx_class, ctx_offsets, 0, 0, stride, 0,
                             &mag);
        }
        dc_tok = msac_symbol_adapt(s, lo_cdf + ctx * 4, 3);
        if (dc_tok == 3) {
            if (tx_class == TX_CLASS_2D)
                mag = levels[1] + levels[stride] + levels[stride + 1];
            mag &= 63;
            ctx = mag > 12 ? 6 : (mag + 1) >> 1;
            dc_tok = msac_hi_tok(s, hi_cdf + ctx * 4);
        }
        // reverse nz_rcs to ascending scan order
        for (int i = 0, j = n_nz - 1; i < j; i++, j--) {
            const int t = nz_rcs[i];
            nz_rcs[i] = nz_rcs[j];
            nz_rcs[j] = t;
        }
    } else {
        const int tok_br = msac_symbol_adapt(s, eob_cdf, 2);
        dc_tok = 1 + tok_br;
        if (tok_br == 2) dc_tok = msac_hi_tok(s, hi_cdf);
    }

    // residual / sign pass
    const int32_t *dq_tbl = c->dq + (seg_id * 3 + plane) * 2;
    const uint8_t *qm_tbl = txtp < IDTX ? c->qm[tx * 3 + plane] : nullptr;
    const int dq_shift = tctx > 2 ? tctx - 2 : 0;
    const int bd = c->bitdepth;
    const int cf_max = (1 << (7 + (bd == 8 ? 8 : bd))) - 1;

    int64_t cul_level = 0;
    int dc_sign_level;
    if (!dc_tok) {
        dc_sign_level = 1 << 6;
    } else {
        const int dsc = get_dc_sign_ctx(a, l, tw, th);
        const int dc_sign = msac_bool_adapt(
            s, c->dc_sign + (chroma * 3 + dsc) * 2);
        dc_sign_level = (dc_sign - 1) & (2 << 6);
        int64_t dc_dq = dq_tbl[0];
        if (qm_tbl) dc_dq = (dc_dq * qm_tbl[0] + 16) >> 5;
        if (dc_tok == 15) {
            dc_tok = (read_golomb(s) + 15) & 0xFFFFF;
            dc_dq = (dc_dq * dc_tok) & 0xFFFFFF;
        } else {
            dc_dq *= dc_tok;
        }
        cul_level = dc_tok;
        dc_dq >>= dq_shift;
        if (dc_dq > cf_max + dc_sign) dc_dq = cf_max + dc_sign;
        cf[0] = dc_sign ? -(int32_t)dc_dq : (int32_t)dc_dq;
    }

    const int64_t ac_dq = dq_tbl[1];
    for (int i = 0; i < n_nz; i++) {
        const int rc = nz_rcs[i];
        const int sign = msac_bool_equi(s);
        int64_t tok = toks[rc];
        int64_t dq = qm_tbl ? (ac_dq * qm_tbl[rc] + 16) >> 5 : ac_dq;
        if (tok == 15) {
            tok = (read_golomb(s) + 15) & 0xFFFFF;
            dq = (dq * tok) & 0xFFFFFF;
        } else {
            dq = dq * tok;
        }
        cul_level += tok;
        dq >>= dq_shift;
        if (dq > cf_max + sign) dq = cf_max + sign;
        cf[rc] = sign ? -(int32_t)dq : (int32_t)dq;
    }

    *out_txtp = txtp;
    *out_eob = eob;
    const int cl = cul_level < 63 ? (int)cul_level : 63;
    return cl | dc_sign_level;
}

}  // extern "C"
