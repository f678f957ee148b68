// Native loop-filter mask builder.
//
// Scalar port of the validated golden model ops/lf_ref.py
// build_lf_masks/_decomp_tx (reference src/lf_mask.c:39-383
// dav1d_create_lf_mask_intra/inter + decomp_tx): walks the raw
// Stage-A block records of one tile and fills the dense per-4x4-edge
// filter-class and level grids the device deblocker consumes. Called
// once per tile in decode order; the grids persist across calls so
// cross-tile neighbor lookups see earlier tiles' leaves.
#include <cstdint>
#include <algorithm>

#include "blockrec.h"

namespace {

struct LfMaskCtx {
    int32_t w4, h4;          // frame 4x4 grid
    int32_t cw4, ch4;        // chroma 4x4 grid
    int32_t ss_hor, ss_ver;
    int32_t layout;
    int32_t lossless[8];     // per-segment lossless flags
};

struct TxInfo {
    int32_t w, h, lw, lh, sub;
};

struct Grids {
    uint8_t *lvl;            // (h4, w4, 4)
    int8_t *vcls_y, *hcls_y; // (h4, w4)
    int8_t *vcls_uv, *hcls_uv;  // (ch4, cw4)
    uint8_t *txw, *txh;      // (h4, w4) leaf tx classes
    uint8_t *ctxw, *ctxh;    // (ch4, cw4)
};

const int TX_4X4 = 0;

// dense leaf decomposition (lf_ref.py:179-206, reference
// lf_mask.c:39-77). txw/txh/stepw/steph are (fh4, fw4) block scratch.
static void decomp_tx(uint8_t *txw, uint8_t *txh, int32_t *stepw,
                      int32_t *steph, int fw4, int from_tx, int depth,
                      int y_off, int x_off, const int32_t tx_masks[2],
                      int y0, int x0, const TxInfo *ti) {
    const TxInfo &t = ti[from_tx];
    const int is_split =
        (from_tx == TX_4X4 || depth > 1)
            ? 0 : (tx_masks[depth] >> (y_off * 4 + x_off)) & 1;
    if (is_split) {
        const int sub = t.sub;
        const int htw4 = t.w >> 1, hth4 = t.h >> 1;
        decomp_tx(txw, txh, stepw, steph, fw4, sub, depth + 1,
                  y_off * 2, x_off * 2, tx_masks, y0, x0, ti);
        if (t.w >= t.h)
            decomp_tx(txw, txh, stepw, steph, fw4, sub, depth + 1,
                      y_off * 2, x_off * 2 + 1, tx_masks, y0, x0 + htw4,
                      ti);
        if (t.h >= t.w) {
            decomp_tx(txw, txh, stepw, steph, fw4, sub, depth + 1,
                      y_off * 2 + 1, x_off * 2, tx_masks, y0 + hth4, x0,
                      ti);
            if (t.w >= t.h)
                decomp_tx(txw, txh, stepw, steph, fw4, sub, depth + 1,
                          y_off * 2 + 1, x_off * 2 + 1, tx_masks,
                          y0 + hth4, x0 + htw4, ti);
        }
    } else {
        const int lw = std::min(2, t.lw), lh = std::min(2, t.lh);
        for (int y = y0; y < y0 + t.h; y++)
            for (int x = x0; x < x0 + t.w; x++) {
                txw[y * fw4 + x] = (uint8_t)lw;
                txh[y * fw4 + x] = (uint8_t)lh;
            }
        for (int y = y0; y < y0 + t.h; y++) stepw[y * fw4 + x0] = t.w;
        for (int x = x0; x < x0 + t.w; x++) steph[y0 * fw4 + x] = t.h;
    }
}

}  // namespace

extern "C" void build_lf_masks_tile(
    const LfMaskCtx *c, const TxInfo *ti, const int32_t *bdims,
    const int32_t *blocks, int64_t n_blocks, Grids *g) {
    const int iw = c->w4, ih = c->h4;
    const int ss_hor = c->ss_hor, ss_ver = c->ss_ver;
    const int cw4g = c->cw4;

    // per-block scratch (max block 32x32 b4)
    uint8_t txw[32 * 32], txh[32 * 32];
    int32_t stepw[32 * 32], steph[32 * 32];

    for (int64_t bi = 0; bi < n_blocks; bi++) {
        const int32_t *b = blocks + bi * BF_N_FIELDS;
        if (!b[BF_LF_HAS]) continue;
        const int bs = b[BF_BS];
        const int fw4 = bdims[bs * 4], fh4 = bdims[bs * 4 + 1];
        const int bx = b[BF_BX], by = b[BF_BY];
        const int bw4 = std::min(iw - bx, fw4);
        const int bh4 = std::min(ih - by, fh4);

        if (bw4 > 0 && bh4 > 0) {
            for (int y = by; y < by + bh4; y++)
                for (int x = bx; x < bx + bw4; x++) {
                    g->lvl[(y * (int64_t)iw + x) * 4 + 0] =
                        (uint8_t)b[BF_LF0];
                    g->lvl[(y * (int64_t)iw + x) * 4 + 1] =
                        (uint8_t)b[BF_LF1];
                }

            if (b[BF_INTRA]) {
                const TxInfo &t = ti[b[BF_TX]];
                const int twl4c = std::min(2, t.lw);
                const int thl4c = std::min(2, t.lh);
                // left/top block edges
                for (int y = 0; y < bh4; y++) {
                    const int l = bx > 0
                        ? g->txw[(by + y) * (int64_t)iw + bx - 1] : twl4c;
                    g->vcls_y[(by + y) * (int64_t)iw + bx] =
                        (int8_t)std::min(twl4c, l);
                }
                for (int x = 0; x < bw4; x++) {
                    const int tcls = by > 0
                        ? g->txh[(by - 1) * (int64_t)iw + bx + x] : thl4c;
                    g->hcls_y[by * (int64_t)iw + bx + x] =
                        (int8_t)std::min(thl4c, tcls);
                }
                // inner tx edges
                for (int x = t.w; x < bw4; x += t.w)
                    for (int y = 0; y < bh4; y++)
                        g->vcls_y[(by + y) * (int64_t)iw + bx + x] =
                            (int8_t)twl4c;
                for (int y = t.h; y < bh4; y += t.h)
                    for (int x = 0; x < bw4; x++)
                        g->hcls_y[(by + y) * (int64_t)iw + bx + x] =
                            (int8_t)thl4c;
                for (int y = 0; y < bh4; y++)
                    for (int x = 0; x < bw4; x++) {
                        g->txw[(by + y) * (int64_t)iw + bx + x] =
                            (uint8_t)twl4c;
                        g->txh[(by + y) * (int64_t)iw + bx + x] =
                            (uint8_t)thl4c;
                    }
            } else {
                const int maxtx =
                    c->lossless[b[BF_SEG_ID]] ? TX_4X4 : b[BF_MAX_YTX];
                const TxInfo &t = ti[maxtx];
                const int32_t tx_masks[2] = {b[BF_TX_SPLIT0],
                                             b[BF_TX_SPLIT1]};
                std::fill(txw, txw + fh4 * fw4, 0);
                std::fill(txh, txh + fh4 * fw4, 0);
                std::fill(stepw, stepw + fh4 * fw4, 0);
                std::fill(steph, steph + fh4 * fw4, 0);
                int y_off = 0;
                for (int y = 0; y < bh4; y += t.h, y_off++) {
                    int x_off = 0;
                    for (int x = 0; x < bw4; x += t.w, x_off++)
                        decomp_tx(txw, txh, stepw, steph, fw4, maxtx, 0,
                                  y_off, x_off, tx_masks, y, x, ti);
                }
                // left/top block edges
                for (int y = 0; y < bh4; y++) {
                    const int own = txw[y * fw4];
                    const int l = bx > 0
                        ? g->txw[(by + y) * (int64_t)iw + bx - 1] : own;
                    g->vcls_y[(by + y) * (int64_t)iw + bx] =
                        (int8_t)std::min(own, l);
                }
                for (int x = 0; x < bw4; x++) {
                    const int own = txh[x];
                    const int tcls = by > 0
                        ? g->txh[(by - 1) * (int64_t)iw + bx + x] : own;
                    g->hcls_y[by * (int64_t)iw + bx + x] =
                        (int8_t)std::min(own, tcls);
                }
                if (!b[BF_SKIP]) {
                    for (int y = 0; y < bh4; y++) {
                        int ltx = txw[y * fw4];
                        int step = stepw[y * fw4];
                        for (int x = step; x < bw4 && step; x += step) {
                            const int rtx = txw[y * fw4 + x];
                            g->vcls_y[(by + y) * (int64_t)iw + bx + x] =
                                (int8_t)std::min(rtx, ltx);
                            ltx = rtx;
                            step = stepw[y * fw4 + x];
                        }
                    }
                    for (int x = 0; x < bw4; x++) {
                        int ttx = txh[x];
                        int step = steph[x];
                        for (int y = step; y < bh4 && step; y += step) {
                            const int btx = txh[y * fw4 + x];
                            g->hcls_y[(by + y) * (int64_t)iw + bx + x] =
                                (int8_t)std::min(ttx, btx);
                            ttx = btx;
                            step = steph[y * fw4 + x];
                        }
                    }
                }
                for (int y = 0; y < bh4; y++)
                    for (int x = 0; x < bw4; x++) {
                        g->txw[(by + y) * (int64_t)iw + bx + x] =
                            txw[y * fw4 + x];
                        g->txh[(by + y) * (int64_t)iw + bx + x] =
                            txh[y * fw4 + x];
                    }
            }
        }

        // chroma
        if (!b[BF_HAS_CHROMA] || c->layout == 0) continue;
        const int cbw4 =
            std::min(((iw + ss_hor) >> ss_hor) - (bx >> ss_hor),
                     (fw4 + ss_hor) >> ss_hor);
        const int cbh4 =
            std::min(((ih + ss_ver) >> ss_ver) - (by >> ss_ver),
                     (fh4 + ss_ver) >> ss_ver);
        if (cbw4 <= 0 || cbh4 <= 0) continue;
        const int cbx = bx >> ss_hor, cby = by >> ss_ver;
        for (int y = cby; y < cby + cbh4; y++)
            for (int x = cbx; x < cbx + cbw4; x++) {
                g->lvl[(y * (int64_t)iw + x) * 4 + 2] = (uint8_t)b[BF_LF2];
                g->lvl[(y * (int64_t)iw + x) * 4 + 3] = (uint8_t)b[BF_LF3];
            }
        const int uvtx = (c->lossless[b[BF_SEG_ID]] && !b[BF_INTRA])
            ? TX_4X4 : b[BF_UVTX];
        const TxInfo &ut = ti[uvtx];
        const int twl4c = ut.lw != 0;
        const int thl4c = ut.lh != 0;
        for (int y = 0; y < cbh4; y++) {
            const int l = cbx > 0
                ? g->ctxw[(cby + y) * (int64_t)cw4g + cbx - 1] : twl4c;
            g->vcls_uv[(cby + y) * (int64_t)cw4g + cbx] =
                (int8_t)std::min(twl4c, l);
        }
        for (int x = 0; x < cbw4; x++) {
            const int tcls = cby > 0
                ? g->ctxh[(cby - 1) * (int64_t)cw4g + cbx + x] : thl4c;
            g->hcls_uv[cby * (int64_t)cw4g + cbx + x] =
                (int8_t)std::min(thl4c, tcls);
        }
        const int skip_inter = !b[BF_INTRA] && b[BF_SKIP];
        if (!skip_inter) {
            for (int x = ut.w; x < cbw4; x += ut.w)
                for (int y = 0; y < cbh4; y++)
                    g->vcls_uv[(cby + y) * (int64_t)cw4g + cbx + x] =
                        (int8_t)twl4c;
            for (int y = ut.h; y < cbh4; y += ut.h)
                for (int x = 0; x < cbw4; x++)
                    g->hcls_uv[(cby + y) * (int64_t)cw4g + cbx + x] =
                        (int8_t)thl4c;
        }
        for (int y = 0; y < cbh4; y++)
            for (int x = 0; x < cbw4; x++) {
                g->ctxw[(cby + y) * (int64_t)cw4g + cbx + x] =
                    (uint8_t)twl4c;
                g->ctxh[(cby + y) * (int64_t)cw4g + cbx + x] =
                    (uint8_t)thl4c;
            }
    }
}
