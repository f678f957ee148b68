// Inter-frame job emitter: walks the dense Stage-A block records and
// emits the compact MC/residual job tables that the device batch
// driver (dav1d_tpu/recon/inter_device.py) uploads and executes.
//
// This is the round-3 replacement for the Python-object seam: the
// routing logic is a scalar port of the repo's own validated golden
// walk (dav1d_tpu/recon/inter_ref.py _recon_b_inter/_chroma_single/
// _compound/_obmc; reference semantics: dav1d src/recon_tmpl.c:
// 938-1168 mc/obmc/warp_affine, 1557-1985 dav1d_recon_b_inter) —
// block state never gets re-boxed into Python objects on the hot
// path, matching the reference's no-reboxing seam.
//
// Blocks the device kernels can't serve (intra, interintra, scaled
// SVC references, warp-in-compound, bilinear compound/OBMC) are
// emitted as *leftovers* in decode order together with the
// tl_4x4_filter state at their walk position; the Python driver
// replays only those through the golden path after the device passes
// land (their pixel regions are disjoint from every device-written
// region, so deferral preserves the sequential walk's semantics).
//
// Job layouts must match ops/mc_jobs.py and the collector comments in
// recon/inter_device.py:
//   PUT  (11): plane, h, w, py, px, ref, dy, dx, amx, amy, ft
//   WARP (12): plane, py, px, ref, dy, dx, mx, my, al, be, ga, de
//   OBMC (13): top, plane, ww, hh, lap_h, py, px, ref, dy, dx,
//              amx, amy, ft
//   COMP (25): plane, h, w, py, px, mode, jw, sign, mkind, mk0..mk3,
//              dy0, dx0, amx0, amy0, ft0, ref0,
//              dy1, dx1, amx1, amy1, ft1, ref1
//   RES  (7):  plane, tx, txtp, py, px, cf_local_off, tile_idx
//   LEFT (3):  global_block_idx, tl_4x4_filter, tile_idx

#include <cstdint>

#include "blockrec.h"

namespace {

enum {
    COMP_INTER_NONE = 0,
    COMP_INTER_WEIGHTED_AVG = 1,
    COMP_INTER_AVG = 2,
    COMP_INTER_SEG = 3,
    COMP_INTER_WEDGE = 4,
    MM_OBMC = 1,
    MM_WARP = 2,
    GLOBALMV = 2,              // single-ref inter mode
    GLOBALMV_GLOBALMV = 6,     // compound inter mode
    WM_TRANSLATION = 1,
    BS_4x4 = 21,
};

struct InterJobCtx {
    // frame geometry
    int32_t bw, bh;            // frame size in 4x4 units
    int32_t ss_hor, ss_ver, layout;
    // per-ref info
    int32_t svc_scaled[7];     // nonzero: scaled MC -> leftover
    int32_t gmv_warp_allowed[7];
    int32_t gmv[7][11];        // mat[6], alpha, beta, gamma, delta, type
    int32_t jnt_weights[7][7];
    // grids (full-frame)
    const uint8_t *b4_filter0, *b4_filter1;   // (bh, bw)
    const int32_t *r_mv;       // (h4a, w4a, 2, 2)  [y, x]
    const int32_t *r_ref;      // (h4a, w4a, 2)
    const int32_t *r_bs;       // (h4a, w4a)
    int32_t rf_w4a;
    // tables
    const int32_t *block_dimensions;   // (22, 4)
    const int32_t *filter_2d;          // (f2d_rows, f2d_cols)
    int32_t f2d_cols;
    const int32_t *filter2d_to_type;   // (10,)
    // outputs (caller-allocated; counts written back)
    int32_t *puts;  int64_t puts_cap,  n_puts;
    int32_t *warps; int64_t warps_cap, n_warps;
    int32_t *obmc;  int64_t obmc_cap,  n_obmc;
    int32_t *comp;  int64_t comp_cap,  n_comp;
    int32_t *res;   int64_t res_cap,   n_res;
    int32_t *left;  int64_t left_cap,  n_left;
};

struct TileDesc {
    const int32_t *blocks; int64_t n_blocks;
    const int32_t *coefs;  int64_t n_coefs;
    int32_t col_start, col_end, row_start, row_end;
    int32_t block_base, tile_idx;
};

// walk state
struct Walk {
    InterJobCtx *c;
    const TileDesc *t;
    int tl_filter;         // tl_4x4_filter
    int quad_saved;        // saved around BL_8X8 4-way splits
    bool overflow;         // a job table filled up (caller re-allocs)
};

struct Snap {
    int64_t puts, warps, obmc, comp, res;
};

static inline Snap snapshot(const InterJobCtx *c) {
    return {c->n_puts, c->n_warps, c->n_obmc, c->n_comp, c->n_res};
}

static inline void rollback(InterJobCtx *c, const Snap &s) {
    c->n_puts = s.puts; c->n_warps = s.warps; c->n_obmc = s.obmc;
    c->n_comp = s.comp; c->n_res = s.res;
}

static inline int rref(const InterJobCtx *c, int y, int x, int i) {
    return c->r_ref[((int64_t)y * c->rf_w4a + x) * 2 + i];
}
static inline int rbs(const InterJobCtx *c, int y, int x) {
    return c->r_bs[(int64_t)y * c->rf_w4a + x];
}
static inline const int32_t *rmv(const InterJobCtx *c, int y, int x,
                                 int i) {
    return c->r_mv + (((int64_t)y * c->rf_w4a + x) * 2 + i) * 2;
}
static inline int b4f2d(const InterJobCtx *c, int y, int x) {
    int64_t o = (int64_t)y * c->bw + x;
    return c->filter_2d[(int64_t)c->b4_filter1[o] * c->f2d_cols +
                        c->b4_filter0[o]];
}

struct McArgs {
    int w, h, dy, dx, amx, amy, ft, ref;
    bool ok;       // false: needs the host path (scaled ref)
};

// port of DeviceInterReconstructor._mc_args (inter_device.py) /
// the shared phase math of inter_ref.py _mc (recon_tmpl.c:938-1005)
static McArgs mc_args(const Walk *w, int bw4, int bh4, int bx, int by,
                      int pl, int mvy, int mvx, int refidx,
                      int filter2d) {
    const InterJobCtx *c = w->c;
    McArgs a;
    a.ok = !c->svc_scaled[refidx];
    int ss_ver = pl ? c->ss_ver : 0;
    int ss_hor = pl ? c->ss_hor : 0;
    int h_mul = 4 >> ss_hor, v_mul = 4 >> ss_ver;
    int mx = mvx & (15 >> (1 - ss_hor));
    int my = mvy & (15 >> (1 - ss_ver));
    a.dx = bx * h_mul + (mvx >> (3 + ss_hor));
    a.dy = by * v_mul + (mvy >> (3 + ss_ver));
    a.amx = mx << (1 - ss_hor);
    a.amy = my << (1 - ss_ver);
    a.ft = c->filter2d_to_type[filter2d];
    a.ref = refidx;
    a.w = bw4 * h_mul;
    a.h = bh4 * v_mul;
    return a;
}

static bool emit_put(Walk *w, int plane_idx, int py, int px,
                     const McArgs &a) {
    InterJobCtx *c = w->c;
    if (c->n_puts >= c->puts_cap) { w->overflow = true; return false; }
    int32_t *j = c->puts + c->n_puts * 11;
    j[0] = plane_idx; j[1] = a.h; j[2] = a.w; j[3] = py; j[4] = px;
    j[5] = a.ref; j[6] = a.dy; j[7] = a.dx; j[8] = a.amx; j[9] = a.amy;
    j[10] = a.ft;
    c->n_puts++;
    return true;
}

// port of DeviceInterReconstructor._enqueue_warp (the golden
// _warp_affine 8x8 tiling, recon_tmpl.c:1115-1168)
static bool emit_warp(Walk *w, int plane_idx, int py, int px,
                      const int32_t *b_dim, int pl, int refidx,
                      const int32_t *wmp, int cur_bx, int cur_by) {
    InterJobCtx *c = w->c;
    int ss_ver = pl ? c->ss_ver : 0;
    int ss_hor = pl ? c->ss_hor : 0;
    int h_mul = 4 >> ss_hor, v_mul = 4 >> ss_ver;
    const int32_t *mat = wmp;            // mat[0..5]
    int alpha = wmp[6], beta = wmp[7], gamma = wmp[8], delta = wmp[9];
    int bw_px = b_dim[0] * h_mul, bh_px = b_dim[1] * v_mul;
    for (int y = 0; y < bh_px; y += 8) {
        int64_t src_y = (int64_t)cur_by * 4 + ((y + 4) << ss_ver);
        int64_t mat3_y = (int64_t)mat[3] * src_y + mat[0];
        int64_t mat5_y = (int64_t)mat[5] * src_y + mat[1];
        for (int x = 0; x < bw_px; x += 8) {
            int64_t src_x = (int64_t)cur_bx * 4 + ((x + 4) << ss_hor);
            int64_t mvx = ((int64_t)mat[2] * src_x + mat3_y) >> ss_hor;
            int64_t mvy = ((int64_t)mat[4] * src_x + mat5_y) >> ss_ver;
            int dx = (int)(mvx >> 16) - 4;
            int mx = (int)(((mvx & 0xffff) - (int64_t)alpha * 4 -
                            (int64_t)beta * 7) & ~0x3f);
            int dy = (int)(mvy >> 16) - 4;
            int my = (int)(((mvy & 0xffff) - (int64_t)gamma * 4 -
                            (int64_t)delta * 4) & ~0x3f);
            if (c->n_warps >= c->warps_cap) {
                w->overflow = true;
                return false;
            }
            int32_t *j = c->warps + c->n_warps * 12;
            j[0] = plane_idx; j[1] = py + y; j[2] = px + x; j[3] = refidx;
            j[4] = dy; j[5] = dx; j[6] = mx; j[7] = my;
            j[8] = alpha; j[9] = beta; j[10] = gamma; j[11] = delta;
            c->n_warps++;
        }
    }
    return true;
}

// port of inter_ref.py _obmc + the collector's lap leaves
// (recon_tmpl.c:1052-1113 obmc())
static bool emit_obmc(Walk *w, int plane_idx, int dst_py, int dst_px,
                      const int32_t *b_dim, int pl, int w4, int h4,
                      int row_start, int col_start, int bx, int by) {
    InterJobCtx *c = w->c;
    int ss_ver = pl ? c->ss_ver : 0;
    int ss_hor = pl ? c->ss_hor : 0;
    int h_mul = 4 >> ss_hor, v_mul = 4 >> ss_ver;
    if (by > row_start &&
        (!pl || b_dim[0] * h_mul + b_dim[1] * v_mul >= 16)) {
        int max_i = b_dim[2] < 4 ? b_dim[2] : 4;
        for (int i = 0, x = 0; x < w4 && i < max_i; ) {
            int ar_ref = rref(c, by - 1, bx + x + 1, 0);
            int a_bs = rbs(c, by - 1, bx + x + 1);
            int bd0 = c->block_dimensions[a_bs * 4 + 0];
            int step4 = bd0 < 2 ? 2 : (bd0 > 16 ? 16 : bd0);
            if (ar_ref > 0) {
                int ow4 = step4 < b_dim[0] ? step4 : b_dim[0];
                int oh4 = (b_dim[1] < 16 ? b_dim[1] : 16) >> 1;
                const int32_t *mv = rmv(c, by - 1, bx + x + 1, 0);
                int f2d = b4f2d(c, by - 1, bx + x + 1);
                McArgs a = mc_args(w, ow4, (oh4 * 3 + 3) >> 2, bx + x,
                                   by, pl, mv[0], mv[1], ar_ref - 1,
                                   f2d);
                if (!a.ok || a.ft < 0) return false;
                if (c->n_obmc >= c->obmc_cap) {
                    w->overflow = true;
                    return false;
                }
                int32_t *j = c->obmc + c->n_obmc * 13;
                j[0] = 1; j[1] = plane_idx; j[2] = a.w;
                j[3] = v_mul * oh4; j[4] = a.h;
                j[5] = dst_py; j[6] = dst_px + x * h_mul;
                j[7] = a.ref; j[8] = a.dy; j[9] = a.dx;
                j[10] = a.amx; j[11] = a.amy; j[12] = a.ft;
                c->n_obmc++;
                i++;
            }
            x += step4;
        }
    }
    if (bx > col_start) {
        int max_i = b_dim[3] < 4 ? b_dim[3] : 4;
        for (int i = 0, y = 0; y < h4 && i < max_i; ) {
            int lr_ref = rref(c, by + y + 1, bx - 1, 0);
            int l_bs = rbs(c, by + y + 1, bx - 1);
            int bd1 = c->block_dimensions[l_bs * 4 + 1];
            int step4 = bd1 < 2 ? 2 : (bd1 > 16 ? 16 : bd1);
            if (lr_ref > 0) {
                int ow4 = (b_dim[0] < 16 ? b_dim[0] : 16) >> 1;
                int oh4 = step4 < b_dim[1] ? step4 : b_dim[1];
                const int32_t *mv = rmv(c, by + y + 1, bx - 1, 0);
                int f2d = b4f2d(c, by + y + 1, bx - 1);
                McArgs a = mc_args(w, ow4, oh4, bx, by + y, pl, mv[0],
                                   mv[1], lr_ref - 1, f2d);
                if (!a.ok || a.ft < 0) return false;
                if (c->n_obmc >= c->obmc_cap) {
                    w->overflow = true;
                    return false;
                }
                int32_t *j = c->obmc + c->n_obmc * 13;
                j[0] = 0; j[1] = plane_idx; j[2] = a.w;
                j[3] = a.h; j[4] = a.h;
                j[5] = dst_py + y * v_mul; j[6] = dst_px;
                j[7] = a.ref; j[8] = a.dy; j[9] = a.dx;
                j[10] = a.amx; j[11] = a.amy; j[12] = a.ft;
                c->n_obmc++;
                i++;
            }
            y += step4;
        }
    }
    return true;
}

// emit one compound job (port of the collector's _exec_compound)
static bool emit_comp(Walk *w, int plane_idx, int py, int px,
                      const McArgs &s0, const McArgs &s1, int comp_type,
                      int jw, int sign, int mkind, const int mk[4]) {
    InterJobCtx *c = w->c;
    if (!s0.ok || !s1.ok || s0.ft < 0 || s1.ft < 0) return false;
    if (c->n_comp >= c->comp_cap) { w->overflow = true; return false; }
    int32_t *j = c->comp + c->n_comp * 25;
    j[0] = plane_idx; j[1] = s0.h; j[2] = s0.w; j[3] = py; j[4] = px;
    j[5] = comp_type; j[6] = jw; j[7] = sign; j[8] = mkind;
    j[9] = mk[0]; j[10] = mk[1]; j[11] = mk[2]; j[12] = mk[3];
    j[13] = s0.dy; j[14] = s0.dx; j[15] = s0.amx; j[16] = s0.amy;
    j[17] = s0.ft; j[18] = s0.ref;
    j[19] = s1.dy; j[20] = s1.dx; j[21] = s1.amx; j[22] = s1.amy;
    j[23] = s1.ft; j[24] = s1.ref;
    c->n_comp++;
    return true;
}

// port of inter_ref.py _chroma_single (recon_tmpl.c:1662-1786
// sub-8x8 chroma handling + single-ref chroma)
static bool chroma_single(Walk *w, const int32_t *B,
                          const int32_t *b_dim, int bw4, int bh4,
                          int cbw4, int cbh4, int filter2d,
                          int row_start, int col_start) {
    InterJobCtx *c = w->c;
    int ss_ver = c->ss_ver, ss_hor = c->ss_hor;
    int bx = B[BF_BX], by = B[BF_BY];
    int uv_px = (bx >> ss_hor) * 4, uv_py = (by >> ss_ver) * 4;
    int mvy = B[BF_MV00], mvx = B[BF_MV01];
    int ref0 = B[BF_REF0];

    bool is_sub8x8 = (bw4 == ss_hor) || (bh4 == ss_ver);
    if (is_sub8x8) {
        if (bw4 == 1)
            is_sub8x8 &= rref(c, by, bx - 1, 0) > 0;
        if (bh4 == ss_ver)
            is_sub8x8 &= rref(c, by - 1, bx, 0) > 0;
        if (bw4 == 1 && bh4 == ss_ver)
            is_sub8x8 &= rref(c, by - 1, bx - 1, 0) > 0;
    }
    if (is_sub8x8) {
        int h_off = 0, v_off = 0;
        if (bw4 == 1 && bh4 == ss_ver) {
            const int32_t *mv = rmv(c, by - 1, bx - 1, 0);
            int refidx = rref(c, by - 1, bx - 1, 0) - 1;
            for (int pl = 0; pl < 2; pl++) {
                McArgs a = mc_args(w, bw4, bh4, bx - 1, by - 1, 1 + pl,
                                   mv[0], mv[1], refidx, w->tl_filter);
                if (!a.ok) return false;
                if (!emit_put(w, 1 + pl, uv_py, uv_px, a)) return false;
            }
            v_off = 2; h_off = 2;
        }
        if (bw4 == 1) {
            const int32_t *mv = rmv(c, by, bx - 1, 0);
            int refidx = rref(c, by, bx - 1, 0) - 1;
            int left_f2d = b4f2d(c, by, bx - 1);
            for (int pl = 0; pl < 2; pl++) {
                McArgs a = mc_args(w, bw4, bh4, bx - 1, by, 1 + pl,
                                   mv[0], mv[1], refidx, left_f2d);
                if (!a.ok) return false;
                if (!emit_put(w, 1 + pl, uv_py + v_off, uv_px, a))
                    return false;
            }
            h_off = 2;
        }
        if (bh4 == ss_ver) {
            const int32_t *mv = rmv(c, by - 1, bx, 0);
            int refidx = rref(c, by - 1, bx, 0) - 1;
            int top_f2d = b4f2d(c, by - 1, bx);
            for (int pl = 0; pl < 2; pl++) {
                McArgs a = mc_args(w, bw4, bh4, bx, by - 1, 1 + pl,
                                   mv[0], mv[1], refidx, top_f2d);
                if (!a.ok) return false;
                if (!emit_put(w, 1 + pl, uv_py, uv_px + h_off, a))
                    return false;
            }
            v_off = 2;
        }
        for (int pl = 0; pl < 2; pl++) {
            McArgs a = mc_args(w, bw4, bh4, bx, by, 1 + pl, mvy, mvx,
                               ref0, filter2d);
            if (!a.ok) return false;
            if (!emit_put(w, 1 + pl, uv_py + v_off, uv_px + h_off, a))
                return false;
        }
        return true;
    }

    int w4 = bw4 < c->bw - bx ? bw4 : c->bw - bx;
    int h4 = bh4 < c->bh - by ? bh4 : c->bh - by;
    int cmin = cbw4 < cbh4 ? cbw4 : cbh4;
    bool warp = cmin > 1 &&
        ((B[BF_INTER_MODE] == GLOBALMV && c->gmv_warp_allowed[ref0]) ||
         (B[BF_MOTION_MODE] == MM_WARP && B[BF_WARP_VALID] &&
          B[BF_WARP_TYPE] > WM_TRANSLATION));
    if (warp) {
        int32_t wmp[11];
        if (B[BF_MOTION_MODE] == MM_WARP) {
            wmp[0] = B[BF_WMAT0]; wmp[1] = B[BF_WMAT1];
            wmp[2] = B[BF_WMAT2]; wmp[3] = B[BF_WMAT3];
            wmp[4] = B[BF_WMAT4]; wmp[5] = B[BF_WMAT5];
            wmp[6] = B[BF_ALPHA]; wmp[7] = B[BF_BETA];
            wmp[8] = B[BF_GAMMA]; wmp[9] = B[BF_DELTA];
        } else {
            for (int k = 0; k < 10; k++) wmp[k] = c->gmv[ref0][k];
        }
        for (int pl = 0; pl < 2; pl++)
            if (!emit_warp(w, 1 + pl, uv_py, uv_px, b_dim, 1 + pl,
                           ref0, wmp, bx, by))
                return false;
    } else {
        int mbw4 = bw4 << (bw4 == ss_hor ? 1 : 0);
        int mbh4 = bh4 << (bh4 == ss_ver ? 1 : 0);
        int mbx = bx & ~ss_hor, mby = by & ~ss_ver;
        for (int pl = 0; pl < 2; pl++) {
            McArgs a = mc_args(w, mbw4, mbh4, mbx, mby, 1 + pl, mvy,
                               mvx, ref0, filter2d);
            if (!a.ok) return false;
            if (!emit_put(w, 1 + pl, uv_py, uv_px, a)) return false;
            if (B[BF_MOTION_MODE] == MM_OBMC) {
                if (!emit_obmc(w, 1 + pl, uv_py, uv_px, b_dim, 1 + pl,
                               w4, h4, row_start, col_start, bx, by))
                    return false;
            }
        }
    }
    // interintra never reaches here (routed to leftovers upfront)
    return true;
}

// port of the collector's _compound (inter_ref.py _compound;
// recon_tmpl.c:1598-1660)
static bool compound(Walk *w, const int32_t *B, int bw4, int bh4,
                     int cbw4, int cbh4, bool has_chroma) {
    InterJobCtx *c = w->c;
    int ss_ver = c->ss_ver, ss_hor = c->ss_hor;
    int bx = B[BF_BX], by = B[BF_BY];
    int px = bx * 4, py = by * 4;
    int filter2d = B[BF_FILTER2D];
    int refs[2] = {B[BF_REF0], B[BF_REF1]};
    int mvs[2][2] = {{B[BF_MV00], B[BF_MV01]},
                     {B[BF_MV10], B[BF_MV11]}};
    int comp_type = B[BF_COMP_TYPE];
    int chr_layout_idx = c->layout == 0 ? 0 : 3 - c->layout;

    // warp-in-compound -> host path
    for (int i = 0; i < 2; i++)
        if (B[BF_INTER_MODE] == GLOBALMV_GLOBALMV &&
            c->gmv_warp_allowed[refs[i]])
            return false;
    McArgs s0 = mc_args(w, bw4, bh4, bx, by, 0, mvs[0][0], mvs[0][1],
                        refs[0], filter2d);
    McArgs s1 = mc_args(w, bw4, bh4, bx, by, 0, mvs[1][0], mvs[1][1],
                        refs[1], filter2d);
    int jw = c->jnt_weights[refs[0]][refs[1]];
    int sign = B[BF_MASK_SIGN];
    int mkind = 0, mk[4] = {0, 0, 0, 0};
    if (comp_type == COMP_INTER_WEDGE) {
        mkind = 1;
        mk[0] = 0; mk[1] = B[BF_BS]; mk[2] = 0; mk[3] = B[BF_WEDGE_IDX];
    }
    if (!emit_comp(w, 0, py, px, s0, s1, comp_type, jw, sign, mkind,
                   mk))
        return false;

    if (!has_chroma) return true;
    int uv_px = (bx >> ss_hor) * 4, uv_py = (by >> ss_ver) * 4;
    int uv_comp = (comp_type == COMP_INTER_AVG ||
                   comp_type == COMP_INTER_WEIGHTED_AVG)
        ? comp_type : COMP_INTER_WEDGE;
    int uv_mkind = 0, uv_mk[4] = {0, 0, 0, 0};
    if (comp_type == COMP_INTER_SEG) {
        uv_mkind = 2;           // gather from the device seg plane
    } else if (comp_type == COMP_INTER_WEDGE) {
        uv_mkind = 1;
        uv_mk[0] = chr_layout_idx; uv_mk[1] = B[BF_BS];
        uv_mk[2] = sign; uv_mk[3] = B[BF_WEDGE_IDX];
    }
    int cmin = cbw4 < cbh4 ? cbw4 : cbh4;
    for (int pl = 0; pl < 2; pl++) {
        for (int i = 0; i < 2; i++)
            if (B[BF_INTER_MODE] == GLOBALMV_GLOBALMV && cmin > 1 &&
                c->gmv_warp_allowed[refs[i]])
                return false;   // chroma warp desc -> host path
        McArgs t0 = mc_args(w, bw4, bh4, bx, by, 1 + pl, mvs[0][0],
                            mvs[0][1], refs[0], filter2d);
        McArgs t1 = mc_args(w, bw4, bh4, bx, by, 1 + pl, mvs[1][0],
                            mvs[1][1], refs[1], filter2d);
        if (!emit_comp(w, 1 + pl, uv_py, uv_px, t0, t1, uv_comp, jw,
                       sign, uv_mkind, uv_mk))
            return false;
    }
    return true;
}

// residual jobs from the tile's coef records (the collector's
// _add_residuals; fused itx+add+scatter on device)
static bool emit_res(Walk *w, const int32_t *B) {
    InterJobCtx *c = w->c;
    const TileDesc *t = w->t;
    for (int64_t i = B[BF_COEF_START]; i < B[BF_COEF_END]; i++) {
        const int32_t *cf = t->coefs + i * CF_N_FIELDS;
        if (cf[CF_EOB] < 0) continue;
        if (c->n_res >= c->res_cap) { w->overflow = true; return false; }
        int32_t *j = c->res + c->n_res * 7;
        j[0] = cf[CF_PLANE]; j[1] = cf[CF_TX]; j[2] = cf[CF_TXTP];
        j[3] = cf[CF_Y4] * 4; j[4] = cf[CF_X4] * 4;
        j[5] = cf[CF_OFF]; j[6] = t->tile_idx;
        c->n_res++;
    }
    return true;
}

// port of _recon_b_inter's collecting branches; returns false when the
// block needs the golden host path (caller rolls back + leftovers it)
static bool collect_block(Walk *w, const int32_t *B, int row_start,
                          int col_start) {
    InterJobCtx *c = w->c;
    int bs = B[BF_BS];
    const int32_t *b_dim = c->block_dimensions + bs * 4;
    int bw4 = b_dim[0], bh4 = b_dim[1];
    int bx = B[BF_BX], by = B[BF_BY];
    int w4 = bw4 < c->bw - bx ? bw4 : c->bw - bx;
    int h4 = bh4 < c->bh - by ? bh4 : c->bh - by;
    int cbw4 = (bw4 + c->ss_hor) >> c->ss_hor;
    int cbh4 = (bh4 + c->ss_ver) >> c->ss_ver;
    bool has_chroma = B[BF_HAS_CHROMA] != 0;
    int px = bx * 4, py = by * 4;

    if (B[BF_COMP_TYPE] == COMP_INTER_NONE) {
        int filter2d = B[BF_FILTER2D];
        int ref0 = B[BF_REF0];
        int bmin = bw4 < bh4 ? bw4 : bh4;
        bool warp = bmin > 1 &&
            ((B[BF_INTER_MODE] == GLOBALMV &&
              c->gmv_warp_allowed[ref0]) ||
             (B[BF_MOTION_MODE] == MM_WARP && B[BF_WARP_VALID] &&
              B[BF_WARP_TYPE] > WM_TRANSLATION));
        if (warp) {
            if (c->svc_scaled[ref0]) return false;
            int32_t wmp[11];
            if (B[BF_MOTION_MODE] == MM_WARP) {
                wmp[0] = B[BF_WMAT0]; wmp[1] = B[BF_WMAT1];
                wmp[2] = B[BF_WMAT2]; wmp[3] = B[BF_WMAT3];
                wmp[4] = B[BF_WMAT4]; wmp[5] = B[BF_WMAT5];
                wmp[6] = B[BF_ALPHA]; wmp[7] = B[BF_BETA];
                wmp[8] = B[BF_GAMMA]; wmp[9] = B[BF_DELTA];
            } else {
                for (int k = 0; k < 10; k++) wmp[k] = c->gmv[ref0][k];
            }
            if (!emit_warp(w, 0, py, px, b_dim, 0, ref0, wmp, bx, by))
                return false;
        } else {
            McArgs a = mc_args(w, bw4, bh4, bx, by, 0, B[BF_MV00],
                               B[BF_MV01], ref0, filter2d);
            if (!a.ok) return false;
            if (!emit_put(w, 0, py, px, a)) return false;
            if (B[BF_MOTION_MODE] == MM_OBMC) {
                if (!emit_obmc(w, 0, py, px, b_dim, 0, w4, h4,
                               row_start, col_start, bx, by))
                    return false;
            }
        }
        if (has_chroma) {
            if (!chroma_single(w, B, b_dim, bw4, bh4, cbw4, cbh4,
                               filter2d, row_start, col_start))
                return false;
        }
        w->tl_filter = filter2d;
    } else {
        if (!compound(w, B, bw4, bh4, cbw4, cbh4, has_chroma))
            return false;
    }
    if (!B[BF_SKIP]) {
        if (!emit_res(w, B)) return false;
    }
    return true;
}

}  // namespace

extern "C" int emit_inter_jobs(InterJobCtx *c, const TileDesc *tiles,
                               int n_tiles) {
    c->n_puts = c->n_warps = c->n_obmc = c->n_comp = c->n_res = 0;
    c->n_left = 0;
    Walk w;
    w.c = c;
    w.tl_filter = 0;
    w.quad_saved = 0;
    w.overflow = false;
    bool quad_saved_set = false;
    for (int ti = 0; ti < n_tiles; ti++) {
        const TileDesc *t = &tiles[ti];
        w.t = t;
        for (int64_t i = 0; i < t->n_blocks; i++) {
            const int32_t *B = t->blocks + i * BF_N_FIELDS;
            int bs = B[BF_BS], bx = B[BF_BX], by = B[BF_BY];
            // _quad_tl_restore (intra_ref.py:87-96; decode.c:2191-2200)
            if (bs == BS_4x4 && (bx & 1) && (by & 1) && quad_saved_set)
                w.tl_filter = w.quad_saved;
            int tl_before = w.tl_filter;
            if (B[BF_INTRA] || B[BF_INTERINTRA_TYPE]) {
                if (B[BF_INTERINTRA_TYPE] &&
                    B[BF_COMP_TYPE] == COMP_INTER_NONE)
                    w.tl_filter = B[BF_FILTER2D];
                if (c->n_left >= c->left_cap) return 2;
                int32_t *L = c->left + c->n_left * 3;
                L[0] = t->block_base + (int32_t)i;
                L[1] = tl_before;
                L[2] = t->tile_idx;
                c->n_left++;
            } else {
                Snap s = snapshot(c);
                int tl_snap = w.tl_filter;
                if (!collect_block(&w, B, t->row_start, t->col_start)) {
                    if (w.overflow) return 2;   // caller re-allocs
                    rollback(c, s);
                    w.tl_filter = tl_snap;
                    if (c->n_left >= c->left_cap) return 2;
                    int32_t *L = c->left + c->n_left * 3;
                    L[0] = t->block_base + (int32_t)i;
                    L[1] = tl_before;
                    L[2] = t->tile_idx;
                    c->n_left++;
                }
            }
            // _quad_tl_save
            if (bs == BS_4x4 && !(bx & 1) && !(by & 1)) {
                w.quad_saved = w.tl_filter;
                quad_saved_set = true;
            }
        }
    }
    return 0;
}
