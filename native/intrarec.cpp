// Native intra reconstruction engine — see intrarec.h.
//
// Every routine is a line-for-line scalar port of the *validated
// Python golden model* in this repository (ops/ipred_ref.py +
// recon/intra_ref.py), which in turn documents the reference
// semantics (src/ipred_tmpl.c, src/ipred_prepare_tmpl.c,
// src/recon_tmpl.c:1176-1556). Bit-exactness is enforced by the
// same md5-vs-reference e2e suite that validates the golden model.
#include <cstdint>
#include <cstring>
#include <algorithm>

#include "blockrec.h"
#include "intrarec.h"

namespace {

// DSP-level mode indices (ops/ipred_ref.py:26-29)
enum {
    DC_PRED = 0, VERT_PRED = 1, HOR_PRED = 2, LEFT_DC_PRED = 3,
    TOP_DC_PRED = 4, DC_128_PRED = 5, Z1_PRED = 6, Z2_PRED = 7,
    Z3_PRED = 8, SMOOTH_PRED = 9, SMOOTH_V_PRED = 10, SMOOTH_H_PRED = 11,
    PAETH_PRED = 12, FILTER_PRED = 13,
};
enum { CODED_VERT_LEFT_PRED = 8, CODED_CFL_PRED = 13 };

// edge_flags bits (entropy/intra_edge.py:12-17)
enum {
    EDGE_I444_TOP_HAS_RIGHT = 1 << 0,
    EDGE_I420_TOP_HAS_RIGHT = 1 << 2,
    EDGE_I444_LEFT_HAS_BOTTOM = 1 << 3,
    EDGE_I420_LEFT_HAS_BOTTOM = 1 << 5,
};

const int MODE_TO_ANGLE[8] = {90, 180, 45, 135, 113, 157, 203, 67};

// mode -> (left, top, topleft, topright, bottomleft)
const uint8_t EDGE_REQ[14][5] = {
    /*DC*/ {1, 1, 0, 0, 0}, /*V*/ {0, 1, 0, 0, 0}, /*H*/ {1, 0, 0, 0, 0},
    /*LDC*/ {1, 0, 0, 0, 0}, /*TDC*/ {0, 1, 0, 0, 0},
    /*128*/ {0, 0, 0, 0, 0}, /*Z1*/ {0, 1, 1, 1, 0},
    /*Z2*/ {1, 1, 1, 0, 0}, /*Z3*/ {1, 0, 1, 0, 1},
    /*SM*/ {1, 1, 0, 0, 0}, /*SMV*/ {1, 1, 0, 0, 0},
    /*SMH*/ {1, 1, 0, 0, 0}, /*PAETH*/ {1, 1, 1, 0, 0},
    /*FILT*/ {1, 1, 1, 0, 0},
};

const int32_t EDGE_KERNELS[3][5] = {
    {0, 4, 8, 4, 0}, {0, 5, 6, 5, 0}, {2, 4, 4, 4, 2}};

struct Edge {
    int32_t buf[2 * 160 + 1];
    static const int C = 160;
    int32_t &at(int i) { return buf[C + i]; }
    int32_t get(int i) const { return buf[C + i]; }
};

static inline int clipi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int ctz_pow2(int v) { return __builtin_ctz(v); }
static inline int blog2(int v) { return 31 - __builtin_clz(v); }

// ---- pixel plane access (templated on pixel type) -------------------
template <typename T>
struct Plane {
    T *base;
    int64_t stride;
    T *row(int64_t y) const { return base + y * stride; }
    int32_t get(int64_t y, int64_t x) const { return row(y)[x]; }
    void set(int64_t y, int64_t x, int32_t v) { row(y)[x] = (T)v; }
};

// ---- ipred_prepare (ops/ipred_ref.py:72-166) ------------------------
template <typename T>
static int prepare_intra_edges(int x, int have_left, int y, int have_top,
                               int w, int h, int edge_flags,
                               const Plane<T> &pl, int64_t px, int64_t py,
                               int mode, int *angle, int tw, int th,
                               int filter_edge, Edge &e, int bd) {
    if (VERT_PRED <= mode && mode <= CODED_VERT_LEFT_PRED) {
        *angle = MODE_TO_ANGLE[mode - VERT_PRED] + 3 * *angle;
        if (*angle <= 90)
            mode = (*angle < 90 && have_top) ? Z1_PRED : VERT_PRED;
        else if (*angle < 180)
            mode = Z2_PRED;
        else
            mode = (*angle > 180 && have_left) ? Z3_PRED : HOR_PRED;
    } else if (mode == DC_PRED) {
        mode = have_left ? (have_top ? DC_PRED : LEFT_DC_PRED)
                         : (have_top ? TOP_DC_PRED : DC_128_PRED);
    } else if (mode == PAETH_PRED) {
        mode = have_left ? (have_top ? PAETH_PRED : HOR_PRED)
                         : (have_top ? VERT_PRED : DC_128_PRED);
    }

    const uint8_t *req = EDGE_REQ[mode];
    const int needs_left = req[0], needs_top = req[1],
              needs_topleft = req[2], needs_topright = req[3],
              needs_bottomleft = req[4];

    const int have_dst_top =
        have_top && (needs_top || needs_topleft ||
                     (needs_left && !have_left));

    if (needs_left) {
        const int sz = th << 2;
        if (have_left) {
            const int px_have = std::min(sz, (h - y) << 2);
            for (int i = 0; i < px_have; i++)
                e.at(-1 - i) = pl.get(py + i, px - 1);
            if (px_have < sz) {
                const int32_t f = e.get(-px_have);
                for (int i = px_have; i < sz; i++) e.at(-1 - i) = f;
            }
        } else {
            const int32_t fill = have_dst_top ? pl.get(py - 1, px)
                                              : ((1 << bd) >> 1) + 1;
            for (int i = 0; i < sz; i++) e.at(-1 - i) = fill;
        }
        if (needs_bottomleft) {
            const int have_bl = (!have_left || y + th >= h)
                ? 0 : (edge_flags & EDGE_I444_LEFT_HAS_BOTTOM);
            if (have_bl) {
                const int px_have = std::min(sz, (h - y - th) << 2);
                for (int i = 0; i < px_have; i++)
                    e.at(-sz - 1 - i) = pl.get(py + sz + i, px - 1);
                if (px_have < sz) {
                    const int32_t f = e.get(-sz - px_have);
                    for (int i = px_have; i < sz; i++)
                        e.at(-sz - 1 - i) = f;
                }
            } else {
                const int32_t f = e.get(-sz);
                for (int i = 0; i < sz; i++) e.at(-sz - 1 - i) = f;
            }
        }
    }

    if (needs_top) {
        const int sz = tw << 2;
        if (have_top) {
            const int px_have = std::min(sz, (w - x) << 2);
            for (int i = 0; i < px_have; i++)
                e.at(1 + i) = pl.get(py - 1, px + i);
            if (px_have < sz) {
                const int32_t f = e.get(px_have);
                for (int i = px_have; i < sz; i++) e.at(1 + i) = f;
            }
        } else {
            const int32_t fill = have_left ? pl.get(py, px - 1)
                                           : ((1 << bd) >> 1) - 1;
            for (int i = 0; i < sz; i++) e.at(1 + i) = fill;
        }
        if (needs_topright) {
            const int have_tr = (!have_top || x + tw >= w)
                ? 0 : (edge_flags & EDGE_I444_TOP_HAS_RIGHT);
            if (have_tr) {
                const int px_have = std::min(sz, (w - x - tw) << 2);
                for (int i = 0; i < px_have; i++)
                    e.at(1 + sz + i) = pl.get(py - 1, px + sz + i);
                if (px_have < sz) {
                    const int32_t f = e.get(sz + px_have);
                    for (int i = px_have; i < sz; i++)
                        e.at(1 + sz + i) = f;
                }
            } else {
                const int32_t f = e.get(sz);
                for (int i = 0; i < sz; i++) e.at(1 + sz + i) = f;
            }
        }
    }

    if (needs_topleft) {
        if (have_left)
            e.at(0) = have_top ? pl.get(py - 1, px - 1)
                               : pl.get(py, px - 1);
        else
            e.at(0) = have_top ? pl.get(py - 1, px) : (1 << bd) >> 1;
        if (mode == Z2_PRED && tw + th >= 6 && filter_edge)
            e.at(0) = ((e.get(-1) + e.get(1)) * 5 + e.get(0) * 6 + 8) >> 4;
    }
    return mode;
}

// ---- DC family (ops/ipred_ref.py:177-212) ---------------------------
static int dc_gen_top(const Edge &e, int w) {
    int64_t s = 0;
    for (int i = 0; i < w; i++) s += e.get(1 + i);
    return (int)((s + (w >> 1)) >> blog2(w));
}
static int dc_gen_left(const Edge &e, int h) {
    int64_t s = 0;
    for (int i = 0; i < h; i++) s += e.get(-h + i);
    return (int)((s + (h >> 1)) >> blog2(h));
}
static int dc_gen(const Edge &e, int w, int h, int bd) {
    int64_t dc = (w + h) >> 1;
    for (int i = 0; i < w; i++) dc += e.get(1 + i);
    for (int i = 0; i < h; i++) dc += e.get(-h + i);
    dc >>= ctz_pow2(w + h);
    if (w != h) {
        if (bd == 8) {
            const int mult = (w > h * 2 || h > w * 2) ? 0x3334 : 0x5556;
            dc = (dc * mult) >> 16;
        } else {
            const int mult = (w > h * 2 || h > w * 2) ? 0x6667 : 0xAAAB;
            dc = (dc * mult) >> 17;
        }
    }
    return (int)dc;
}

// ---- predictors writing into out[h][w] (int32, row stride w) --------
static void splat(int32_t *out, int w, int h, int v) {
    for (int i = 0; i < w * h; i++) out[i] = v;
}

static void pred_v(int32_t *o, const Edge &e, int w, int h) {
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) o[y * w + x] = e.get(1 + x);
}
static void pred_h(int32_t *o, const Edge &e, int w, int h) {
    for (int y = 0; y < h; y++) {
        const int32_t v = e.get(-1 - y);
        for (int x = 0; x < w; x++) o[y * w + x] = v;
    }
}
static void pred_paeth(int32_t *o, const Edge &e, int w, int h) {
    const int tl = e.get(0);
    for (int y = 0; y < h; y++) {
        const int l = e.get(-1 - y);
        for (int x = 0; x < w; x++) {
            const int t = e.get(1 + x);
            const int base = l + t - tl;
            const int ld = std::abs(l - base), td = std::abs(t - base),
                      tld = std::abs(tl - base);
            o[y * w + x] = (ld <= td && ld <= tld) ? l
                           : (td <= tld) ? t : tl;
        }
    }
}
static void pred_smooth(int32_t *o, const Edge &e, int w, int h,
                        const uint8_t *smw) {
    const int right = e.get(w), bottom = e.get(-h);
    for (int y = 0; y < h; y++) {
        const int wv = smw[h + y], l = e.get(-1 - y);
        for (int x = 0; x < w; x++) {
            const int wh = smw[w + x], t = e.get(1 + x);
            o[y * w + x] = (wv * t + (256 - wv) * bottom + wh * l +
                            (256 - wh) * right + 256) >> 9;
        }
    }
}
static void pred_smooth_v(int32_t *o, const Edge &e, int w, int h,
                          const uint8_t *smw) {
    const int bottom = e.get(-h);
    for (int y = 0; y < h; y++) {
        const int wv = smw[h + y];
        for (int x = 0; x < w; x++)
            o[y * w + x] = (wv * e.get(1 + x) + (256 - wv) * bottom +
                            128) >> 8;
    }
}
static void pred_smooth_h(int32_t *o, const Edge &e, int w, int h,
                          const uint8_t *smw) {
    const int right = e.get(w);
    for (int y = 0; y < h; y++) {
        const int l = e.get(-1 - y);
        for (int x = 0; x < w; x++)
            o[y * w + x] = (smw[w + x] * l + (256 - smw[w + x]) * right +
                            128) >> 8;
    }
}

// ---- directional helpers (ops/ipred_ref.py:270-363) -----------------
static int get_filter_strength(int wh, int angle, int is_sm) {
    if (is_sm) {
        if (wh <= 8) {
            if (angle >= 64) return 2;
            if (angle >= 40) return 1;
        } else if (wh <= 16) {
            if (angle >= 48) return 2;
            if (angle >= 20) return 1;
        } else if (wh <= 24) {
            if (angle >= 4) return 3;
        } else {
            return 3;
        }
    } else {
        if (wh <= 8) {
            if (angle >= 56) return 1;
        } else if (wh <= 16) {
            if (angle >= 40) return 1;
        } else if (wh <= 24) {
            if (angle >= 32) return 3;
            if (angle >= 16) return 2;
            if (angle >= 8) return 1;
        } else if (wh <= 32) {
            if (angle >= 32) return 3;
            if (angle >= 4) return 2;
            return 1;
        } else {
            return 3;
        }
    }
    return 0;
}

// src = edge buffer gather (arr[base + i], i clipped to [from, to))
static void filter_edge(int32_t *out, int sz, int lim_from, int lim_to,
                        const int32_t *arr, int base, int src_from,
                        int src_to, int strength) {
    const int32_t *kern = EDGE_KERNELS[strength - 1];
    int32_t vals[2 * 160 + 8];
    for (int i = 0; i < sz + 4; i++)
        vals[i] = arr[base + clipi(i - 2, src_from, src_to - 1)];
    const int lo = std::min(sz, lim_from), hi = std::min(lim_to, sz);
    for (int i = 0; i < sz; i++) {
        if (i < lo || i >= hi) {
            out[i] = vals[i + 2];
        } else {
            int64_t acc = 0;
            for (int j = 0; j < 5; j++) acc += (int64_t)vals[i + j] * kern[j];
            out[i] = (int32_t)((acc + 8) >> 4);
        }
    }
}

static int get_upsample(int wh, int angle, int is_sm) {
    return angle < 40 && wh <= (16 >> is_sm);
}

// returns 2*hsz values (out[2*hsz-1] unused, zeroed)
static void upsample_edge(int32_t *out, int hsz, const int32_t *arr,
                          int base, int src_from, int src_to, int bd) {
    const int bd_max = (1 << bd) - 1;
    int32_t vals[2 * 160 + 4];
    for (int i = 0; i < hsz + 2; i++)
        vals[i] = arr[base + clipi(i - 1, src_from, src_to - 1)];
    const int n = hsz - 1;
    memset(out, 0, sizeof(int32_t) * hsz * 2);
    for (int i = 0; i < n; i++) {
        out[2 * i] = vals[1 + i];
        const int s = (-vals[i] + 9 * vals[1 + i] + 9 * vals[2 + i] -
                       vals[3 + i] + 8) >> 4;
        out[2 * i + 1] = clipi(s, 0, bd_max);
    }
    out[2 * n] = vals[1 + n];
}

// ---- Z1 / Z2 / Z3 (ops/ipred_ref.py:366-521) ------------------------
static void pred_z1(int32_t *o, const Edge &e, int w, int h, int angle,
                    int bd, const IpredTables *tb) {
    const int is_sm = (angle >> 9) & 1;
    const int enable_ief = angle >> 10;
    angle &= 511;
    int dx = tb->dr_intra_derivative[angle >> 1];
    const int upsample_above =
        enable_ief ? get_upsample(w + h, 90 - angle, is_sm) : 0;

    int32_t top[2 * 160];
    int top_len, max_base_x;
    if (upsample_above) {
        upsample_edge(top, w + h, e.buf, Edge::C + 1, -1,
                      w + std::min(w, h), bd);
        top_len = 2 * (w + h);
        max_base_x = 2 * (w + h) - 2;
        dx <<= 1;
    } else {
        const int strength =
            enable_ief ? get_filter_strength(w + h, 90 - angle, is_sm) : 0;
        if (strength) {
            filter_edge(top, w + h, 0, w + h, e.buf, Edge::C + 1, -1,
                        w + std::min(w, h), strength);
            top_len = w + h;
            max_base_x = w + h - 1;
        } else {
            top_len = w + std::min(w, h);
            for (int i = 0; i < top_len; i++) top[i] = e.get(1 + i);
            max_base_x = top_len - 1;
        }
    }
    const int base_inc = 1 + upsample_above;
    for (int y = 0; y < h; y++) {
        const int xpos = dx * (y + 1);
        const int frac = xpos & 0x3E;
        for (int x = 0; x < w; x++) {
            const int base = (xpos >> 6) + x * base_inc;
            if (base < max_base_x) {
                const int64_t v =
                    (int64_t)top[base] * (64 - frac) +
                    (int64_t)top[std::min(base + 1, top_len - 1)] * frac;
                o[y * w + x] = (int32_t)((v + 32) >> 6);
            } else {
                o[y * w + x] = top[max_base_x];
            }
        }
    }
}

static void pred_z2(int32_t *o, const Edge &e, int w, int h, int angle,
                    int bd, int max_width, int max_height,
                    const IpredTables *tb) {
    const int is_sm = (angle >> 9) & 1;
    const int enable_ief = angle >> 10;
    angle &= 511;
    int dy = tb->dr_intra_derivative[(angle - 90) >> 1];
    int dx = tb->dr_intra_derivative[(180 - angle) >> 1];
    const int upsample_left =
        enable_ief ? get_upsample(w + h, 180 - angle, is_sm) : 0;
    const int upsample_above =
        enable_ief ? get_upsample(w + h, angle - 90, is_sm) : 0;

    int32_t buf[129];
    memset(buf, 0, sizeof(buf));
    const int C = 64;

    if (upsample_above) {
        int32_t up[2 * 160];
        upsample_edge(up, w + 1, e.buf, Edge::C, 0, w + 1, bd);
        for (int i = 0; i <= 2 * w; i++) buf[C + i] = up[i];
        dx <<= 1;
    } else {
        const int strength =
            enable_ief ? get_filter_strength(w + h, angle - 90, is_sm) : 0;
        if (strength)
            filter_edge(buf + C + 1, w, 0, max_width, e.buf, Edge::C + 1,
                        -1, w, strength);
        else
            for (int i = 0; i < w; i++) buf[C + 1 + i] = e.get(1 + i);
    }
    if (upsample_left) {
        int32_t up[2 * 160];
        upsample_edge(up, h + 1, e.buf, Edge::C - h, 0, h + 1, bd);
        for (int i = 0; i <= 2 * h; i++) buf[C - 2 * h + i] = up[i];
        dy <<= 1;
    } else {
        const int strength =
            enable_ief ? get_filter_strength(w + h, 180 - angle, is_sm) : 0;
        if (strength)
            filter_edge(buf + C - h, h, h - max_height, h, e.buf,
                        Edge::C - h, 0, h + 1, strength);
        else
            for (int i = 0; i < h; i++) buf[C - h + i] = e.get(-h + i);
    }
    buf[C] = e.get(0);

    const int base_inc_x = 1 + upsample_above;
    const int left_off = -(1 + upsample_left);
    for (int y = 0; y < h; y++) {
        const int xpos = ((1 + upsample_above) << 6) - dx * (y + 1);
        const int frac_x = xpos & 0x3E;
        for (int x = 0; x < w; x++) {
            const int base_x = (xpos >> 6) + x * base_inc_x;
            int64_t v;
            if (base_x >= 0) {
                const int ia = clipi(C + base_x, 0, 127);
                v = (int64_t)buf[ia] * (64 - frac_x) +
                    (int64_t)buf[ia + 1] * frac_x;
            } else {
                const int ypos = (y << (6 + upsample_left)) - dy * (x + 1);
                const int frac_y = ypos & 0x3E;
                const int il = clipi(C + left_off - (ypos >> 6), 1, 128);
                v = (int64_t)buf[il] * (64 - frac_y) +
                    (int64_t)buf[il - 1] * frac_y;
            }
            o[y * w + x] = (int32_t)((v + 32) >> 6);
        }
    }
}

static void pred_z3(int32_t *o, const Edge &e, int w, int h, int angle,
                    int bd, const IpredTables *tb) {
    const int is_sm = (angle >> 9) & 1;
    const int enable_ief = angle >> 10;
    angle &= 511;
    int dy = tb->dr_intra_derivative[(270 - angle) >> 1];
    const int upsample_left =
        enable_ief ? get_upsample(w + h, angle - 180, is_sm) : 0;

    int32_t arr[2 * 160];
    int arr_len, left_anchor, max_base_y;
    if (upsample_left) {
        upsample_edge(arr, w + h, e.buf, Edge::C - (w + h),
                      std::max(w - h, 0), w + h + 1, bd);
        arr_len = 2 * (w + h);
        left_anchor = 2 * (w + h) - 2;
        max_base_y = 2 * (w + h) - 2;
        dy <<= 1;
    } else {
        const int strength =
            enable_ief ? get_filter_strength(w + h, angle - 180, is_sm) : 0;
        if (strength) {
            filter_edge(arr, w + h, 0, w + h, e.buf, Edge::C - (w + h),
                        std::max(w - h, 0), w + h + 1, strength);
            arr_len = w + h;
            left_anchor = w + h - 1;
            max_base_y = w + h - 1;
        } else {
            arr_len = w + h;
            for (int i = 0; i < arr_len; i++)
                arr[i] = e.get(-(w + h) + i);
            left_anchor = w + h - 1;
            max_base_y = h + std::min(w, h) - 1;
        }
    }
    const int base_inc = 1 + upsample_left;
    for (int x = 0; x < w; x++) {
        const int ypos = dy * (x + 1);
        const int frac = ypos & 0x3E;
        for (int y = 0; y < h; y++) {
            const int base = (ypos >> 6) + y * base_inc;
            if (base < max_base_y) {
                const int bc = base;
                const int i0 = clipi(left_anchor - bc, 0, arr_len - 1);
                const int i1 = clipi(left_anchor - bc - 1, 0, arr_len - 1);
                const int64_t v = (int64_t)arr[i0] * (64 - frac) +
                                  (int64_t)arr[i1] * frac;
                o[y * w + x] = (int32_t)((v + 32) >> 6);
            } else {
                o[y * w + x] = arr[left_anchor - max_base_y];
            }
        }
    }
}

// ---- filter intra (ops/ipred_ref.py:527-581) ------------------------
static void pred_filter(int32_t *o, const Edge &e, int w, int h,
                        int filt_idx, int bd, const IpredTables *tb) {
    filt_idx &= 511;
    const int8_t *flt = tb->filter_intra_taps + filt_idx * 64;
    int64_t M[8][7];
    for (int fi = 0; fi < 8; fi++) {
        M[fi][0] = flt[2 * fi];
        M[fi][1] = flt[2 * fi + 1];
        M[fi][2] = flt[16 + 2 * fi];
        M[fi][3] = flt[17 + 2 * fi];
        M[fi][4] = flt[32 + 2 * fi];
        M[fi][5] = flt[33 + 2 * fi];
        M[fi][6] = flt[48 + 2 * fi];
    }
    const int bd_max = (1 << bd) - 1;
    for (int y = 0; y < h; y += 2) {
        for (int x = 0; x < w; x += 4) {
            int64_t p0, p1, p2, p3, p4, p5, p6;
            if (y == 0) {
                p0 = x ? e.get(x) : e.get(0);
                p1 = e.get(1 + x); p2 = e.get(2 + x);
                p3 = e.get(3 + x); p4 = e.get(4 + x);
            } else {
                const int32_t *row = o + (y - 1) * w;
                p0 = x ? row[x - 1] : e.get(-y);
                p1 = row[x]; p2 = row[x + 1];
                p3 = row[x + 2]; p4 = row[x + 3];
            }
            if (x) {
                p5 = o[y * w + x - 1];
                p6 = o[(y + 1) * w + x - 1];
            } else {
                p5 = e.get(-(y + 1));
                p6 = e.get(-(y + 2));
            }
            for (int fi = 0; fi < 8; fi++) {
                const int64_t *t = M[fi];
                int64_t acc = (t[0] * p0 + t[1] * p1 + t[2] * p2 +
                               t[3] * p3 + t[4] * p4 + t[5] * p5 +
                               t[6] * p6 + 8) >> 4;
                if (acc < 0) acc = 0;
                else if (acc > bd_max) acc = bd_max;
                if (fi < 4) o[y * w + x + fi] = (int32_t)acc;
                else o[(y + 1) * w + x + fi - 4] = (int32_t)acc;
            }
        }
    }
}

// ---- CFL (ops/ipred_ref.py:584-617) ---------------------------------
template <typename T>
static void cfl_ac(int32_t *ac, const Plane<T> &ypl, int64_t py, int64_t px,
                   int ss_hor, int ss_ver, int w_pad, int h_pad,
                   int cw, int ch) {
    const int nh = ch - 4 * h_pad, nw = cw - 4 * w_pad;
    const int sh = 1 + (ss_ver == 0) + (ss_hor == 0);
    for (int y = 0; y < nh; y++) {
        for (int x = 0; x < nw; x++) {
            const int64_t sy = py + ((int64_t)y << ss_ver);
            const int64_t sx = px + ((int64_t)x << ss_hor);
            int32_t s = ypl.get(sy, sx);
            if (ss_hor) s += ypl.get(sy, sx + 1);
            if (ss_ver) {
                s += ypl.get(sy + 1, sx);
                if (ss_hor) s += ypl.get(sy + 1, sx + 1);
            }
            ac[y * cw + x] = s << sh;
        }
    }
    for (int y = 0; y < nh; y++)
        for (int x = nw; x < cw; x++) ac[y * cw + x] = ac[y * cw + nw - 1];
    for (int y = nh; y < ch; y++)
        memcpy(ac + y * cw, ac + (nh - 1) * cw, sizeof(int32_t) * cw);
    const int log2sz = blog2(cw) + blog2(ch);
    int64_t total = 0;
    for (int i = 0; i < cw * ch; i++) total += ac[i];
    total += (int64_t(1) << log2sz) >> 1;
    total >>= log2sz;
    for (int i = 0; i < cw * ch; i++) ac[i] -= (int32_t)total;
}

static int cfl_dc_mode(int mode, const Edge &e, int w, int h, int bd) {
    switch (mode) {
    case DC_PRED: return dc_gen(e, w, h, bd);
    case DC_128_PRED: return (1 << bd) >> 1;
    case TOP_DC_PRED: return dc_gen_top(e, w);
    case LEFT_DC_PRED: return dc_gen_left(e, h);
    }
    return 0;
}

// ---- residual add via the native itx engine -------------------------
struct CoefRec {
    const int32_t *coefs;   // tile coef records
    const int32_t *cf_pool;
};

static const int32_t *find_coef(const CoefRec &cr, int start, int end,
                                int plane, int x4, int y4, int *eob,
                                int *tx, int *txtp) {
    for (int i = start; i < end; i++) {
        const int32_t *r = cr.coefs + (int64_t)i * CF_N_FIELDS;
        if (r[CF_PLANE] == plane && r[CF_X4] == x4 && r[CF_Y4] == y4) {
            *eob = r[CF_EOB];
            *tx = r[CF_TX];
            *txtp = r[CF_TXTP];
            return cr.cf_pool + r[CF_OFF];
        }
    }
    return nullptr;
}

// ---- per-block reconstruction (recon/intra_ref.py:81-324) ------------
template <typename T>
struct Walker {
    const IntraCtx *c;
    const IpredTables *tb;
    const ItxTables *itb;
    CoefRec cr;
    const int32_t *pal_pool;
    const uint8_t *palidx_pool;
    Plane<T> pl[3];
    Edge e;
    int32_t pred[64 * 64];
    int32_t ac[32 * 32];

    void store_pred(int plane_idx, int64_t py, int64_t px, int w, int h) {
        for (int y = 0; y < h; y++) {
            T *row = pl[plane_idx].row(py + y) + px;
            const int32_t *p = pred + y * w;
            for (int x = 0; x < w; x++) row[x] = (T)p[x];
        }
    }

    void add_residual(int plane_idx, int64_t py, int64_t px,
                      const int32_t *cf, int eob, int tx, int txtp) {
        itx_add_block(itb, pl[plane_idx].row(py) + px,
                      pl[plane_idx].stride, (int32_t)sizeof(T), cf, eob,
                      tx, txtp, c->bd);
    }

    void maybe_residual(int plane_idx, int x4, int y4, int64_t py,
                        int64_t px, int cs, int ce) {
        int eob, tx, txtp;
        const int32_t *cf = find_coef(cr, cs, ce, plane_idx, x4, y4,
                                      &eob, &tx, &txtp);
        if (cf && eob >= 0)
            add_residual(plane_idx, py, px, cf, eob, tx, txtp);
    }

    void run_pred(int mode, int w, int h, int angle, int max_w, int max_h) {
        switch (mode) {
        case DC_PRED: splat(pred, w, h, dc_gen(e, w, h, c->bd)); break;
        case DC_128_PRED: splat(pred, w, h, (1 << c->bd) >> 1); break;
        case TOP_DC_PRED: splat(pred, w, h, dc_gen_top(e, w)); break;
        case LEFT_DC_PRED: splat(pred, w, h, dc_gen_left(e, h)); break;
        case VERT_PRED: pred_v(pred, e, w, h); break;
        case HOR_PRED: pred_h(pred, e, w, h); break;
        case PAETH_PRED: pred_paeth(pred, e, w, h); break;
        case SMOOTH_PRED: pred_smooth(pred, e, w, h, tb->sm_weights); break;
        case SMOOTH_V_PRED:
            pred_smooth_v(pred, e, w, h, tb->sm_weights); break;
        case SMOOTH_H_PRED:
            pred_smooth_h(pred, e, w, h, tb->sm_weights); break;
        case Z1_PRED: pred_z1(pred, e, w, h, angle, c->bd, tb); break;
        case Z2_PRED:
            pred_z2(pred, e, w, h, angle, c->bd, max_w, max_h, tb); break;
        case Z3_PRED: pred_z3(pred, e, w, h, angle, c->bd, tb); break;
        case FILTER_PRED:
            pred_filter(pred, e, w, h, angle, c->bd, tb); break;
        }
    }

    // one luma tx block (intra_ref.py:174-224)
    void recon_tx_block(const int32_t *b, int bx, int by, int x, int y,
                        int init_x, int init_y, int sub_w4, int sub_h4,
                        int sb_has_tr, int sb_has_bl, int tw, int th,
                        int sm_fl) {
        const int64_t px = (int64_t)bx * 4, py = (int64_t)by * 4;
        const int w_px = tw * 4, h_px = th * 4;
        if (b[BF_PAL_SZ0]) {
            const int32_t *palrow = pal_pool + (int64_t)b[BF_PAL_IDX] * 24;
            const int bw4 = tb->block_dimensions[b[BF_BS] * 4];
            const uint8_t *idx = palidx_pool + b[BF_PALIDX_Y_OFF];
            const int idx_stride = bw4 * 4;
            const int ox = (bx - b[BF_BX]) * 4, oy = (by - b[BF_BY]) * 4;
            for (int yy = 0; yy < h_px; yy++) {
                T *row = pl[0].row(py + yy) + px;
                const uint8_t *ir = idx + (int64_t)(oy + yy) * idx_stride + ox;
                for (int xx = 0; xx < w_px; xx++)
                    row[xx] = (T)palrow[ir[xx]];
            }
            if (!b[BF_SKIP])
                maybe_residual(0, bx, by, py, px, b[BF_COEF_START],
                               b[BF_COEF_END]);
            return;
        }
        const int edge_flags =
            ((((y > init_y || !sb_has_tr) && (x + tw >= sub_w4))
                  ? 0 : EDGE_I444_TOP_HAS_RIGHT) |
             ((x > init_x || (!sb_has_bl && y + th >= sub_h4))
                  ? 0 : EDGE_I444_LEFT_HAS_BOTTOM));
        int angle = b[BF_Y_ANGLE];
        const int mode = prepare_intra_edges<T>(
            bx, bx > c->col_start, by, by > c->row_start, c->col_end,
            c->row_end, edge_flags, pl[0], px, py, b[BF_Y_MODE], &angle,
            tw, th, c->intra_edge_filter, e, c->bd);
        run_pred(mode, w_px, h_px, angle | sm_fl,
                 4 * c->bw - 4 * bx, 4 * c->bh - 4 * by);
        store_pred(0, py, px, w_px, h_px);
        if (!b[BF_SKIP])
            maybe_residual(0, bx, by, py, px, b[BF_COEF_START],
                           b[BF_COEF_END]);
    }

    // one chroma tx block (intra_ref.py:227-286)
    void recon_uv_tx_block(const int32_t *b, int plx, int x, int y,
                           int init_x, int init_y, int sub_cw4,
                           int sub_ch4, int uv_sb_has_tr, int uv_sb_has_bl,
                           int tw, int th, int sm_uv_fl) {
        const int ss_ver = c->ss_ver, ss_hor = c->ss_hor;
        const int cbx = (b[BF_BX] >> ss_hor) + x;
        const int cby = (b[BF_BY] >> ss_ver) + y;
        const int64_t px = (int64_t)cbx * 4, py = (int64_t)cby * 4;
        const int w_px = tw * 4, h_px = th * 4;
        const int pi = 1 + plx;
        if (b[BF_PAL_SZ1]) {
            const int32_t *palrow =
                pal_pool + (int64_t)b[BF_PAL_IDX] * 24 + (1 + plx) * 8;
            const int bw4 = tb->block_dimensions[b[BF_BS] * 4];
            const int cbw4 = (bw4 + ss_hor) >> ss_hor;
            const uint8_t *idx = palidx_pool + b[BF_PALIDX_UV_OFF];
            const int idx_stride = cbw4 * 4;
            const int ox = (cbx - (b[BF_BX] >> ss_hor)) * 4;
            const int oy = (cby - (b[BF_BY] >> ss_ver)) * 4;
            for (int yy = 0; yy < h_px; yy++) {
                T *row = pl[pi].row(py + yy) + px;
                const uint8_t *ir = idx + (int64_t)(oy + yy) * idx_stride + ox;
                for (int xx = 0; xx < w_px; xx++)
                    row[xx] = (T)palrow[ir[xx]];
            }
            if (!b[BF_SKIP])
                maybe_residual(pi, cbx, cby, py, px, b[BF_COEF_START],
                               b[BF_COEF_END]);
            return;
        }
        const int is_cfl = b[BF_UV_MODE] == CODED_CFL_PRED;
        const int alpha = plx == 0 ? b[BF_CFL0] : b[BF_CFL1];
        if (!(is_cfl && alpha)) {
            const int edge_flags =
                ((((y > (init_y >> ss_ver) || !uv_sb_has_tr) &&
                   (x + tw >= sub_cw4))
                      ? 0 : EDGE_I444_TOP_HAS_RIGHT) |
                 ((x > (init_x >> ss_hor) ||
                   (!uv_sb_has_bl && y + th >= sub_ch4))
                      ? 0 : EDGE_I444_LEFT_HAS_BOTTOM));
            const int uv_mode = is_cfl ? DC_PRED : b[BF_UV_MODE];
            int angle = b[BF_UV_ANGLE];
            const int xstart = c->col_start >> ss_hor;
            const int ystart = c->row_start >> ss_ver;
            const int mode = prepare_intra_edges<T>(
                cbx, cbx > xstart, cby, cby > ystart,
                c->col_end >> ss_hor, c->row_end >> ss_ver, edge_flags,
                pl[pi], px, py, uv_mode, &angle, tw, th,
                c->intra_edge_filter, e, c->bd);
            const int full_angle =
                angle | (c->intra_edge_filter << 10) | sm_uv_fl;
            const int max_w =
                (4 * c->bw + ss_hor - 4 * (b[BF_BX] & ~ss_hor)) >> ss_hor;
            const int max_h =
                (4 * c->bh + ss_ver - 4 * (b[BF_BY] & ~ss_ver)) >> ss_ver;
            run_pred(mode, w_px, h_px, full_angle, max_w, max_h);
            store_pred(pi, py, px, w_px, h_px);
        }
        if (!b[BF_SKIP])
            maybe_residual(pi, cbx, cby, py, px, b[BF_COEF_START],
                           b[BF_COEF_END]);
    }

    // CFL (intra_ref.py:289-324)
    void recon_cfl(const int32_t *b, int cw4, int ch4, int cbw4, int cbh4,
                   int uv_tw, int uv_th, int y_tw, int y_th) {
        const int ss_ver = c->ss_ver, ss_hor = c->ss_hor;
        const int64_t ypx = 4 * (int64_t)(b[BF_BX] & ~ss_hor);
        const int64_t ypy = 4 * (int64_t)(b[BF_BY] & ~ss_ver);
        const int furthest_r = ((cw4 << ss_hor) + y_tw - 1) & ~(y_tw - 1);
        const int furthest_b = ((ch4 << ss_ver) + y_th - 1) & ~(y_th - 1);
        cfl_ac<T>(ac, pl[0], ypy, ypx, ss_hor, ss_ver,
                  cbw4 - (furthest_r >> ss_hor),
                  cbh4 - (furthest_b >> ss_ver), cbw4 * 4, cbh4 * 4);
        const int acw = cbw4 * 4;
        for (int plx = 0; plx < 2; plx++) {
            const int alpha = plx == 0 ? b[BF_CFL0] : b[BF_CFL1];
            if (!alpha) continue;
            const int pi = 1 + plx;
            const int cbx = b[BF_BX] >> ss_hor, cby = b[BF_BY] >> ss_ver;
            const int64_t px = (int64_t)cbx * 4, py = (int64_t)cby * 4;
            const int xstart = c->col_start >> ss_hor;
            const int ystart = c->row_start >> ss_ver;
            int angle = 0;
            const int mode = prepare_intra_edges<T>(
                cbx, cbx > xstart, cby, cby > ystart,
                c->col_end >> ss_hor, c->row_end >> ss_ver, 0, pl[pi],
                px, py, DC_PRED, &angle, uv_tw, uv_th, 0, e, c->bd);
            const int w_px = uv_tw * 4, h_px = uv_th * 4;
            const int dc = cfl_dc_mode(mode, e, w_px, h_px, c->bd);
            const int bd_max = (1 << c->bd) - 1;
            for (int yy = 0; yy < h_px; yy++) {
                T *row = pl[pi].row(py + yy) + px;
                for (int xx = 0; xx < w_px; xx++) {
                    const int diff = alpha * ac[yy * acw + xx];
                    int v = (std::abs(diff) + 32) >> 6;
                    if (diff < 0) v = -v;
                    row[xx] = (T)clipi(dc + v, 0, bd_max);
                }
            }
        }
    }

    // whole block (intra_ref.py:81-155)
    void recon_block(const int32_t *b, const int32_t *txinfo) {
        const int bw4 = tb->block_dimensions[b[BF_BS] * 4];
        const int bh4 = tb->block_dimensions[b[BF_BS] * 4 + 1];
        const int ss_ver = c->ss_ver, ss_hor = c->ss_hor;
        const int w4 = std::min(bw4, c->bw - b[BF_BX]);
        const int h4 = std::min(bh4, c->bh - b[BF_BY]);
        const int cw4 = (w4 + ss_hor) >> ss_hor;
        const int ch4 = (h4 + ss_ver) >> ss_ver;
        const int cbw4 = (bw4 + ss_hor) >> ss_hor;
        const int cbh4 = (bh4 + ss_ver) >> ss_ver;
        const int y_tw = txinfo[b[BF_TX] * 4];
        const int y_th = txinfo[b[BF_TX] * 4 + 1];
        const int uv_tw = txinfo[b[BF_UVTX] * 4];
        const int uv_th = txinfo[b[BF_UVTX] * 4 + 1];
        const int sm_fl = b[BF_SM_FL] | (c->intra_edge_filter << 10);
        const int ef = b[BF_EDGE_FLAGS];

        for (int init_y = 0; init_y < h4; init_y += 16) {
            const int sub_h4 = std::min(h4, 16 + init_y);
            const int sub_ch4 = std::min(ch4, (init_y + 16) >> ss_ver);
            for (int init_x = 0; init_x < w4; init_x += 16) {
                const int sub_w4 = std::min(w4, init_x + 16);
                const int sb_has_tr =
                    (init_x + 16 < w4) ? 1
                    : init_y ? 0 : (ef & EDGE_I444_TOP_HAS_RIGHT);
                const int sb_has_bl =
                    init_x ? 0
                    : (init_y + 16 < h4) ? 1
                    : (ef & EDGE_I444_LEFT_HAS_BOTTOM);

                for (int y = init_y; y < sub_h4; y += y_th)
                    for (int x = init_x; x < sub_w4; x += y_tw)
                        recon_tx_block(b, b[BF_BX] + x, b[BF_BY] + y, x,
                                       y, init_x, init_y, sub_w4, sub_h4,
                                       sb_has_tr, sb_has_bl, y_tw, y_th,
                                       sm_fl);

                if (!b[BF_HAS_CHROMA]) continue;

                if (b[BF_UV_MODE] == CODED_CFL_PRED && init_x == 0 &&
                    init_y == 0)
                    recon_cfl(b, cw4, ch4, cbw4, cbh4, uv_tw, uv_th,
                              y_tw, y_th);

                const int sub_cw4 = std::min(cw4, (init_x + 16) >> ss_hor);
                const int uv_sb_has_tr =
                    (((init_x + 16) >> ss_hor) < cw4) ? 1
                    : init_y ? 0
                    : (ef & (EDGE_I420_TOP_HAS_RIGHT >> (c->layout - 1)));
                const int uv_sb_has_bl =
                    init_x ? 0
                    : (((init_y + 16) >> ss_ver) < ch4) ? 1
                    : (ef & (EDGE_I420_LEFT_HAS_BOTTOM >> (c->layout - 1)));
                const int sm_uv_fl = b[BF_SM_UV_FL];
                for (int plx = 0; plx < 2; plx++)
                    for (int y = init_y >> ss_ver; y < sub_ch4; y += uv_th)
                        for (int x = init_x >> ss_hor; x < sub_cw4;
                             x += uv_tw)
                            recon_uv_tx_block(b, plx, x, y, init_x,
                                              init_y, sub_cw4, sub_ch4,
                                              uv_sb_has_tr, uv_sb_has_bl,
                                              uv_tw, uv_th, sm_uv_fl);
            }
        }
    }
};

template <typename T>
static int run_tile(const IntraCtx *c, const IpredTables *tb,
                    const ItxTables *itb, const int32_t *blocks,
                    int64_t n_blocks, const int32_t *coefs,
                    const int32_t *cf_pool, const int32_t *pal_pool,
                    const uint8_t *palidx_pool, const int64_t *sel,
                    int64_t n_sel) {
    Walker<T> w;
    w.c = c;
    w.tb = tb;
    w.itb = itb;
    w.cr.coefs = coefs;
    w.cr.cf_pool = cf_pool;
    w.pal_pool = pal_pool;
    w.palidx_pool = palidx_pool;
    for (int i = 0; i < 3; i++) {
        w.pl[i].base = (T *)c->planes[i];
        w.pl[i].stride = c->stride[i];
    }
    memset(w.e.buf, 0, sizeof(w.e.buf));
    if (sel) {
        for (int64_t i = 0; i < n_sel; i++) {
            const int64_t bi = sel[i];
            if (bi < 0 || bi >= n_blocks) return -2;
            w.recon_block(blocks + bi * BF_N_FIELDS, itb->txfm_info);
        }
    } else {
        for (int64_t i = 0; i < n_blocks; i++) {
            const int32_t *b = blocks + i * BF_N_FIELDS;
            if (!b[BF_INTRA]) return -3;   // keyframe walk only
            w.recon_block(b, itb->txfm_info);
        }
    }
    return 0;
}

}  // namespace

extern "C" int intra_recon_tile(
    const IntraCtx *c, const IpredTables *tb, const ItxTables *itb,
    const int32_t *blocks, int64_t n_blocks,
    const int32_t *coefs, const int32_t *cf_pool,
    const int32_t *pal_pool, const uint8_t *palidx_pool,
    const int64_t *sel, int64_t n_sel) {
    if (c->bytes_pp == 1)
        return run_tile<uint8_t>(c, tb, itb, blocks, n_blocks, coefs,
                                 cf_pool, pal_pool, palidx_pool, sel,
                                 n_sel);
    return run_tile<uint16_t>(c, tb, itb, blocks, n_blocks, coefs,
                              cf_pool, pal_pool, palidx_pool, sel, n_sel);
}
