// Native Stage-A tile parser: the full decode_sb/decode_b symbol walk
// in C++, one call per tile (VERDICT r1 item 2: the msac state never
// crosses the FFI per symbol).
//
// Semantics mirror the validated Python reference implementation
// (dav1d_tpu/entropy/{decode,decode_inter,refmvs,env,warpmv}.py), which
// is behavior-parity with the reference decoder (reference
// src/decode.c:683-2747, refmvs.c, warpmv.c, env.h). The Python parser
// remains the golden model (and the generator/trace path); outputs are
// dense pools the Python side materializes into the FramePlan.
//
// Build: make -C native
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include "msac.h"
#include "stagea.h"

namespace {

// ---- enums mirrored from entropy/levels.py --------------------------------
enum {
    PARTITION_NONE, PARTITION_H, PARTITION_V, PARTITION_SPLIT,
    PARTITION_T_TOP_SPLIT, PARTITION_T_BOTTOM_SPLIT, PARTITION_T_LEFT_SPLIT,
    PARTITION_T_RIGHT_SPLIT, PARTITION_H4, PARTITION_V4,
};
enum { BL_128X128, BL_64X64, BL_32X32, BL_16X16, BL_8X8 };
enum { BS_128x128 = 0, BS_64x64 = 3, BS_4x4 = 21 };
enum { TX_4X4 = 0, TX_8X8, TX_16X16, TX_32X32, TX_64X64, RTX_4X8 = 5 };
enum { DCT_DCT = 0, IDTX = 9, WHT_WHT = 16 };
enum {
    DC_PRED = 0, VERT_PRED = 1, VERT_LEFT_PRED = 8, SMOOTH_PRED = 9,
    SMOOTH_V_PRED = 10, SMOOTH_H_PRED = 11, N_INTRA_PRED_MODES = 13,
    CFL_PRED = 13, FILTER_PRED = 13,
};
enum { NEARESTMV = 0, NEARMV, GLOBALMV, NEWMV };
enum {
    NEARESTMV_NEARESTMV = 0, NEARMV_NEARMV, NEARESTMV_NEWMV,
    NEWMV_NEARESTMV, NEARMV_NEWMV, NEWMV_NEARMV, GLOBALMV_GLOBALMV,
    NEWMV_NEWMV, N_COMP_INTER_PRED_MODES,
};
enum {
    COMP_INTER_NONE = 0, COMP_INTER_WEIGHTED_AVG, COMP_INTER_AVG,
    COMP_INTER_SEG, COMP_INTER_WEDGE,
};
enum { INTER_INTRA_NONE = 0, INTER_INTRA_BLEND, INTER_INTRA_WEDGE };
enum { MM_TRANSLATION = 0, MM_OBMC, MM_WARP };
enum { N_SWITCHABLE_FILTERS = 3, FILTER_SWITCHABLE = 4 };
enum { MV_JOINT_H = 1, MV_JOINT_V = 2 };
enum {
    WM_IDENTITY = 0, WM_TRANSLATION, WM_ROT_ZOOM, WM_AFFINE,
};
enum {
    EDGE_I444_TOP_HAS_RIGHT = 1, EDGE_I444_LEFT_HAS_BOTTOM = 2,
};
enum { TXFM_MODE_SWITCHABLE = 2 };

const int64_t CFL_ALLOWED_MASK =
    (1LL << 7) | (1LL << 8) | (1LL << 9) | (1LL << 11) | (1LL << 12) |
    (1LL << 13) | (1LL << 14) | (1LL << 15) | (1LL << 16) | (1LL << 17) |
    (1LL << 18) | (1LL << 19) | (1LL << 20) | (1LL << 21);
const int64_t WEDGE_ALLOWED_MASK =
    (1LL << 7) | (1LL << 8) | (1LL << 9) | (1LL << 11) | (1LL << 12) |
    (1LL << 13) | (1LL << 15) | (1LL << 16) | (1LL << 17);
const int64_t INTERINTRA_ALLOWED_MASK =
    (1LL << 7) | (1LL << 8) | (1LL << 11) | (1LL << 12) | (1LL << 13) |
    (1LL << 16) | (1LL << 17);

const int INVALID_MV = -32768;

const int32_t DIV_MULT[32] = {
    0, 16384, 8192, 5461, 4096, 3276, 2730, 2340,
    2048, 1820, 1638, 1489, 1365, 1260, 1170, 1092,
    1024, 963, 910, 862, 819, 780, 744, 712,
    682, 655, 630, 606, 585, 564, 546, 528};

const uint16_t WARP_DIV_LUT[257] = {
    16384, 16320, 16257, 16194, 16132, 16070, 16009, 15948, 15888, 15828,
    15768, 15709, 15650, 15592, 15534, 15477, 15420, 15364, 15308, 15252,
    15197, 15142, 15087, 15033, 14980, 14926, 14873, 14821, 14769, 14717,
    14665, 14614, 14564, 14513, 14463, 14413, 14364, 14315, 14266, 14218,
    14170, 14122, 14075, 14028, 13981, 13935, 13888, 13843, 13797, 13752,
    13707, 13662, 13618, 13574, 13530, 13487, 13443, 13400, 13358, 13315,
    13273, 13231, 13190, 13148, 13107, 13066, 13026, 12985, 12945, 12906,
    12866, 12827, 12788, 12749, 12710, 12672, 12633, 12596, 12558, 12520,
    12483, 12446, 12409, 12373, 12336, 12300, 12264, 12228, 12193, 12157,
    12122, 12087, 12053, 12018, 11984, 11950, 11916, 11882, 11848, 11815,
    11782, 11749, 11716, 11683, 11651, 11619, 11586, 11555, 11523, 11491,
    11460, 11429, 11398, 11367, 11336, 11305, 11275, 11245, 11215, 11185,
    11155, 11125, 11096, 11067, 11038, 11009, 10980, 10951, 10923, 10894,
    10866, 10838, 10810, 10782, 10755, 10727, 10700, 10673, 10645, 10618,
    10592, 10565, 10538, 10512, 10486, 10460, 10434, 10408, 10382, 10356,
    10331, 10305, 10280, 10255, 10230, 10205, 10180, 10156, 10131, 10107,
    10082, 10058, 10034, 10010, 9986, 9963, 9939, 9916, 9892, 9869,
    9846, 9823, 9800, 9777, 9754, 9732, 9709, 9687, 9664, 9642,
    9620, 9598, 9576, 9554, 9533, 9511, 9489, 9468, 9447, 9425,
    9404, 9383, 9362, 9341, 9321, 9300, 9279, 9259, 9239, 9218,
    9198, 9178, 9158, 9138, 9118, 9098, 9079, 9059, 9039, 9020,
    9001, 8981, 8962, 8943, 8924, 8905, 8886, 8867, 8849, 8830,
    8812, 8793, 8775, 8756, 8738, 8720, 8702, 8684, 8666, 8648,
    8630, 8613, 8595, 8577, 8560, 8542, 8525, 8508, 8490, 8473,
    8456, 8439, 8422, 8405, 8389, 8372, 8355, 8339, 8322, 8306,
    8289, 8273, 8257, 8240, 8224, 8208, 8192};

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }
static inline int iclip(int v, int lo, int hi) {
    return v < lo ? lo : v > hi ? hi : v;
}
static inline int iclip_u8(int v) { return iclip(v, 0, 255); }
static inline int apply_sign(int v, int64_t s) { return s < 0 ? -v : v; }
static inline int64_t apply_sign64(int64_t v, int64_t s) {
    return s < 0 ? -v : v;
}
static inline int s16(int v) {
    return (int)(int16_t)(uint16_t)(v & 0xFFFF);
}
static inline int bitlen(uint64_t v) {
    int n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

}  // namespace

// ---- output record layouts (must match entropy/native_tile.py) ------------
#include "blockrec.h"

// ---- mode CDFs -------------------------------------------------------------
struct ModeCdfs {
    // shapes in comments; all uint16, C-contiguous
    uint16_t *partition;        // (5,4,16)
    uint16_t *uv_mode;          // (2,13,16)
    uint16_t *cfl_alpha;        // (6,16)
    uint16_t *cfl_sign;         // (8,)
    uint16_t *angle_delta;      // (8,8)
    uint16_t *filter_intra;     // (8,)
    uint16_t *use_filter_intra; // (22,2)
    uint16_t *seg_id;           // (3,8)
    uint16_t *seg_pred;         // (3,2)
    uint16_t *pal_sz;           // (2,7,8)
    uint16_t *pal_y;            // (7,3,2)
    uint16_t *pal_uv;           // (2,2)
    uint16_t *color_map;        // (2,7,5,8)
    uint16_t *txsz;             // (4,3,4)
    uint16_t *txpart;           // (7,3,2)
    uint16_t *delta_q;          // (4,)
    uint16_t *delta_lf;         // (5,4)
    uint16_t *restore_switchable;  // (4,)
    uint16_t *restore_wiener;   // (2,)
    uint16_t *restore_sgrproj;  // (2,)
    uint16_t *skip;             // (3,2)
    uint16_t *skip_mode;        // (3,2)
    uint16_t *intra;            // (4,2)
    uint16_t *intrabc;          // (2,)
    uint16_t *y_mode;           // (4,16)
    uint16_t *kfym;             // (5,5,16)
    uint16_t *comp;             // (5,2)
    uint16_t *comp_dir;         // (5,2)
    uint16_t *ref;              // (6,3,2)
    uint16_t *comp_fwd_ref;     // (3,3,2)
    uint16_t *comp_bwd_ref;     // (2,3,2)
    uint16_t *comp_uni_ref;     // (3,3,2)
    uint16_t *comp_inter_mode;  // (8,8)
    uint16_t *newmv_mode;       // (6,2)
    uint16_t *globalmv_mode;    // (2,2)
    uint16_t *refmv_mode;       // (6,2)
    uint16_t *drl_bit;          // (3,2)
    uint16_t *interintra;       // (7,2)
    uint16_t *interintra_mode;  // (4,4)
    uint16_t *interintra_wedge; // (7,2)
    uint16_t *wedge_comp;       // (9,2)
    uint16_t *wedge_idx;        // (9,16)
    uint16_t *mask_comp;        // (6,2)
    uint16_t *jnt_comp;         // (6,2)
    uint16_t *motion_mode;      // (22,4)
    uint16_t *obmc;             // (22,2)
    uint16_t *filter;           // (2,8,4)
    uint16_t *mv_joint;         // (4,)
    // per mv component (0=y, 1=x)
    uint16_t *mv_classes[2];    // (16,)
    uint16_t *mv_sign[2];       // (2,)
    uint16_t *mv_class0[2];     // (2,)
    uint16_t *mv_class0_fp[2];  // (2,4)
    uint16_t *mv_class0_hp[2];  // (2,)
    uint16_t *mv_classN[2];     // (10,2)
    uint16_t *mv_classN_fp[2];  // (4,)
    uint16_t *mv_classN_hp[2];  // (2,)
};

// ---- tile context -----------------------------------------------------------
struct TileCtx {
    CoefCtx coef;               // embeds the Msac (THE tile coder state)
    ModeCdfs m;

    // geometry / frame constants
    int32_t bw, bh, w4f, h4f;   // b4 grid + true 4x4 extents
    int32_t sb128, sb_shift, sb_step;
    int32_t key_or_intra, layout;
    int32_t col_start, col_end, row_start, row_end;   // b4 units
    int32_t hbd;                // seq_hdr.hbd (0/1/2)

    // frame header scalars
    int32_t seg_enabled, seg_update_map, seg_temporal, seg_preskip;
    int32_t seg_last_active;
    int32_t seg_delta_q[8], seg_ref[8], seg_skip[8], seg_globalmv[8];
    int32_t seg_delta_lf[8][4];     // y_v, y_h, u, v
    int32_t delta_q_present, delta_q_res_log2;
    int32_t delta_lf_present, delta_lf_multi, delta_lf_res_log2;
    int32_t base_qidx, ydc_delta, uac_delta, udc_delta, vac_delta, vdc_delta;
    const int32_t *dq_tbl;      // (3,256,2)
    int32_t skip_mode_enabled, skip_mode_refs[2];
    int32_t switchable_comp_refs;
    int32_t subpel_filter_mode, dual_filter;
    int32_t txfm_mode;
    int32_t allow_screen_content_tools, force_integer_mv, hp;
    int32_t use_ref_frame_mvs_hdr;   // frame_hdr.use_ref_frame_mvs
    int32_t warp_motion, switchable_motion_mode;
    int32_t frame_offset, order_hint_n_bits;
    int32_t refpoc[7], svc_scale[7];
    int32_t gmv_type[7];
    int32_t gmv_matrix[7][6];
    int32_t cdef_nbits;
    int32_t lf_level_y[2], lf_level_u, lf_level_v;
    int32_t lf_mode_ref_delta_enabled;
    int32_t lf_ref_delta[8], lf_mode_delta[2];
    int32_t rst_type[3], rst_unit_size[2];
    int32_t frame_w0, frame_w1, frame_h;     // widths pre/post superres
    int32_t superres_denom;
    int32_t seq_filter_intra, seq_inter_intra, seq_masked_compound;
    int32_t seq_jnt_comp, seq_order_hint;
    int32_t reduced_txtp_set;   // also in coef

    // static tables
    const int32_t *block_dimensions;  // (22,4)
    const uint8_t *txfm_dim;          // (19,8)
    const uint8_t *block_sizes;       // (5,10,2)
    const uint8_t *al_part_ctx;       // (2,5,10)
    const uint8_t *max_txfm_size_for_bs;  // (22,4)
    const uint8_t *partition_type_count; // (5,)
    const uint8_t *ymode_size_context;   // (22,)
    const uint8_t *intra_mode_context;   // (13,)
    const uint8_t *wedge_ctx_lut;        // (22,)
    const uint8_t *filter_2d;            // (4,4)
    const uint8_t *comp_inter_pred_modes;  // (8,2)
    const int32_t *edge_tree;         // (n_nodes, 14)
    int32_t tree_root[2];             // node id for 128 / 64 roots
    const int32_t *sgr_params;        // (16,2)

    // neighbour context arrays (a: width aw; l: 32)
    int32_t aw;                       // a array width
    uint8_t *a_mode, *l_mode;
    uint8_t *a_lcoef, *l_lcoef;
    uint8_t *a_ccoef0, *a_ccoef1, *l_ccoef0, *l_ccoef1;
    uint8_t *a_seg_pred, *l_seg_pred;
    uint8_t *a_skip, *l_skip;
    uint8_t *a_skip_mode, *l_skip_mode;
    uint8_t *a_intra, *l_intra;
    uint8_t *a_comp_type, *l_comp_type;
    int8_t *a_ref0, *a_ref1, *l_ref0, *l_ref1;
    uint8_t *a_filter0, *a_filter1, *l_filter0, *l_filter1;
    int8_t *a_tx_intra, *l_tx_intra;
    int8_t *a_tx, *l_tx;
    uint8_t *a_partition, *l_partition;   // (aw>>1,), (16,)
    uint8_t *a_uvmode, *l_uvmode;
    uint8_t *a_pal_sz, *l_pal_sz;
    uint8_t *pal_sz_uv;               // (2,32)
    int32_t *al_pal;                  // (2,32,3,8)
    uint8_t *txtp_map;                // (32, aw)

    // plan grids (strides = bw except noted)
    uint8_t *b4_bs, *b4_intra, *b4_skip, *b4_ymode, *b4_uvmode, *b4_seg;
    uint8_t *b4_filter0, *b4_filter1;   // (bh, bw) each
    int8_t *cdef_idx;                 // (n64h, n64w)
    int32_t n64h, n64w;
    const uint8_t *prev_segmap;       // (bh, bw) or null

    // refmvs frame state (null for intra frames without intrabc)
    int32_t have_rf;
    int32_t *r_mv;                    // (h4a, w4a, 2, 2)
    int32_t *r_ref;                   // (h4a, w4a, 2)
    int32_t *r_bs, *r_mf;             // (h4a, w4a)
    int32_t rf_w4a;                   // row stride in blocks
    int32_t *proj_mv;                 // (ih8, stride8, 2)
    int32_t *proj_ref;                // (ih8, stride8)
    int32_t rf_stride8, rf_iw4, rf_ih4, rf_iw8, rf_ih8;
    int32_t rf_sign_bias[7], rf_pocdiff[7];
    int32_t rf_use_ref_frame_mvs;     // n_mfmvs > 0
    int32_t rt_col_start, rt_col_end, rt_row_start, rt_row_end;

    // outputs
    int32_t *out_blocks;              // (max_blocks, BF_N_FIELDS)
    int64_t max_blocks, n_blocks;
    int32_t *out_coefs;               // (max_coefs, CF_N_FIELDS)
    int64_t max_coefs, n_coefs;
    int32_t *cf_pool;
    int64_t cf_cap, cf_used;
    int32_t *pal_pool;                // (max_pal, 3, 8)
    int64_t pal_cap, pal_used;
    uint8_t *palidx_pool;
    int64_t palidx_cap, palidx_used;
    int32_t *out_lr;                  // (max_lr, LR_N_FIELDS)
    int64_t max_lr, n_lr;

    // mutable per-tile state
    int32_t bx, by;                   // current position (b4)
    int32_t last_qidx, last_delta_lf[4];
    int32_t dq_scratch[8 * 3 * 2];    // local dq when delta-q active
    int32_t lr_ref[3][12];            // per-plane {type, fv[3], fh[3], w[2]}
    int32_t err;                      // sticky error code
    const int32_t *frame_dq;          // (8,3,2) frame-level dq (coef.dq init)
    int32_t allow_intrabc;
    int32_t strict;                   // trailing-bits conformance check
    int32_t txfm_mode_pad;            // reserved
};

// ============================================================================
// small helpers
// ============================================================================

static inline const int32_t *bdim(const TileCtx *t, int bs) {
    return t->block_dimensions + bs * 4;
}
static inline const uint8_t *tdim(const TileCtx *t, int tx) {
    return t->txfm_dim + tx * 8;
}

struct MvPair { int y, x; };
struct Cand { MvPair mv[2]; int weight; };

// fix_mv_precision (refmvs.py:42-61)
static inline MvPair fix_int_mv_precision(MvPair m) {
    m.x = s16((m.x - (m.x >> 15) + 3) & ~7);
    m.y = s16((m.y - (m.y >> 15) + 3) & ~7);
    return m;
}
static inline MvPair fix_mv_precision(const TileCtx *t, MvPair m) {
    if (t->force_integer_mv) return fix_int_mv_precision(m);
    if (!t->hp) {
        m.x = s16((m.x - (m.x >> 15)) & ~1);
        m.y = s16((m.y - (m.y >> 15)) & ~1);
    }
    return m;
}

// get_gmv_2d (refmvs.py:64-86)
static MvPair get_gmv_2d(const TileCtx *t, int refidx, int bx4, int by4,
                         int bw4, int bh4) {
    const int typ = t->gmv_type[refidx];
    const int32_t *mat = t->gmv_matrix[refidx];
    MvPair out{0, 0};
    if (typ == WM_IDENTITY) return out;
    if (typ == WM_TRANSLATION) {
        out.y = mat[0] >> 13;
        out.x = mat[1] >> 13;
        if (t->force_integer_mv) return fix_int_mv_precision(out);
        return out;
    }
    const int x = bx4 * 4 + bw4 * 2 - 1;
    const int y = by4 * 4 + bh4 * 2 - 1;
    const int64_t xc = (int64_t)(mat[2] - 65536) * x + (int64_t)mat[3] * y +
                       mat[0];
    const int64_t yc = (int64_t)(mat[5] - 65536) * y + (int64_t)mat[4] * x +
                       mat[1];
    const int shift = 16 - (3 - !t->hp);
    const int64_t rnd = (1LL << shift) >> 1;
    int64_t ry = apply_sign64((((yc < 0 ? -yc : yc) + rnd) >> shift)
                              << (!t->hp), yc);
    int64_t rx = apply_sign64((((xc < 0 ? -xc : xc) + rnd) >> shift)
                              << (!t->hp), xc);
    out.y = s16((int)ry);
    out.x = s16((int)rx);
    if (t->force_integer_mv) return fix_int_mv_precision(out);
    return out;
}

// mv_projection (refmvs.py:89-95)
static inline MvPair mv_projection(int my, int mx, int num, int den) {
    const int64_t frac = (int64_t)num * DIV_MULT[den];
    const int64_t y = my * frac, x = mx * frac;
    MvPair o;
    o.y = iclip((int)((y + 8192 + (y >> 63)) >> 14), -0x3FFF, 0x3FFF);
    o.x = iclip((int)((x + 8192 + (x >> 63)) >> 14), -0x3FFF, 0x3FFF);
    return o;
}

// refmvs grid accessors
static inline int32_t *rmv_at(const TileCtx *t, int by4, int bx4) {
    return t->r_mv + ((int64_t)by4 * t->rf_w4a + bx4) * 4;
}
static inline int32_t *rref_at(const TileCtx *t, int by4, int bx4) {
    return t->r_ref + ((int64_t)by4 * t->rf_w4a + bx4) * 2;
}
static inline int rbs_at(const TileCtx *t, int by4, int bx4) {
    return t->r_bs[(int64_t)by4 * t->rf_w4a + bx4];
}
static inline int rmf_at(const TileCtx *t, int by4, int bx4) {
    return t->r_mf[(int64_t)by4 * t->rf_w4a + bx4];
}

static void splat_mv(TileCtx *t, int bx4, int by4, int bw4, int bh4,
                     MvPair mv0, MvPair mv1, int ref0, int ref1, int bs,
                     int mf) {
    for (int y = 0; y < bh4; y++) {
        int32_t *mv = rmv_at(t, by4 + y, bx4);
        int32_t *rr = rref_at(t, by4 + y, bx4);
        int32_t *rb = t->r_bs + ((int64_t)(by4 + y) * t->rf_w4a + bx4);
        int32_t *rm = t->r_mf + ((int64_t)(by4 + y) * t->rf_w4a + bx4);
        for (int x = 0; x < bw4; x++) {
            mv[x * 4 + 0] = mv0.y;
            mv[x * 4 + 1] = mv0.x;
            mv[x * 4 + 2] = mv1.y;
            mv[x * 4 + 3] = mv1.x;
            rr[x * 2 + 0] = ref0;
            rr[x * 2 + 1] = ref1;
            rb[x] = bs;
            rm[x] = mf;
        }
    }
}

// ============================================================================
// refmvs_find (refmvs.py:309-732)
// ============================================================================

struct RefFindCtx {
    Cand stack[12];
    int n;
    int ctx;
};

static void add_spatial_candidate(TileCtx *t, Cand *stack, int *n,
                                  int weight, int by4, int bx4,
                                  const int ref[2], const MvPair gmv[2],
                                  int *have_newmv, int *have_refmv) {
    const int32_t *bmv = rmv_at(t, by4, bx4);
    const int32_t *bref = rref_at(t, by4, bx4);
    const int mf = rmf_at(t, by4, bx4);
    if (bmv[0] == INVALID_MV && bmv[1] == INVALID_MV) return;
    if (ref[1] == -1) {
        for (int k = 0; k < 2; k++) {
            if (bref[k] == ref[0]) {
                MvPair cand;
                if ((mf & 1) && !(gmv[0].y == INVALID_MV &&
                                  gmv[0].x == INVALID_MV)) {
                    cand = gmv[0];
                } else {
                    cand.y = bmv[k * 2 + 0];
                    cand.x = bmv[k * 2 + 1];
                }
                *have_refmv = 1;
                *have_newmv |= mf >> 1;
                for (int m = 0; m < *n; m++) {
                    if (stack[m].mv[0].y == cand.y &&
                        stack[m].mv[0].x == cand.x) {
                        stack[m].weight += weight;
                        return;
                    }
                }
                if (*n < 8) {
                    stack[*n].mv[0] = cand;
                    stack[*n].mv[1] = MvPair{0, 0};
                    stack[*n].weight = weight;
                    (*n)++;
                }
                return;
            }
        }
    } else if (bref[0] == ref[0] && bref[1] == ref[1]) {
        MvPair c0, c1;
        if ((mf & 1) && !(gmv[0].y == INVALID_MV && gmv[0].x == INVALID_MV))
            c0 = gmv[0];
        else
            c0 = MvPair{bmv[0], bmv[1]};
        if ((mf & 1) && !(gmv[1].y == INVALID_MV && gmv[1].x == INVALID_MV))
            c1 = gmv[1];
        else
            c1 = MvPair{bmv[2], bmv[3]};
        *have_refmv = 1;
        *have_newmv |= mf >> 1;
        for (int m = 0; m < *n; m++) {
            if (stack[m].mv[0].y == c0.y && stack[m].mv[0].x == c0.x &&
                stack[m].mv[1].y == c1.y && stack[m].mv[1].x == c1.x) {
                stack[m].weight += weight;
                return;
            }
        }
        if (*n < 8) {
            stack[*n].mv[0] = c0;
            stack[*n].mv[1] = c1;
            stack[*n].weight = weight;
            (*n)++;
        }
    }
}

static int scan_row(TileCtx *t, Cand *stack, int *n, const int ref[2],
                    const MvPair gmv[2], int by4, int bx4_start, int bw4,
                    int w4, int max_rows, int step, int *have_newmv,
                    int *have_refmv) {
    int x = 0;
    int cand_bs = rbs_at(t, by4, bx4_start);
    int cand_bw4 = bdim(t, cand_bs)[0];
    int ln = imax(step, imin(bw4, cand_bw4));
    if (bw4 <= cand_bw4) {
        int weight = bw4 == 1 ? 2
                              : imax(2, imin(2 * max_rows,
                                             bdim(t, cand_bs)[1]));
        add_spatial_candidate(t, stack, n, ln * weight, by4, bx4_start,
                              ref, gmv, have_newmv, have_refmv);
        return weight >> 1;
    }
    for (;;) {
        add_spatial_candidate(t, stack, n, ln * 2, by4, bx4_start + x,
                              ref, gmv, have_newmv, have_refmv);
        x += ln;
        if (x >= w4) return 1;
        cand_bs = rbs_at(t, by4, bx4_start + x);
        cand_bw4 = bdim(t, cand_bs)[0];
        ln = imax(step, cand_bw4);
    }
}

static int scan_col(TileCtx *t, Cand *stack, int *n, const int ref[2],
                    const MvPair gmv[2], int by4_start, int bx4, int bh4,
                    int h4, int max_cols, int step, int *have_newmv,
                    int *have_refmv) {
    int y = 0;
    int cand_bs = rbs_at(t, by4_start, bx4);
    int cand_bh4 = bdim(t, cand_bs)[1];
    int ln = imax(step, imin(bh4, cand_bh4));
    if (bh4 <= cand_bh4) {
        int weight = bh4 == 1 ? 2
                              : imax(2, imin(2 * max_cols,
                                             bdim(t, cand_bs)[0]));
        add_spatial_candidate(t, stack, n, ln * weight, by4_start, bx4,
                              ref, gmv, have_newmv, have_refmv);
        return weight >> 1;
    }
    for (;;) {
        add_spatial_candidate(t, stack, n, ln * 2, by4_start + y, bx4,
                              ref, gmv, have_newmv, have_refmv);
        y += ln;
        if (y >= h4) return 1;
        cand_bs = rbs_at(t, by4_start + y, bx4);
        cand_bh4 = bdim(t, cand_bs)[1];
        ln = imax(step, cand_bh4);
    }
}

static void add_temporal_candidate(TileCtx *t, Cand *stack, int *n,
                                   int y8, int x8, const int ref[2],
                                   int *gmv_ctx, const MvPair tgmv[2]) {
    const int64_t off = (int64_t)y8 * t->rf_stride8 + x8;
    const int my = t->proj_mv[off * 2 + 0], mx = t->proj_mv[off * 2 + 1];
    if (my == INVALID_MV && mx == INVALID_MV) return;
    const int rb_ref = t->proj_ref[off];
    MvPair p = mv_projection(my, mx, t->rf_pocdiff[ref[0] - 1], rb_ref);
    p = fix_mv_precision(t, p);
    if (ref[1] == -1) {
        if (gmv_ctx)
            *gmv_ctx = (abs(p.x - tgmv[0].x) | abs(p.y - tgmv[0].y)) >= 16;
        for (int m = 0; m < *n; m++) {
            if (stack[m].mv[0].y == p.y && stack[m].mv[0].x == p.x) {
                stack[m].weight += 2;
                return;
            }
        }
        if (*n < 8) {
            stack[*n].mv[0] = p;
            stack[*n].mv[1] = MvPair{0, 0};
            stack[*n].weight = 2;
            (*n)++;
        }
    } else {
        MvPair q = mv_projection(my, mx, t->rf_pocdiff[ref[1] - 1], rb_ref);
        q = fix_mv_precision(t, q);
        for (int m = 0; m < *n; m++) {
            if (stack[m].mv[0].y == p.y && stack[m].mv[0].x == p.x &&
                stack[m].mv[1].y == q.y && stack[m].mv[1].x == q.x) {
                stack[m].weight += 2;
                return;
            }
        }
        if (*n < 8) {
            stack[*n].mv[0] = p;
            stack[*n].mv[1] = q;
            stack[*n].weight = 2;
            (*n)++;
        }
    }
}

static void sort_range(Cand *stack, int lo, int hi) {
    int ln = hi;
    while (ln > lo) {
        int last = lo;
        for (int n = lo + 1; n < ln; n++) {
            if (stack[n - 1].weight < stack[n].weight) {
                Cand tmp = stack[n - 1];
                stack[n - 1] = stack[n];
                stack[n] = tmp;
                last = n;
            }
        }
        ln = last;
    }
}

// returns cnt via rfc->n, ctx via rfc->ctx; stack holds >=2 entries
static void refmvs_find(TileCtx *t, RefFindCtx *rfc, const int ref[2],
                        int bs, int edge_flags, int by4, int bx4) {
    const int32_t *bd = bdim(t, bs);
    const int bw4 = bd[0], bh4 = bd[1];
    const int w4 = imin(imin(bw4, 16), t->rt_col_end - bx4);
    const int h4 = imin(imin(bh4, 16), t->rt_row_end - by4);

    MvPair gmv[2] = {{INVALID_MV, INVALID_MV}, {INVALID_MV, INVALID_MV}};
    MvPair tgmv[2] = {{0, 0}, {0, 0}};
    if (ref[0] > 0) {
        tgmv[0] = get_gmv_2d(t, ref[0] - 1, bx4, by4, bw4, bh4);
        if (t->gmv_type[ref[0] - 1] > WM_TRANSLATION) gmv[0] = tgmv[0];
    }
    if (ref[1] > 0) {
        tgmv[1] = get_gmv_2d(t, ref[1] - 1, bx4, by4, bw4, bh4);
        if (t->gmv_type[ref[1] - 1] > WM_TRANSLATION) gmv[1] = tgmv[1];
    }

    Cand *stack = rfc->stack;
    int n = 0;
    int have_newmv_row = 0, have_refmv_row = 0;
    int have_newmv_col = 0, have_refmv_col = 0;
    int max_rows = 0, max_cols = 0;
    int n_rows = -1, n_cols = -1;    // -1 = scan not run
    if (by4 > t->rt_row_start) {
        max_rows = imin((by4 - t->rt_row_start + 1) >> 1, 2 + (bh4 > 1));
        n_rows = scan_row(t, stack, &n, ref, gmv, by4 - 1, bx4, bw4, w4,
                          max_rows, bw4 >= 16 ? 4 : 1, &have_newmv_row,
                          &have_refmv_row);
    }
    if (bx4 > t->rt_col_start) {
        max_cols = imin((bx4 - t->rt_col_start + 1) >> 1, 2 + (bw4 > 1));
        n_cols = scan_col(t, stack, &n, ref, gmv, by4, bx4 - 1, bh4, h4,
                          max_cols, bh4 >= 16 ? 4 : 1, &have_newmv_col,
                          &have_refmv_col);
    }
    if (n_rows != -1 && (edge_flags & EDGE_I444_TOP_HAS_RIGHT) &&
        imax(bw4, bh4) <= 16 && bw4 + bx4 < t->rt_col_end) {
        add_spatial_candidate(t, stack, &n, 4, by4 - 1, bx4 + bw4, ref,
                              gmv, &have_newmv_row, &have_refmv_row);
    }

    const int have_newmv = have_newmv_row | have_newmv_col;
    const int nearest_match = have_refmv_col + have_refmv_row;
    const int nearest_cnt = n;
    for (int m = 0; m < n; m++) stack[m].weight += 640;

    // temporal
    int globalmv_ctx = t->use_ref_frame_mvs_hdr;
    if (t->rf_use_ref_frame_mvs) {
        const int by8 = by4 >> 1, bx8 = bx4 >> 1;
        const int step_h = bw4 >= 16 ? 2 : 1;
        const int step_v = bh4 >= 16 ? 2 : 1;
        const int w8 = imin((w4 + 1) >> 1, 8);
        const int h8 = imin((h4 + 1) >> 1, 8);
        for (int y = 0; y < h8; y += step_v)
            for (int x = 0; x < w8; x += step_h)
                add_temporal_candidate(t, stack, &n, by8 + y, bx8 + x, ref,
                                       (x | y) ? nullptr : &globalmv_ctx,
                                       tgmv);
        if (imin(bw4, bh4) >= 2 && imax(bw4, bh4) < 16) {
            const int bh8 = bh4 >> 1, bw8 = bw4 >> 1;
            const int has_bottom =
                by8 + bh8 < imin(t->rt_row_end >> 1, (by8 & ~7) + 8);
            if (has_bottom &&
                bx8 - 1 >= imax(t->rt_col_start >> 1, bx8 & ~7))
                add_temporal_candidate(t, stack, &n, by8 + bh8, bx8 - 1,
                                       ref, nullptr, tgmv);
            if (bx8 + bw8 < imin(t->rt_col_end >> 1, (bx8 & ~7) + 8)) {
                if (has_bottom)
                    add_temporal_candidate(t, stack, &n, by8 + bh8,
                                           bx8 + bw8, ref, nullptr, tgmv);
                if (by8 + bh8 - 1 <
                    imin(t->rt_row_end >> 1, (by8 & ~7) + 8))
                    add_temporal_candidate(t, stack, &n, by8 + bh8 - 1,
                                           bx8 + bw8, ref, nullptr, tgmv);
            }
        }
    }

    // top/left corner (both scans must have run)
    if (n_rows != -1 && n_cols != -1) {
        int dummy_new = 0;
        add_spatial_candidate(t, stack, &n, 4, by4 - 1, bx4 - 1, ref, gmv,
                              &dummy_new, &have_refmv_row);
    }

    // secondary rows/cols
    for (int k = 2; k <= 3; k++) {
        if (n_rows != -1 && k > n_rows && k <= max_rows) {
            const int by_sec = (by4 - 2 * k + 1) | 1;
            int dummy_new = 0;
            n_rows += scan_row(t, stack, &n, ref, gmv, by_sec, bx4 | 1,
                               bw4, w4, 1 + max_rows - k,
                               bw4 >= 16 ? 4 : 2, &dummy_new,
                               &have_refmv_row);
        }
        if (n_cols != -1 && k > n_cols && k <= max_cols) {
            int dummy_new = 0;
            n_cols += scan_col(t, stack, &n, ref, gmv, by4 | 1,
                               (bx4 - k * 2 + 1) | 1, bh4, h4,
                               1 + max_cols - k, bh4 >= 16 ? 4 : 2,
                               &dummy_new, &have_refmv_col);
        }
    }

    const int ref_match_count = have_refmv_col + have_refmv_row;
    int refmv_ctx, newmv_ctx;
    if (nearest_match == 0) {
        refmv_ctx = imin(2, ref_match_count);
        newmv_ctx = ref_match_count > 0;
    } else if (nearest_match == 1) {
        refmv_ctx = imin(ref_match_count * 3, 4);
        newmv_ctx = 3 - have_newmv;
    } else {
        refmv_ctx = 5;
        newmv_ctx = 5 - have_newmv;
    }

    sort_range(stack, 0, nearest_cnt);
    sort_range(stack, nearest_cnt, n);

    const int left = -(bx4 + bw4 + 4) * 4 * 8;
    const int right = (t->rf_iw4 - bx4 + 4) * 4 * 8;
    const int top = -(by4 + bh4 + 4) * 4 * 8;
    const int bottom = (t->rf_ih4 - by4 + 4) * 4 * 8;

    if (ref[1] > 0) {
        if (n < 2) {
            const int sign0 = t->rf_sign_bias[ref[0] - 1];
            const int sign1 = t->rf_sign_bias[ref[1] - 1];
            const int sz4 = imin(w4, h4);
            MvPair same[2][2];
            int have_same[2][2] = {{0, 0}, {0, 0}};
            MvPair diff[2][2];
            int same_count[4] = {0, 0, 0, 0};

            auto add_ext = [&](int by_c, int bx_c) {
                const int32_t *bref = rref_at(t, by_c, bx_c);
                const int32_t *bmv = rmv_at(t, by_c, bx_c);
                for (int k = 0; k < 2; k++) {
                    const int cand_ref = bref[k];
                    if (cand_ref <= 0) break;
                    const int cy = bmv[k * 2 + 0], cx = bmv[k * 2 + 1];
                    if (cand_ref == ref[0]) {
                        if (same_count[0] < 2) {
                            same[same_count[0]][0] = MvPair{cy, cx};
                            have_same[same_count[0]][0] = 1;
                            same_count[0]++;
                        }
                        if (same_count[3] < 2) {
                            MvPair v = (sign1 ^
                                        t->rf_sign_bias[cand_ref - 1])
                                           ? MvPair{-cy, -cx}
                                           : MvPair{cy, cx};
                            diff[same_count[3]][1] = v;
                            same_count[3]++;
                        }
                    } else if (cand_ref == ref[1]) {
                        if (same_count[1] < 2) {
                            same[same_count[1]][1] = MvPair{cy, cx};
                            have_same[same_count[1]][1] = 1;
                            same_count[1]++;
                        }
                        if (same_count[2] < 2) {
                            MvPair v = (sign0 ^
                                        t->rf_sign_bias[cand_ref - 1])
                                           ? MvPair{-cy, -cx}
                                           : MvPair{cy, cx};
                            diff[same_count[2]][0] = v;
                            same_count[2]++;
                        }
                    } else {
                        if (same_count[2] < 2) {
                            diff[same_count[2]][0] =
                                (sign0 ^ t->rf_sign_bias[cand_ref - 1])
                                    ? MvPair{-cy, -cx}
                                    : MvPair{cy, cx};
                            same_count[2]++;
                        }
                        if (same_count[3] < 2) {
                            diff[same_count[3]][1] =
                                (sign1 ^ t->rf_sign_bias[cand_ref - 1])
                                    ? MvPair{-cy, -cx}
                                    : MvPair{cy, cx};
                            same_count[3]++;
                        }
                    }
                }
            };

            if (n_rows != -1) {
                int x = 0;
                while (x < sz4) {
                    const int bs_c = rbs_at(t, by4 - 1, bx4 + x);
                    add_ext(by4 - 1, bx4 + x);
                    x += bdim(t, bs_c)[0];
                }
            }
            if (n_cols != -1) {
                int y = 0;
                while (y < sz4) {
                    const int bs_c = rbs_at(t, by4 + y, bx4 - 1);
                    add_ext(by4 + y, bx4 - 1);
                    y += bdim(t, bs_c)[1];
                }
            }

            for (int k = 0; k < 2; k++) {
                int m = same_count[k];
                if (m >= 2) continue;
                const int l_ = same_count[2 + k];
                if (l_) {
                    same[m][k] = diff[0][k];
                    m++;
                    if (m == 2) continue;
                    if (l_ == 2) {
                        same[1][k] = diff[1][k];
                        continue;
                    }
                }
                while (m < 2) {
                    same[m][k] = tgmv[k];
                    m++;
                }
            }

            Cand ext0, ext1;
            ext0.mv[0] = same[0][0];
            ext0.mv[1] = same[0][1];
            ext0.weight = 2;
            ext1.mv[0] = same[1][0];
            ext1.mv[1] = same[1][1];
            ext1.weight = 2;
            if (n == 1) {
                if (stack[0].mv[0].y == ext0.mv[0].y &&
                    stack[0].mv[0].x == ext0.mv[0].x &&
                    stack[0].mv[1].y == ext0.mv[1].y &&
                    stack[0].mv[1].x == ext0.mv[1].x)
                    stack[n++] = ext1;
                else
                    stack[n++] = ext0;
            } else {
                stack[n++] = ext0;
                stack[n++] = ext1;
            }
            if (n > 2) n = 2;
        }

        for (int m = 0; m < n; m++) {
            stack[m].mv[0].y = iclip(stack[m].mv[0].y, top, bottom);
            stack[m].mv[0].x = iclip(stack[m].mv[0].x, left, right);
            stack[m].mv[1].y = iclip(stack[m].mv[1].y, top, bottom);
            stack[m].mv[1].x = iclip(stack[m].mv[1].x, left, right);
        }

        const int rc = refmv_ctx >> 1;
        int ctx;
        if (rc == 0)
            ctx = imin(newmv_ctx, 1);
        else if (rc == 1)
            ctx = 1 + imin(newmv_ctx, 3);
        else
            ctx = iclip(3 + newmv_ctx, 4, 7);
        rfc->n = n;
        rfc->ctx = ctx;
        return;
    }

    if (n < 2 && ref[0] > 0) {
        const int sign = t->rf_sign_bias[ref[0] - 1];
        const int sz4 = imin(w4, h4);

        auto add_single = [&](int by_c, int bx_c) {
            const int32_t *bref = rref_at(t, by_c, bx_c);
            const int32_t *bmv = rmv_at(t, by_c, bx_c);
            for (int k = 0; k < 2; k++) {
                const int cand_ref = bref[k];
                if (cand_ref <= 0) break;
                int cy = bmv[k * 2 + 0], cx = bmv[k * 2 + 1];
                if (sign ^ t->rf_sign_bias[cand_ref - 1]) {
                    cy = -cy;
                    cx = -cx;
                }
                int found = 0;
                for (int m = 0; m < n; m++) {
                    if (stack[m].mv[0].y == cy && stack[m].mv[0].x == cx) {
                        found = 1;
                        break;
                    }
                }
                if (!found) {
                    stack[n].mv[0] = MvPair{cy, cx};
                    stack[n].mv[1] = MvPair{0, 0};
                    stack[n].weight = 2;
                    n++;
                }
            }
        };

        if (n_rows != -1) {
            int x = 0;
            while (x < sz4 && n < 2) {
                const int bs_c = rbs_at(t, by4 - 1, bx4 + x);
                add_single(by4 - 1, bx4 + x);
                x += bdim(t, bs_c)[0];
            }
        }
        if (n_cols != -1) {
            int y = 0;
            while (y < sz4 && n < 2) {
                const int bs_c = rbs_at(t, by4 + y, bx4 - 1);
                add_single(by4 + y, bx4 - 1);
                y += bdim(t, bs_c)[1];
            }
        }
    }

    for (int m = 0; m < n; m++) {
        stack[m].mv[0].y = iclip(stack[m].mv[0].y, top, bottom);
        stack[m].mv[0].x = iclip(stack[m].mv[0].x, left, right);
    }

    const int cnt = n;
    while (n < 2) {
        stack[n].mv[0] = tgmv[0];
        stack[n].mv[1] = MvPair{0, 0};
        stack[n].weight = 2;
        n++;
    }
    rfc->n = cnt;
    rfc->ctx = (refmv_ctx << 4) | (globalmv_ctx << 3) | newmv_ctx;
}

static inline int get_drl_context(const Cand *stack, int idx) {
    if (stack[idx].weight >= 640) return stack[idx + 1].weight < 640;
    return stack[idx + 1].weight < 640 ? 2 : 0;
}

// ============================================================================
// warped motion (warpmv.py)
// ============================================================================

struct WarpParams {
    int valid;      // 1 when type == AFFINE
    int32_t mat[6];
    int alpha, beta, gamma, delta;
};

static inline int iclip_wmp(int64_t v) {
    const int cv = iclip((int)v, -32768, 32767);
    return apply_sign(((cv < 0 ? -cv : cv) + 32) >> 6, cv) * 64;
}

static void resolve_divisor_32(uint32_t d, int *div, int *shift) {
    const int sh = bitlen(d) - 1;
    const int e = d - (1u << sh);
    const int f = sh > 8 ? (e + (1 << (sh - 9))) >> (sh - 8)
                         : e << (8 - sh);
    *div = WARP_DIV_LUT[f];
    *shift = sh + 14;
}

// warpmv.py:60-78 get_shear_params; returns nonzero if invalid
static int get_shear_params(WarpParams *wm) {
    const int32_t *mat = wm->mat;
    if (mat[2] <= 0) return 1;
    wm->alpha = iclip_wmp(mat[2] - 0x10000);
    wm->beta = iclip_wmp(mat[3]);
    int div, shift;
    resolve_divisor_32((uint32_t)abs(mat[2]), &div, &shift);
    const int64_t y = apply_sign64(div, mat[2]);
    const int64_t v1 = ((int64_t)mat[4] * 0x10000) * y;
    const int64_t rnd = (1LL << shift) >> 1;
    wm->gamma = iclip_wmp(
        apply_sign64(((v1 < 0 ? -v1 : v1) + rnd) >> shift, v1));
    const int64_t v2 = ((int64_t)mat[3] * mat[4]) * y;
    wm->delta = iclip_wmp(
        mat[5] - apply_sign64(((v2 < 0 ? -v2 : v2) + rnd) >> shift, v2) -
        0x10000);
    return (4 * abs(wm->alpha) + 7 * abs(wm->beta) >= 0x10000) ||
           (4 * abs(wm->gamma) + 4 * abs(wm->delta) >= 0x10000);
}

static void resolve_divisor_64(uint64_t d, int64_t *div, int *shift) {
    const int sh = bitlen(d) - 1;
    const int64_t e = d - (1ULL << sh);
    const int64_t f = sh > 8 ? (e + (1LL << (sh - 9))) >> (sh - 8)
                             : e << (8 - sh);
    *div = WARP_DIV_LUT[f];
    *shift = sh + 14;
}

static inline int get_mult_shift_ndiag(int64_t px, int64_t idet, int shift) {
    const int64_t v1 = px * idet;
    const int64_t v2 =
        apply_sign64(((v1 < 0 ? -v1 : v1) + ((1LL << shift) >> 1)) >> shift,
                     v1);
    return iclip((int)v2, -0x1FFF, 0x1FFF);
}

static inline int get_mult_shift_diag(int64_t px, int64_t idet, int shift) {
    const int64_t v1 = px * idet;
    const int64_t v2 =
        apply_sign64(((v1 < 0 ? -v1 : v1) + ((1LL << shift) >> 1)) >> shift,
                     v1);
    return iclip((int)v2, 0xE001, 0x11FFF);
}

struct WarpPt { int in_x, in_y, out_x, out_y; };

// warpmv.py:117-199 find_affine_int; returns nonzero on failure
static int find_affine_int(const WarpPt *pts, int np_, int bw4, int bh4,
                           int mvy, int mvx, WarpParams *wm, int bx4,
                           int by4) {
    int32_t *mat = wm->mat;
    int64_t a[2][2] = {{0, 0}, {0, 0}};
    int64_t bxv[2] = {0, 0}, byv[2] = {0, 0};
    const int rsuy = 2 * bh4 - 1;
    const int rsux = 2 * bw4 - 1;
    const int suy = rsuy * 8, sux = rsux * 8;
    const int duy = suy + mvy, dux = sux + mvx;
    const int isuy = by4 * 4 + rsuy, isux = bx4 * 4 + rsux;

    for (int i = 0; i < np_; i++) {
        const int dx = pts[i].out_x - dux;
        const int dy = pts[i].out_y - duy;
        const int sx = pts[i].in_x - sux;
        const int sy = pts[i].in_y - suy;
        if (abs(sx - dx) < 256 && abs(sy - dy) < 256) {
            a[0][0] += ((sx * sx) >> 2) + sx * 2 + 8;
            a[0][1] += ((sx * sy) >> 2) + sx + sy + 4;
            a[1][1] += ((sy * sy) >> 2) + sy * 2 + 8;
            bxv[0] += ((sx * dx) >> 2) + sx + dx + 8;
            bxv[1] += ((sy * dx) >> 2) + sy + dx + 4;
            byv[0] += ((sx * dy) >> 2) + sx + dy + 4;
            byv[1] += ((sy * dy) >> 2) + sy + dy + 8;
        }
    }

    const int64_t det = a[0][0] * a[1][1] - a[0][1] * a[0][1];
    if (det == 0) return 1;
    int64_t idet;
    int shift;
    resolve_divisor_64((uint64_t)(det < 0 ? -det : det), &idet, &shift);
    idet = apply_sign64(idet, det);
    shift -= 16;
    if (shift < 0) {
        idet <<= -shift;
        shift = 0;
    }

    mat[2] = get_mult_shift_diag(a[1][1] * bxv[0] - a[0][1] * bxv[1], idet,
                                 shift);
    mat[3] = get_mult_shift_ndiag(a[0][0] * bxv[1] - a[0][1] * bxv[0], idet,
                                  shift);
    mat[4] = get_mult_shift_ndiag(a[1][1] * byv[0] - a[0][1] * byv[1], idet,
                                  shift);
    mat[5] = get_mult_shift_diag(a[0][0] * byv[1] - a[0][1] * byv[0], idet,
                                 shift);
    mat[0] = iclip((int)(mvx * 0x2000 -
                         ((int64_t)isux * (mat[2] - 0x10000) +
                          (int64_t)isuy * mat[3])),
                   -0x800000, 0x7FFFFF);
    mat[1] = iclip((int)(mvy * 0x2000 -
                         ((int64_t)isux * mat[4] +
                          (int64_t)isuy * (mat[5] - 0x10000))),
                   -0x800000, 0x7FFFFF);
    return 0;
}

// ============================================================================
// env.py context helpers
// ============================================================================

static inline int get_intra_ctx(const TileCtx *t, int by4, int bx4,
                                int have_top, int have_left) {
    if (have_left) {
        if (have_top) {
            const int ctx = t->l_intra[by4] + t->a_intra[bx4];
            return ctx + (ctx == 2);
        }
        return t->l_intra[by4] * 2;
    }
    return have_top ? t->a_intra[bx4] * 2 : 0;
}

static inline int gather_left_partition_prob(const uint16_t *cdf, int bl) {
    int out = (int)cdf[PARTITION_H - 1] - (int)cdf[PARTITION_H];
    out += (int)cdf[PARTITION_SPLIT - 1] - (int)cdf[PARTITION_T_LEFT_SPLIT];
    if (bl != BL_128X128)
        out += (int)cdf[PARTITION_H4 - 1] - (int)cdf[PARTITION_H4];
    return out;
}

static inline int gather_top_partition_prob(const uint16_t *cdf, int bl) {
    int out = (int)cdf[PARTITION_V - 1] - (int)cdf[PARTITION_T_TOP_SPLIT];
    out += (int)cdf[PARTITION_T_LEFT_SPLIT - 1];
    if (bl != BL_128X128)
        out += (int)cdf[PARTITION_V4 - 1] - (int)cdf[PARTITION_T_RIGHT_SPLIT];
    return out;
}

static inline int get_filter_ctx(const TileCtx *t, int comp, int dir,
                                 int ref, int by4, int bx4) {
    const uint8_t *af = dir ? t->a_filter1 : t->a_filter0;
    const uint8_t *lf = dir ? t->l_filter1 : t->l_filter0;
    const int a_f = (t->a_ref0[bx4] == ref || t->a_ref1[bx4] == ref)
                        ? af[bx4] : N_SWITCHABLE_FILTERS;
    const int l_f = (t->l_ref0[by4] == ref || t->l_ref1[by4] == ref)
                        ? lf[by4] : N_SWITCHABLE_FILTERS;
    if (a_f == l_f) return comp * 4 + a_f;
    if (a_f == N_SWITCHABLE_FILTERS) return comp * 4 + l_f;
    if (l_f == N_SWITCHABLE_FILTERS) return comp * 4 + a_f;
    return comp * 4 + N_SWITCHABLE_FILTERS;
}

static int get_comp_ctx(const TileCtx *t, int by4, int bx4, int have_top,
                        int have_left) {
    if (have_top) {
        if (have_left) {
            if (t->a_comp_type[bx4]) {
                if (t->l_comp_type[by4]) return 4;
                return 2 + (t->l_ref0[by4] >= 4 || t->l_ref0[by4] < 0);
            }
            if (t->l_comp_type[by4])
                return 2 + (t->a_ref0[bx4] >= 4 || t->a_ref0[bx4] < 0);
            return (t->l_ref0[by4] >= 4) ^ (t->a_ref0[bx4] >= 4);
        }
        return t->a_comp_type[bx4] ? 3 : (t->a_ref0[bx4] >= 4);
    }
    if (have_left) return t->l_comp_type[by4] ? 3 : (t->l_ref0[by4] >= 4);
    return 1;
}

static inline int has_uni_comp_a(const TileCtx *t, int off) {
    return (t->a_ref0[off] < 4) == (t->a_ref1[off] < 4);
}
static inline int has_uni_comp_l(const TileCtx *t, int off) {
    return (t->l_ref0[off] < 4) == (t->l_ref1[off] < 4);
}

static int get_comp_dir_ctx(const TileCtx *t, int by4, int bx4,
                            int have_top, int have_left) {
    if (have_top && have_left) {
        const int a_intra = t->a_intra[bx4], l_intra = t->l_intra[by4];
        if (a_intra && l_intra) return 2;
        if (a_intra || l_intra) {
            if (a_intra) {
                if (t->l_comp_type[by4] == COMP_INTER_NONE) return 2;
                return 1 + 2 * has_uni_comp_l(t, by4);
            }
            if (t->a_comp_type[bx4] == COMP_INTER_NONE) return 2;
            return 1 + 2 * has_uni_comp_a(t, bx4);
        }
        const int a_comp = t->a_comp_type[bx4] != COMP_INTER_NONE;
        const int l_comp = t->l_comp_type[by4] != COMP_INTER_NONE;
        const int a_ref0 = t->a_ref0[bx4], l_ref0 = t->l_ref0[by4];
        if (!a_comp && !l_comp) return 1 + 2 * ((a_ref0 >= 4) == (l_ref0 >= 4));
        if (!a_comp || !l_comp) {
            const int uni = a_comp ? has_uni_comp_a(t, bx4)
                                   : has_uni_comp_l(t, by4);
            if (!uni) return 1;
            return 3 + ((a_ref0 >= 4) == (l_ref0 >= 4));
        }
        const int a_uni = has_uni_comp_a(t, bx4);
        const int l_uni = has_uni_comp_l(t, by4);
        if (!a_uni && !l_uni) return 0;
        if (!a_uni || !l_uni) return 2;
        return 3 + ((a_ref0 == 4) == (l_ref0 == 4));
    }
    if (have_top || have_left) {
        if (have_left) {
            if (t->l_intra[by4]) return 2;
            if (t->l_comp_type[by4] == COMP_INTER_NONE) return 2;
            return 4 * has_uni_comp_l(t, by4);
        }
        if (t->a_intra[bx4]) return 2;
        if (t->a_comp_type[bx4] == COMP_INTER_NONE) return 2;
        return 4 * has_uni_comp_a(t, bx4);
    }
    return 2;
}

static inline int get_poc_diff(int ohb, int a, int b) {
    if (!ohb) return 0;
    const int bits = ohb;
    const int diff = a - b;
    const int m = 1 << (bits - 1);
    return (diff & (m - 1)) - (diff & m);
}

static int get_jnt_comp_ctx(const TileCtx *t, int ref0poc, int ref1poc,
                            int by4, int bx4) {
    const int d0 = abs(get_poc_diff(t->order_hint_n_bits, ref0poc,
                                    t->frame_offset));
    const int d1 = abs(get_poc_diff(t->order_hint_n_bits, t->frame_offset,
                                    ref1poc));
    const int offset = d0 == d1;
    const int a_ctx =
        t->a_comp_type[bx4] >= COMP_INTER_AVG || t->a_ref0[bx4] == 6;
    const int l_ctx =
        t->l_comp_type[by4] >= COMP_INTER_AVG || t->l_ref0[by4] == 6;
    return 3 * offset + a_ctx + l_ctx;
}

static int get_mask_comp_ctx(const TileCtx *t, int by4, int bx4) {
    const int a_ctx = t->a_comp_type[bx4] >= COMP_INTER_SEG
                          ? 1 : (t->a_ref0[bx4] == 6 ? 3 : 0);
    const int l_ctx = t->l_comp_type[by4] >= COMP_INTER_SEG
                          ? 1 : (t->l_ref0[by4] == 6 ? 3 : 0);
    return imin(a_ctx + l_ctx, 5);
}

// generic neighbour-ref counting (env.py _ref_cnts)
static int collect_refs(const TileCtx *t, int by4, int bx4, int have_top,
                        int have_left, int refs[4]) {
    int n = 0;
    if (have_top && !t->a_intra[bx4]) {
        refs[n++] = t->a_ref0[bx4];
        if (t->a_comp_type[bx4]) refs[n++] = t->a_ref1[bx4];
    }
    if (have_left && !t->l_intra[by4]) {
        refs[n++] = t->l_ref0[by4];
        if (t->l_comp_type[by4]) refs[n++] = t->l_ref1[by4];
    }
    return n;
}

#define REF_CTX_FN(name, ...)                                              \
    static int name(const TileCtx *t, int by4, int bx4, int have_top,      \
                    int have_left) {                                       \
        int refs[4];                                                       \
        const int nn = collect_refs(t, by4, bx4, have_top, have_left,      \
                                    refs);                                 \
        __VA_ARGS__                                                        \
    }

REF_CTX_FN(av1_get_ref_ctx, {
    int cnt[2] = {0, 0};
    for (int i = 0; i < nn; i++) cnt[refs[i] >= 4]++;
    return cnt[0] == cnt[1] ? 1 : (cnt[0] < cnt[1] ? 0 : 2);
})
REF_CTX_FN(av1_get_fwd_ref_ctx, {
    int cnt[4] = {0, 0, 0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] >= 0 && refs[i] < 4) cnt[refs[i]]++;
    const int c0 = cnt[0] + cnt[1], c2 = cnt[2] + cnt[3];
    return c0 == c2 ? 1 : (c0 < c2 ? 0 : 2);
})
REF_CTX_FN(av1_get_fwd_ref_1_ctx, {
    int cnt[2] = {0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] >= 0 && refs[i] < 2) cnt[refs[i]]++;
    return cnt[0] == cnt[1] ? 1 : (cnt[0] < cnt[1] ? 0 : 2);
})
REF_CTX_FN(av1_get_fwd_ref_2_ctx, {
    int cnt[2] = {0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] == 2 || refs[i] == 3) cnt[refs[i] - 2]++;
    return cnt[0] == cnt[1] ? 1 : (cnt[0] < cnt[1] ? 0 : 2);
})
REF_CTX_FN(av1_get_bwd_ref_ctx, {
    int cnt[3] = {0, 0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] >= 4) cnt[refs[i] - 4]++;
    const int c1 = cnt[1] + cnt[0];
    return cnt[2] == c1 ? 1 : (c1 < cnt[2] ? 0 : 2);
})
REF_CTX_FN(av1_get_bwd_ref_1_ctx, {
    int cnt[3] = {0, 0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] >= 4) cnt[refs[i] - 4]++;
    return cnt[0] == cnt[1] ? 1 : (cnt[0] < cnt[1] ? 0 : 2);
})
REF_CTX_FN(av1_get_uni_p1_ctx, {
    int cnt[3] = {0, 0, 0};
    for (int i = 0; i < nn; i++)
        if (refs[i] - 1 >= 0 && refs[i] - 1 < 3) cnt[refs[i] - 1]++;
    const int c1 = cnt[1] + cnt[2];
    return cnt[0] == c1 ? 1 : (cnt[0] < c1 ? 0 : 2);
})

// ============================================================================
// LR units (decode.py:303-398)
// ============================================================================

static void read_restoration_info(TileCtx *t, int p, int frame_type,
                                  int x64, int row) {
    Msac *s = &t->coef.msac;
    int32_t *ref = t->lr_ref[p];
    int32_t lr[12];
    memset(lr, 0, sizeof(lr));
    // layout: [0]=type [1..3]=fv [4..6]=fh [7..8]=w
    const int RESTORATION_WIENER = 2, RESTORATION_SGRPROJ = 3;
    if (frame_type == 1) {
        const int flt = msac_symbol_adapt(s, t->m.restore_switchable, 2);
        lr[0] = flt + (flt ? 1 : 0);
    } else {
        const int typ = msac_bool_adapt(
            s, frame_type == RESTORATION_WIENER ? t->m.restore_wiener
                                                : t->m.restore_sgrproj);
        lr[0] = typ ? frame_type : 0;
    }
    if (lr[0] == RESTORATION_WIENER) {
        lr[1] = p ? 0 : msac_subexp(s, ref[1] + 5, 16, 1) - 5;
        lr[2] = msac_subexp(s, ref[2] + 23, 32, 2) - 23;
        lr[3] = msac_subexp(s, ref[3] + 17, 64, 3) - 17;
        lr[4] = p ? 0 : msac_subexp(s, ref[4] + 5, 16, 1) - 5;
        lr[5] = msac_subexp(s, ref[5] + 23, 32, 2) - 23;
        lr[6] = msac_subexp(s, ref[6] + 17, 64, 3) - 17;
        lr[7] = ref[7];
        lr[8] = ref[8];
        memcpy(ref, lr, sizeof(lr));
    } else if (lr[0] == RESTORATION_SGRPROJ) {
        const int idx = msac_bools(s, 4);
        const int32_t *sp = t->sgr_params + idx * 2;
        lr[0] += idx;
        lr[7] = sp[0] ? msac_subexp(s, ref[7] + 96, 128, 4) - 96 : 0;
        lr[8] = sp[1] ? msac_subexp(s, ref[8] + 32, 128, 4) - 32 : 95;
        lr[1] = ref[1];
        lr[2] = ref[2];
        lr[3] = ref[3];
        lr[4] = ref[4];
        lr[5] = ref[5];
        lr[6] = ref[6];
        memcpy(ref, lr, sizeof(lr));
    }
    if (t->n_lr < t->max_lr) {
        int32_t *rec = t->out_lr + t->n_lr * LR_N_FIELDS;
        rec[LR_PLANE] = p;
        rec[LR_ROW] = row;
        rec[LR_X64] = x64;
        rec[LR_TYPE] = lr[0];
        rec[LR_FV0] = lr[1];
        rec[LR_FV1] = lr[2];
        rec[LR_FV2] = lr[3];
        rec[LR_FH0] = lr[4];
        rec[LR_FH1] = lr[5];
        rec[LR_FH2] = lr[6];
        rec[LR_W0] = lr[7];
        rec[LR_W1] = lr[8];
        t->n_lr++;
    } else {
        t->err = -3;
    }
}

static void read_lr_units(TileCtx *t) {
    for (int p = 0; p < 3; p++) {
        if (t->rst_type[p] == 0) continue;
        const int ss_ver = (p && t->layout == 1) ? 1 : 0;
        const int ss_hor = (p && t->layout != 3) ? 1 : 0;
        const int unit_size_log2 = t->rst_unit_size[p ? 1 : 0];
        const int y = (t->by * 4) >> ss_ver;
        const int h = (t->frame_h + ss_ver) >> ss_ver;
        const int unit_size = 1 << unit_size_log2;
        const int mask = unit_size - 1;
        if (y & mask) continue;
        const int half_unit = unit_size >> 1;
        if (y && y + half_unit > h) continue;
        const int row = t->by >> 4;
        if (t->frame_w0 != t->frame_w1) {
            const int w = (t->frame_w1 + ss_hor) >> ss_hor;
            const int n_units = imax(1, (w + half_unit) >> unit_size_log2);
            const int d = t->superres_denom;
            const int rnd = unit_size * 8 - 1;
            const int shift = unit_size_log2 + 3;
            const int x0 = ((4 * t->bx * d >> ss_hor) + rnd) >> shift;
            const int x1 =
                ((4 * (t->bx + t->sb_step) * d >> ss_hor) + rnd) >> shift;
            for (int x = x0; x < imin(x1, n_units); x++) {
                const int px_x = x << (unit_size_log2 + ss_hor);
                read_restoration_info(t, p, t->rst_type[p], px_x >> 6, row);
            }
        } else {
            const int x = (4 * t->bx) >> ss_hor;
            if (x & mask) continue;
            const int w = (t->frame_w0 + ss_hor) >> ss_hor;
            if (x && x + half_unit > w) continue;
            read_restoration_info(t, p, t->rst_type[p], t->bx >> 4, row);
        }
    }
}

// ============================================================================
// palette (decode.py:701-891)
// ============================================================================

static int read_pal_plane(TileCtx *t, int pl, int sz_ctx, int bx4, int by4,
                          int32_t *pal) {
    Msac *s = &t->coef.msac;
    const int bpc = 8 + 2 * t->hbd;
    const int pal_sz =
        msac_symbol_adapt(s, t->m.pal_sz + (pl * 7 + sz_ctx) * 8, 6) + 2;
    int cache[16];
    int n_cache = 0;
    int l_cache = pl ? t->pal_sz_uv[32 + by4] : t->l_pal_sz[by4];
    int a_cache = 0;
    if (by4 & 15)
        a_cache = pl ? t->pal_sz_uv[bx4 & 31] : t->a_pal_sz[bx4];
    const int32_t *lpal = t->al_pal + ((1 * 32 + by4) * 3 + pl) * 8;
    const int32_t *apal = t->al_pal + ((0 * 32 + (bx4 & 31)) * 3 + pl) * 8;
    int li = 0, ai = 0;
    while (l_cache && a_cache) {
        const int lv_ = lpal[li], av = apal[ai];
        if (lv_ < av) {
            if (!n_cache || cache[n_cache - 1] != lv_) cache[n_cache++] = lv_;
            li++;
            l_cache--;
        } else {
            if (av == lv_) {
                li++;
                l_cache--;
            }
            if (!n_cache || cache[n_cache - 1] != av) cache[n_cache++] = av;
            ai++;
            a_cache--;
        }
    }
    while (l_cache) {
        const int v = lpal[li];
        if (!n_cache || cache[n_cache - 1] != v) cache[n_cache++] = v;
        li++;
        l_cache--;
    }
    while (a_cache) {
        const int v = apal[ai];
        if (!n_cache || cache[n_cache - 1] != v) cache[n_cache++] = v;
        ai++;
        a_cache--;
    }
    int used_cache[8];
    int n_used = 0;
    for (int i = 0; i < n_cache; i++) {
        if (n_used >= pal_sz) break;
        if (msac_bool_equi(s)) used_cache[n_used++] = cache[i];
    }
    int i = n_used;
    if (i < pal_sz) {
        int newv[8];
        int n_new = 0;
        int prev = msac_bools(s, bpc);
        newv[n_new++] = prev;
        i++;
        if (i < pal_sz) {
            int bits = bpc - 3 + msac_bools(s, 2);
            const int mx = (1 << bpc) - 1;
            while (i < pal_sz) {
                const int delta = msac_bools(s, bits);
                prev = imin(prev + delta + (pl ? 0 : 1), mx);
                newv[n_new++] = prev;
                i++;
                if (prev + (pl ? 0 : 1) >= mx) {
                    while (i < pal_sz) {
                        newv[n_new++] = mx;
                        i++;
                    }
                    break;
                }
                const int room = mx - prev - (pl ? 0 : 1);
                bits = imin(bits, 1 + (room > 0 ? bitlen(room) - 1 : -1));
            }
        }
        // merge sorted cache + new entries
        int n = 0, mch = 0;
        for (int k = 0; k < pal_sz; k++) {
            if (n < n_used && (mch >= n_new || used_cache[n] <= newv[mch]))
                pal[k] = used_cache[n++];
            else
                pal[k] = newv[mch++];
        }
    } else {
        for (int k = 0; k < pal_sz; k++) pal[k] = used_cache[k];
    }
    return pal_sz;
}

static int read_pal_uv(TileCtx *t, int sz_ctx, int bx4, int by4,
                       int32_t *pal_u, int32_t *pal_v) {
    Msac *s = &t->coef.msac;
    const int pal_sz = read_pal_plane(t, 1, sz_ctx, bx4, by4, pal_u);
    const int bpc = 8 + 2 * t->hbd;
    if (msac_bool_equi(s)) {
        const int bits = bpc - 4 + msac_bools(s, 2);
        int prev = msac_bools(s, bpc);
        pal_v[0] = prev;
        const int mx = (1 << bpc) - 1;
        for (int i = 1; i < pal_sz; i++) {
            int delta = msac_bools(s, bits);
            if (delta && msac_bool_equi(s)) delta = -delta;
            prev = (prev + delta) & mx;
            pal_v[i] = prev;
        }
    } else {
        for (int i = 0; i < pal_sz; i++) pal_v[i] = msac_bools(s, bpc);
    }
    return pal_sz;
}

// decode.py:818-882 read_pal_indices with pal_idx_finish edge replication
static void read_pal_indices(TileCtx *t, int pal_sz, int pl, int w4, int h4,
                             int bw4, int bh4, uint8_t *m) {
    Msac *s = &t->coef.msac;
    const int stride = bw4 * 4;
    memset(m, 0, (size_t)bh4 * 4 * stride);
    m[0] = msac_uniform(s, pal_sz);
    uint16_t *cmap_cdf = t->m.color_map + ((pl * 7 + (pal_sz - 2)) * 5) * 8;
    const int W = w4 * 4, H = h4 * 4;
    for (int i = 1; i < 4 * (w4 + h4) - 1; i++) {
        const int first = imin(i, W - 1);
        const int last = imax(0, i - H + 1);
        for (int j = first; j >= last; j--) {
            const int y = i - j, x = j;
            const int have_left = x > 0, have_top = y > 0;
            int order[8];
            int n_ord = 0;
            unsigned mask = 0;
            int ctx;
#define ADDO(v)                          \
    do {                                 \
        order[n_ord++] = (v);            \
        mask |= 1u << (v);               \
    } while (0)
            if (!have_left) {
                ctx = 0;
                ADDO(m[(y - 1) * stride + x]);
            } else if (!have_top) {
                ctx = 0;
                ADDO(m[y * stride + x - 1]);
            } else {
                const int l_ = m[y * stride + x - 1];
                const int t_ = m[(y - 1) * stride + x];
                const int tl = m[(y - 1) * stride + x - 1];
                const int same_t_l = t_ == l_;
                const int same_t_tl = t_ == tl;
                const int same_l_tl = l_ == tl;
                if (same_t_l && same_t_tl && same_l_tl) {
                    ctx = 4;
                    ADDO(t_);
                } else if (same_t_l) {
                    ctx = 3;
                    ADDO(t_);
                    ADDO(tl);
                } else if (same_t_tl || same_l_tl) {
                    ctx = 2;
                    ADDO(tl);
                    ADDO(same_t_tl ? l_ : t_);
                } else {
                    ctx = 1;
                    ADDO(imin(t_, l_));
                    ADDO(imax(t_, l_));
                    ADDO(tl);
                }
            }
#undef ADDO
            for (int bit = 0; bit < 8; bit++)
                if (!(mask & (1u << bit))) order[n_ord++] = bit;
            const int color_idx =
                msac_symbol_adapt(s, cmap_cdf + ctx * 8, pal_sz - 1);
            m[y * stride + x] = (uint8_t)order[color_idx];
        }
    }
    if (W < stride)
        for (int y = 0; y < bh4 * 4; y++)
            for (int x = W; x < stride; x++)
                m[y * stride + x] = m[y * stride + W - 1];
    if (H < bh4 * 4)
        for (int y = H; y < bh4 * 4; y++)
            memcpy(m + y * stride, m + (H - 1) * stride, stride);
}

// ============================================================================
// segmentation / cdef / delta q-lf / loop-filter levels (decode.py:894-1036)
// ============================================================================

static inline int get_tx_ctx(const TileCtx *t, int by4, int bx4, int maxlw,
                             int maxlh) {
    return (t->l_tx_intra[by4] >= maxlh) + (t->a_tx_intra[bx4] >= maxlw);
}

static int prev_frame_segid(const TileCtx *t, int w4, int h4) {
    if (!t->prev_segmap) return 0;
    int mn = 255;
    for (int y = 0; y < h4; y++) {
        const uint8_t *row =
            t->prev_segmap + (int64_t)(t->by + y) * t->bw + t->bx;
        for (int x = 0; x < w4; x++)
            if (row[x] < mn) mn = row[x];
    }
    return mn;
}

static int get_cur_frame_segid(const TileCtx *t, int have_top, int have_left,
                               int *ctx) {
    const uint8_t *seg = t->b4_seg;
    const int bx = t->bx, by = t->by;
    const int64_t stride = t->bw;
    if (have_left && have_top) {
        const int l_ = seg[by * stride + bx - 1];
        const int a_ = seg[(by - 1) * stride + bx];
        const int al = seg[(by - 1) * stride + bx - 1];
        if (l_ == a_ && al == l_) *ctx = 2;
        else if (l_ == a_ || al == l_ || a_ == al) *ctx = 1;
        else *ctx = 0;
        return a_ == al ? a_ : l_;
    }
    *ctx = 0;
    if (have_left) return seg[by * stride + bx - 1];
    if (have_top) return seg[(by - 1) * stride + bx];
    return 0;
}

// env.py:168-180
static int neg_deinterleave(int diff, int ref, int mx) {
    if (!ref) return diff;
    if (ref >= mx - 1) return mx - diff - 1;
    if (2 * ref < mx) {
        if (diff <= 2 * ref)
            return (diff & 1) ? ref + ((diff + 1) >> 1) : ref - (diff >> 1);
        return diff;
    }
    if (diff <= 2 * (mx - ref - 1))
        return (diff & 1) ? ref + ((diff + 1) >> 1) : ref - (diff >> 1);
    return mx - (diff + 1);
}

static int read_seg_id(TileCtx *t, int bx4, int by4, int w4, int h4,
                       int have_top, int have_left, int skip,
                       int *seg_pred_out) {
    Msac *s = &t->coef.msac;
    *seg_pred_out = 0;
    if (!skip && t->seg_temporal) {
        const int spctx = t->a_seg_pred[bx4] + t->l_seg_pred[by4];
        const int seg_pred = msac_bool_adapt(s, t->m.seg_pred + spctx * 2);
        if (seg_pred) {
            *seg_pred_out = 1;
            return prev_frame_segid(t, w4, h4);
        }
    }
    int seg_ctx;
    const int pred_seg_id = get_cur_frame_segid(t, have_top, have_left,
                                                &seg_ctx);
    if (skip) return pred_seg_id;
    const int diff = msac_symbol_adapt(s, t->m.seg_id + seg_ctx * 8, 7);
    const int last_active = t->seg_last_active;
    int seg_id = neg_deinterleave(diff, pred_seg_id, last_active + 1);
    if (seg_id > last_active || seg_id >= 8) seg_id = 0;
    return seg_id;
}

static void read_cdef_idx(TileCtx *t, int bw4, int bh4) {
    int8_t *g = t->cdef_idx;
    const int y64 = t->by >> 4, x64 = t->bx >> 4;
    if (g[y64 * t->n64w + x64] != -1) return;
    const int v = msac_bools(&t->coef.msac, t->cdef_nbits);
    g[y64 * t->n64w + x64] = (int8_t)v;
    if (bw4 > 16 && x64 + 1 < t->n64w) g[y64 * t->n64w + x64 + 1] = (int8_t)v;
    if (bh4 > 16 && y64 + 1 < t->n64h) g[(y64 + 1) * t->n64w + x64] = (int8_t)v;
    if (bw4 == 32 && bh4 == 32 && y64 + 1 < t->n64h && x64 + 1 < t->n64w)
        g[(y64 + 1) * t->n64w + x64 + 1] = (int8_t)v;
}

// FrameContext._init_quant_tables (decode.py:147-164)
static void init_quant_tables(const TileCtx *t, int qidx, int32_t *dq) {
    const int n_seg = t->seg_enabled ? 8 : 1;
    const int32_t *tbl = t->dq_tbl + (int64_t)t->hbd * 256 * 2;
    for (int i = 0; i < n_seg; i++) {
        const int yac = t->seg_enabled
                            ? iclip_u8(qidx + t->seg_delta_q[i]) : qidx;
        const int ydc = iclip_u8(yac + t->ydc_delta);
        const int uac = iclip_u8(yac + t->uac_delta);
        const int udc = iclip_u8(yac + t->udc_delta);
        const int vac = iclip_u8(yac + t->vac_delta);
        const int vdc = iclip_u8(yac + t->vdc_delta);
        dq[(i * 3 + 0) * 2 + 0] = tbl[ydc * 2 + 0];
        dq[(i * 3 + 0) * 2 + 1] = tbl[yac * 2 + 1];
        dq[(i * 3 + 1) * 2 + 0] = tbl[udc * 2 + 0];
        dq[(i * 3 + 1) * 2 + 1] = tbl[uac * 2 + 1];
        dq[(i * 3 + 2) * 2 + 0] = tbl[vdc * 2 + 0];
        dq[(i * 3 + 2) * 2 + 1] = tbl[vac * 2 + 1];
    }
}

static void read_delta_q_lf(TileCtx *t, int bs, int skip) {
    Msac *s = &t->coef.msac;
    const int prev_qidx = t->last_qidx;
    const int max_bs = t->sb128 ? BS_128x128 : BS_64x64;
    const int have_delta_q = t->delta_q_present && (bs != max_bs || !skip);
    if (have_delta_q) {
        int delta_q = msac_symbol_adapt(s, t->m.delta_q, 3);
        if (delta_q == 3) {
            const int n_bits = 1 + msac_bools(s, 3);
            delta_q = msac_bools(s, n_bits) + 1 + (1 << n_bits);
        }
        if (delta_q) {
            if (msac_bool_equi(s)) delta_q = -delta_q;
            delta_q *= 1 << t->delta_q_res_log2;
        }
        t->last_qidx = iclip(t->last_qidx + delta_q, 1, 255);
        if (t->delta_lf_present) {
            const int n_lfs = t->delta_lf_multi
                                  ? (t->layout != 0 ? 4 : 2) : 1;
            for (int i = 0; i < n_lfs; i++) {
                int delta_lf = msac_symbol_adapt(
                    s, t->m.delta_lf + (i + t->delta_lf_multi) * 4, 3);
                if (delta_lf == 3) {
                    const int n_bits = 1 + msac_bools(s, 3);
                    delta_lf = msac_bools(s, n_bits) + 1 + (1 << n_bits);
                }
                if (delta_lf) {
                    if (msac_bool_equi(s)) delta_lf = -delta_lf;
                    delta_lf *= 1 << t->delta_lf_res_log2;
                }
                t->last_delta_lf[i] =
                    iclip(t->last_delta_lf[i] + delta_lf, -63, 63);
            }
        }
    }
    if (t->last_qidx == t->base_qidx) {
        t->coef.dq = (int32_t *)t->frame_dq;
    } else if (t->last_qidx != prev_qidx) {
        init_quant_tables(t, t->last_qidx, t->dq_scratch);
        t->coef.dq = t->dq_scratch;
    }
}

// decode.py:894-927 _calc_lf_lvl
static void calc_lf_lvl(const TileCtx *t, int32_t *B) {
    int r, m_;
    if (B[BF_INTRA]) {
        r = 0;
        m_ = 0;
    } else {
        const int is_gmv =
            B[BF_INTER_MODE] ==
            (B[BF_COMP_TYPE] ? GLOBALMV_GLOBALMV : GLOBALMV);
        r = B[BF_REF0] + 1;
        m_ = !is_gmv;
    }
    const int seg_id = B[BF_SEG_ID];
    const int base_lvls[4] = {t->lf_level_y[0], t->lf_level_y[1],
                              t->lf_level_u, t->lf_level_v};
    int32_t out[4];
    for (int i = 0; i < 4; i++) {
        const int base_lvl = base_lvls[i];
        if (i >= 2 && !base_lvl) {
            out[i] = 0;
            continue;
        }
        const int lfd = t->last_delta_lf[t->delta_lf_multi ? i : 0];
        const int seg_delta =
            t->seg_enabled ? t->seg_delta_lf[seg_id][i] : 0;
        const int base =
            iclip(iclip(base_lvl + lfd, 0, 63) + seg_delta, 0, 63);
        if (!t->lf_mode_ref_delta_enabled) {
            out[i] = base;
        } else {
            const int sh = base >= 32;
            const int delta =
                t->lf_ref_delta[r] + (r ? t->lf_mode_delta[m_] : 0);
            out[i] = iclip(base + delta * (1 << sh), 0, 63);
        }
    }
    B[BF_LF_HAS] = 1;
    B[BF_LF0] = out[0];
    B[BF_LF1] = out[1];
    B[BF_LF2] = out[2];
    B[BF_LF3] = out[3];
}

// ============================================================================
// mv residual (decode_inter.py:23-55)
// ============================================================================

static int read_mv_component_diff(TileCtx *t, int ci, int mv_prec) {
    Msac *s = &t->coef.msac;
    const int sign = msac_bool_adapt(s, t->m.mv_sign[ci]);
    const int cl = msac_symbol_adapt(s, t->m.mv_classes[ci], 10);
    int fp = 3, hp = 1, up;
    if (!cl) {
        up = msac_bool_adapt(s, t->m.mv_class0[ci]);
        if (mv_prec >= 0) {
            fp = msac_symbol_adapt(s, t->m.mv_class0_fp[ci] + up * 4, 3);
            if (mv_prec > 0) hp = msac_bool_adapt(s, t->m.mv_class0_hp[ci]);
        }
    } else {
        up = 1 << cl;
        for (int n = 0; n < cl; n++)
            up |= msac_bool_adapt(s, t->m.mv_classN[ci] + n * 2) << n;
        if (mv_prec >= 0) {
            fp = msac_symbol_adapt(s, t->m.mv_classN_fp[ci], 3);
            if (mv_prec > 0) hp = msac_bool_adapt(s, t->m.mv_classN_hp[ci]);
        }
    }
    const int diff = ((up << 3) | (fp << 1) | hp) + 1;
    return sign ? -diff : diff;
}

static MvPair read_mv_residual(TileCtx *t, MvPair mv, int mv_prec) {
    const int joint = msac_symbol_adapt(&t->coef.msac, t->m.mv_joint, 3);
    if (joint & MV_JOINT_V)
        mv.y = s16(mv.y + read_mv_component_diff(t, 0, mv_prec));
    if (joint & MV_JOINT_H)
        mv.x = s16(mv.x + read_mv_component_diff(t, 1, mv_prec));
    return mv;
}

// ============================================================================
// coefficient block emission (decode.py:1232-1318, decode_inter.py:734-866)
// ============================================================================

// decode one coef block at (x4, y4) plane coords, emit the record, return
// cf_ctx; *out_txtp receives the transform type.
static int emit_coef_block(TileCtx *t, const uint8_t *a, const uint8_t *l,
                           int tx, int bs, int intra, int plane, int ytxtp,
                           const int32_t *B, int x4, int y4,
                           int32_t *out_txtp) {
    const uint8_t *td = tdim(t, tx);
    const int cf_len = (td[0] < 8 ? td[0] : 8) * (td[1] < 8 ? td[1] : 8) * 16;
    if (t->n_coefs >= t->max_coefs || t->cf_used + cf_len > t->cf_cap) {
        t->err = -3;
        *out_txtp = 0;
        return 0x40;
    }
    int32_t txtp, eob;
    const int cf_ctx = coef_decode(
        &t->coef, a, l, tx, bs, intra, plane, ytxtp, B[BF_SEG_ID],
        B[BF_UV_MODE], B[BF_Y_MODE], B[BF_Y_ANGLE],
        t->cf_pool + t->cf_used, &txtp, &eob);
    int32_t *rec = t->out_coefs + t->n_coefs * CF_N_FIELDS;
    rec[CF_PLANE] = plane;
    rec[CF_X4] = x4;
    rec[CF_Y4] = y4;
    rec[CF_TX] = tx;
    rec[CF_TXTP] = txtp;
    rec[CF_EOB] = eob;
    rec[CF_OFF] = eob >= 0 ? (int32_t)t->cf_used : -1;
    t->n_coefs++;
    if (eob >= 0) t->cf_used += cf_len;
    *out_txtp = txtp;
    return cf_ctx;
}

// intra pass-1 coefficient order (decode.py:1232-1318)
static void read_coef_blocks_intra(TileCtx *t, int32_t *B, int bs, int bx4,
                                   int by4, int cbx4, int cby4, int bw4,
                                   int bh4, int w4, int h4, int has_chroma) {
    const int ss_ver = t->coef.ss_ver, ss_hor = t->coef.ss_hor;
    if (B[BF_SKIP]) {
        memset(t->a_lcoef + bx4, 0x40, bw4);
        memset(t->l_lcoef + by4, 0x40, bh4);
        if (has_chroma) {
            const int cbw4 = (bw4 + ss_hor) >> ss_hor;
            const int cbh4 = (bh4 + ss_ver) >> ss_ver;
            memset(t->a_ccoef0 + cbx4, 0x40, cbw4);
            memset(t->a_ccoef1 + cbx4, 0x40, cbw4);
            memset(t->l_ccoef0 + cby4, 0x40, cbh4);
            memset(t->l_ccoef1 + cby4, 0x40, cbh4);
        }
        return;
    }
    const int cw4 = (w4 + ss_hor) >> ss_hor;
    const int ch4 = (h4 + ss_ver) >> ss_ver;
    const int tx = B[BF_TX], uvtx = B[BF_UVTX];
    const uint8_t *td = tdim(t, tx);
    const uint8_t *utd = tdim(t, uvtx);
    const int tw = td[0], th = td[1];
    const int utw = utd[0], uth = utd[1];
    const int bx_outer = t->bx, by_outer = t->by;

    for (int init_y = 0; init_y < h4; init_y += 16) {
        const int sub_h4 = imin(h4, 16 + init_y);
        for (int init_x = 0; init_x < w4; init_x += 16) {
            const int sub_w4 = imin(w4, init_x + 16);
            int y = init_y;
            int cur_by = by_outer + init_y;
            while (y < sub_h4) {
                int x = init_x;
                int cur_bx = bx_outer + init_x;
                while (x < sub_w4) {
                    int32_t txtp;
                    const int cf_ctx = emit_coef_block(
                        t, t->a_lcoef + bx4 + x, t->l_lcoef + by4 + y, tx,
                        bs, 1, 0, DCT_DCT, B, cur_bx, cur_by, &txtp);
                    const int nw = imin(tw, t->bw - cur_bx);
                    const int nh = imin(th, t->bh - cur_by);
                    memset(t->a_lcoef + bx4 + x, cf_ctx, nw);
                    memset(t->l_lcoef + by4 + y, cf_ctx, nh);
                    x += tw;
                    cur_bx += tw;
                }
                y += th;
                cur_by += th;
            }
            if (!has_chroma) continue;
            const int sub_ch4 = imin(ch4, (init_y + 16) >> ss_ver);
            const int sub_cw4 = imin(cw4, (init_x + 16) >> ss_hor);
            for (int pl = 0; pl < 2; pl++) {
                uint8_t *ac = pl ? t->a_ccoef1 : t->a_ccoef0;
                uint8_t *lc = pl ? t->l_ccoef1 : t->l_ccoef0;
                int cy = init_y >> ss_ver;
                cur_by = by_outer + init_y;
                while (cy < sub_ch4) {
                    int cx = init_x >> ss_hor;
                    int cur_bx2 = bx_outer + init_x;
                    while (cx < sub_cw4) {
                        int32_t txtp;
                        const int cf_ctx = emit_coef_block(
                            t, ac + cbx4 + cx, lc + cby4 + cy, uvtx, bs, 1,
                            1 + pl, DCT_DCT, B, cur_bx2 >> ss_hor,
                            cur_by >> ss_ver, &txtp);
                        const int ctw =
                            imin(utw, (t->bw - cur_bx2 + ss_hor) >> ss_hor);
                        const int cth =
                            imin(uth, (t->bh - cur_by + ss_ver) >> ss_ver);
                        memset(ac + cbx4 + cx, cf_ctx, ctw);
                        memset(lc + cby4 + cy, cf_ctx, cth);
                        cx += utw;
                        cur_bx2 += utw << ss_hor;
                    }
                    cy += uth;
                    cur_by += uth << ss_ver;
                }
            }
        }
    }
}

// ============================================================================
// vartx tree (decode_inter.py:58-138) + inter coef tree (:734-866)
// ============================================================================

static void read_tx_tree(TileCtx *t, int bx, int by, int from_tx, int depth,
                         int32_t *masks, int x_off, int y_off) {
    const int bx4 = bx, by4 = by & 31;
    const uint8_t *td = tdim(t, from_tx);
    const int txw = td[2], txh = td[3];
    int is_split = 0;
    if (depth < 2 && from_tx > TX_4X4) {
        const int cat = 2 * (TX_64X64 - td[5]) - depth;
        const int a_ = t->a_tx[bx4] < txw;
        const int l_ = t->l_tx[by4] < txh;
        is_split = msac_bool_adapt(&t->coef.msac,
                                   t->m.txpart + (cat * 3 + a_ + l_) * 2);
        if (is_split) masks[depth] |= 1 << (y_off * 4 + x_off);
    }
    if (is_split && td[5] > 1 /*TX_8X8*/) {
        const int sub = td[6];
        const uint8_t *std_ = tdim(t, sub);
        const int txsw = std_[0], txsh = std_[1];
        read_tx_tree(t, bx, by, sub, depth + 1, masks, x_off * 2, y_off * 2);
        if (txw >= txh && bx + txsw < t->bw)
            read_tx_tree(t, bx + txsw, by, sub, depth + 1, masks,
                         x_off * 2 + 1, y_off * 2);
        if (txh >= txw && by + txsh < t->bh) {
            read_tx_tree(t, bx, by + txsh, sub, depth + 1, masks,
                         x_off * 2, y_off * 2 + 1);
            if (txw >= txh && bx + txsw < t->bw)
                read_tx_tree(t, bx + txsw, by + txsh, sub, depth + 1, masks,
                             x_off * 2 + 1, y_off * 2 + 1);
        }
    } else {
        const int n_w = 1 << txw, n_h = 1 << txh;
        memset(t->a_tx + bx4, is_split ? TX_4X4 : txw, n_w);
        memset(t->l_tx + by4, is_split ? TX_4X4 : txh, n_h);
    }
}

static void read_vartx_tree(TileCtx *t, int32_t *B, int bs, int bx4,
                            int by4) {
    const int32_t *bd = bdim(t, bs);
    const int bw4 = bd[0], bh4 = bd[1];
    int32_t tx_split[2] = {0, 0};
    int max_ytx = t->max_txfm_size_for_bs[bs * 4 + 0];
    const int seg_id = B[BF_SEG_ID];
    if (!B[BF_SKIP] &&
        (t->coef.seg_lossless[seg_id] || max_ytx == TX_4X4)) {
        max_ytx = TX_4X4;
        B[BF_UVTX] = TX_4X4;
        if (t->txfm_mode == TXFM_MODE_SWITCHABLE) {
            memset(t->a_tx + bx4, TX_4X4, bw4);
            memset(t->l_tx + by4, TX_4X4, bh4);
        }
    } else if (t->txfm_mode != TXFM_MODE_SWITCHABLE || B[BF_SKIP]) {
        if (t->txfm_mode == TXFM_MODE_SWITCHABLE) {
            memset(t->a_tx + bx4, (int)bd[2], bw4);
            memset(t->l_tx + by4, (int)bd[3], bh4);
        }
        B[BF_UVTX] = t->max_txfm_size_for_bs[bs * 4 + t->layout];
    } else {
        const uint8_t *ytd = tdim(t, max_ytx);
        const int ytw = ytd[0], yth = ytd[1];
        int y_off = 0;
        for (int y = 0; y < bh4; y += yth, y_off++) {
            int x_off = 0;
            for (int x = 0; x < bw4; x += ytw, x_off++)
                read_tx_tree(t, t->bx + x, t->by + y, max_ytx, 0, tx_split,
                             x_off, y_off);
        }
        B[BF_UVTX] = t->max_txfm_size_for_bs[bs * 4 + t->layout];
    }
    B[BF_MAX_YTX] = max_ytx;
    B[BF_TX_SPLIT0] = tx_split[0];
    B[BF_TX_SPLIT1] = tx_split[1];
}

static void read_coef_tree(TileCtx *t, int32_t *B, int bs, int bx, int by,
                           int ytx, int depth, int x_off, int y_off) {
    const uint8_t *td = tdim(t, ytx);
    const int txw = td[0], txh = td[1];
    const int32_t tx_split[2] = {B[BF_TX_SPLIT0], B[BF_TX_SPLIT1]};
    if (depth < 2 && tx_split[depth] &&
        (tx_split[depth] & (1 << (y_off * 4 + x_off)))) {
        const int sub = td[6];
        const uint8_t *std_ = tdim(t, sub);
        const int txsw = std_[0], txsh = std_[1];
        read_coef_tree(t, B, bs, bx, by, sub, depth + 1, x_off * 2,
                       y_off * 2);
        if (txw >= txh && bx + txsw < t->bw)
            read_coef_tree(t, B, bs, bx + txsw, by, sub, depth + 1,
                           x_off * 2 + 1, y_off * 2);
        if (txh >= txw && by + txsh < t->bh) {
            read_coef_tree(t, B, bs, bx, by + txsh, sub, depth + 1,
                           x_off * 2, y_off * 2 + 1);
            if (txw >= txh && bx + txsw < t->bw)
                read_coef_tree(t, B, bs, bx + txsw, by + txsh, sub,
                               depth + 1, x_off * 2 + 1, y_off * 2 + 1);
        }
    } else {
        const int bx4 = bx, by4 = by & 31;
        int32_t txtp;
        const int cf_ctx = emit_coef_block(
            t, t->a_lcoef + bx4, t->l_lcoef + by4, ytx, bs, 0, 0, DCT_DCT,
            B, bx, by, &txtp);
        const int nw = imin(txw, t->bw - bx);
        const int nh = imin(txh, t->bh - by);
        memset(t->a_lcoef + bx4, cf_ctx, nw);
        memset(t->l_lcoef + by4, cf_ctx, nh);
        for (int yy = 0; yy < txh && (by & 31) + yy < 32; yy++)
            memset(t->txtp_map + ((by & 31) + yy) * t->aw + bx, txtp, txw);
    }
}

// inter/intrabc coefficient order (decode_inter.py:780-866)
static void read_coef_blocks_inter(TileCtx *t, int32_t *B, int bs, int bx4,
                                   int by4, int bw4, int bh4, int w4, int h4,
                                   int has_chroma) {
    const int ss_ver = t->coef.ss_ver, ss_hor = t->coef.ss_hor;
    const int cbx4 = bx4 >> ss_hor;
    const int cby4 = (by4 & 31) >> ss_ver;
    if (B[BF_SKIP]) {
        memset(t->a_lcoef + bx4, 0x40, bw4);
        memset(t->l_lcoef + by4, 0x40, bh4);
        if (has_chroma) {
            const int cbw4 = (bw4 + ss_hor) >> ss_hor;
            const int cbh4 = (bh4 + ss_ver) >> ss_ver;
            memset(t->a_ccoef0 + cbx4, 0x40, cbw4);
            memset(t->a_ccoef1 + cbx4, 0x40, cbw4);
            memset(t->l_ccoef0 + cby4, 0x40, cbh4);
            memset(t->l_ccoef1 + cby4, 0x40, cbh4);
        }
        return;
    }
    const int cw4 = (w4 + ss_hor) >> ss_hor;
    const int ch4 = (h4 + ss_ver) >> ss_ver;
    const int uvtx = B[BF_UVTX];
    const uint8_t *utd = tdim(t, uvtx);
    const int utw = utd[0], uth = utd[1];
    const uint8_t *mtd = tdim(t, B[BF_MAX_YTX]);
    const int mtw = mtd[0], mth = mtd[1];
    const int bx_outer = t->bx, by_outer = t->by;

    for (int init_y = 0; init_y < h4; init_y += 16) {
        const int sub_h4 = imin(h4, 16 + init_y);
        for (int init_x = 0; init_x < w4; init_x += 16) {
            const int sub_w4 = imin(w4, init_x + 16);
            int y_off = init_y ? 1 : 0;
            for (int y = init_y; y < sub_h4; y += mth, y_off++) {
                int x_off = init_x ? 1 : 0;
                for (int x = init_x; x < sub_w4; x += mtw, x_off++)
                    read_coef_tree(t, B, bs, bx_outer + x, by_outer + y,
                                   B[BF_MAX_YTX], 0, x_off, y_off);
            }
            if (!has_chroma) continue;
            const int sub_ch4 = imin(ch4, (init_y + 16) >> ss_ver);
            const int sub_cw4 = imin(cw4, (init_x + 16) >> ss_hor);
            for (int pl = 0; pl < 2; pl++) {
                uint8_t *ac = pl ? t->a_ccoef1 : t->a_ccoef0;
                uint8_t *lc = pl ? t->l_ccoef1 : t->l_ccoef0;
                int cy = init_y >> ss_ver;
                int cur_by = by_outer + init_y;
                while (cy < sub_ch4) {
                    int cx = init_x >> ss_hor;
                    int cur_bx = bx_outer + init_x;
                    while (cx < sub_cw4) {
                        const int ytxtp = t->txtp_map[
                            ((by_outer & 31) + (cy << ss_ver)) * t->aw +
                            bx_outer + (cx << ss_hor)];
                        int32_t txtp;
                        const int cf_ctx = emit_coef_block(
                            t, ac + cbx4 + cx, lc + cby4 + cy, uvtx, bs, 0,
                            1 + pl, ytxtp, B, cur_bx >> ss_hor,
                            cur_by >> ss_ver, &txtp);
                        const int ctw =
                            imin(utw, (t->bw - cur_bx + ss_hor) >> ss_hor);
                        const int cth =
                            imin(uth, (t->bh - cur_by + ss_ver) >> ss_ver);
                        memset(ac + cbx4 + cx, cf_ctx, ctw);
                        memset(lc + cby4 + cy, cf_ctx, cth);
                        cx += utw;
                        cur_bx += utw << ss_hor;
                    }
                    cy += uth;
                    cur_by += uth << ss_ver;
                }
            }
        }
    }
}

// ============================================================================
// block record emission helpers
// ============================================================================

static int32_t *new_block(TileCtx *t, int bl, int bs, int bp,
                          int edge_flags) {
    if (t->n_blocks >= t->max_blocks) {
        t->err = -3;
        t->n_blocks = t->max_blocks - 1;   // clobber last; err aborts anyway
    }
    int32_t *B = t->out_blocks + t->n_blocks * BF_N_FIELDS;
    memset(B, 0, sizeof(int32_t) * BF_N_FIELDS);
    B[BF_BX] = t->bx;
    B[BF_BY] = t->by;
    B[BF_BS] = bs;
    B[BF_BL] = bl;
    B[BF_BP] = bp;
    B[BF_INTRA] = 1;
    B[BF_EDGE_FLAGS] = edge_flags;
    B[BF_HAS_CHROMA] = 1;
    B[BF_REF0] = -1;
    B[BF_REF1] = -1;
    B[BF_COEF_START] = (int32_t)t->n_coefs;
    B[BF_PAL_IDX] = -1;
    B[BF_PALIDX_Y_OFF] = -1;
    B[BF_PALIDX_UV_OFF] = -1;
    return B;
}

static void fill_plan_grids(TileCtx *t, const int32_t *B, int w4, int h4,
                            int intra, int ymode, int uvmode) {
    const int64_t stride = t->bw;
    const int y0 = t->by, x0 = t->bx;
    for (int y = 0; y < h4; y++) {
        const int64_t off = (y0 + y) * stride + x0;
        memset(t->b4_bs + off, B[BF_BS], w4);
        memset(t->b4_intra + off, intra, w4);
        memset(t->b4_skip + off, B[BF_SKIP], w4);
        memset(t->b4_seg + off, B[BF_SEG_ID], w4);
        memset(t->b4_ymode + off, ymode, w4);
        memset(t->b4_uvmode + off, uvmode, w4);
    }
}

static void copy_pal_block(TileCtx *t, const int32_t pal[3][8], int bx4,
                           int by4, int bw4, int bh4, int uv) {
    const int ax = bx4 & 31;
    const int aend = imin(ax + bw4, 32);
    for (int pl = uv ? 1 : 0; pl <= (uv ? 2 : 0); pl++) {
        for (int i = ax; i < aend; i++)
            memcpy(t->al_pal + ((0 * 32 + i) * 3 + pl) * 8, pal[pl],
                   8 * sizeof(int32_t));
        for (int i = by4; i < by4 + bh4; i++)
            memcpy(t->al_pal + ((1 * 32 + i) * 3 + pl) * 8, pal[pl],
                   8 * sizeof(int32_t));
    }
}

// ============================================================================
// decode_b: intra branch (decode.py:1039-1229)
// ============================================================================

static void decode_b_intra(TileCtx *t, int32_t *B, int bl, int bs, int bp,
                           const int32_t *bd, int bx4, int by4, int cbx4,
                           int cby4, int bw4, int bh4, int w4, int h4,
                           int cbw4, int cbh4, int have_top, int have_left,
                           int has_chroma, int seg_pred) {
    Msac *s = &t->coef.msac;
    ModeCdfs *m = &t->m;
    const int seg_id = B[BF_SEG_ID];

    // smooth-neighbor flags (pre-ctx-update)
    const int a_sm = (t->a_intra[bx4] &&
                      t->a_mode[bx4] >= SMOOTH_PRED &&
                      t->a_mode[bx4] <= SMOOTH_H_PRED) ? 512 : 0;
    const int l_sm = (t->l_intra[by4] &&
                      t->l_mode[by4] >= SMOOTH_PRED &&
                      t->l_mode[by4] <= SMOOTH_H_PRED) ? 512 : 0;
    B[BF_SM_FL] = a_sm | l_sm;
    const int a_smu = (t->a_uvmode[cbx4] >= SMOOTH_PRED &&
                       t->a_uvmode[cbx4] <= SMOOTH_H_PRED) ? 512 : 0;
    const int l_smu = (t->l_uvmode[cby4] >= SMOOTH_PRED &&
                       t->l_uvmode[cby4] <= SMOOTH_H_PRED) ? 512 : 0;
    B[BF_SM_UV_FL] = a_smu | l_smu;

    uint16_t *ymode_cdf;
    if (!t->key_or_intra)
        ymode_cdf = m->y_mode + t->ymode_size_context[bs] * 16;
    else
        ymode_cdf = m->kfym +
                    ((int)t->intra_mode_context[t->a_mode[bx4]] * 5 +
                     (int)t->intra_mode_context[t->l_mode[by4]]) * 16;
    int y_mode = msac_symbol_adapt(s, ymode_cdf, N_INTRA_PRED_MODES - 1);
    B[BF_Y_MODE] = y_mode;

    int y_angle = 0;
    if (bd[2] + bd[3] >= 2 && y_mode >= VERT_PRED &&
        y_mode <= VERT_LEFT_PRED)
        y_angle = msac_symbol_adapt(
                      s, m->angle_delta + (y_mode - VERT_PRED) * 8, 6) - 3;
    B[BF_Y_ANGLE] = y_angle;

    int uv_mode = 0, uv_angle = 0;
    if (has_chroma) {
        const int lossless = t->coef.seg_lossless[seg_id];
        const int cfl_allowed =
            lossless ? (cbw4 == 1 && cbh4 == 1)
                     : ((CFL_ALLOWED_MASK >> bs) & 1);
        uv_mode = msac_symbol_adapt(
            s, m->uv_mode + (cfl_allowed * 13 + y_mode) * 16,
            13 - !cfl_allowed);
        B[BF_UV_MODE] = uv_mode;
        if (uv_mode == CFL_PRED) {
            const int sign = msac_symbol_adapt(s, m->cfl_sign, 7) + 1;
            const int sign_u = sign * 0x56 >> 8;
            const int sign_v = sign - sign_u * 3;
            int alpha_u = 0, alpha_v = 0;
            if (sign_u) {
                const int ctx = (sign_u == 2) * 3 + sign_v;
                alpha_u = msac_symbol_adapt(s, m->cfl_alpha + ctx * 16, 15)
                          + 1;
                if (sign_u == 1) alpha_u = -alpha_u;
            }
            if (sign_v) {
                const int ctx = (sign_v == 2) * 3 + sign_u;
                alpha_v = msac_symbol_adapt(s, m->cfl_alpha + ctx * 16, 15)
                          + 1;
                if (sign_v == 1) alpha_v = -alpha_v;
            }
            B[BF_CFL0] = alpha_u;
            B[BF_CFL1] = alpha_v;
        } else if (bd[2] + bd[3] >= 2 && uv_mode >= VERT_PRED &&
                   uv_mode <= VERT_LEFT_PRED) {
            uv_angle = msac_symbol_adapt(
                s, m->angle_delta + (uv_mode - VERT_PRED) * 8, 6) - 3;
        }
        B[BF_UV_ANGLE] = uv_angle;
    }

    // palette
    int pal_sz0 = 0, pal_sz1 = 0;
    int32_t pal[3][8];
    memset(pal, 0, sizeof(pal));
    if (t->allow_screen_content_tools && imax(bw4, bh4) <= 16 &&
        bw4 + bh4 >= 4) {
        const int sz_ctx = bd[2] + bd[3] - 2;
        if (y_mode == DC_PRED) {
            const int pal_ctx = (t->a_pal_sz[bx4] > 0) +
                                (t->l_pal_sz[by4] > 0);
            const int use_y_pal = msac_bool_adapt(
                s, m->pal_y + (sz_ctx * 3 + pal_ctx) * 2);
            if (use_y_pal)
                pal_sz0 = read_pal_plane(t, 0, sz_ctx, bx4, by4, pal[0]);
        }
        if (has_chroma && uv_mode == DC_PRED) {
            const int pal_ctx = pal_sz0 > 0;
            const int use_uv_pal =
                msac_bool_adapt(s, m->pal_uv + pal_ctx * 2);
            if (use_uv_pal)
                pal_sz1 = read_pal_uv(t, sz_ctx, bx4, by4, pal[1], pal[2]);
        }
        B[BF_PAL_SZ0] = pal_sz0;
        B[BF_PAL_SZ1] = pal_sz1;
    }

    if (y_mode == DC_PRED && !pal_sz0 && imax(bd[2], bd[3]) <= 3 &&
        t->seq_filter_intra) {
        const int is_filter =
            msac_bool_adapt(s, t->m.use_filter_intra + bs * 2);
        if (is_filter) {
            y_mode = FILTER_PRED;
            y_angle = msac_symbol_adapt(s, m->filter_intra, 4);
            B[BF_Y_MODE] = y_mode;
            B[BF_Y_ANGLE] = y_angle;
        }
    }

    if (pal_sz0 || pal_sz1) {
        if (t->pal_used >= t->pal_cap) {
            t->err = -3;
            return;
        }
        memcpy(t->pal_pool + t->pal_used * 24, pal, sizeof(pal));
        B[BF_PAL_IDX] = (int32_t)t->pal_used;
        t->pal_used++;
    }
    if (pal_sz0) {
        const int64_t need = (int64_t)bh4 * 4 * bw4 * 4;
        if (t->palidx_used + need > t->palidx_cap) {
            t->err = -3;
            return;
        }
        read_pal_indices(t, pal_sz0, 0, w4, h4, bw4, bh4,
                         t->palidx_pool + t->palidx_used);
        B[BF_PALIDX_Y_OFF] = (int32_t)t->palidx_used;
        t->palidx_used += need;
    }
    if (has_chroma && pal_sz1) {
        const int ss_v = t->coef.ss_ver, ss_h = t->coef.ss_hor;
        const int64_t need = (int64_t)cbh4 * 4 * cbw4 * 4;
        if (t->palidx_used + need > t->palidx_cap) {
            t->err = -3;
            return;
        }
        read_pal_indices(t, pal_sz1, 1, (w4 + ss_h) >> ss_h,
                         (h4 + ss_v) >> ss_v, cbw4, cbh4,
                         t->palidx_pool + t->palidx_used);
        B[BF_PALIDX_UV_OFF] = (int32_t)t->palidx_used;
        t->palidx_used += need;
    }

    // tx size
    const int lossless = t->coef.seg_lossless[seg_id];
    int tx, uvtx;
    if (lossless) {
        tx = uvtx = TX_4X4;
    } else {
        tx = t->max_txfm_size_for_bs[bs * 4 + 0];
        uvtx = t->max_txfm_size_for_bs[bs * 4 + t->layout];
        const uint8_t *td = tdim(t, tx);
        if (t->txfm_mode == TXFM_MODE_SWITCHABLE && td[5] > TX_4X4) {
            const int tctx = get_tx_ctx(t, by4, bx4, td[2], td[3]);
            uint16_t *tx_cdf = m->txsz + ((td[5] - 1) * 3 + tctx) * 4;
            int depth = msac_symbol_adapt(s, tx_cdf,
                                          imin(td[5], 2));
            while (depth--) {
                tx = td[6];
                td = tdim(t, tx);
            }
        }
    }
    B[BF_TX] = tx;
    B[BF_UVTX] = uvtx;

    read_coef_blocks_intra(t, B, bs, bx4, by4, cbx4, cby4, bw4, bh4, w4, h4,
                           has_chroma);
    if (t->err) return;

    // context updates (decode.py:1177-1218)
    const int y_mode_nofilt = y_mode == FILTER_PRED ? DC_PRED : y_mode;
    const uint8_t *tdf = tdim(t, tx);
    memset(t->a_tx_intra + bx4, tdf[2], bw4);
    memset(t->a_tx + bx4, tdf[2], bw4);
    memset(t->a_mode + bx4, y_mode_nofilt, bw4);
    memset(t->a_pal_sz + bx4, pal_sz0, bw4);
    memset(t->pal_sz_uv + (bx4 & 31), has_chroma ? pal_sz1 : 0,
           imin((bx4 & 31) + bw4, 32) - (bx4 & 31));
    memset(t->a_seg_pred + bx4, seg_pred, bw4);
    memset(t->a_skip_mode + bx4, 0, bw4);
    memset(t->a_intra + bx4, 1, bw4);
    memset(t->a_skip + bx4, B[BF_SKIP], bw4);
    memset(t->l_tx_intra + by4, tdf[3], bh4);
    memset(t->l_tx + by4, tdf[3], bh4);
    memset(t->l_mode + by4, y_mode_nofilt, bh4);
    memset(t->l_pal_sz + by4, pal_sz0, bh4);
    memset(t->pal_sz_uv + 32 + by4, has_chroma ? pal_sz1 : 0, bh4);
    memset(t->l_seg_pred + by4, seg_pred, bh4);
    if (pal_sz0) copy_pal_block(t, pal, bx4, by4, bw4, bh4, 0);
    if (pal_sz1) copy_pal_block(t, pal, bx4, by4, bw4, bh4, 1);
    memset(t->l_skip_mode + by4, 0, bh4);
    memset(t->l_intra + by4, 1, bh4);
    memset(t->l_skip + by4, B[BF_SKIP], bh4);
    if (!t->key_or_intra) {
        memset(t->a_comp_type + bx4, COMP_INTER_NONE, bw4);
        memset(t->a_ref0 + bx4, 0xFF, bw4);
        memset(t->a_ref1 + bx4, 0xFF, bw4);
        memset(t->a_filter0 + bx4, N_SWITCHABLE_FILTERS, bw4);
        memset(t->a_filter1 + bx4, N_SWITCHABLE_FILTERS, bw4);
        memset(t->l_comp_type + by4, COMP_INTER_NONE, bh4);
        memset(t->l_ref0 + by4, 0xFF, bh4);
        memset(t->l_ref1 + by4, 0xFF, bh4);
        memset(t->l_filter0 + by4, N_SWITCHABLE_FILTERS, bh4);
        memset(t->l_filter1 + by4, N_SWITCHABLE_FILTERS, bh4);
    }
    if (has_chroma) {
        memset(t->a_uvmode + cbx4, uv_mode, cbw4);
        memset(t->l_uvmode + cby4, uv_mode, cbh4);
    }

    fill_plan_grids(t, B, w4, h4, 1, y_mode, B[BF_UV_MODE]);
}

// ============================================================================
// decode_b: inter branch (decode_inter.py:141-731)
// ============================================================================

// decode.c:198-262 analog (decode_inter.py:141-212)
static void find_matching_ref(TileCtx *t, int intra_edge_flags, int bw4,
                              int bh4, int w4, int h4, int have_left,
                              int have_top, int ref, uint64_t masks[2]) {
    const int bx = t->bx, by = t->by;
    masks[0] = masks[1] = 0;
    int count = 0;
    int have_topleft = have_top && have_left;
    int have_topright = imax(bw4, bh4) < 32 && have_top &&
                        bx + bw4 < t->rt_col_end &&
                        (intra_edge_flags & EDGE_I444_TOP_HAS_RIGHT);

#define MATCHES(by_c, bx_c)                                                \
    (rref_at(t, by_c, bx_c)[0] == ref + 1 &&                               \
     rref_at(t, by_c, bx_c)[1] == -1)

    if (have_top) {
        if (MATCHES(by - 1, bx)) {
            masks[0] |= 1;
            count = 1;
        }
        int aw4 = bdim(t, rbs_at(t, by - 1, bx))[0];
        if (aw4 >= bw4) {
            const int off = bx & (aw4 - 1);
            if (off) have_topleft = 0;
            if (aw4 - off > bw4) have_topright = 0;
        } else {
            uint64_t mask = 1ULL << aw4;
            int x = aw4;
            while (x < w4) {
                if (MATCHES(by - 1, bx + x)) {
                    masks[0] |= mask;
                    count++;
                    if (count >= 8) return;
                }
                aw4 = bdim(t, rbs_at(t, by - 1, bx + x))[0];
                mask <<= aw4;
                x += aw4;
            }
        }
    }
    if (have_left) {
        if (MATCHES(by, bx - 1)) {
            masks[1] |= 1;
            count++;
            if (count >= 8) return;
        }
        int lh4 = bdim(t, rbs_at(t, by, bx - 1))[1];
        if (lh4 >= bh4) {
            if (by & (lh4 - 1)) have_topleft = 0;
        } else {
            uint64_t mask = 1ULL << lh4;
            int y = lh4;
            while (y < h4) {
                if (MATCHES(by + y, bx - 1)) {
                    masks[1] |= mask;
                    count++;
                    if (count >= 8) return;
                }
                lh4 = bdim(t, rbs_at(t, by + y, bx - 1))[1];
                mask <<= lh4;
                y += lh4;
            }
        }
    }
    if (have_topleft && MATCHES(by - 1, bx - 1)) {
        masks[1] |= 1ULL << 32;
        count++;
        if (count >= 8) return;
    }
    if (have_topright && MATCHES(by - 1, bx + bw4))
        masks[0] |= 1ULL << 32;
#undef MATCHES
}

// decode.c:265-330 analog (decode_inter.py:214-297)
static void derive_warpmv(TileCtx *t, int bw4, int bh4,
                          const uint64_t masks[2], int mvy, int mvx,
                          WarpParams *wm) {
    const int bx = t->bx, by = t->by;
    WarpPt pts[8];
    int np_ = 0;

#define ADD_SAMPLE(dx, dy, sx, sy, by_c, bx_c)                             \
    do {                                                                   \
        const int32_t *bd_ = bdim(t, rbs_at(t, by_c, bx_c));               \
        const int in_x = 16 * (2 * (dx) + (sx) * bd_[0]) - 8;              \
        const int in_y = 16 * (2 * (dy) + (sy) * bd_[1]) - 8;              \
        const int32_t *bmv_ = rmv_at(t, by_c, bx_c);                       \
        pts[np_].in_x = in_x;                                              \
        pts[np_].in_y = in_y;                                              \
        pts[np_].out_x = in_x + bmv_[1];                                   \
        pts[np_].out_y = in_y + bmv_[0];                                   \
        np_++;                                                             \
    } while (0)

    if ((masks[0] & 0xFFFFFFFFULL) == 1 && !(masks[1] >> 32)) {
        const int off = bx & (bdim(t, rbs_at(t, by - 1, bx))[0] - 1);
        ADD_SAMPLE(-off, 0, 1, -1, by - 1, bx);
    } else {
        uint64_t xmask = masks[0] & 0xFFFFFFFFULL;
        int off = 0;
        while (np_ < 8 && xmask) {
            const int tz = __builtin_ctzll(xmask);
            off += tz;
            xmask >>= tz;
            ADD_SAMPLE(off, 0, 1, -1, by - 1, bx + off);
            xmask &= ~1ULL;
        }
    }
    if (np_ < 8 && masks[1] == 1) {
        const int off = by & (bdim(t, rbs_at(t, by, bx - 1))[1] - 1);
        ADD_SAMPLE(0, -off, -1, 1, by - off, bx - 1);
    } else {
        uint64_t ymask = masks[1] & 0xFFFFFFFFULL;
        int off = 0;
        while (np_ < 8 && ymask) {
            const int tz = __builtin_ctzll(ymask);
            off += tz;
            ymask >>= tz;
            ADD_SAMPLE(0, off, -1, 1, by + off, bx - 1);
            ymask &= ~1ULL;
        }
    }
    if (np_ < 8 && (masks[1] >> 32))
        ADD_SAMPLE(0, 0, -1, -1, by - 1, bx - 1);
    if (np_ < 8 && (masks[0] >> 32))
        ADD_SAMPLE(bw4, 0, 1, -1, by - 1, bx + bw4);
#undef ADD_SAMPLE

    const int thresh = 4 * imax(4, imin(imax(bw4, bh4), 28));
    int mvd[8];
    int ret = 0;
    for (int i = 0; i < np_; i++) {
        const int d = abs(pts[i].out_x - pts[i].in_x - mvx) +
                      abs(pts[i].out_y - pts[i].in_y - mvy);
        if (d > thresh) {
            mvd[i] = -1;
        } else {
            mvd[i] = d;
            ret++;
        }
    }
    if (!ret) {
        ret = 1;
    } else {
        int i = 0, j = np_ - 1;
        for (int k = 0; k < np_ - ret; k++) {
            while (mvd[i] != -1) i++;
            while (mvd[j] == -1) j--;
            if (i > j) break;
            mvd[i] = mvd[j];
            pts[i] = pts[j];
            i++;
            j--;
        }
    }

    // defaults (WarpedMotionParams identity)
    wm->mat[0] = 0; wm->mat[1] = 0; wm->mat[2] = 0x10000;
    wm->mat[3] = 0; wm->mat[4] = 0; wm->mat[5] = 0x10000;
    wm->alpha = wm->beta = wm->gamma = wm->delta = 0;
    if (!find_affine_int(pts, ret, bw4, bh4, mvy, mvx, wm, bx, by) &&
        !get_shear_params(wm))
        wm->valid = 1;     // WM_AFFINE
    else
        wm->valid = 0;     // WM_IDENTITY
}

static void decode_b_inter(TileCtx *t, int32_t *B, int bl, int bs, int bp,
                           const int32_t *bd, int bx4, int by4, int cbx4,
                           int cby4, int bw4, int bh4, int w4, int h4,
                           int cbw4, int cbh4, int have_top, int have_left,
                           int has_chroma, int seg_set, int seg_pred,
                           int edge_flags) {
    Msac *s = &t->coef.msac;
    ModeCdfs *m = &t->m;
    const int seg_id = B[BF_SEG_ID];
    const int seg_free = !seg_set ||
                         (t->seg_ref[seg_id] == -1 &&
                          !t->seg_globalmv[seg_id] && !t->seg_skip[seg_id]);
    int has_subpel_filter = 0;
    int is_comp = 0;
    B[BF_INTRA] = 0;
    B[BF_MOTION_MODE] = MM_TRANSLATION;

    if (B[BF_SKIP_MODE]) {
        is_comp = 1;
    } else if (seg_free && t->switchable_comp_refs && imin(bw4, bh4) > 1) {
        const int ctx = get_comp_ctx(t, by4, bx4, have_top, have_left);
        is_comp = msac_bool_adapt(s, m->comp + ctx * 2);
    }

    RefFindCtx rfc;
    MvPair mv0{0, 0}, mv1{0, 0};
    int ref0 = 0, ref1 = -1;

    if (B[BF_SKIP_MODE]) {
        ref0 = t->skip_mode_refs[0];
        ref1 = t->skip_mode_refs[1];
        B[BF_COMP_TYPE] = COMP_INTER_AVG;
        B[BF_INTER_MODE] = NEARESTMV_NEARESTMV;
        int refpair[2] = {ref0 + 1, ref1 + 1};
        refmvs_find(t, &rfc, refpair, bs, edge_flags, t->by, t->bx);
        mv0 = fix_mv_precision(t, rfc.stack[0].mv[0]);
        mv1 = fix_mv_precision(t, rfc.stack[0].mv[1]);
    } else if (is_comp) {
        const int dir_ctx =
            get_comp_dir_ctx(t, by4, bx4, have_top, have_left);
        if (msac_bool_adapt(s, m->comp_dir + dir_ctx * 2)) {
            // bidir
            const int ctx1 =
                av1_get_fwd_ref_ctx(t, by4, bx4, have_top, have_left);
            if (msac_bool_adapt(s, m->comp_fwd_ref + (0 * 3 + ctx1) * 2)) {
                const int ctx2 = av1_get_fwd_ref_2_ctx(t, by4, bx4,
                                                       have_top, have_left);
                ref0 = 2 + msac_bool_adapt(
                               s, m->comp_fwd_ref + (2 * 3 + ctx2) * 2);
            } else {
                const int ctx2 = av1_get_fwd_ref_1_ctx(t, by4, bx4,
                                                       have_top, have_left);
                ref0 = msac_bool_adapt(s,
                                       m->comp_fwd_ref + (1 * 3 + ctx2) * 2);
            }
            const int ctx3 =
                av1_get_bwd_ref_ctx(t, by4, bx4, have_top, have_left);
            if (msac_bool_adapt(s, m->comp_bwd_ref + (0 * 3 + ctx3) * 2)) {
                ref1 = 6;
            } else {
                const int ctx4 = av1_get_bwd_ref_1_ctx(t, by4, bx4,
                                                       have_top, have_left);
                ref1 = 4 + msac_bool_adapt(
                               s, m->comp_bwd_ref + (1 * 3 + ctx4) * 2);
            }
        } else {
            // unidir
            const int uctx_p =
                av1_get_ref_ctx(t, by4, bx4, have_top, have_left);
            if (msac_bool_adapt(s, m->comp_uni_ref + (0 * 3 + uctx_p) * 2)) {
                ref0 = 4;
                ref1 = 6;
            } else {
                const int uctx_p1 =
                    av1_get_uni_p1_ctx(t, by4, bx4, have_top, have_left);
                ref0 = 0;
                ref1 = 1 + msac_bool_adapt(
                               s, m->comp_uni_ref + (1 * 3 + uctx_p1) * 2);
                if (ref1 == 2) {
                    const int uctx_p2 = av1_get_fwd_ref_2_ctx(
                        t, by4, bx4, have_top, have_left);
                    ref1 += msac_bool_adapt(
                        s, m->comp_uni_ref + (2 * 3 + uctx_p2) * 2);
                }
            }
        }
        int refpair[2] = {ref0 + 1, ref1 + 1};
        refmvs_find(t, &rfc, refpair, bs, edge_flags, t->by, t->bx);
        const int n_mvs = rfc.n;
        const int inter_mode = msac_symbol_adapt(
            s, m->comp_inter_mode + rfc.ctx * 8,
            N_COMP_INTER_PRED_MODES - 1);
        B[BF_INTER_MODE] = inter_mode;
        const uint8_t *im = t->comp_inter_pred_modes + inter_mode * 2;
        int drl_idx = 0;
        if (inter_mode == NEWMV_NEWMV) {
            if (n_mvs > 1) {
                const int drl1 = get_drl_context(rfc.stack, 0);
                drl_idx += msac_bool_adapt(s, m->drl_bit + drl1 * 2);
                if (drl_idx == 1 && n_mvs > 2) {
                    const int drl2 = get_drl_context(rfc.stack, 1);
                    drl_idx += msac_bool_adapt(s, m->drl_bit + drl2 * 2);
                }
            }
        } else if (im[0] == NEARMV || im[1] == NEARMV) {
            drl_idx = 1;
            if (n_mvs > 2) {
                const int drl2 = get_drl_context(rfc.stack, 1);
                drl_idx += msac_bool_adapt(s, m->drl_bit + drl2 * 2);
                if (drl_idx == 2 && n_mvs > 3) {
                    const int drl3 = get_drl_context(rfc.stack, 2);
                    drl_idx += msac_bool_adapt(s, m->drl_bit + drl3 * 2);
                }
            }
        }
        B[BF_DRL_IDX] = drl_idx;
        has_subpel_filter =
            imin(bw4, bh4) == 1 || inter_mode != GLOBALMV_GLOBALMV;
        MvPair mv_out[2];
        for (int idx = 0; idx < 2; idx++) {
            const int which = im[idx];
            const int refi = idx ? ref1 : ref0;
            if (which == NEARMV || which == NEARESTMV) {
                mv_out[idx] = fix_mv_precision(t, rfc.stack[drl_idx].mv[idx]);
            } else if (which == GLOBALMV) {
                has_subpel_filter |= t->gmv_type[refi] == WM_TRANSLATION;
                mv_out[idx] = get_gmv_2d(t, refi, t->bx, t->by, bw4, bh4);
            } else {   // NEWMV
                const int mv_prec = t->hp - t->force_integer_mv;
                mv_out[idx] = read_mv_residual(t, rfc.stack[drl_idx].mv[idx],
                                               mv_prec);
            }
        }
        mv0 = mv_out[0];
        mv1 = mv_out[1];

        // jnt vs seg/wedge
        int is_segwedge = 0;
        if (t->seq_masked_compound) {
            const int mask_ctx = get_mask_comp_ctx(t, by4, bx4);
            is_segwedge = msac_bool_adapt(s, m->mask_comp + mask_ctx * 2);
        }
        if (!is_segwedge) {
            if (t->seq_jnt_comp) {
                const int jnt_ctx = get_jnt_comp_ctx(
                    t, t->refpoc[ref0], t->refpoc[ref1], by4, bx4);
                B[BF_COMP_TYPE] =
                    COMP_INTER_WEIGHTED_AVG +
                    msac_bool_adapt(s, m->jnt_comp + jnt_ctx * 2);
            } else {
                B[BF_COMP_TYPE] = COMP_INTER_AVG;
            }
        } else {
            if ((WEDGE_ALLOWED_MASK >> bs) & 1) {
                const int wctx = t->wedge_ctx_lut[bs];
                B[BF_COMP_TYPE] =
                    COMP_INTER_WEDGE -
                    msac_bool_adapt(s, m->wedge_comp + wctx * 2);
                if (B[BF_COMP_TYPE] == COMP_INTER_WEDGE)
                    B[BF_WEDGE_IDX] =
                        msac_symbol_adapt(s, m->wedge_idx + wctx * 16, 15);
            } else {
                B[BF_COMP_TYPE] = COMP_INTER_SEG;
            }
            B[BF_MASK_SIGN] = msac_bool_equi(s);
        }
    } else {
        // single ref
        B[BF_COMP_TYPE] = COMP_INTER_NONE;
        if (seg_set && t->seg_ref[seg_id] > 0) {
            ref0 = t->seg_ref[seg_id] - 1;
        } else if (seg_set &&
                   (t->seg_globalmv[seg_id] || t->seg_skip[seg_id])) {
            ref0 = 0;
        } else {
            const int ctx1 =
                av1_get_ref_ctx(t, by4, bx4, have_top, have_left);
            if (msac_bool_adapt(s, m->ref + (0 * 3 + ctx1) * 2)) {
                const int ctx2 =
                    av1_get_bwd_ref_ctx(t, by4, bx4, have_top, have_left);
                if (msac_bool_adapt(s, m->ref + (1 * 3 + ctx2) * 2)) {
                    ref0 = 6;
                } else {
                    const int ctx3 = av1_get_bwd_ref_1_ctx(
                        t, by4, bx4, have_top, have_left);
                    ref0 = 4 + msac_bool_adapt(s, m->ref + (5 * 3 + ctx3) * 2);
                }
            } else {
                const int ctx2 =
                    av1_get_fwd_ref_ctx(t, by4, bx4, have_top, have_left);
                if (msac_bool_adapt(s, m->ref + (2 * 3 + ctx2) * 2)) {
                    const int ctx3 = av1_get_fwd_ref_2_ctx(
                        t, by4, bx4, have_top, have_left);
                    ref0 = 2 + msac_bool_adapt(s, m->ref + (4 * 3 + ctx3) * 2);
                } else {
                    const int ctx3 = av1_get_fwd_ref_1_ctx(
                        t, by4, bx4, have_top, have_left);
                    ref0 = msac_bool_adapt(s, m->ref + (3 * 3 + ctx3) * 2);
                }
            }
        }

        int refpair[2] = {ref0 + 1, -1};
        refmvs_find(t, &rfc, refpair, bs, edge_flags, t->by, t->bx);
        const int n_mvs = rfc.n;
        const int ctx = rfc.ctx;
        const int seg_force =
            seg_set && (t->seg_skip[seg_id] || t->seg_globalmv[seg_id]);

        if (seg_force || msac_bool_adapt(s, m->newmv_mode + (ctx & 7) * 2)) {
            if (seg_force ||
                !msac_bool_adapt(s, m->globalmv_mode + ((ctx >> 3) & 1) * 2)) {
                B[BF_INTER_MODE] = GLOBALMV;
                mv0 = get_gmv_2d(t, ref0, t->bx, t->by, bw4, bh4);
                has_subpel_filter = imin(bw4, bh4) == 1 ||
                                    t->gmv_type[ref0] == WM_TRANSLATION;
            } else {
                has_subpel_filter = 1;
                int drl_idx;
                if (msac_bool_adapt(s, m->refmv_mode + ((ctx >> 4) & 15) * 2)) {
                    B[BF_INTER_MODE] = NEARMV;
                    drl_idx = 1;
                    if (n_mvs > 2) {
                        const int drl2 = get_drl_context(rfc.stack, 1);
                        drl_idx += msac_bool_adapt(s, m->drl_bit + drl2 * 2);
                        if (drl_idx == 2 && n_mvs > 3) {
                            const int drl3 = get_drl_context(rfc.stack, 2);
                            drl_idx +=
                                msac_bool_adapt(s, m->drl_bit + drl3 * 2);
                        }
                    }
                } else {
                    B[BF_INTER_MODE] = NEARESTMV;
                    drl_idx = 0;
                }
                B[BF_DRL_IDX] = drl_idx;
                mv0 = rfc.stack[drl_idx].mv[0];
                if (drl_idx < 2) mv0 = fix_mv_precision(t, mv0);
            }
        } else {
            has_subpel_filter = 1;
            B[BF_INTER_MODE] = NEWMV;
            int drl_idx = 0;
            if (n_mvs > 1) {
                const int drl1 = get_drl_context(rfc.stack, 0);
                drl_idx += msac_bool_adapt(s, m->drl_bit + drl1 * 2);
                if (drl_idx == 1 && n_mvs > 2) {
                    const int drl2 = get_drl_context(rfc.stack, 1);
                    drl_idx += msac_bool_adapt(s, m->drl_bit + drl2 * 2);
                }
            }
            B[BF_DRL_IDX] = drl_idx;
            if (n_mvs > 1)
                mv0 = rfc.stack[drl_idx].mv[0];
            else
                mv0 = fix_mv_precision(t, rfc.stack[0].mv[0]);
            const int mv_prec = t->hp - t->force_integer_mv;
            mv0 = read_mv_residual(t, mv0, mv_prec);
        }

        // interintra
        const int ii_sz_grp = t->ymode_size_context[bs];
        if (t->seq_inter_intra && ((INTERINTRA_ALLOWED_MASK >> bs) & 1) &&
            msac_bool_adapt(s, m->interintra + ii_sz_grp * 2)) {
            B[BF_INTERINTRA_MODE] =
                msac_symbol_adapt(s, m->interintra_mode + ii_sz_grp * 4, 3);
            const int wctx = t->wedge_ctx_lut[bs];
            B[BF_INTERINTRA_TYPE] =
                INTER_INTRA_BLEND +
                msac_bool_adapt(s, m->interintra_wedge + wctx * 2);
            if (B[BF_INTERINTRA_TYPE] == INTER_INTRA_WEDGE)
                B[BF_WEDGE_IDX] =
                    msac_symbol_adapt(s, m->wedge_idx + wctx * 16, 15);
        } else {
            B[BF_INTERINTRA_TYPE] = INTER_INTRA_NONE;
        }

        // motion variation
        int oddzero = 0;
        if (have_left)
            for (int n = 0; n < (h4 >> 1) && !oddzero; n++)
                oddzero |= !t->l_intra[by4 + 1 + n * 2];
        if (!oddzero && have_top)
            for (int n = 0; n < (w4 >> 1) && !oddzero; n++)
                oddzero |= !t->a_intra[bx4 + 1 + n * 2];
        if (t->switchable_motion_mode &&
            B[BF_INTERINTRA_TYPE] == INTER_INTRA_NONE &&
            imin(bw4, bh4) >= 2 &&
            !(!t->force_integer_mv && B[BF_INTER_MODE] == GLOBALMV &&
              t->gmv_type[ref0] > WM_TRANSLATION) &&
            oddzero) {
            uint64_t masks[2];
            find_matching_ref(t, edge_flags, bw4, bh4, w4, h4, have_left,
                              have_top, ref0, masks);
            const int allow_warp =
                !t->svc_scale[ref0] && !t->force_integer_mv &&
                t->warp_motion && (masks[0] | masks[1]);
            int motion_mode;
            if (allow_warp)
                motion_mode =
                    msac_symbol_adapt(s, m->motion_mode + bs * 4, 2);
            else
                motion_mode = msac_bool_adapt(s, m->obmc + bs * 2);
            B[BF_MOTION_MODE] = motion_mode;
            if (motion_mode == MM_WARP) {
                has_subpel_filter = 0;
                WarpParams wm;
                derive_warpmv(t, bw4, bh4, masks, mv0.y, mv0.x, &wm);
                B[BF_WARP_VALID] = wm.valid;
                B[BF_WARP_TYPE] = wm.valid ? WM_AFFINE : WM_IDENTITY;
                B[BF_WMAT0] = wm.mat[0];
                B[BF_WMAT1] = wm.mat[1];
                B[BF_WMAT2] = wm.mat[2];
                B[BF_WMAT3] = wm.mat[3];
                B[BF_WMAT4] = wm.mat[4];
                B[BF_WMAT5] = wm.mat[5];
                B[BF_ALPHA] = wm.alpha;
                B[BF_BETA] = wm.beta;
                B[BF_GAMMA] = wm.gamma;
                B[BF_DELTA] = wm.delta;
            }
        } else {
            B[BF_MOTION_MODE] = MM_TRANSLATION;
        }
    }

    B[BF_REF0] = ref0;
    B[BF_REF1] = ref1;
    B[BF_MV00] = mv0.y;
    B[BF_MV01] = mv0.x;
    B[BF_MV10] = mv1.y;
    B[BF_MV11] = mv1.x;

    // subpel filter
    int f0, f1;
    if (t->subpel_filter_mode == FILTER_SWITCHABLE) {
        if (has_subpel_filter) {
            const int comp = B[BF_COMP_TYPE] != COMP_INTER_NONE;
            const int ctx1 = get_filter_ctx(t, comp, 0, ref0, by4, bx4);
            f0 = msac_symbol_adapt(s, m->filter + (0 * 8 + ctx1) * 4,
                                   N_SWITCHABLE_FILTERS - 1);
            if (t->dual_filter) {
                const int ctx2 = get_filter_ctx(t, comp, 1, ref0, by4, bx4);
                f1 = msac_symbol_adapt(s, m->filter + (1 * 8 + ctx2) * 4,
                                       N_SWITCHABLE_FILTERS - 1);
            } else {
                f1 = f0;
            }
        } else {
            f0 = f1 = 0;   // FILTER_REGULAR
        }
    } else {
        f0 = f1 = t->subpel_filter_mode;
    }
    B[BF_FILTER0] = f0;
    B[BF_FILTER1] = f1;
    B[BF_FILTER2D] = t->filter_2d[f1 * 4 + f0];

    read_vartx_tree(t, B, bs, bx4, by4);
    read_coef_blocks_inter(t, B, bs, bx4, by4, bw4, bh4, w4, h4, has_chroma);
    if (t->err) return;

    // refmvs splat
    if (is_comp) {
        const int mode = B[BF_INTER_MODE];
        const int mf = (mode == GLOBALMV_GLOBALMV) |
                       (((1 << mode) & 0xBC) ? 2 : 0);
        splat_mv(t, t->bx, t->by, bw4, bh4, mv0, mv1, ref0 + 1, ref1 + 1,
                 bs, mf);
    } else {
        const int mode = B[BF_INTER_MODE];
        const int mf = (mode == GLOBALMV && imin(bw4, bh4) >= 2) |
                       ((mode == NEWMV) ? 2 : 0);
        splat_mv(t, t->bx, t->by, bw4, bh4, mv0, MvPair{0, 0}, ref0 + 1,
                 B[BF_INTERINTRA_TYPE] ? 0 : -1, bs, mf);
    }

    // context updates (decode_inter.py:682-716)
    memset(t->a_seg_pred + bx4, seg_pred, bw4);
    memset(t->a_skip_mode + bx4, B[BF_SKIP_MODE], bw4);
    memset(t->a_intra + bx4, 0, bw4);
    memset(t->a_skip + bx4, B[BF_SKIP], bw4);
    memset(t->a_pal_sz + bx4, 0, bw4);
    memset(t->pal_sz_uv + (bx4 & 31), 0,
           imin((bx4 & 31) + bw4, 32) - (bx4 & 31));
    memset(t->a_tx_intra + bx4, (int)bd[2], bw4);
    memset(t->a_comp_type + bx4, B[BF_COMP_TYPE], bw4);
    memset(t->a_filter0 + bx4, f0, bw4);
    memset(t->a_filter1 + bx4, f1, bw4);
    for (int y = 0; y < h4; y++) {   // frame-clipped (numpy slice clamp)
        const int64_t off = (int64_t)(t->by + y) * t->bw + t->bx;
        memset(t->b4_filter0 + off, f0, w4);
        memset(t->b4_filter1 + off, f1, w4);
    }
    memset(t->a_mode + bx4, B[BF_INTER_MODE], bw4);
    memset(t->a_ref0 + bx4, ref0, bw4);
    memset(t->a_ref1 + bx4, ref1, bw4);
    memset(t->l_seg_pred + by4, seg_pred, bh4);
    memset(t->l_skip_mode + by4, B[BF_SKIP_MODE], bh4);
    memset(t->l_intra + by4, 0, bh4);
    memset(t->l_skip + by4, B[BF_SKIP], bh4);
    memset(t->l_pal_sz + by4, 0, bh4);
    memset(t->pal_sz_uv + 32 + by4, 0, bh4);
    memset(t->l_tx_intra + by4, (int)bd[3], bh4);
    memset(t->l_comp_type + by4, B[BF_COMP_TYPE], bh4);
    memset(t->l_filter0 + by4, f0, bh4);
    memset(t->l_filter1 + by4, f1, bh4);
    memset(t->l_mode + by4, B[BF_INTER_MODE], bh4);
    memset(t->l_ref0 + by4, ref0, bh4);
    memset(t->l_ref1 + by4, ref1, bh4);
    if (has_chroma) {
        memset(t->a_uvmode + cbx4, DC_PRED, cbw4);
        memset(t->l_uvmode + cby4, DC_PRED, cbh4);
    }

    fill_plan_grids(t, B, w4, h4, 0, 0 /*b4_ymode untouched: stays 0*/,
                    DC_PRED);
}

// ============================================================================
// decode_b: intrabc branch (decode_inter.py:869-977)
// ============================================================================

static void decode_b_intrabc(TileCtx *t, int32_t *B, int bs,
                             const int32_t *bd, int bx4, int by4, int bw4,
                             int bh4, int has_chroma, int seg_pred,
                             int edge_flags, int cbx4, int cby4, int cbw4,
                             int cbh4, int w4, int h4) {
    const int ss_ver = t->coef.ss_ver, ss_hor = t->coef.ss_hor;
    B[BF_INTRA] = 0;

    RefFindCtx rfc;
    int refpair[2] = {0, -1};
    refmvs_find(t, &rfc, refpair, bs, edge_flags, t->by, t->bx);
    MvPair mv;
    if (rfc.stack[0].mv[0].y || rfc.stack[0].mv[0].x) {
        mv = rfc.stack[0].mv[0];
    } else if (rfc.stack[1].mv[0].y || rfc.stack[1].mv[0].x) {
        mv = rfc.stack[1].mv[0];
    } else {
        if (t->by - (16 << t->sb128) < t->row_start) {
            mv.y = 0;
            mv.x = -(512 << t->sb128) - 2048;
        } else {
            mv.y = -(512 << t->sb128);
            mv.x = 0;
        }
    }
    mv = read_mv_residual(t, mv, -1);

    // clip to the decoded parts of the current tile
    int border_left = t->col_start * 4;
    int border_top = t->row_start * 4;
    if (has_chroma) {
        if (bw4 < 2 && ss_hor) border_left += 4;
        if (bh4 < 2 && ss_ver) border_top += 4;
    }
    int src_left = t->bx * 4 + (mv.x >> 3);
    int src_top = t->by * 4 + (mv.y >> 3);
    int src_right = src_left + bw4 * 4;
    int src_bottom = src_top + bh4 * 4;
    const int border_right = ((t->col_end + (bw4 - 1)) & ~(bw4 - 1)) * 4;

    if (src_left < border_left) {
        src_right += border_left - src_left;
        src_left = border_left;
    } else if (src_right > border_right) {
        src_left -= src_right - border_right;
        src_right = border_right;
    }
    if (src_top < border_top) {
        src_bottom += border_top - src_top;
        src_top = border_top;
    }
    const int sbx = (t->bx >> (4 + t->sb128)) << (6 + t->sb128);
    const int sby = (t->by >> (4 + t->sb128)) << (6 + t->sb128);
    const int sb_size = 1 << (6 + t->sb128);
    if (src_bottom > sby && src_right > sbx) {
        if (src_top - border_top >= src_bottom - sby) {
            const int d = src_bottom - sby;
            src_top -= d;
            src_bottom -= d;
        } else if (src_left - border_left >= src_right - sbx) {
            const int d = src_right - sbx;
            src_left -= d;
            src_right -= d;
        }
    }
    if (src_bottom > sby + sb_size) {
        const int d = src_bottom - (sby + sb_size);
        src_top -= d;
        src_bottom -= d;
    }
    if (src_bottom > sby && src_right > sbx) {
        t->err = -5;   // intrabc mv overlaps current superblock
        return;
    }

    MvPair dmv{(src_top - t->by * 4) * 8, (src_left - t->bx * 4) * 8};
    B[BF_MV00] = dmv.y;
    B[BF_MV01] = dmv.x;
    B[BF_REF0] = -1;
    B[BF_REF1] = -1;
    B[BF_FILTER2D] = 9;   // FILTER_2D_BILINEAR

    read_vartx_tree(t, B, bs, bx4, by4);
    read_coef_blocks_inter(t, B, bs, bx4, by4, bw4, bh4, w4, h4, has_chroma);
    if (t->err) return;

    splat_mv(t, t->bx, t->by, bw4, bh4, dmv, MvPair{0, 0}, 0, -1, bs, 0);

    // context updates (decode_inter.py:952-971)
    memset(t->a_tx_intra + bx4, (int)bd[2], bw4);
    memset(t->a_mode + bx4, DC_PRED, bw4);
    memset(t->a_pal_sz + bx4, 0, bw4);
    memset(t->pal_sz_uv + (bx4 & 31), 0,
           imin((bx4 & 31) + bw4, 32) - (bx4 & 31));
    memset(t->a_seg_pred + bx4, seg_pred, bw4);
    memset(t->a_skip_mode + bx4, 0, bw4);
    memset(t->a_intra + bx4, 0, bw4);
    memset(t->a_skip + bx4, B[BF_SKIP], bw4);
    memset(t->l_tx_intra + by4, (int)bd[3], bh4);
    memset(t->l_mode + by4, DC_PRED, bh4);
    memset(t->l_pal_sz + by4, 0, bh4);
    memset(t->pal_sz_uv + 32 + by4, 0, bh4);
    memset(t->l_seg_pred + by4, seg_pred, bh4);
    memset(t->l_skip_mode + by4, 0, bh4);
    memset(t->l_intra + by4, 0, bh4);
    memset(t->l_skip + by4, B[BF_SKIP], bh4);
    if (has_chroma) {
        memset(t->a_uvmode + cbx4, DC_PRED, cbw4);
        memset(t->l_uvmode + cby4, DC_PRED, cbh4);
    }
    // note: b4_ymode/b4_uvmode untouched by the Python intrabc path
    const int64_t stride = t->bw;
    for (int y = 0; y < h4; y++) {
        const int64_t off = (int64_t)(t->by + y) * stride + t->bx;
        memset(t->b4_bs + off, bs, w4);
        memset(t->b4_intra + off, 0, w4);
        memset(t->b4_skip + off, B[BF_SKIP], w4);
        memset(t->b4_seg + off, B[BF_SEG_ID], w4);
    }
}

// ============================================================================
// decode_b dispatcher (decode.py:569-698)
// ============================================================================

static void decode_b(TileCtx *t, int bl, int bs, int bp, int edge_flags) {
    if (t->err) return;
    Msac *s = &t->coef.msac;
    ModeCdfs *m = &t->m;
    int32_t *B = new_block(t, bl, bs, bp, edge_flags);
    if (t->err) return;
    const int32_t *bd = bdim(t, bs);
    const int bx4 = t->bx;
    const int by4 = t->by & 31;
    const int ss_ver = t->coef.ss_ver, ss_hor = t->coef.ss_hor;
    const int cbx4 = bx4 >> ss_hor;
    const int cby4 = by4 >> ss_ver;
    const int bw4 = bd[0], bh4 = bd[1];
    const int w4 = imin(bw4, t->bw - t->bx);
    const int h4 = imin(bh4, t->bh - t->by);
    const int cbw4 = (bw4 + ss_hor) >> ss_hor;
    const int cbh4 = (bh4 + ss_ver) >> ss_ver;
    const int have_left = t->bx > t->col_start;
    const int have_top = t->by > t->row_start;
    const int has_chroma = t->layout != 0 &&
                           (bw4 > ss_hor || (t->bx & 1)) &&
                           (bh4 > ss_ver || (t->by & 1));
    B[BF_HAS_CHROMA] = has_chroma;

    int seg_set = 0, seg_pred = 0;
    if (t->seg_enabled) {
        if (!t->seg_update_map) {
            B[BF_SEG_ID] = prev_frame_segid(t, w4, h4);
            seg_set = 1;
        } else if (t->seg_preskip) {
            B[BF_SEG_ID] = read_seg_id(t, bx4, by4, w4, h4, have_top,
                                       have_left, 0, &seg_pred);
            seg_set = 1;
        }
    }

    // skip_mode
    int sid = B[BF_SEG_ID];
    int skip_mode = 0;
    if ((!seg_set ||
         (!t->seg_globalmv[sid] && t->seg_ref[sid] == -1 &&
          !t->seg_skip[sid])) &&
        t->skip_mode_enabled && imin(bw4, bh4) > 1) {
        const int smctx = t->a_skip_mode[bx4] + t->l_skip_mode[by4];
        skip_mode = msac_bool_adapt(s, m->skip_mode + smctx * 2);
    }
    B[BF_SKIP_MODE] = skip_mode;

    // skip
    if (skip_mode || (seg_set && t->seg_skip[sid])) {
        B[BF_SKIP] = 1;
    } else {
        const int sctx = t->a_skip[bx4] + t->l_skip[by4];
        B[BF_SKIP] = msac_bool_adapt(s, m->skip + sctx * 2);
    }

    // postskip segment id
    if (t->seg_enabled && t->seg_update_map && !t->seg_preskip) {
        B[BF_SEG_ID] = read_seg_id(t, bx4, by4, w4, h4, have_top, have_left,
                                   B[BF_SKIP], &seg_pred);
        seg_set = 1;
        sid = B[BF_SEG_ID];
    }

    // cdef index
    if (!B[BF_SKIP]) read_cdef_idx(t, bw4, bh4);

    // delta q / lf
    if (!((t->bx | t->by) & (31 >> !t->sb128)))
        read_delta_q_lf(t, bs, B[BF_SKIP]);

    // intra/inter flag
    int intra;
    if (skip_mode) {
        intra = 0;
    } else if (!t->key_or_intra) {
        if (seg_set && (t->seg_ref[sid] >= 0 || t->seg_globalmv[sid])) {
            intra = !t->seg_ref[sid];
        } else {
            const int ictx =
                get_intra_ctx(t, by4, bx4, have_top, have_left);
            intra = !msac_bool_adapt(s, m->intra + ictx * 2);
        }
    } else if (t->allow_intrabc) {
        intra = !msac_bool_adapt(s, m->intrabc);
    } else {
        intra = 1;
    }
    B[BF_INTRA] = intra;

    if (intra) {
        decode_b_intra(t, B, bl, bs, bp, bd, bx4, by4, cbx4, cby4, bw4, bh4,
                       w4, h4, cbw4, cbh4, have_top, have_left, has_chroma,
                       seg_pred);
        if ((!t->key_or_intra || t->allow_intrabc) && t->have_rf)
            splat_mv(t, t->bx, t->by, bw4, bh4,
                     MvPair{INVALID_MV, INVALID_MV}, MvPair{0, 0}, 0, -1,
                     bs, 0);
    } else if (t->key_or_intra) {
        decode_b_intrabc(t, B, bs, bd, bx4, by4, bw4, bh4, has_chroma,
                         seg_pred, edge_flags, cbx4, cby4, cbw4, cbh4, w4,
                         h4);
    } else {
        decode_b_inter(t, B, bl, bs, bp, bd, bx4, by4, cbx4, cby4, bw4, bh4,
                       w4, h4, cbw4, cbh4, have_top, have_left, has_chroma,
                       seg_set, seg_pred, edge_flags);
    }
    if (t->err) return;

    if (t->lf_level_y[0] || t->lf_level_y[1]) calc_lf_lvl(t, B);
    B[BF_COEF_END] = (int32_t)t->n_coefs;
    t->n_blocks++;
}

// ============================================================================
// partition walk (decode.py:400-566)
// ============================================================================

static inline int en(const TileCtx *t, int node, int k) {
    return t->edge_tree[node * 14 + k];
}

enum {
    EN_O = 0, EN_H0, EN_H1, EN_V0, EN_V1, EN_S0, EN_S1, EN_S2,
    EN_H4, EN_V4, EN_C0,
};
enum {
    EDGE_ALL_TOP_HAS_RIGHT = 7,
    EDGE_ALL_LEFT_HAS_BOTTOM = 56,
    EDGE_ALL_TR_AND_BL = 63,
};

static void decode_sb(TileCtx *t, int bl, int node);

static void dispatch_partition(TileCtx *t, int bl, int bp, const uint8_t *b,
                               int hsz, int node) {
    switch (bp) {
    case PARTITION_NONE:
        decode_b(t, bl, b[0], bp, en(t, node, EN_O));
        break;
    case PARTITION_H:
        decode_b(t, bl, b[0], bp, en(t, node, EN_H0));
        t->by += hsz;
        decode_b(t, bl, b[0], bp, en(t, node, EN_H1));
        t->by -= hsz;
        break;
    case PARTITION_V:
        decode_b(t, bl, b[0], bp, en(t, node, EN_V0));
        t->bx += hsz;
        decode_b(t, bl, b[0], bp, en(t, node, EN_V1));
        t->bx -= hsz;
        break;
    case PARTITION_SPLIT:
        if (bl == BL_8X8) {
            decode_b(t, bl, BS_4x4, bp, EDGE_ALL_TR_AND_BL);
            t->bx += 1;
            decode_b(t, bl, BS_4x4, bp, en(t, node, EN_S0));
            t->bx -= 1;
            t->by += 1;
            decode_b(t, bl, BS_4x4, bp, en(t, node, EN_S1));
            t->bx += 1;
            decode_b(t, bl, BS_4x4, bp, en(t, node, EN_S2));
            t->bx -= 1;
            t->by -= 1;
        } else {
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 0));
            t->bx += hsz;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 1));
            t->bx -= hsz;
            t->by += hsz;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 2));
            t->bx += hsz;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 3));
            t->bx -= hsz;
            t->by -= hsz;
        }
        break;
    case PARTITION_T_TOP_SPLIT:
        decode_b(t, bl, b[0], bp, EDGE_ALL_TR_AND_BL);
        t->bx += hsz;
        decode_b(t, bl, b[0], bp, en(t, node, EN_V1));
        t->bx -= hsz;
        t->by += hsz;
        decode_b(t, bl, b[1], bp, en(t, node, EN_H1));
        t->by -= hsz;
        break;
    case PARTITION_T_BOTTOM_SPLIT:
        decode_b(t, bl, b[0], bp, en(t, node, EN_H0));
        t->by += hsz;
        decode_b(t, bl, b[1], bp, en(t, node, EN_V0));
        t->bx += hsz;
        decode_b(t, bl, b[1], bp, 0);
        t->bx -= hsz;
        t->by -= hsz;
        break;
    case PARTITION_T_LEFT_SPLIT:
        decode_b(t, bl, b[0], bp, EDGE_ALL_TR_AND_BL);
        t->by += hsz;
        decode_b(t, bl, b[0], bp, en(t, node, EN_H1));
        t->by -= hsz;
        t->bx += hsz;
        decode_b(t, bl, b[1], bp, en(t, node, EN_V1));
        t->bx -= hsz;
        break;
    case PARTITION_T_RIGHT_SPLIT:
        decode_b(t, bl, b[0], bp, en(t, node, EN_V0));
        t->bx += hsz;
        decode_b(t, bl, b[1], bp, en(t, node, EN_H0));
        t->by += hsz;
        decode_b(t, bl, b[1], bp, 0);
        t->by -= hsz;
        t->bx -= hsz;
        break;
    case PARTITION_H4:
        decode_b(t, bl, b[0], bp, en(t, node, EN_H0));
        t->by += hsz >> 1;
        decode_b(t, bl, b[0], bp, en(t, node, EN_H4));
        t->by += hsz >> 1;
        decode_b(t, bl, b[0], bp, EDGE_ALL_LEFT_HAS_BOTTOM);
        t->by += hsz >> 1;
        if (t->by < t->bh)
            decode_b(t, bl, b[0], bp, en(t, node, EN_H1));
        t->by -= hsz * 3 >> 1;
        break;
    case PARTITION_V4:
        decode_b(t, bl, b[0], bp, en(t, node, EN_V0));
        t->bx += hsz >> 1;
        decode_b(t, bl, b[0], bp, en(t, node, EN_V4));
        t->bx += hsz >> 1;
        decode_b(t, bl, b[0], bp, EDGE_ALL_TOP_HAS_RIGHT);
        t->bx += hsz >> 1;
        if (t->bx < t->bw)
            decode_b(t, bl, b[0], bp, en(t, node, EN_V1));
        t->bx -= hsz * 3 >> 1;
        break;
    default:
        t->err = -7;
    }
}

static void decode_sb(TileCtx *t, int bl, int node) {
    if (t->err) return;
    Msac *s = &t->coef.msac;
    const int hsz = 16 >> bl;
    const int have_h_split = t->bw > t->bx + hsz;
    const int have_v_split = t->bh > t->by + hsz;

    if (!have_h_split && !have_v_split) {
        decode_sb(t, bl + 1, en(t, node, EN_C0 + 0));
        return;
    }

    const int bx8 = t->bx >> 1;
    const int by8 = (t->by & 31) >> 1;
    const int ctx = ((t->a_partition[bx8] >> (4 - bl)) & 1) +
                    (((t->l_partition[by8] >> (4 - bl)) & 1) << 1);
    uint16_t *pc = t->m.partition + (bl * 4 + ctx) * 16;
    int bp;

    if (have_h_split && have_v_split) {
        bp = msac_symbol_adapt(s, pc, t->partition_type_count[bl]);
        if (t->layout == 2 &&
            (bp == PARTITION_V || bp == PARTITION_V4 ||
             bp == PARTITION_T_LEFT_SPLIT ||
             bp == PARTITION_T_RIGHT_SPLIT)) {
            t->err = -4;   // 4:2:2 forbidden vertical partition
            return;
        }
        const uint8_t *b = t->block_sizes + (bl * 10 + bp) * 2;
        dispatch_partition(t, bl, bp, b, hsz, node);
    } else if (have_h_split) {
        const int is_split =
            msac_bool(s, gather_top_partition_prob(pc, bl));
        if (is_split) {
            bp = PARTITION_SPLIT;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 0));
            t->bx += hsz;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 1));
            t->bx -= hsz;
        } else {
            bp = PARTITION_H;
            decode_b(t, bl,
                     t->block_sizes[(bl * 10 + PARTITION_H) * 2 + 0], bp,
                     en(t, node, EN_H0));
        }
    } else {
        const int is_split =
            msac_bool(s, gather_left_partition_prob(pc, bl));
        if (t->layout == 2 && !is_split) {
            t->err = -4;
            return;
        }
        if (is_split) {
            bp = PARTITION_SPLIT;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 0));
            t->by += hsz;
            decode_sb(t, bl + 1, en(t, node, EN_C0 + 2));
            t->by -= hsz;
        } else {
            bp = PARTITION_V;
            decode_b(t, bl,
                     t->block_sizes[(bl * 10 + PARTITION_V) * 2 + 0], bp,
                     en(t, node, EN_V0));
        }
    }
    if (t->err) return;

    if (bp != PARTITION_SPLIT || bl == BL_8X8) {
        memset(t->a_partition + bx8, t->al_part_ctx[(0 * 5 + bl) * 10 + bp],
               hsz);
        memset(t->l_partition + by8, t->al_part_ctx[(1 * 5 + bl) * 10 + bp],
               hsz);
    }
}

// ============================================================================
// tile entry
// ============================================================================

static void reset_block_ctx(TileCtx *t, int is_a) {
    const int n = is_a ? t->aw : 32;
    const int key = t->key_or_intra;
#define A_OR_L(fld_a, fld_l) (is_a ? t->fld_a : t->fld_l)
    memset(A_OR_L(a_intra, l_intra), key ? 1 : 0, n);
    memset(A_OR_L(a_uvmode, l_uvmode), DC_PRED, n);
    memset(A_OR_L(a_mode, l_mode), key ? DC_PRED : NEARESTMV, n);
    memset(A_OR_L(a_partition, l_partition), 0, is_a ? t->aw >> 1 : 16);
    memset(A_OR_L(a_skip, l_skip), 0, n);
    memset(A_OR_L(a_skip_mode, l_skip_mode), 0, n);
    memset(A_OR_L(a_tx_intra, l_tx_intra), 0xFF, n);   // -1
    memset(A_OR_L(a_tx, l_tx), TX_64X64, n);
    if (!key) {
        memset(A_OR_L(a_ref0, l_ref0), 0xFF, n);
        memset(A_OR_L(a_ref1, l_ref1), 0xFF, n);
        memset(A_OR_L(a_comp_type, l_comp_type), 0, n);
    }
    memset(A_OR_L(a_lcoef, l_lcoef), 0x40, n);
    memset(A_OR_L(a_ccoef0, l_ccoef0), 0x40, n);
    memset(A_OR_L(a_ccoef1, l_ccoef1), 0x40, n);
    memset(A_OR_L(a_filter0, l_filter0), N_SWITCHABLE_FILTERS, n);
    memset(A_OR_L(a_filter1, l_filter1), N_SWITCHABLE_FILTERS, n);
    memset(A_OR_L(a_seg_pred, l_seg_pred), 0, n);
    memset(A_OR_L(a_pal_sz, l_pal_sz), 0, n);
#undef A_OR_L
}

extern "C" int64_t tile_parse(TileCtx *t) {
    t->err = 0;
    t->n_blocks = 0;
    t->n_coefs = 0;
    t->cf_used = 0;
    t->pal_used = 0;
    t->palidx_used = 0;
    t->n_lr = 0;
    t->last_qidx = t->base_qidx;
    t->last_delta_lf[0] = t->last_delta_lf[1] = 0;
    t->last_delta_lf[2] = t->last_delta_lf[3] = 0;
    t->coef.dq = (int32_t *)t->frame_dq;
    memset(t->al_pal, 0, 2 * 32 * 3 * 8 * sizeof(int32_t));
    memset(t->pal_sz_uv, 0, 64);
    memset(t->txtp_map, 0, (size_t)32 * t->aw);

    // per-tile LR prediction refs (decode.py:279-281)
    for (int p = 0; p < 3; p++) {
        int32_t *r = t->lr_ref[p];
        r[0] = 0;
        r[1] = 3; r[2] = -7; r[3] = 15;
        r[4] = 3; r[5] = -7; r[6] = 15;
        r[7] = -32; r[8] = 31;
    }

    reset_block_ctx(t, 1);
    const int root_bl = t->sb128 ? 0 : 1;
    const int root_node = t->tree_root[t->sb128 ? 0 : 1];

    for (int by = t->row_start; by < t->row_end; by += t->sb_step) {
        t->by = by;
        reset_block_ctx(t, 0);
        memset(t->pal_sz_uv + 32, 0, 32);
        for (int bx = t->col_start; bx < t->col_end; bx += t->sb_step) {
            t->bx = bx;
            read_lr_units(t);
            decode_sb(t, root_bl, root_node);
            if (t->err) return t->err;
        }
        if (t->coef.msac.cnt <= -15) return -2;   // msac overread
    }

    if (t->strict) {
        // check_trailing_bits (msac.py:30-42)
        const Msac *s = &t->coef.msac;
        const int n_bits = -(s->cnt + 14);
        const int n_bytes = (n_bits + 7) >> 3;
        const int64_t p = s->pos + n_bytes;
        const int pattern = 128 >> ((n_bits - 1) & 7);
        if (p < 1 || p > s->end) return -6;
        if ((s->buf[p - 1] & (2 * pattern - 1)) != pattern) return -6;
        for (int64_t i = p; i < s->end; i++)
            if (s->buf[i]) return -6;
    }
    return 0;
}
