/* Dump the AV1 specification constant tables from the reference decoder
 * into a flat binary container consumed by tools/oracle/pack_tables.py.
 *
 * These tables (default CDFs, dequantizer LUTs, quantizer matrices, scan
 * orders, subpel/warp/resize filter taps, grain gaussian sequence, mode
 * LUTs) are normative AV1 data: any bit-exact decoder contains the same
 * numbers. We extract them from the compiled reference rather than
 * hand-transcribing ~10k constants.
 *
 * Container format per entry: u32 name_len | name | u32 byte_len | bytes.
 */
#include <stdio.h>
#include <stdint.h>
#include <string.h>

/* Pull in the reference cdf.c so the static default CDF tables are
 * visible in this translation unit. We deliberately do NOT link the
 * library's cdf.o to avoid duplicate symbols. */
#include "src/cdf.c"

#include "src/tables.h"
#include "src/scan.h"
#include "src/dequant_tables.h"
#include "src/qm.h"
#include "src/wedge.h"

static FILE *out;

static void dump(const char *name, const void *data, size_t len) {
    uint32_t n = (uint32_t)strlen(name), l = (uint32_t)len;
    fwrite(&n, 4, 1, out);
    fwrite(name, 1, n, out);
    fwrite(&l, 4, 1, out);
    fwrite(data, 1, len, out);
}

#define D(sym) dump(#sym, &(sym), sizeof(sym))
#define DM(name, field) dump("cdf." name, &default_cdf.field, sizeof(default_cdf.field))



int main(int argc, char **argv) {
    out = fopen(argc > 1 ? argv[1] : "tables.bin", "wb");
    if (!out) return 1;

    dav1d_init_qm_tables();
    dav1d_init_ii_wedge_masks();
    dav1d_init_last_nonzero_col_from_eob_tables();

    /* default CDF tables, one entry per field (compiler-derived layout) */
#define DF(field) dump("cdf." #field, &default_cdf.field, sizeof(default_cdf.field))
    DF(m.uv_mode); DF(m.partition); DF(m.cfl_alpha); DF(m.txtp_inter1);
    DF(m.txtp_inter2); DF(m.txtp_intra1); DF(m.txtp_intra2); DF(m.cfl_sign);
    DF(m.angle_delta); DF(m.filter_intra); DF(m.seg_id); DF(m.pal_sz);
    DF(m.color_map); DF(m.txsz); DF(m.delta_q); DF(m.delta_lf);
    DF(m.restore_switchable); DF(m.restore_wiener); DF(m.restore_sgrproj);
    DF(m.txtp_inter3); DF(m.use_filter_intra); DF(m.txpart); DF(m.skip);
    DF(m.pal_y); DF(m.pal_uv); DF(m.intrabc); DF(m.y_mode); DF(m.wedge_idx);
    DF(m.comp_inter_mode); DF(m.filter); DF(m.interintra_mode);
    DF(m.motion_mode); DF(m.skip_mode); DF(m.newmv_mode); DF(m.globalmv_mode);
    DF(m.refmv_mode); DF(m.drl_bit); DF(m.intra); DF(m.comp); DF(m.comp_dir);
    DF(m.jnt_comp); DF(m.mask_comp); DF(m.wedge_comp); DF(m.ref);
    DF(m.comp_fwd_ref); DF(m.comp_bwd_ref); DF(m.comp_uni_ref); DF(m.seg_pred);
    DF(m.interintra); DF(m.interintra_wedge); DF(m.obmc);
    DF(mv.comp.classes); DF(mv.comp.sign); DF(mv.comp.class0);
    DF(mv.comp.class0_fp); DF(mv.comp.class0_hp); DF(mv.comp.classN);
    DF(mv.comp.classN_fp); DF(mv.comp.classN_hp);
    DF(mv.joint);
    DF(kfym);
#define DC(q, field) do { char nm[64]; \
    snprintf(nm, sizeof(nm), "cdf.coef.%d." #field, q); \
    dump(nm, &default_coef_cdf[q].field, sizeof(default_coef_cdf[q].field)); \
    } while (0)
    for (int q = 0; q < 4; q++) {
        DC(q, eob_bin_16); DC(q, eob_bin_32); DC(q, eob_bin_64);
        DC(q, eob_bin_128); DC(q, eob_bin_256); DC(q, eob_bin_512);
        DC(q, eob_bin_1024); DC(q, eob_base_tok); DC(q, base_tok);
        DC(q, br_tok); DC(q, eob_hi_bit); DC(q, skip); DC(q, dc_sign);
    }

    /* mode / geometry LUTs (src/tables.c) */
    D(dav1d_al_part_ctx);
    D(dav1d_block_sizes);
    D(dav1d_block_dimensions);
    D(dav1d_txfm_dimensions);
    D(dav1d_max_txfm_size_for_bs);
    D(dav1d_txtp_from_uvmode);
    D(dav1d_comp_inter_pred_modes);
    D(dav1d_partition_type_count);
    D(dav1d_tx_types_per_set);
    D(dav1d_filter_mode_to_y_mode);
    D(dav1d_ymode_size_context);
    D(dav1d_lo_ctx_offsets);
    D(dav1d_skip_ctx);
    D(dav1d_tx_type_class);
    D(dav1d_filter_2d);
    D(dav1d_filter_dir);
    D(dav1d_intra_mode_context);
    D(dav1d_wedge_ctx_lut);
    D(dav1d_cdef_directions);
    D(dav1d_sgr_params);
    D(dav1d_sgr_x_by_x);
    D(dav1d_mc_subpel_filters);
    D(dav1d_mc_warp_filter);
    D(dav1d_resize_filter);
    D(dav1d_sm_weights);
    D(dav1d_dr_intra_derivative);
    D(dav1d_filter_intra_taps);
    D(dav1d_obmc_masks);
    D(dav1d_gaussian_sequence);

    /* dequant: [3 bitdepths][256 qindex][dc,ac] */
    D(dav1d_dq_tbl);

    /* scan orders + eob->last-col LUTs, flattened per rect tx size */
    for (int t = 0; t < N_RECT_TX_SIZES; t++) {
        const TxfmInfo *ti = &dav1d_txfm_dimensions[t];
        const int n = imin(ti->w * 4, 32) * imin(ti->h * 4, 32);
        char name[64];
        snprintf(name, sizeof(name), "scan.%d", t);
        dump(name, dav1d_scans[t], n * sizeof(uint16_t));
        snprintf(name, sizeof(name), "lastcol_from_eob.%d", t);
        dump(name, dav1d_last_nonzero_col_from_eob[t], n * sizeof(uint8_t));
    }

    /* quantizer matrices: 15 levels x 2 planes x rect tx (NULL for 64x) */
    for (int i = 0; i < 15; i++)
        for (int j = 0; j < 2; j++)
            for (int t = 0; t < N_RECT_TX_SIZES; t++) {
                const uint8_t *qm = dav1d_qm_tbl[i][j][t];
                if (!qm) continue;
                const TxfmInfo *ti = &dav1d_txfm_dimensions[t];
                const int n = imin(ti->w * 4, 32) * imin(ti->h * 4, 32);
                char name[64];
                snprintf(name, sizeof(name), "qm.%d.%d.%d", i, j, t);
                dump(name, qm, n);
            }

    /* wedge + interintra masks (built by dav1d_init_ii_wedge_masks) */
    D(dav1d_masks);

    fclose(out);
    return 0;
}
