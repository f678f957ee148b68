#!/usr/bin/env python3
"""Pack tables.bin (from dump_tables.c) into dav1d_tpu/tables_data.npz.

Applies dtype + shape to every entry. Shapes mirror the declarations in
reference src/cdf.h, src/tables.h, src/scan.h, src/dequant_tables.h,
src/qm.h, src/wedge.h. A size mismatch raises — that's the guard against
schema drift between the dump and this file.
"""
import sys
import numpy as np

U8, I8, U16, I16 = np.uint8, np.int8, np.uint16, np.int16

# name -> (dtype, shape)
SCHEMA = {
    # ---- default CDFs (uint16 probability tables; trailing slots are the
    # adaptation-count cell + SIMD padding, kept verbatim) ----
    "cdf.m.uv_mode": (U16, (2, 13, 16)),
    "cdf.m.partition": (U16, (5, 4, 16)),
    "cdf.m.cfl_alpha": (U16, (6, 16)),
    "cdf.m.txtp_inter1": (U16, (2, 16)),
    "cdf.m.txtp_inter2": (U16, (16,)),
    "cdf.m.txtp_intra1": (U16, (2, 13, 8)),
    "cdf.m.txtp_intra2": (U16, (3, 13, 8)),
    "cdf.m.cfl_sign": (U16, (8,)),
    "cdf.m.angle_delta": (U16, (8, 8)),
    "cdf.m.filter_intra": (U16, (8,)),
    "cdf.m.seg_id": (U16, (3, 8)),
    "cdf.m.pal_sz": (U16, (2, 7, 8)),
    "cdf.m.color_map": (U16, (2, 7, 5, 8)),
    "cdf.m.txsz": (U16, (4, 3, 4)),
    "cdf.m.delta_q": (U16, (4,)),
    "cdf.m.delta_lf": (U16, (5, 4)),
    "cdf.m.restore_switchable": (U16, (4,)),
    "cdf.m.restore_wiener": (U16, (2,)),
    "cdf.m.restore_sgrproj": (U16, (2,)),
    "cdf.m.txtp_inter3": (U16, (4, 2)),
    "cdf.m.use_filter_intra": (U16, (22, 2)),
    "cdf.m.txpart": (U16, (7, 3, 2)),
    "cdf.m.skip": (U16, (3, 2)),
    "cdf.m.pal_y": (U16, (7, 3, 2)),
    "cdf.m.pal_uv": (U16, (2, 2)),
    "cdf.m.intrabc": (U16, (2,)),
    "cdf.m.y_mode": (U16, (4, 16)),
    "cdf.m.wedge_idx": (U16, (9, 16)),
    "cdf.m.comp_inter_mode": (U16, (8, 8)),
    "cdf.m.filter": (U16, (2, 8, 4)),
    "cdf.m.interintra_mode": (U16, (4, 4)),
    "cdf.m.motion_mode": (U16, (22, 4)),
    "cdf.m.skip_mode": (U16, (3, 2)),
    "cdf.m.newmv_mode": (U16, (6, 2)),
    "cdf.m.globalmv_mode": (U16, (2, 2)),
    "cdf.m.refmv_mode": (U16, (6, 2)),
    "cdf.m.drl_bit": (U16, (3, 2)),
    "cdf.m.intra": (U16, (4, 2)),
    "cdf.m.comp": (U16, (5, 2)),
    "cdf.m.comp_dir": (U16, (5, 2)),
    "cdf.m.jnt_comp": (U16, (6, 2)),
    "cdf.m.mask_comp": (U16, (6, 2)),
    "cdf.m.wedge_comp": (U16, (9, 2)),
    "cdf.m.ref": (U16, (6, 3, 2)),
    "cdf.m.comp_fwd_ref": (U16, (3, 3, 2)),
    "cdf.m.comp_bwd_ref": (U16, (2, 3, 2)),
    "cdf.m.comp_uni_ref": (U16, (3, 3, 2)),
    "cdf.m.seg_pred": (U16, (3, 2)),
    "cdf.m.interintra": (U16, (7, 2)),
    "cdf.m.interintra_wedge": (U16, (7, 2)),
    "cdf.m.obmc": (U16, (22, 2)),
    "cdf.mv.comp.classes": (U16, (16,)),
    "cdf.mv.comp.sign": (U16, (2,)),
    "cdf.mv.comp.class0": (U16, (2,)),
    "cdf.mv.comp.class0_fp": (U16, (2, 4)),
    "cdf.mv.comp.class0_hp": (U16, (2,)),
    "cdf.mv.comp.classN": (U16, (10, 2)),
    "cdf.mv.comp.classN_fp": (U16, (4,)),
    "cdf.mv.comp.classN_hp": (U16, (2,)),
    "cdf.mv.joint": (U16, (4,)),
    "cdf.kfym": (U16, (5, 5, 16)),
    # ---- mode / geometry LUTs ----
    "dav1d_al_part_ctx": (U8, (2, 5, 10)),
    "dav1d_block_sizes": (U8, (5, 10, 2)),
    "dav1d_block_dimensions": (U8, (22, 4)),
    "dav1d_txfm_dimensions": (U8, (19, 8)),
    "dav1d_max_txfm_size_for_bs": (U8, (22, 4)),
    "dav1d_txtp_from_uvmode": (U8, (14,)),
    "dav1d_comp_inter_pred_modes": (U8, (8, 2)),
    "dav1d_partition_type_count": (U8, (5,)),
    "dav1d_tx_types_per_set": (U8, (40,)),
    "dav1d_filter_mode_to_y_mode": (U8, (5,)),
    "dav1d_ymode_size_context": (U8, (22,)),
    "dav1d_lo_ctx_offsets": (U8, (3, 5, 5)),
    "dav1d_skip_ctx": (U8, (5, 5)),
    "dav1d_tx_type_class": (U8, (17,)),
    "dav1d_filter_2d": (U8, (4, 4)),
    "dav1d_filter_dir": (U8, (10, 2)),
    "dav1d_intra_mode_context": (U8, (13,)),
    "dav1d_wedge_ctx_lut": (U8, (22,)),
    "dav1d_cdef_directions": (I8, (12, 2)),
    "dav1d_sgr_params": (U16, (16, 2)),
    "dav1d_sgr_x_by_x": (U8, (256,)),
    "dav1d_mc_subpel_filters": (I8, (6, 15, 8)),
    "dav1d_mc_warp_filter": (I8, (193, 8)),
    "dav1d_resize_filter": (I8, (64, 8)),
    "dav1d_sm_weights": (U8, (128,)),
    "dav1d_dr_intra_derivative": (U16, (44,)),
    "dav1d_filter_intra_taps": (I8, (5, 64)),
    "dav1d_obmc_masks": (U8, (64,)),
    "dav1d_gaussian_sequence": (I16, (2048,)),
    "dav1d_dq_tbl": (U16, (3, 256, 2)),
    "dav1d_masks": (U8, None),  # raw blob, decoded by ops/masks.py
}

COEF_FIELDS = {
    "eob_bin_16": (2, 2, 8), "eob_bin_32": (2, 2, 8), "eob_bin_64": (2, 2, 8),
    "eob_bin_128": (2, 2, 8), "eob_bin_256": (2, 2, 16),
    "eob_bin_512": (2, 16), "eob_bin_1024": (2, 16),
    "eob_base_tok": (5, 2, 4, 4), "base_tok": (5, 2, 41, 4),
    "br_tok": (4, 2, 21, 4), "eob_hi_bit": (5, 2, 9, 2),
    "skip": (5, 13, 2), "dc_sign": (2, 3, 2),
}
for _q in range(4):
    for _f, _s in COEF_FIELDS.items():
        SCHEMA[f"cdf.coef.{_q}.{_f}"] = (U16, _s)


def read_entries(path):
    blob = open(path, "rb").read()
    off = 0
    while off < len(blob):
        nlen = int.from_bytes(blob[off:off + 4], "little"); off += 4
        name = blob[off:off + nlen].decode(); off += nlen
        dlen = int.from_bytes(blob[off:off + 4], "little"); off += 4
        yield name, blob[off:off + dlen]
        off += dlen


def main(src, dst):
    out = {}
    for name, raw in read_entries(src):
        if name in SCHEMA:
            dtype, shape = SCHEMA[name]
            a = np.frombuffer(raw, dtype=dtype)
            if shape is not None:
                assert a.size == int(np.prod(shape)), \
                    f"{name}: got {a.size} elems, want {shape}"
                a = a.reshape(shape)
            out[name] = a
        elif name.startswith(("scan.", "lastcol_from_eob.", "qm.")):
            dtype = U16 if name.startswith("scan.") else U8
            out[name] = np.frombuffer(raw, dtype=dtype)
        else:
            print(f"warning: unknown entry {name} ({len(raw)} bytes)", file=sys.stderr)
    np.savez_compressed(dst, **out)
    print(f"packed {len(out)} tables -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/oracle-build/tables.bin",
         sys.argv[2] if len(sys.argv) > 2 else "/root/repo/dav1d_tpu/tables_data.npz")
