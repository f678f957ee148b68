"""Adaptive CDF context state.

Python equivalent of the reference CdfContext (reference src/cdf.h:38-143):
every field is a mutable numpy uint16 array whose last-axis cells hold
[n_symbols inverse-CDF entries..., adaptation count, padding]. Defaults are
the AV1 spec tables loaded from tables_data.npz (4 qindex categories for
coefficient CDFs; reference cdf.c:4014-4017 qcat selection).

`update()` implements refresh_context's copy-without-counts
(reference cdf.c:3915-4012): CDF values propagate to the ref slot, the
adaptation counts reset to zero.
"""
from __future__ import annotations

import copy as _copy

import numpy as np

from .. import tables

# Leaf-field metadata: name -> number of coded symbols minus 1 per use.
# Where n_symbols varies per leading index the value is a list indexed by
# the first axis. Matches the decode call sites and cdf.c's update macros.
_M_NSYMS = {
    "uv_mode": None,               # special: [2][13] ctx, n = 12 or 13
    "partition": None,             # special: per block level
    "cfl_alpha": 15,
    "txtp_inter1": 15,
    "txtp_inter2": 11,
    "txtp_intra1": 6,
    "txtp_intra2": 4,
    "cfl_sign": 7,
    "angle_delta": 6,
    "filter_intra": 4,
    "seg_id": 7,
    "pal_sz": 6,
    "color_map": None,             # special: n = pal_sz - 1 per [5] ctx... (by use)
    "txsz": None,                  # special: depth count per size
    "delta_q": 3,
    "delta_lf": 3,
    "restore_switchable": 2,
    "restore_wiener": 1,
    "restore_sgrproj": 1,
    "txtp_inter3": 1,
    "use_filter_intra": 1,
    "txpart": 1,
    "skip": 1,
    "pal_y": 1,
    "pal_uv": 1,
    "intrabc": 1,
    "y_mode": 12,
    "wedge_idx": 15,
    "comp_inter_mode": 7,
    "filter": 2,
    "interintra_mode": 3,
    "motion_mode": 2,
    "skip_mode": 1,
    "newmv_mode": 1,
    "globalmv_mode": 1,
    "refmv_mode": 1,
    "drl_bit": 1,
    "intra": 1,
    "comp": 1,
    "comp_dir": 1,
    "jnt_comp": 1,
    "mask_comp": 1,
    "wedge_comp": 1,
    "ref": 1,
    "comp_fwd_ref": 1,
    "comp_bwd_ref": 1,
    "comp_uni_ref": 1,
    "seg_pred": 1,
    "interintra": 1,
    "interintra_wedge": 1,
    "obmc": 1,
}

_COEF_NSYMS = {
    "eob_bin_16": 4, "eob_bin_32": 5, "eob_bin_64": 6, "eob_bin_128": 7,
    "eob_bin_256": 8, "eob_bin_512": 9, "eob_bin_1024": 10,
    "eob_base_tok": 2, "base_tok": 3, "br_tok": 3, "eob_hi_bit": 1,
    "skip": 1, "dc_sign": 1,
}

_MV_COMP_NSYMS = {
    "classes": 10, "sign": 1, "class0": 1, "class0_fp": 3, "class0_hp": 1,
    "classN": 1, "classN_fp": 3, "classN_hp": 1,
}

N_PARTITIONS = 10
N_SUB8X8_PARTITIONS = 4


class _NS:
    """Attribute-bag for a group of cdf arrays."""
    def copy(self):
        new = _NS()
        for k, v in self.__dict__.items():
            if isinstance(v, np.ndarray):
                setattr(new, k, v.copy())
            elif isinstance(v, list):
                setattr(new, k, [x.copy() for x in v])
            else:
                setattr(new, k, v.copy())
        return new


class CdfContext:
    """Holds .m (modes), .coef, .mv (list of 2 components + joint), .kfym."""

    __slots__ = ("m", "coef", "mv_comp", "mv_joint", "kfym")

    def __init__(self, m, coef, mv_comp, mv_joint, kfym):
        self.m = m
        self.coef = coef
        self.mv_comp = mv_comp      # list of 2 _NS
        self.mv_joint = mv_joint    # np array
        self.kfym = kfym

    @classmethod
    def default(cls, qidx: int) -> "CdfContext":
        """Fresh default CDFs for a frame with base qindex `qidx`
        (reference cdf.c:4014-4017, 4030-4037)."""
        qcat = (qidx > 20) + (qidx > 60) + (qidx > 120)
        m = _NS()
        for name in _M_NSYMS:
            m.__dict__[name] = tables.get(f"cdf.m.{name}").copy()
        coef = _NS()
        for name in _COEF_NSYMS:
            coef.__dict__[name] = tables.get(f"cdf.coef.{qcat}.{name}").copy()
        comp = _NS()
        for name in _MV_COMP_NSYMS:
            comp.__dict__[name] = tables.get(f"cdf.mv.comp.{name}").copy()
        mv_comp = [comp, comp.copy()]
        mv_joint = tables.get("cdf.mv.joint").copy()
        kfym = tables.get("cdf.kfym").copy()
        return cls(m, coef, mv_comp, mv_joint, kfym)

    def copy(self) -> "CdfContext":
        return CdfContext(self.m.copy(), self.coef.copy(),
                          [c.copy() for c in self.mv_comp],
                          self.mv_joint.copy(), self.kfym.copy())

    # ------------------------------------------------------------------
    # fields whose adaptation only ever lives within one frame: the
    # reference's update memcpys skip them (cdf.c:3931 covers up to
    # m.intrabc; the inter memcpy starts at m.y_mode; kfym is after mv)
    _INTRA_ONLY_FIELDS = ("intrabc",)
    _INTER_FIELDS = frozenset((
        "y_mode", "wedge_idx", "comp_inter_mode", "filter",
        "interintra_mode", "motion_mode", "skip_mode", "newmv_mode",
        "globalmv_mode", "refmv_mode", "drl_bit", "intra", "comp",
        "comp_dir", "jnt_comp", "mask_comp", "wedge_comp", "ref",
        "comp_fwd_ref", "comp_bwd_ref", "comp_uni_ref", "seg_pred",
        "interintra", "interintra_wedge", "obmc"))

    def update_from(self, src: "CdfContext", key_or_intra: bool) -> None:
        """refresh_context semantics: copy CDF values from the decoded
        frame's adapted state `src`, resetting every adaptation count to 0
        (reference cdf.c dav1d_cdf_thread_update:3915-4012). intrabc and
        kfym never propagate; inter-mode and mv fields only propagate from
        inter/switch frames."""
        def cp(dst_ns, src_ns, name, n):
            d = dst_ns.__dict__[name]
            d[...] = src_ns.__dict__[name]
            if name == "uv_mode":
                d[0, :, 12] = 0          # 13 symbols without CFL
                d[1, :, 13] = 0          # 14 symbols with CFL
            elif name == "partition":
                d[0, :, N_PARTITIONS - 3] = 0        # BL_128X128: 8 syms
                d[1:4, :, N_PARTITIONS - 1] = 0      # mid levels: 10 syms
                d[4, :, N_SUB8X8_PARTITIONS - 1] = 0  # BL_8X8: 4 syms
            elif name == "color_map":
                for sz in range(7):
                    d[:, sz, :, sz + 1] = 0          # alphabet = sz + 2
            elif name == "txsz":
                d[0, :, 1] = 0                        # 2 symbols
                d[1:, :, 2] = 0                       # 3 symbols
            else:
                d.reshape(-1, d.shape[-1])[:, n] = 0

        for name, n in _COEF_NSYMS.items():
            cp(self.coef, src.coef, name, n)
        for name, n in _M_NSYMS.items():
            if name in self._INTRA_ONLY_FIELDS or name in self._INTER_FIELDS:
                continue
            cp(self.m, src.m, name, n)
        if key_or_intra:
            return
        for name in self._INTER_FIELDS:
            cp(self.m, src.m, name, _M_NSYMS[name])
        for dst_c, src_c in zip(self.mv_comp, src.mv_comp):
            for name, n in _MV_COMP_NSYMS.items():
                cp(dst_c, src_c, name, n)
        self.mv_joint[...] = src.mv_joint
        self.mv_joint[3] = 0
