"""Native Stage-A tile parser (native/tileparse.cpp) equivalence tests.

The C++ parser must produce a FramePlan identical field-by-field to the
Python golden parser (entropy/decode.py) — blocks, coefficients, grids,
LR units, palette maps, warp params — across the tool space. This is
the checkasm analog for the whole Stage-A walk (the e2e suite then
validates both against the reference oracle's md5).
"""
import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.entropy import native_tile

pytestmark = pytest.mark.skipif(not native_tile.available(),
                                reason="native tile parser not built")

SEG = [dict(delta_q=-20), dict(delta_q=30, delta_lf_y_v=10),
       dict(delta_lf_u=-8), dict(), dict(delta_q=50), dict(skip=1),
       dict(ref=3), dict(globalmv=1)]

CONFIGS = [
    dict(name="inter-alltools", width=192, height=128, n_frames=5, seed=11,
         sb128=1, warped_motion=1, switchable_motion_mode=1,
         masked_compound=1, inter_intra=1, jnt_comp=1, allow_skip_mode=1,
         use_ref_frame_mvs=1, ref_frame_mvs=1, dual_filter=1, delta_q=1,
         delta_lf=1, lf_levels=(12, 10, 6, 8), mode_ref_delta=1,
         cdef_params=(2, 1, [9, 5], [3, 2]), lr_types=(1, 2, 3)),
    dict(name="screen", width=160, height=96, n_frames=4, seed=5,
         screen_content=1, qidx=60, lf_levels=(8, 8, 4, 4)),
    dict(name="seg-temporal-444-hbd", width=128, height=96, n_frames=4,
         seed=9, hbd=1, layout=3, delta_q=1, segmentation=SEG,
         seg_temporal=1),
    dict(name="tiles-422-12bit", width=144, height=80, n_frames=3, seed=3,
         layout=2, hbd=2, tile_log2_cols=1, tile_log2_rows=1),
    dict(name="superres-lr", width=160, height=120, n_frames=3, seed=13,
         superres_denom=12, lr_types=(1, 1, 1), lf_levels=(10, 10, 5, 5)),
    dict(name="monochrome", width=128, height=64, n_frames=3, seed=21,
         monochrome=1),
    dict(name="seg-reduced-nocdfupd", width=96, height=64, n_frames=4,
         seed=17, segmentation=SEG, qidx=140, reduced_txtp=1,
         disable_cdf_update=1),
    dict(name="seg-mapinherit", width=96, height=64, n_frames=3, seed=23,
         segmentation=SEG, seg_update_map=0),
]


def _plan_sig(plans):
    h = hashlib.md5()
    for p in plans:
        for g in ("b4_bs", "b4_intra", "b4_skip", "b4_ymode", "b4_uvmode",
                  "b4_seg", "b4_filter", "cdef_idx"):
            h.update(np.ascontiguousarray(getattr(p, g)).tobytes())
        h.update(repr(p.lr_units).encode())
        for b in p.blocks:
            h.update(repr((
                b.bx, b.by, b.bs, b.bl, b.bp, b.intra, b.skip, b.seg_id,
                b.y_mode, b.y_angle, b.uv_mode, b.uv_angle,
                tuple(b.cfl_alpha), tuple(b.pal_sz), b.tx, b.uvtx,
                b.edge_flags, b.sm_fl, b.sm_uv_fl, tuple(b.ref),
                tuple(map(tuple, b.mv)), b.inter_mode, b.drl_idx,
                b.comp_type, b.skip_mode, b.interintra_type,
                b.interintra_mode, b.wedge_idx, b.mask_sign, b.motion_mode,
                tuple(b.filter), b.filter2d, b.max_ytx, tuple(b.tx_split),
                b.coef_start, b.coef_end, b.lf_lvl)).encode())
            if b.warpmv is not None:
                h.update(repr((int(b.warpmv.type), list(b.warpmv.matrix),
                               b.warpmv.alpha, b.warpmv.beta,
                               b.warpmv.gamma, b.warpmv.delta)).encode())
            if b.pal is not None:
                for x in b.pal:
                    h.update(np.asarray(x).tobytes())
            if b.pal_idx_y is not None:
                h.update(b.pal_idx_y.tobytes())
            if b.pal_idx_uv is not None:
                h.update(b.pal_idx_uv.tobytes())
        for c in p.coefs:
            h.update(repr((c.plane, c.x4, c.y4, c.tx, c.txtp,
                           c.eob)).encode())
            if c.cf is not None:
                h.update(np.asarray(c.cf).tobytes())
    return h.hexdigest()


def _decode_plans(frames, use_native):
    orig = native_tile.parse_tile_native
    if not use_native:
        native_tile.parse_tile_native = lambda tp: False
    try:
        plans = []
        dec = ObuStreamDecoder(do_recon=False)
        for fd in frames:
            for out in dec.decode_temporal_unit(fd):
                plans.append(out[0] if isinstance(out, tuple) else out)
        return [p for p in plans if p is not None]
    finally:
        native_tile.parse_tile_native = orig


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c["name"])
def test_native_plan_matches_python(cfg):
    cfg = dict(cfg)
    cfg.pop("name")
    w, h = cfg.pop("width"), cfg.pop("height")
    data, _ = generate_stream(w, h, **cfg)
    frames = [fr.data for fr in IvfReader(data)]
    sig_native = _plan_sig(_decode_plans(frames, True))
    sig_python = _plan_sig(_decode_plans(frames, False))
    assert sig_native == sig_python
