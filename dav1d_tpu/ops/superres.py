"""Super-resolution: horizontal upscale of the decoded (coded-width)
picture to the output width (reference recon_tmpl.c:2053-2086
filter_sbrow_resize + decode.c:3524-3540 step/x0 setup). Runs after
CDEF, before loop restoration; the pre-CDEF LR boundary rows are
resized as well (reference lf_apply_tmpl.c backup_lpf resize path)."""
from __future__ import annotations

import numpy as np

from ..recon.picture import Picture
from .mc_ref import get_upscale_x0, resize_plane, scale_fac


def apply_superres(pic, pre_cdef, plan):
    f = plan.f
    fh = f.frame_hdr
    in_w, out_w = fh.width[0], fh.width[1]
    out = Picture(out_w, fh.height, pic.layout, pic.bpc)
    ss_hor, ss_ver = pic.ss_hor, pic.ss_ver
    step = [scale_fac(in_w, out_w),
            scale_fac((in_w + ss_hor) >> ss_hor, (out_w + ss_hor) >> ss_hor)]
    x0 = [get_upscale_x0(in_w, out_w, step[0]),
          get_upscale_x0((in_w + ss_hor) >> ss_hor,
                         (out_w + ss_hor) >> ss_hor, step[1])]
    out_pre = [None] * 3 if pre_cdef is not None else None
    for pl in range(3 if pic.layout else 1):
        c = int(bool(pl))
        src_w = (4 * f.bw) >> (ss_hor * c)      # even-rounded coded width
        dst_w = (out_w + (ss_hor * c)) >> (ss_hor * c)
        h = (fh.height + (ss_ver * c)) >> (ss_ver * c)
        res = resize_plane(pic.planes[pl][:h], src_w, h, dst_w,
                           step[c], x0[c], pic.bpc)
        out.planes[pl][:h, :dst_w] = res.astype(out.planes[pl].dtype)
        if pre_cdef is not None:
            # keep the padded geometry the non-SR path has (stripe
            # context reads may touch rows/cols past the visible area)
            buf = np.zeros(out.planes[pl].shape, np.int32)
            buf[:h, :dst_w] = resize_plane(pre_cdef[pl][:h], src_w, h,
                                           dst_w, step[c], x0[c], pic.bpc)
            out_pre[pl] = buf
    return out, out_pre
