"""Super-resolution: horizontal upscale of the decoded (coded-width)
picture to the output width (reference recon_tmpl.c:2053-2086
filter_sbrow_resize + decode.c:3524-3540 step/x0 setup). Runs after
CDEF, before loop restoration; the pre-CDEF LR boundary rows are
resized as well (reference lf_apply_tmpl.c backup_lpf resize path).

Device path: the per-output-column source positions and 8-tap filter
phases are static per frame geometry, so the host builds a
(dst_w, 8) gather-index/filter table once and the device resolves the
whole plane as 8 weighted column gathers in one jitted program."""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..recon.picture import Picture
from .backend import jax_mod, device_scope
from .mc_ref import (get_upscale_x0, resize_plane, scale_fac,
                     _resize_filter)


def _resize_tables(dst_w, src_w, dx, mx0):
    """(dst_w, 8) clamped source column ids + filter taps (reference
    mc_tmpl.c:918-958 resize_c position recurrence)."""
    F = _resize_filter()
    idx = np.zeros((dst_w, 8), np.int32)
    flt = np.zeros((dst_w, 8), np.int32)
    mx = mx0
    src_x = -1
    for ox in range(dst_w):
        flt[ox] = F[mx >> 8]
        idx[ox] = np.clip(np.arange(src_x - 3, src_x + 5), 0, src_w - 1)
        mx += dx
        src_x += mx >> 14
        mx &= 0x3FFF
    return idx, flt


@lru_cache(maxsize=None)
def _resize_fn(h, dst_w, bpc):
    jax = jax_mod()
    jnp = jax.numpy

    def fn(src, idx, flt):
        acc = jnp.zeros((h, dst_w), jnp.int32)
        for i in range(8):
            acc = acc + flt[None, :, i] * jnp.take(src, idx[:, i], axis=1)
        return jnp.clip((-acc + 64) >> 7, 0, (1 << bpc) - 1)

    return jax.jit(fn)


def resize_plane_device(src, src_w, h, dst_w, step, mx0, bpc):
    """Device-path resize_plane (same contract as mc_ref.resize_plane);
    src: (>=h, >=src_w) int array."""
    idx, flt = _resize_tables(dst_w, src_w, step, mx0)
    with device_scope():
        fn = _resize_fn(h, dst_w, bpc)
        return fn(np.asarray(src[:h], np.int32), idx, flt)


def apply_superres_device(pic, pre_cdef, plan):
    """Device-path apply_superres; same contract as apply_superres."""
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
        src_w = (4 * f.bw) >> (ss_hor * c)
        dst_w = (out_w + (ss_hor * c)) >> (ss_hor * c)
        h = (fh.height + (ss_ver * c)) >> (ss_ver * c)
        res = resize_plane_device(pic.planes[pl], src_w, h, dst_w,
                                  step[c], x0[c], pic.bpc)
        out.planes[pl][:h, :dst_w] = np.asarray(res).astype(
            out.planes[pl].dtype)
        if pre_cdef is not None:
            buf = np.zeros(out.planes[pl].shape, np.int32)
            buf[:h, :dst_w] = np.asarray(resize_plane_device(
                pre_cdef[pl], src_w, h, dst_w, step[c], x0[c], pic.bpc))
            out_pre[pl] = buf
    return out, out_pre


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
