"""Stage-B in-loop filter chain — device orchestration.

Runs deblock -> CDEF -> super-res -> loop-restoration as one
device-resident sequence: planes upload once, every filter consumes the
previous filter's device arrays (the pre-CDEF lpf snapshot for LR is
just the deblock output kept alive), and pixels download once at the
end. Mirrors the reference's per-sbrow postfilter chain semantics
(reference thread_task.c:699-854) collapsed into whole-frame passes.

The golden host path (ops/*_ref.py) remains behind
DAV1D_TPU_BACKEND=numpy and is the parity oracle for this module.
"""
from __future__ import annotations

import numpy as np

from ..ops.backend import device_scope, jax_mod
from ..utils import timing


def run_filter_chain_device(pic, plan, inloop_filters):
    """Apply the enabled in-loop filters on device. Returns the final
    Picture (a new one when super-res is active, else `pic` mutated)."""
    f = plan.f
    fh = f.frame_hdr
    jnp = jax_mod().numpy

    lflf = fh.loopfilter
    do_deblock = bool(inloop_filters & 1) and \
        (lflf.level_y[0] or lflf.level_y[1])
    cd = fh.cdef
    do_cdef = bool(inloop_filters & 2) and f.seq_hdr.cdef and \
        any(cd.y_strength[i] or cd.uv_strength[i]
            for i in range(1 << cd.n_bits))
    do_sr = fh.width[0] != fh.width[1]
    do_lr = bool(inloop_filters & 4) and \
        any(t != 0 for t in fh.restoration.type)

    if not (do_deblock or do_cdef or do_sr or do_lr):
        if getattr(pic, "host_stale", False) and \
                pic.pending_fetch is None and pic.dev is not None:
            from ..ops.backend import queue_plane_fetch
            with device_scope():
                pic.pending_fetch = queue_plane_fetch(
                    pic.dev, pic.planes, pic.bpc, jnp)
        return pic

    import os as _os
    _sync = None
    if timing.ENABLED and _os.environ.get("DAV1D_TPU_TIMING_SYNC"):
        import jax as _jax
        _sync = _jax.block_until_ready

    with device_scope():
        with timing.phase("filters.upload"):
            if getattr(pic, "dev", None) is not None:
                # recon left the planes device-resident: zero traffic
                planes = list(pic.dev)
            else:
                # native dtype over the tunnel, widen on device
                planes = [jnp.asarray(np.asarray(p)).astype(jnp.int32)
                          for p in pic.planes]
            if _sync:
                _sync(planes)

        if do_deblock:
            from ..ops.lf import deblock_planes_device
            with timing.phase("filters.deblock"):
                planes = deblock_planes_device(planes, plan, pic.bpc)
                if _sync:
                    _sync(planes)

        pre_cdef = planes if do_lr else None   # post-deblock lpf snapshot

        if do_cdef:
            from ..ops.cdef import cdef_planes_device
            with timing.phase("filters.cdef"):
                planes = cdef_planes_device(planes, plan, pic.bpc)
                if _sync:
                    _sync(planes)

        if do_sr:
            from ..ops.superres import (_resize_tables, _resize_fn,
                                        scale_fac, get_upscale_x0)
            from .picture import Picture
            in_w, out_w = fh.width[0], fh.width[1]
            newpic = Picture(out_w, fh.height, pic.layout, pic.bpc)
            newpic.props = pic.props
            ss_hor, ss_ver = pic.ss_hor, pic.ss_ver
            step = [scale_fac(in_w, out_w),
                    scale_fac((in_w + ss_hor) >> ss_hor,
                              (out_w + ss_hor) >> ss_hor)]
            x0 = [get_upscale_x0(in_w, out_w, step[0]),
                  get_upscale_x0((in_w + ss_hor) >> ss_hor,
                                 (out_w + ss_hor) >> ss_hor, step[1])]
            new_planes = []
            new_pre = [] if do_lr else None
            for pl in range(len(planes)):
                c = int(bool(pl))
                src_w = (4 * f.bw) >> (ss_hor * c)
                dst_w = (out_w + (ss_hor * c)) >> (ss_hor * c)
                h = (fh.height + (ss_ver * c)) >> (ss_ver * c)
                idx, flt = _resize_tables(dst_w, src_w, step[c], x0[c])
                fn = _resize_fn(h, dst_w, pic.bpc)
                full = jnp.zeros(newpic.planes[pl].shape, jnp.int32)
                full = full.at[:h, :dst_w].set(fn(planes[pl][:h], idx,
                                                  flt))
                new_planes.append(full)
                if do_lr:
                    pre = jnp.zeros(newpic.planes[pl].shape, jnp.int32)
                    pre = pre.at[:h, :dst_w].set(
                        fn(pre_cdef[pl][:h], idx, flt))
                    new_pre.append(pre)
            planes = new_planes
            pre_cdef = new_pre
            out_pic = newpic
        else:
            out_pic = pic

        if do_lr:
            from ..ops.lr import lr_planes_device
            with timing.phase("filters.lr"):
                planes = lr_planes_device(planes, pre_cdef, plan, pic.bpc)
                if _sync:
                    _sync(planes)

        # cast down on device (4x fewer tunnel bytes), QUEUE the
        # device->host transfer, and return without blocking: the
        # first host consumer (output boundary, golden scaled-ref MC,
        # film grain copy) materializes via fetch_pic_host. The final
        # planes stay attached as the device-resident cache so later
        # frames reference them with zero upload traffic.
        with timing.phase("filters.fetch"):
            from ..ops.backend import queue_plane_fetch
            out_pic.pending_fetch = queue_plane_fetch(
                planes, out_pic.planes, pic.bpc, jnp)
        out_pic.dev = planes
        out_pic.dev_c = None    # pre-filter chroma stack is stale
        out_pic.host_stale = True
        if out_pic is not pic:
            pic.dev = None      # pre-super-res picture is dropped
            pic.dev_c = None
    return out_pic
