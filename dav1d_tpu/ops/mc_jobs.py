"""Motion-compensation / residual kernels over compact job descriptors.

Round-3 evolution of ops/mc.py's scatter-fused kernels: instead of
uploading per-job gather/scatter index MATRICES (rows/cols/drows/dcols,
~2MB/frame over a ~20MB/s tunnel), each job is a dozen int32 scalars and
every index tensor is built INSIDE the jitted program with iota+clip —
the only per-launch upload is the (n, K) job table. Filter taps resolve
in-jit from the constant filter bank; wedge/seg compound masks come from
a device-resident mask plane written by the luma pass (no host round
trip between the luma w_mask outputs and the chroma combines).

Job layouts (int32 columns; shared with the native Stage-A job emitter
native/interjobs.cpp — see recon/inter_device.py for the collector):

  PUT  [plane, h, w, py, px, slot, dy, dx, amx, amy, ft]          (11)
  WARP [plane, py, px, slot, dy, dx, mx, my, al, be, ga, de]      (12)
  OBMC [top, plane, ww, hh, lap_h, py, px, slot, dy, dx,
        amx, amy, ft]                                             (13)
  COMP [plane, h, w, py, px, mode, jw, sign, mkind,
        dy0, dx0, amx0, amy0, ft0, slot0,
        dy1, dx1, amx1, amy1, ft1, slot1]                         (21)
  RES  [plane, tx, txtp, py, px, cfoff]                           (6)

Batch-padding rows carry py=px=OOB (and h=w=0) so their scatter lanes
drop; gather ids clamp into the reference so padded lanes still read
valid memory. Semantics are bit-exact vs ops/mc_ref.py / ops/itx_ref.py
(reference src/mc_tmpl.c:51-958, src/itx_tmpl.c:43-203) — validated by
the e2e md5 suite against the reference binary.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod
from .mc_ref import (_warp_filter, obmc_masks, intermediate_bits,
                     prep_bias)
from .mc import filter_banks, COMP_AVG, COMP_WAVG, COMP_SEG

OOB = 1 << 20


def _rnd(jnp, v, sh):
    return (v + ((1 << sh) >> 1)) >> sh


def _dst_ids(jnp, py, px, h, w, H, W):
    """In-jit destination ids with OOB on padding rows/cols."""
    ih = jnp.arange(H, dtype=jnp.int32)
    iw = jnp.arange(W, dtype=jnp.int32)
    drows = jnp.where(ih[None, :] < h[:, None], py[:, None] + ih, OOB)
    dcols = jnp.where(iw[None, :] < w[:, None], px[:, None] + iw, OOB)
    return drows, dcols


def _gather_ids(jnp, dy, dx, win_h, win_w, off, rh, rw):
    rows = jnp.clip(dy[:, None] - off +
                    jnp.arange(win_h, dtype=jnp.int32), 0, rh - 1)
    cols = jnp.clip(dx[:, None] - off +
                    jnp.arange(win_w, dtype=jnp.int32), 0, rw - 1)
    return rows, cols


def _scatter(plane, drows, dcols, vals):
    return plane.at[drows[:, :, None], dcols[:, None, :]].set(
        vals.astype(plane.dtype), mode="drop")


def _prep_patch(jnp, REF, slot, rows, cols):
    return REF[slot[:, None, None], rows[:, :, None],
               cols[:, None, :]].astype(jnp.int32)


def _taps(jnp, fb, small, ft, phase):
    return fb[small.astype(jnp.int32), ft & 3, phase]


@lru_cache(maxsize=None)
def put8_jobs_fn(n, H, W, bd, rh, rw):
    """8-tap put over (n, 11) jobs; indices/taps built in-jit."""
    jax = jax_mod()
    jnp = jax.numpy
    ib = intermediate_bits(bd)
    FB = filter_banks()

    def fn(REF, jobs, plane):
        h, w = jobs[:, 1], jobs[:, 2]
        py, px = jobs[:, 3], jobs[:, 4]
        slot, dy, dx = jobs[:, 5], jobs[:, 6], jobs[:, 7]
        amx, amy, ft = jobs[:, 8], jobs[:, 9], jobs[:, 10]
        fb = jnp.asarray(FB)
        fh = _taps(jnp, fb, w <= 4, ft, amx)
        fv = _taps(jnp, fb, h <= 4, ft >> 2, amy)
        rows, cols = _gather_ids(jnp, dy, dx, H + 7, W + 7, 3, rh, rw)
        patch = _prep_patch(jnp, REF, slot, rows, cols)
        mid = jnp.zeros((n, H + 7, W), jnp.int32)
        for i in range(8):
            mid = mid + fh[:, i, None, None] * patch[:, :, i:i + W]
        mid = _rnd(jnp, mid, 6 - ib)
        out = jnp.zeros((n, H, W), jnp.int32)
        for i in range(8):
            out = out + fv[:, i, None, None] * mid[:, i:i + H]
        out = jnp.clip(_rnd(jnp, out, 6 + ib), 0, (1 << bd) - 1)
        drows, dcols = _dst_ids(jnp, py, px, h, w, H, W)
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def bilin_jobs_fn(n, H, W, bd, rh, rw):
    """Bilinear put over (n, 11) jobs (ft column ignored)."""
    jax = jax_mod()
    jnp = jax.numpy
    ib = intermediate_bits(bd)

    def fn(REF, jobs, plane):
        h, w = jobs[:, 1], jobs[:, 2]
        py, px = jobs[:, 3], jobs[:, 4]
        slot, dy, dx = jobs[:, 5], jobs[:, 6], jobs[:, 7]
        amx, amy = jobs[:, 8], jobs[:, 9]
        rows, cols = _gather_ids(jnp, dy, dx, H + 1, W + 1, 0, rh, rw)
        p = _prep_patch(jnp, REF, slot, rows, cols)
        mid = _rnd(jnp, 16 * p[:, :, :W] +
                   amx[:, None, None] * (p[:, :, 1:W + 1] - p[:, :, :W]),
                   4 - ib)
        v = 16 * mid[:, :H] + amy[:, None, None] * (mid[:, 1:H + 1] -
                                                    mid[:, :H])
        out = jnp.clip(_rnd(jnp, v, 4 + ib), 0, (1 << bd) - 1)
        drows, dcols = _dst_ids(jnp, py, px, h, w, H, W)
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def warp_jobs_fn(n, bd, rh, rw):
    """8x8 affine warp tiles over (n, 12) jobs."""
    jax = jax_mod()
    jnp = jax.numpy
    ib = intermediate_bits(bd)
    WF_np = _warp_filter()

    def fn(REF, jobs, plane):
        py, px, slot = jobs[:, 1], jobs[:, 2], jobs[:, 3]
        dy, dx = jobs[:, 4], jobs[:, 5]
        mx, my = jobs[:, 6], jobs[:, 7]
        alpha, beta = jobs[:, 8], jobs[:, 9]
        gamma, delta = jobs[:, 10], jobs[:, 11]
        WF = jnp.asarray(WF_np)
        rows, cols = _gather_ids(jnp, dy, dx, 15, 15, 3, rh, rw)
        patch = _prep_patch(jnp, REF, slot, rows, cols)
        yy = jnp.arange(15, dtype=jnp.int32)
        xx = jnp.arange(8, dtype=jnp.int32)
        idx = 64 + ((mx[:, None, None] + beta[:, None, None] * yy[:, None]
                     + alpha[:, None, None] * xx[None, :] + 512) >> 10)
        F = WF[idx]
        mid = jnp.zeros((n, 15, 8), jnp.int32)
        for t in range(8):
            mid = mid + F[:, :, :, t] * patch[:, :, t:t + 8]
        mid = _rnd(jnp, mid, 7 - ib)
        yy8 = jnp.arange(8, dtype=jnp.int32)
        idxy = 64 + ((my[:, None, None] +
                      delta[:, None, None] * yy8[:, None] +
                      gamma[:, None, None] * xx[None, :] + 512) >> 10)
        Fv = WF[idxy]
        out = jnp.zeros((n, 8, 8), jnp.int32)
        for t in range(8):
            out = out + Fv[:, :, :, t] * mid[:, t:t + 8, :]
        out = jnp.clip(_rnd(jnp, out, 7 + ib), 0, (1 << bd) - 1)
        i8 = jnp.arange(8, dtype=jnp.int32)
        drows = py[:, None] + i8
        dcols = px[:, None] + i8
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def obmc_jobs_fn(n, ww, hh, lap_h, bd, top, rh, rw):
    """OBMC lap (8-tap put) + directional blend over (n, 13) jobs."""
    jax = jax_mod()
    jnp = jax.numpy
    ib = intermediate_bits(bd)
    px_max = (1 << bd) - 1
    FB = filter_banks()
    if top:
        hb = (hh * 3) >> 2
        m_np = obmc_masks()[hh:hh + hb].reshape(1, hb, 1)
    else:
        wb = (ww * 3) >> 2
        m_np = obmc_masks()[ww:ww + wb].reshape(1, 1, wb)

    def fn(REF, jobs, plane):
        py, px = jobs[:, 5], jobs[:, 6]
        slot, dy, dx = jobs[:, 7], jobs[:, 8], jobs[:, 9]
        amx, amy, ft = jobs[:, 10], jobs[:, 11], jobs[:, 12]
        fb = jnp.asarray(FB)
        fh = fb[1 if ww <= 4 else 0, ft & 3, amx]
        fv = fb[1 if lap_h <= 4 else 0, (ft >> 2) & 3, amy]
        m = jnp.asarray(m_np)
        rows, cols = _gather_ids(jnp, dy, dx, lap_h + 7, ww + 7, 3,
                                 rh, rw)
        patch = _prep_patch(jnp, REF, slot, rows, cols)
        mid = jnp.zeros((n, lap_h + 7, ww), jnp.int32)
        for i in range(8):
            mid = mid + fh[:, i, None, None] * patch[:, :, i:i + ww]
        mid = _rnd(jnp, mid, 6 - ib)
        lap = jnp.zeros((n, lap_h, ww), jnp.int32)
        for i in range(8):
            lap = lap + fv[:, i, None, None] * mid[:, i:i + lap_h]
        lap = jnp.clip(_rnd(jnp, lap, 6 + ib), 0, px_max)
        if top:
            hb_, wb_ = (hh * 3) >> 2, ww
            lap = lap[:, :hb_]
        else:
            hb_, wb_ = hh, (ww * 3) >> 2
            lap = lap[:, :, :wb_]
        drows = jnp.where(py[:, None] >= OOB, OOB,
                          py[:, None] + jnp.arange(hb_, dtype=jnp.int32))
        dcols = jnp.where(px[:, None] >= OOB, OOB,
                          px[:, None] + jnp.arange(wb_, dtype=jnp.int32))
        dst = plane[drows[:, :, None], dcols[:, None, :]].astype(jnp.int32)
        out = (dst * (64 - m) + lap * m + 32) >> 6
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def comp_jobs_fn(n, H, W, bd, ss_hor, ss_ver, rh, rw, seg_out,
                 use_msk=True):
    """Compound (two 8-tap preps + combine) over (n, 21) jobs.

    msk: (n, H, W) int8 wedge weights (mkind==1 rows; zeros otherwise).
    segplane: device (Hc, Wc) int32 holding luma w_mask outputs at
    chroma coordinates. With seg_out=True (luma pass) SEG jobs scatter
    their subsampled w_mask there; with seg_out=False (chroma pass)
    mkind==2 jobs gather their mask from it — so the seg mask never
    crosses the host boundary (reference w_mask 444/422/420 chain,
    mc_tmpl.c:724-768).
    """
    jax = jax_mod()
    jnp = jax.numpy
    ib = intermediate_bits(bd)
    pb = prep_bias(bd)
    px_max = (1 << bd) - 1
    FB = filter_banks()

    def fn(REF, jobs, msk, segplane, plane):
        h, w = jobs[:, 1], jobs[:, 2]
        py, px = jobs[:, 3], jobs[:, 4]
        mode, jw, sign = jobs[:, 5], jobs[:, 6], jobs[:, 7]
        mkind = jobs[:, 8]
        fb = jnp.asarray(FB)

        def prep(base):
            dy, dx = jobs[:, base], jobs[:, base + 1]
            amx, amy = jobs[:, base + 2], jobs[:, base + 3]
            ft, slot = jobs[:, base + 4], jobs[:, base + 5]
            fh = _taps(jnp, fb, w <= 4, ft, amx)
            fv = _taps(jnp, fb, h <= 4, ft >> 2, amy)
            rows, cols = _gather_ids(jnp, dy, dx, H + 7, W + 7, 3,
                                     rh, rw)
            patch = _prep_patch(jnp, REF, slot, rows, cols)
            mid = jnp.zeros((n, H + 7, W), jnp.int32)
            for i in range(8):
                mid = mid + fh[:, i, None, None] * patch[:, :, i:i + W]
            mid = _rnd(jnp, mid, 6 - ib)
            out = jnp.zeros((n, H, W), jnp.int32)
            for i in range(8):
                out = out + fv[:, i, None, None] * mid[:, i:i + H]
            return _rnd(jnp, out, 6) - pb

        t0 = prep(9)
        t1 = prep(15)
        sgn = sign[:, None, None]
        ts0 = jnp.where(sgn == 1, t1, t0)
        ts1 = jnp.where(sgn == 1, t0, t1)
        m3 = mode[:, None, None]
        avg = (t0 + t1 + ((1 << ib) + pb * 2)) >> (ib + 1)
        jw3 = jw[:, None, None]
        wavg = (t0 * jw3 + t1 * (16 - jw3) +
                ((8 << ib) + pb * 16)) >> (ib + 4)
        mask_sh = bd + ib - 4
        mask_rnd = 1 << (mask_sh - 5)
        tdiff = ts0 - ts1
        m_seg = jnp.minimum(38 + ((jnp.abs(tdiff) + mask_rnd) >> mask_sh),
                            64)
        drows, dcols = _dst_ids(jnp, py, px, h, w, H, W)
        msk_i = msk.astype(jnp.int32) if use_msk else \
            jnp.zeros((n, H, W), jnp.int32)
        if seg_out:
            m_ext = msk_i
        else:
            # chroma: mkind==2 gathers the mask from the seg plane at
            # this job's own dst coordinates (clamped; padding lanes
            # read garbage but their scatter drops)
            sp = segplane[jnp.clip(drows, 0, segplane.shape[0] - 1)
                          [:, :, None],
                          jnp.clip(dcols, 0, segplane.shape[1] - 1)
                          [:, None, :]]
            m_ext = jnp.where((mkind == 2)[:, None, None], sp, msk_i)
        m_used = jnp.where(m3 == COMP_SEG, m_seg, m_ext)
        masked = (tdiff * m_used + ts1 * 64 +
                  ((32 << ib) + pb * 64)) >> (ib + 6)
        out = jnp.where(m3 == COMP_AVG, avg,
                        jnp.where(m3 == COMP_WAVG, wavg, masked))
        out = jnp.clip(out, 0, px_max)
        plane = _scatter(plane, drows, dcols, out)
        if not seg_out:
            return plane, segplane
        # luma SEG jobs: subsample the w_mask output and scatter it to
        # chroma coordinates for the chroma combines
        if ss_hor:
            mpair = m_seg[:, :, 0::2] + m_seg[:, :, 1::2]
            if ss_ver:
                seg_sub = (mpair[:, 0::2] + mpair[:, 1::2] +
                           2 - sign[:, None, None]) >> 2
            else:
                seg_sub = (mpair + 1 - sign[:, None, None]) >> 1
        else:
            seg_sub = m_seg
        Hc, Wc = H >> ss_ver, W >> ss_hor
        is_seg = mode == COMP_SEG
        ihc = jnp.arange(Hc, dtype=jnp.int32)
        iwc = jnp.arange(Wc, dtype=jnp.int32)
        hc, wc = h >> ss_ver, w >> ss_hor
        pyc = jnp.where(is_seg, py >> ss_ver, OOB)
        pxc = jnp.where(is_seg, px >> ss_hor, OOB)
        sdr = jnp.where(ihc[None, :] < hc[:, None], pyc[:, None] + ihc,
                        OOB)
        sdc = jnp.where(iwc[None, :] < wc[:, None], pxc[:, None] + iwc,
                        OOB)
        segplane = segplane.at[sdr[:, :, None], sdc[:, None, :]].set(
            seg_sub.astype(segplane.dtype), mode="drop")
        return plane, segplane

    return jax.jit(fn)


@lru_cache(maxsize=None)
def res_tx_fn(n, tx, bd):
    """Pass-D residual program with the (row, col) 1-D transform kinds
    selected at RUNTIME by lax.switch: one compiled program per
    (tx, batch-bucket, plane-shape) serves every non-WHT txtp.

    Rationale: at 1080p a frame touches hundreds of distinct
    (plane, tx, txtp) combos; compiling one XLA program per combo (the
    round-3 res_jobs_fn below) produced a 400s/frame first-run compile
    wall on host XLA and a large remote-compile surface on the tunnel
    TPU. Grouping launches by (plane, tx, txtp) but PROGRAMS by
    (plane, tx) collapses ~450 programs to ~50, and — with fixed batch
    buckets — makes the compiled-program set stream-independent, so a
    warm persistent cache serves any content. Semantics are identical:
    the switch index pair selects the same itx_core butterflies the
    per-txtp program would have baked in (reference itx_tmpl.c:43-121;
    kind order DCT/ADST/FLIPADST/IDENTITY as itx_1d.c)."""
    from ..entropy import levels as lv
    from . import itx_core
    from .itx_ref import TX_SHIFT
    jax = jax_mod()
    jnp = jax.numpy
    t_dim = lv.TXFM_INFO[tx]
    w, h = 4 * t_dim.w, 4 * t_dim.h
    sw, sh = min(w, 32), min(h, 32)
    bd_max = (1 << bd) - 1
    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1
    is_rect2 = (w * 2 == h) or (h * 2 == w)
    if bd == 8:
        row_min = col_min = -(1 << 15)
    else:
        row_min = -(bd_max + 1) << 7
        col_min = -(bd_max + 1) << 5
    row_max, col_max = ~row_min, ~col_min
    lw2, lh2 = t_dim.lw + 2, t_dim.lh + 2
    row_kinds = res_tx_kinds(tx)[0]
    col_kinds = res_tx_kinds(tx)[1]

    def _row_branch(kind):
        f = itx_core.FNS[(lw2, kind)]

        def br(rows):                        # (n, sh, sw) -> (n, sh, w)
            out = f([rows[:, :, i] for i in range(sw)],
                    lambda v: jnp.clip(v, row_min, row_max))
            return jnp.stack(out, axis=2)
        return br

    def _col_branch(kind):
        f = itx_core.FNS[(lh2, kind)]

        def br(tmp):                         # (n, sh, w) -> (n, h, w)
            out = f([tmp[:, i, :] for i in range(sh)],
                    lambda v: jnp.clip(v, col_min, col_max))
            return jnp.stack(out, axis=1)
        return br

    row_brs = [_row_branch(k) for k in row_kinds]
    col_brs = [_col_branch(k) for k in col_kinds]

    def fn(cfpool, jobs, kidx, plane):
        off = jobs[:, 5]
        cf = cfpool[off[:, None] + jnp.arange(sw * sh, dtype=jnp.int32)]
        rows = cf.reshape(n, sw, sh).transpose(0, 2, 1)
        if is_rect2:
            rows = (rows * 181 + 128) >> 8
        tmp = jax.lax.switch(kidx[0], row_brs, rows)
        tmp = jnp.clip((tmp + rnd) >> shift, col_min, col_max)
        res = (jax.lax.switch(kidx[1], col_brs, tmp) + 8) >> 4
        py, px = jobs[:, 3], jobs[:, 4]
        drows = jnp.where(py[:, None] >= OOB, OOB, py[:, None] +
                          jnp.arange(h, dtype=jnp.int32))
        dcols = jnp.where(px[:, None] >= OOB, OOB, px[:, None] +
                          jnp.arange(w, dtype=jnp.int32))
        cur = plane[drows[:, :, None], dcols[:, None, :]].astype(jnp.int32)
        out = jnp.clip(cur + res, 0, bd_max)
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def res_tx_kinds(tx):
    """(row_kinds, col_kinds): the 1-D transform kinds available for
    this tx's dimensions, in itx_core kind order (DCT, ADST, FLIPADST,
    IDENTITY). Launch code maps txtp -> switch indices with .index()."""
    from ..entropy import levels as lv
    from . import itx_core
    t_dim = lv.TXFM_INFO[tx]
    lw2, lh2 = t_dim.lw + 2, t_dim.lh + 2
    return ([k for k in range(4) if (lw2, k) in itx_core.FNS],
            [k for k in range(4) if (lh2, k) in itx_core.FNS])


@lru_cache(maxsize=None)
def res_jobs_fn(n, tx, txtp, bd):
    """Fused inverse transform + residual add + scatter over (n, 6)
    jobs: coefficients gather straight from the uploaded Stage-A pool
    (cfoff column), so residual pixels never exist on the host
    (reference itx_tmpl.c:43-121 + recon_tmpl.c itxfm_add call sites).
    The generic path is bit-identical to the dc-only fast path, so one
    static program serves every eob (see ops/itx.py)."""
    from ..entropy import levels as lv
    from . import itx_core
    from .itx_ref import TX1D_TYPES, TX_SHIFT
    jax = jax_mod()
    jnp = jax.numpy
    t_dim = lv.TXFM_INFO[tx]
    w, h = 4 * t_dim.w, 4 * t_dim.h
    sw, sh = min(w, 32), min(h, 32)
    bd_max = (1 << bd) - 1

    if txtp == lv.WHT_WHT:
        def fn(cfpool, jobs, plane):
            off = jobs[:, 5]
            cf = cfpool[off[:, None] + jnp.arange(sw * sh,
                                                  dtype=jnp.int32)]
            c = (cf.reshape(n, 4, 4) >> 2)           # [x][y]
            rows = itx_core.wht4([c[:, i, :] for i in range(4)])
            cols = itx_core.wht4([jnp.stack(rows, 1)[:, :, i]
                                  for i in range(4)])
            res = jnp.stack(cols, 1)                     # (n, y, x)
            py, px = jobs[:, 3], jobs[:, 4]
            i4 = jnp.arange(4, dtype=jnp.int32)
            drows = py[:, None] + i4
            dcols = px[:, None] + i4
            cur = plane[drows[:, :, None],
                        dcols[:, None, :]].astype(jnp.int32)
            out = jnp.clip(cur + res, 0, bd_max)
            return _scatter(plane, drows, dcols, out)

        return jax.jit(fn)

    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1
    is_rect2 = (w * 2 == h) or (h * 2 == w)
    if bd == 8:
        row_min = col_min = -(1 << 15)
    else:
        row_min = -(bd_max + 1) << 7
        col_min = -(bd_max + 1) << 5
    row_max, col_max = ~row_min, ~col_min
    first_t, second_t = TX1D_TYPES[txtp]
    first_fn = itx_core.FNS[(t_dim.lw + 2, first_t)]
    second_fn = itx_core.FNS[(t_dim.lh + 2, second_t)]

    def fn(cfpool, jobs, plane):
        off = jobs[:, 5]
        cf = cfpool[off[:, None] + jnp.arange(sw * sh, dtype=jnp.int32)]
        cfm = cf.reshape(n, sw, sh)
        rows = cfm.transpose(0, 2, 1)
        if is_rect2:
            rows = (rows * 181 + 128) >> 8
        row_out = first_fn([rows[:, :, i] for i in range(sw)],
                           lambda v: jnp.clip(v, row_min, row_max))
        tmp = jnp.stack(row_out, axis=2)
        tmp = jnp.clip((tmp + rnd) >> shift, col_min, col_max)
        col_out = second_fn([tmp[:, i, :] for i in range(sh)],
                            lambda v: jnp.clip(v, col_min, col_max))
        res = (jnp.stack(col_out, axis=1) + 8) >> 4    # (n, h, w)
        py, px = jobs[:, 3], jobs[:, 4]
        drows = jnp.where(py[:, None] >= OOB, OOB, py[:, None] +
                          jnp.arange(h, dtype=jnp.int32))
        dcols = jnp.where(px[:, None] >= OOB, OOB, px[:, None] +
                          jnp.arange(w, dtype=jnp.int32))
        cur = plane[drows[:, :, None], dcols[:, None, :]].astype(jnp.int32)
        out = jnp.clip(cur + res, 0, bd_max)
        return _scatter(plane, drows, dcols, out)

    return jax.jit(fn)
