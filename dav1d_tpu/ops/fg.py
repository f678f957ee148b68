"""Film grain application — whole-plane device kernel.

TPU-native formulation of the reference grain synthesis (reference
src/filmgrain_tmpl.c:169-423 fgy/fguv_32x32xn, fg_apply_tmpl.c):
grain-LUT and scaling-LUT generation stay on the host (tiny,
inherently serial AR/LFSR recursions; cached per grain-parameter set —
dav1d regenerates them per frame, we memoize), while the 32x32-block
application becomes one whole-plane program: the per-block offset
chains expand to per-pixel grain-LUT gather maps (main/left/top/
topleft), the overlap blends become masked weight maps, and the
scaling LUT is a device gather on the source pixels.

Bit-exact vs ops/fg_ref.py (the validated golden model) by tests.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod, device_scope
from . import fg_ref
from .fg_ref import (FG_BLOCK_SIZE, GRAIN_WIDTH, _rand, generate_grain_y,
                     generate_grain_uv, generate_scaling)

_GRAIN_CACHE = {}


def _fgd_key(fgd, bd):
    return (fgd.seed, bd, fgd.grain_scale_shift, fgd.ar_coeff_lag,
            fgd.ar_coeff_shift, tuple(fgd.ar_coeffs_y),
            tuple(tuple(c) for c in fgd.ar_coeffs_uv),
            tuple(fgd.num_uv_points), fgd.chroma_scaling_from_luma,
            fgd.num_y_points,
            tuple(tuple(p) for p in fgd.y_points[:fgd.num_y_points]),
            tuple(tuple(tuple(p) for p in fgd.uv_points[i]
                        [:fgd.num_uv_points[i]]) for i in range(2)),
            fgd.scaling_shift)


def _grain_data(fgd, ss_x, ss_y, bd):
    """Grain + scaling LUTs, memoized (stable across frames that reuse
    the same film-grain parameters)."""
    key = (_fgd_key(fgd, bd), ss_x, ss_y)
    hit = _GRAIN_CACHE.get(key)
    if hit is not None:
        return hit
    lut_y = generate_grain_y(fgd, bd)
    luts = [lut_y, None, None]
    for uv in range(2):
        if fgd.num_uv_points[uv] or fgd.chroma_scaling_from_luma:
            luts[1 + uv] = generate_grain_uv(fgd, lut_y, uv, ss_x, ss_y,
                                             bd)
    scalings = [None, None, None]
    if fgd.num_y_points or fgd.chroma_scaling_from_luma:
        scalings[0] = generate_scaling(bd, fgd.y_points, fgd.num_y_points)
    for uv in range(2):
        if fgd.num_uv_points[uv]:
            scalings[1 + uv] = generate_scaling(bd, fgd.uv_points[uv],
                                                fgd.num_uv_points[uv])
    if len(_GRAIN_CACHE) > 32:
        _GRAIN_CACHE.clear()
    _GRAIN_CACHE[key] = (luts, scalings)
    return luts, scalings


def _block_offsets(fgd, n_rows, n_bx):
    """Per-(32-row, 32-col-block) grain offsets. Each row draws its own
    8-bit LFSR chain from a row-seeded state (reference
    filmgrain_tmpl.c:183-195); the row above's chain is re-derived
    identically, so off[row-1, bx] is exactly the 'top' offset."""
    off = np.zeros((n_rows, n_bx), np.int32)
    for row in range(n_rows):
        s = fgd.seed
        s ^= ((row * 37 + 178) & 0xFF) << 8
        s ^= (row * 173 + 105) & 0xFF
        state = [s]
        for b in range(n_bx):
            off[row, b] = _rand(state, 8)
    return off


def _w_vecs(bs, sub):
    """Per-in-block-position overlap weight vectors (length bs)."""
    wtab = fg_ref.W_OVERLAP_SUB if sub else fg_ref.W_OVERLAP
    w0 = np.zeros(bs, np.int32)
    w1 = np.zeros(bs, np.int32)
    for i, (a, b_) in enumerate(wtab):
        w0[i] = a
        w1[i] = b_
    return w0, w1


def _grain_maps_injit(jnp, off, h, w, sx, sy, lut_w):
    """Per-pixel grain-LUT gather indices + overlap masks/weights,
    built ON DEVICE from the (n_rows, n_bx) block-offset table (the
    precomputed full-frame int32 maps cost ~32MB of tunnel traffic per
    1080p frame; the offset table is a few KB)."""
    bs_y = FG_BLOCK_SIZE >> sy
    bs_x = FG_BLOCK_SIZE >> sx
    n_rows, n_bx = off.shape
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    row_of = ys // bs_y
    bx_of = xs // bs_x
    y_in = ys - row_of * bs_y
    x_in = xs - bx_of * bs_x

    def maps(dx_blk, dy_blk):
        r = jnp.clip(row_of - dy_blk, 0, n_rows - 1)
        b = jnp.clip(bx_of - dx_blk, 0, n_bx - 1)
        rv = off[r[:, None], b[None, :]]
        offx = 3 + (2 >> sx) * (3 + (rv >> 4))
        offy = 3 + (2 >> sy) * (3 + (rv & 0xF))
        iy = offy + y_in[:, None] + bs_y * dy_blk
        ix = offx + x_in[None, :] + bs_x * dx_blk
        return iy * lut_w + ix

    xmask = (x_in < min(2 >> sx, 2))[None, :] & (bx_of > 0)[None, :]
    ymask = (y_in < min(2 >> sy, 2))[:, None] & (row_of > 0)[:, None]
    wx0v, wx1v = _w_vecs(bs_x, sx)
    wy0v, wy1v = _w_vecs(bs_y, sy)
    wx0 = jnp.take(jnp.asarray(wx0v), x_in)[None, :]
    wx1 = jnp.take(jnp.asarray(wx1v), x_in)[None, :]
    wy0 = jnp.take(jnp.asarray(wy0v), y_in)[:, None]
    wy1 = jnp.take(jnp.asarray(wy1v), y_in)[:, None]
    return maps, xmask, ymask, wx0, wx1, wy0, wy1


@lru_cache(maxsize=None)
def _fgy_fn(h, w, bd, scaling_shift, overlap, clip_range, lut_w):
    jax = jax_mod()
    jnp = jax.numpy
    bdm8 = bd - 8
    ctr = 128 << bdm8
    mn, mx = (16 << bdm8, 235 << bdm8) if clip_range else \
        (0, (1 << bd) - 1)

    def rnd2(x, s):
        return (x + ((1 << s) >> 1)) >> s

    def fn(src, lut, scaling, off):
        maps, xmask, ymask, wx0, wx1, wy0, wy1 = \
            _grain_maps_injit(jnp, off, h, w, 0, 0, lut_w)
        main, left = maps(0, 0), maps(1, 0)
        top, topleft = maps(0, 1), maps(1, 1)
        lf = lut.reshape(-1)
        G = jnp.take(lf, main)
        if overlap:
            GL = jnp.take(lf, left)
            GT = jnp.take(lf, top)
            GTL = jnp.take(lf, topleft)
            g1 = jnp.where(
                xmask,
                jnp.clip(rnd2(GL * wx0 + G * wx1, 5), -ctr, ctr - 1), G)
            t1 = jnp.where(
                xmask,
                jnp.clip(rnd2(GTL * wx0 + GT * wx1, 5), -ctr, ctr - 1), GT)
            g = jnp.where(
                ymask,
                jnp.clip(rnd2(t1 * wy0 + g1 * wy1, 5), -ctr, ctr - 1), g1)
        else:
            g = G
        sv = src.astype(jnp.int32)
        noise = rnd2(jnp.take(scaling, sv) * g, scaling_shift)
        return jnp.clip(sv + noise, mn, mx)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _fguv_fn(h, w, bd, scaling_shift, overlap, clip_range, is_id, sx, sy,
             csfl, uv_luma_mult, uv_mult, uv_offset, lut_w):
    jax = jax_mod()
    jnp = jax.numpy
    bdm8 = bd - 8
    ctr = 128 << bdm8
    mn = (16 << bdm8) if clip_range else 0
    mx = ((235 if is_id else 240) << bdm8) if clip_range else \
        (1 << bd) - 1

    def rnd2(x, s):
        return (x + ((1 << s) >> 1)) >> s

    def fn(src, luma, lut, scaling, off):
        maps, xmask, ymask, wx0, wx1, wy0, wy1 = \
            _grain_maps_injit(jnp, off, h, w, sx, sy, lut_w)
        main, left = maps(0, 0), maps(1, 0)
        top, topleft = maps(0, 1), maps(1, 1)
        lf = lut.reshape(-1)
        G = jnp.take(lf, main)
        if overlap:
            GL = jnp.take(lf, left)
            GT = jnp.take(lf, top)
            GTL = jnp.take(lf, topleft)
            g1 = jnp.where(
                xmask,
                jnp.clip(rnd2(GL * wx0 + G * wx1, 5), -ctr, ctr - 1), G)
            t1 = jnp.where(
                xmask,
                jnp.clip(rnd2(GTL * wx0 + GT * wx1, 5), -ctr, ctr - 1), GT)
            g = jnp.where(
                ymask,
                jnp.clip(rnd2(t1 * wy0 + g1 * wy1, 5), -ctr, ctr - 1), g1)
        else:
            g = G
        # luma average at this chroma position
        ly = luma[::1 << sy, ::1 << sx][:h, :w].astype(jnp.int32)
        if sx:
            ly2 = luma[::1 << sy, 1::1 << sx][:h, :w].astype(jnp.int32)
            avg = (ly + ly2 + 1) >> 1
        else:
            avg = ly
        sv = src.astype(jnp.int32)
        if csfl:
            val = avg
        else:
            combined = avg * uv_luma_mult + sv * uv_mult
            val = jnp.clip((combined >> 6) + uv_offset * (1 << bdm8),
                           0, (1 << bd) - 1)
        noise = rnd2(jnp.take(scaling, val) * g, scaling_shift)
        return jnp.clip(sv + noise, mn, mx)

    return jax.jit(fn)


def apply_film_grain_device(pic, fh, seq):
    """Device-path grain application; same contract as
    fg_ref.apply_film_grain (returns a grained copy)."""
    fgd = fh.film_grain_data
    if not fh.film_grain_present:
        return pic
    from ..recon.picture import Picture
    from .backend import fetch_pic_host
    fetch_pic_host(pic)    # the output copy below reads host planes
    bd = pic.bpc
    out = Picture(pic.w, pic.h, pic.layout, bd)
    for i, p in enumerate(pic.planes):
        out.planes[i][:] = p
    ss_x, ss_y = pic.ss_hor, pic.ss_ver
    luts, scalings = _grain_data(fgd, ss_x, ss_y, bd)
    w, h = pic.w, pic.h
    is_id = getattr(seq, "mtrx", 0) == 0
    n_rows = (h + FG_BLOCK_SIZE - 1) // FG_BLOCK_SIZE
    n_bx = (w + FG_BLOCK_SIZE - 1) // FG_BLOCK_SIZE
    off = _block_offsets(fgd, n_rows, n_bx)
    overlap = bool(fgd.overlap_flag)

    # device-resident source planes (Picture.dev) skip the upload
    devp = getattr(pic, "dev", None)

    def _src(pl_idx, hh, ww):
        if devp is not None:
            return devp[pl_idx][:hh, :ww]
        return np.asarray(pic.planes[pl_idx][:hh, :ww], np.int32)

    with device_scope():
        if fgd.num_y_points:
            fn = _fgy_fn(h, w, bd, fgd.scaling_shift, overlap,
                         bool(fgd.clip_to_restricted_range),
                         luts[0].shape[1])
            res = fn(_src(0, h, w),
                     luts[0].astype(np.int32),
                     scalings[0].astype(np.int32), off)
            out.planes[0][:h, :w] = np.asarray(res).astype(
                out.planes[0].dtype)
        if pic.layout != 0 and (fgd.num_uv_points[0] or
                                fgd.num_uv_points[1] or
                                fgd.chroma_scaling_from_luma):
            cw = (w + ss_x) >> ss_x
            chh = (h + ss_y) >> ss_y
            for pl in range(2):
                if not (fgd.num_uv_points[pl] or
                        fgd.chroma_scaling_from_luma):
                    continue
                sc = scalings[0] if fgd.chroma_scaling_from_luma else \
                    scalings[1 + pl]
                fn = _fguv_fn(chh, cw, bd, fgd.scaling_shift, overlap,
                              bool(fgd.clip_to_restricted_range),
                              bool(is_id), ss_x, ss_y,
                              bool(fgd.chroma_scaling_from_luma),
                              int(fgd.uv_luma_mult[pl]),
                              int(fgd.uv_mult[pl]),
                              int(fgd.uv_offset[pl]),
                              luts[1 + pl].shape[1])
                res = fn(_src(1 + pl, chh, cw),
                         _src(0, chh << ss_y, (cw << ss_x) + ss_x),
                         luts[1 + pl].astype(np.int32),
                         sc.astype(np.int32), off)
                out.planes[1 + pl][:chh, :cw] = np.asarray(res).astype(
                    out.planes[1 + pl].dtype)
    return out
