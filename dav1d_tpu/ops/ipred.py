"""Intra prediction — batched device kernels.

TPU formulation of the reference ipred family (reference
src/ipred_tmpl.c:44-659): a batch of same-geometry intra jobs computes
from per-job EDGE BUFFERS — (n, 321) int32 arrays with the golden
Edge layout (center 160, buf[C + i] == topleft_out[i]) — gathered on
device from the current plane by host-built index tables
(recon/ipred_device.py builds them with the exact
ipred_prepare_tmpl.c:74-203 availability logic, so the device never
branches on availability). The mode-dependent select runs as masked
whole-batch arithmetic:

- the splat family (DC variants / V / H / PAETH / SMOOTH*) computes
  every candidate and selects by the per-job dsp mode — the candidates
  are tiny (<=64x64) and the select keeps one compiled program per
  geometry;
- Z1/Z2/Z3 take per-job angle derivatives + edge-filter strengths as
  data (the upsample flags are static group keys, reference
  ipred_tmpl.c:392-407): raw and strength-1..3 filtered edges are all
  computed and selected per job.

Bit-exact vs ops/ipred_ref.py (the validated golden model) by
tests/test_ipred_device.py.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import tables
from ..entropy import levels as lv
from .backend import jax_mod

C = 160                 # edge buffer center (matches ipred_ref.Edge)
EDGE_LEN = 2 * C + 1


def _lv():
    from . import ipred_ref as r
    return r


@lru_cache(maxsize=None)
def _sm_weights_np(n):
    return tables.get("dav1d_sm_weights")[n:n + n].astype(np.int32)


@lru_cache(maxsize=None)
def edge_gather_fn(n, flat_len):
    """(src_flat (flat_len,), idx (n, 321), tlf (n,)) -> edges (n, 321)
    with the Z2 topleft 5-6-5 filter applied where tlf != 0
    (reference ipred_prepare_tmpl.c:186-190)."""
    jax = jax_mod()
    jnp = jax.numpy

    def fn(src_flat, idx, tlf):
        e = src_flat[idx].astype(jnp.int32)
        filt = ((e[:, C - 1] + e[:, C + 1]) * 5 + e[:, C] * 6 + 8) >> 4
        tl = jnp.where(tlf != 0, filt, e[:, C])
        return e.at[:, C].set(tl)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def splat_family_fn(n, w, h, bd):
    """Non-angular predictors over (n, 321) edges; per-job dsp `mode`
    selects among DC/DC_128/TOP_DC/LEFT_DC/H/V/PAETH/SMOOTH/SMOOTH_V/
    SMOOTH_H (reference ipred_tmpl.c:44-328). Returns (n, h, w)."""
    r = _lv()
    jax = jax_mod()
    jnp = jax.numpy
    half = (1 << bd) >> 1
    wh_w = _sm_weights_np(w)
    wh_h = _sm_weights_np(h)
    # dc shift/mult statics (ipred_tmpl.c dc_gen)
    ctz = ((w + h) & -(w + h)).bit_length() - 1
    if w != h:
        if bd == 8:
            mult = 0x3334 if (w > h * 2 or h > w * 2) else 0x5556
            msh = 16
        else:
            mult = 0x6667 if (w > h * 2 or h > w * 2) else 0xAAAB
            msh = 17
    else:
        mult, msh = 1, 0

    def fn(edges, mode):
        top = edges[:, C + 1:C + 1 + w]                     # (n, w)
        left = edges[:, C - h:C][:, ::-1]                   # (n, h) top 1st
        tl = edges[:, C][:, None, None]
        t3 = top[:, None, :]
        l3 = left[:, :, None]

        sum_t = jnp.sum(top, axis=1)
        sum_l = jnp.sum(left, axis=1)
        dc = (sum_t + sum_l + ((w + h) >> 1)) >> ctz
        if mult != 1:
            dc = (dc * mult) >> msh
        dc_top = (sum_t + (w >> 1)) >> (w.bit_length() - 1)
        dc_left = (sum_l + (h >> 1)) >> (h.bit_length() - 1)

        base = l3 + t3 - tl
        ldiff = jnp.abs(l3 - base)
        tdiff = jnp.abs(t3 - base)
        tldiff = jnp.abs(tl - base)
        paeth = jnp.where(
            (ldiff <= tdiff) & (ldiff <= tldiff),
            jnp.broadcast_to(l3, (n, h, w)),
            jnp.where(tdiff <= tldiff, jnp.broadcast_to(t3, (n, h, w)),
                      jnp.broadcast_to(tl, (n, h, w))))

        swh = jnp.asarray(wh_w)[None, None, :]
        swv = jnp.asarray(wh_h)[None, :, None]
        right = edges[:, C + w][:, None, None]
        bottom = edges[:, C - h][:, None, None]
        smooth = (swv * t3 + (256 - swv) * bottom +
                  swh * l3 + (256 - swh) * right + 256) >> 9
        smooth_v = (swv * t3 + (256 - swv) * bottom + 128) >> 8
        smooth_h = (swh * l3 + (256 - swh) * right + 128) >> 8

        def splat(v):
            return jnp.broadcast_to(v[:, None, None], (n, h, w))

        m = mode[:, None, None]
        out = splat(dc)
        out = jnp.where(m == r.DC_128_PRED, half, out)
        out = jnp.where(m == r.TOP_DC_PRED, splat(dc_top), out)
        out = jnp.where(m == r.LEFT_DC_PRED, splat(dc_left), out)
        out = jnp.where(m == r.VERT_PRED, jnp.broadcast_to(t3, (n, h, w)),
                        out)
        out = jnp.where(m == r.HOR_PRED, jnp.broadcast_to(l3, (n, h, w)),
                        out)
        out = jnp.where(m == r.PAETH_PRED, paeth, out)
        out = jnp.where(m == r.SMOOTH_PRED, smooth, out)
        out = jnp.where(m == r.SMOOTH_V_PRED, smooth_v, out)
        out = jnp.where(m == r.SMOOTH_H_PRED, smooth_h, out)
        return out

    return jax.jit(fn)


_EDGE_KERNELS = np.array([[0, 4, 8, 4, 0], [0, 5, 6, 5, 0],
                          [2, 4, 4, 4, 2]], np.int32)


def _filter_edges_batch(jnp, edges, base, sz, src_from, src_to,
                        lim_from, lim_to, strength):
    """Batched ipred_tmpl.c:363-386 with per-job strength select
    (strength==0 -> raw passthrough of topleft_out[base-C .. +sz)).
    base: buffer index of element 0. lim_from/lim_to: (n,) or scalars.
    Returns (n, sz) int32."""
    idx = np.clip(np.arange(-2, sz + 2), src_from, src_to - 1)
    vals = edges[:, base + idx]                      # (n, sz+4)
    outs = [edges[:, base:base + sz]]
    for s in range(3):
        kern = _EDGE_KERNELS[s]
        acc = jnp.zeros(outs[0].shape, jnp.int32)
        for j in range(5):
            k = int(kern[j])
            if k:
                acc = acc + vals[:, j:j + sz] * k
        filt = (acc + 8) >> 4
        i = jnp.arange(sz)[None, :]
        lf = jnp.minimum(jnp.asarray(lim_from), sz)
        lt = jnp.minimum(jnp.asarray(lim_to), sz)
        if getattr(lf, "ndim", 0) == 1:
            lf = lf[:, None]
        if getattr(lt, "ndim", 0) == 1:
            lt = lt[:, None]
        passthru = vals[:, 2:2 + sz]
        outs.append(jnp.where((i < lf) | (i >= lt), passthru, filt))
    s3 = strength[:, None]
    out = jnp.where(s3 == 1, outs[1],
                    jnp.where(s3 == 2, outs[2],
                              jnp.where(s3 == 3, outs[3], outs[0])))
    return out


def _upsample_edges_batch(jnp, edges, base, hsz, src_from, src_to, bd):
    """Batched ipred_tmpl.c:392-407; returns (n, 2*hsz) int32."""
    bd_max = (1 << bd) - 1
    idx = np.clip(np.arange(-1, hsz + 1), src_from, src_to - 1)
    vals = edges[:, base + idx]                      # (n, hsz+2)
    nn = hsz - 1
    s = (-vals[:, 0:nn] + 9 * vals[:, 1:1 + nn] + 9 * vals[:, 2:2 + nn]
         - vals[:, 3:3 + nn] + 8) >> 4
    s = jnp.clip(s, 0, bd_max)
    n = edges.shape[0]
    out = jnp.zeros((n, hsz * 2), jnp.int32)
    out = out.at[:, 0:2 * nn:2].set(vals[:, 1:1 + nn])
    out = out.at[:, 1:2 * nn:2].set(s)
    out = out.at[:, nn * 2].set(vals[:, 1 + nn])
    return out


@lru_cache(maxsize=None)
def z1_fn(n, w, h, bd, upsample):
    """Z1 (reference ipred_tmpl.c:409-461) over per-job dx (pre-shifted
    when upsample) and strength (0=raw)."""
    jax = jax_mod()
    jnp = jax.numpy
    wmin = min(w, h)

    def fn(edges, dx, strength):
        if upsample:
            top = _upsample_edges_batch(jnp, edges, C + 1, w + h, -1,
                                        w + wmin, bd)
            L = 2 * (w + h)
            max_base = jnp.full((n,), 2 * (w + h) - 2, jnp.int32)
            base_inc = 2
        else:
            # unified length-L buffer: raw entries clamp at w+wmin-1
            # exactly like the golden top[min(idx, len-1)]
            L = w + h
            raw_idx = np.minimum(np.arange(L), w + wmin - 1)
            raw = edges[:, C + 1 + raw_idx]
            filt = _filter_edges_batch(jnp, edges, C + 1, w + h, -1,
                                       w + wmin, 0, w + h, strength)
            top = jnp.where((strength > 0)[:, None], filt, raw)
            max_base = jnp.where(strength > 0, w + h - 1, w + wmin - 1) \
                .astype(jnp.int32)
            base_inc = 1
        xpos = dx[:, None] * jnp.arange(1, h + 1)[None, :]   # (n, h)
        frac = (xpos & 0x3E)[:, :, None]
        base = (xpos >> 6)[:, :, None] + \
            (jnp.arange(w) * base_inc)[None, None, :]
        mb = max_base[:, None, None]
        bc = jnp.minimum(base, mb)
        g0 = jnp.take_along_axis(top[:, None, :].repeat(h, 1)
                                 .reshape(n * h, L),
                                 bc.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        bc1 = jnp.minimum(bc + 1, L - 1)
        g1 = jnp.take_along_axis(top[:, None, :].repeat(h, 1)
                                 .reshape(n * h, L),
                                 bc1.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        v = g0 * (64 - frac) + g1 * frac
        last = jnp.take_along_axis(top, max_base[:, None], axis=1)
        return jnp.where(base < mb, (v + 32) >> 6,
                         last[:, :, None]).astype(jnp.int32)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def z3_fn(n, w, h, bd, upsample):
    """Z3 (reference ipred_tmpl.c:529-581) over per-job dy + strength."""
    jax = jax_mod()
    jnp = jax.numpy
    wmin = min(w, h)
    base0 = C - (w + h)
    sfrom = max(w - h, 0)

    def fn(edges, dy, strength):
        if upsample:
            arr = _upsample_edges_batch(jnp, edges, base0, w + h, sfrom,
                                        w + h + 1, bd)
            L = 2 * (w + h)
            anchor = 2 * (w + h) - 2
            max_base = jnp.full((n,), 2 * (w + h) - 2, jnp.int32)
        else:
            L = w + h
            anchor = w + h - 1
            raw = edges[:, base0:base0 + L]
            filt = _filter_edges_batch(jnp, edges, base0, w + h, sfrom,
                                       w + h + 1, 0, w + h, strength)
            arr = jnp.where((strength > 0)[:, None], filt, raw)
            max_base = jnp.where(strength > 0, w + h - 1,
                                 h + wmin - 1).astype(jnp.int32)
        ypos = dy[:, None] * jnp.arange(1, w + 1)[None, :]   # (n, w)
        frac = (ypos & 0x3E)[:, None, :]
        base = (ypos >> 6)[:, None, :] + \
            (jnp.arange(h) * (1 + upsample))[None, :, None]
        mb = max_base[:, None, None]
        bc = jnp.minimum(base, mb)
        i0 = jnp.clip(anchor - bc, 0, L - 1)
        i1 = jnp.clip(anchor - bc - 1, 0, L - 1)
        flat = arr[:, None, :].repeat(h, 1).reshape(n * h, L)
        g0 = jnp.take_along_axis(flat, i0.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        g1 = jnp.take_along_axis(flat, i1.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        v = g0 * (64 - frac) + g1 * frac
        lastv = jnp.take_along_axis(
            arr, jnp.clip(anchor - max_base, 0, L - 1)[:, None], axis=1)
        return jnp.where(base < mb, (v + 32) >> 6,
                         lastv[:, :, None]).astype(jnp.int32)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def z2_fn(n, w, h, bd, up_above, up_left):
    """Z2 (reference ipred_tmpl.c:463-527) over per-job dx/dy
    (pre-shifted for upsample), strengths, max_width/max_height."""
    jax = jax_mod()
    jnp = jax.numpy
    C2 = 64
    BL = 129

    def fn(edges, dx, dy, str_t, str_l, max_w, max_h):
        buf = jnp.zeros((n, BL), jnp.int32)
        if up_above:
            up = _upsample_edges_batch(jnp, edges, C, w + 1, 0, w + 1, bd)
            buf = buf.at[:, C2:C2 + 2 * w + 1].set(up[:, :2 * w + 1])
        else:
            top = _filter_edges_batch(jnp, edges, C + 1, w, -1, w,
                                      0, max_w, str_t)
            raw = edges[:, C + 1:C + 1 + w]
            buf = buf.at[:, C2 + 1:C2 + 1 + w].set(
                jnp.where((str_t > 0)[:, None], top, raw))
        if up_left:
            up = _upsample_edges_batch(jnp, edges, C - h, h + 1, 0,
                                       h + 1, bd)
            buf = buf.at[:, C2 - 2 * h:C2 + 1].set(up[:, :2 * h + 1])
        else:
            lf = _filter_edges_batch(jnp, edges, C - h, h, 0, h + 1,
                                     h - max_h, h, str_l)
            raw = edges[:, C - h:C]
            buf = buf.at[:, C2 - h:C2].set(
                jnp.where((str_l > 0)[:, None], lf, raw))
        buf = buf.at[:, C2].set(edges[:, C])

        base_inc_x = 1 + up_above
        left_off = -(1 + up_left)
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        xpos = ((1 + up_above) << 6) - dx[:, None, None] * (ys + 1)
        base_x = (xpos >> 6) + xs * base_inc_x
        frac_x = xpos & 0x3E
        ia = jnp.clip(C2 + base_x, 0, BL - 2)
        flat = buf[:, None, :].repeat(h, 1).reshape(n * h, BL)
        va0 = jnp.take_along_axis(flat, ia.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        va1 = jnp.take_along_axis(flat, (ia + 1).reshape(n * h, w),
                                  axis=1).reshape(n, h, w)
        va = va0 * (64 - frac_x) + va1 * frac_x
        ypos = (ys << (6 + up_left)) - dy[:, None, None] * (xs + 1)
        base_y = ypos >> 6
        frac_y = ypos & 0x3E
        il = jnp.clip(C2 + left_off - base_y, 1, BL - 1)
        vl0 = jnp.take_along_axis(flat, il.reshape(n * h, w), axis=1) \
            .reshape(n, h, w)
        vl1 = jnp.take_along_axis(flat, (il - 1).reshape(n * h, w),
                                  axis=1).reshape(n, h, w)
        vl = vl0 * (64 - frac_y) + vl1 * frac_y
        return jnp.where(base_x >= 0, (va + 32) >> 6,
                         (vl + 32) >> 6).astype(jnp.int32)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def filter_fn(n, w, h, bd):
    """FILTER_PRED (reference ipred_tmpl.c:620-659): 4x2 sub-blocks
    with a raster wavefront dependency (left/top outputs feed the next
    sub-block). The walk is static (w/4 * h/2 steps, unrolled in the
    jitted program); each step is a batched (n, 8)x(7,) tap MAC over
    the whole job batch, so the VPU sees n-wide lanes, not scalars.
    Per-job taps arrive as data ((n, 8, 7), gathered from the 5 filter
    kinds host-side). Returns (n, h, w) int32."""
    jax = jax_mod()
    jnp = jax.numpy
    bd_max = (1 << bd) - 1

    def fn(edges, taps):
        out = {}
        for y in range(0, h, 2):
            for x in range(0, w, 4):
                if y == 0:
                    p0 = edges[:, C + x]
                    p1 = edges[:, C + 1 + x]
                    p2 = edges[:, C + 2 + x]
                    p3 = edges[:, C + 3 + x]
                    p4 = edges[:, C + 4 + x]
                else:
                    p0 = out[(y - 1, x - 1)] if x else edges[:, C - y]
                    p1 = out[(y - 1, x)]
                    p2 = out[(y - 1, x + 1)]
                    p3 = out[(y - 1, x + 2)]
                    p4 = out[(y - 1, x + 3)]
                if x:
                    p5 = out[(y, x - 1)]
                    p6 = out[(y + 1, x - 1)]
                else:
                    p5 = edges[:, C - (y + 1)]
                    p6 = edges[:, C - (y + 2)]
                ps = jnp.stack([p0, p1, p2, p3, p4, p5, p6], 1)  # (n,7)
                acc = (jnp.einsum("nkp,np->nk", taps, ps) + 8) >> 4
                acc = jnp.clip(acc, 0, bd_max)
                for fi in range(8):
                    yy = y + (fi >> 2)
                    xx = x + (fi & 3)
                    out[(yy, xx)] = acc[:, fi]
        rows = [jnp.stack([out[(yy, xx)] for xx in range(w)], 1)
                for yy in range(h)]
        return jnp.stack(rows, 1)

    return jax.jit(fn)


def filter_taps(filt_idx):
    """(8, 7) int32 tap matrix for one filter kind (host-side, used to
    build the per-job taps input of filter_fn)."""
    from . import ipred_ref as r
    return np.asarray(r._filter_tap_matrix(filt_idx), np.int32)


@lru_cache(maxsize=None)
def cfl_fn(n, cw, ch, ss_hor, ss_ver, bd):
    """Chroma-from-luma, one fused kernel per chroma geometry: batched
    ac extraction (reference ipred_tmpl.c:661-720) from the current
    device luma plane + DC from the chroma edges + alpha scaling
    (ipred_tmpl.c:91-104). jobs (n, 6) int32 columns:
    (ypy, ypx, nh, nw, alpha, dcmode). Returns (n, ch, cw)."""
    jax = jax_mod()
    jnp = jax.numpy
    half = (1 << bd) >> 1
    bd_max = (1 << bd) - 1
    log2sz = (cw.bit_length() - 1) + (ch.bit_length() - 1)
    ctz = ((cw + ch) & -(cw + ch)).bit_length() - 1
    if cw != ch:
        if bd == 8:
            mult = 0x3334 if (cw > ch * 2 or ch > cw * 2) else 0x5556
            msh = 16
        else:
            mult = 0x6667 if (cw > ch * 2 or ch > cw * 2) else 0xAAAB
            msh = 17
    else:
        mult, msh = 1, 0
    H, W = ch << ss_ver, cw << ss_hor
    shift = 1 + (not ss_ver) + (not ss_hor)

    def fn(y_plane, edges, jobs):
        ypy, ypx = jobs[:, 0], jobs[:, 1]
        nh, nw = jobs[:, 2], jobs[:, 3]
        alpha, mode = jobs[:, 4], jobs[:, 5]
        rows = ypy[:, None] + jnp.arange(H, dtype=jnp.int32)[None, :]
        cols = ypx[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        src = y_plane[rows[:, :, None], cols[:, None, :]]    # (n, H, W)
        blk = src[:, ::1 << ss_ver, ::1 << ss_hor]
        if ss_hor:
            blk = blk + src[:, ::1 << ss_ver, 1::2]
        if ss_ver:
            blk = blk + src[:, 1::2, ::1 << ss_hor]
            if ss_hor:
                blk = blk + src[:, 1::2, 1::2]
        blk = blk << shift
        # pad-replicate at the POST-SUM granularity (ipred_tmpl.c ac
        # loops copy whole summed entries, not source pixels)
        bi = jnp.minimum(jnp.arange(ch)[None, :], nh[:, None] - 1)
        bj = jnp.minimum(jnp.arange(cw)[None, :], nw[:, None] - 1)
        ac = blk[jnp.arange(n)[:, None, None], bi[:, :, None],
                 bj[:, None, :]]
        total = (jnp.sum(ac, axis=(1, 2)) + ((1 << log2sz) >> 1)) \
            >> log2sz
        ac = ac - total[:, None, None]

        r = _lv()
        top = edges[:, C + 1:C + 1 + cw]
        left = edges[:, C - ch:C]
        sum_t = jnp.sum(top, axis=1)
        sum_l = jnp.sum(left, axis=1)
        dc = (sum_t + sum_l + ((cw + ch) >> 1)) >> ctz
        if mult != 1:
            dc = (dc * mult) >> msh
        dc_top = (sum_t + (cw >> 1)) >> (cw.bit_length() - 1)
        dc_left = (sum_l + (ch >> 1)) >> (ch.bit_length() - 1)
        dc = jnp.where(mode == r.DC_128_PRED, half,
                       jnp.where(mode == r.TOP_DC_PRED, dc_top,
                                 jnp.where(mode == r.LEFT_DC_PRED,
                                           dc_left, dc)))
        diff = alpha[:, None, None] * ac
        v = (jnp.abs(diff) + 32) >> 6
        v = jnp.where(diff < 0, -v, v)
        return jnp.clip(dc[:, None, None] + v, 0, bd_max)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def scatter_pred_fn(n, w, h):
    """Scatter (n, h, w) predictions into the plane at per-job (py, px)
    (padding rows carry py=px OOB and drop)."""
    jax = jax_mod()
    jnp = jax.numpy
    OOB = 1 << 20

    def fn(plane, pys, pxs, preds):
        drows = jnp.where(pys[:, None] >= OOB, OOB,
                          pys[:, None] + jnp.arange(h, dtype=jnp.int32))
        dcols = jnp.where(pxs[:, None] >= OOB, OOB,
                          pxs[:, None] + jnp.arange(w, dtype=jnp.int32))
        return plane.at[drows[:, :, None], dcols[:, None, :]].set(
            preds.astype(plane.dtype), mode="drop")

    return jax.jit(fn)
