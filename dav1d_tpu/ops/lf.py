"""Deblocking filter — whole-plane device kernel.

TPU-native formulation of the reference deblocker (reference
src/loopfilter_tmpl.c:37-162, lf_apply_tmpl.c): because AV1 constrains
the filter width by the transform size on both sides of an edge, no two
edges of one directional pass ever overlap reads-after-writes — the
whole vertical (then horizontal) pass is data-parallel. We exploit that
by filtering *every* edge of a pass simultaneously with strided
whole-plane slices: for column-edge x the p_i/q_i taps are the strided
views plane[:, 4x-1-i] / plane[:, 4x+i], the per-edge filter class and
level maps become (h4, w4) parameter planes, and the 4/6/8/16-wide
decisions and filters are computed everywhere and blended with masks.
One jitted XLA program per (shape, bitdepth, plane kind); the horizontal
pass runs on the transposed plane after the vertical pass (the
reference's effective cols-then-rows order).

Bit-exact vs ops/lf_ref.py (the validated golden model) by tests.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod, device_scope
from .lf_ref import build_lf_masks, calc_eih

PAD = 8


def _shift_x(jnp, a, s):
    """Shift (H, wn) edge-indexed array by s edges along axis 1 so that
    output edge-column x' reads edge x' - s (zero fill)."""
    if s == 0:
        return a
    if s > 0:
        return jnp.pad(a, ((0, 0), (s, 0)))[:, :a.shape[1]]
    return jnp.pad(a, ((0, 0), (0, -s)))[:, -s:]


def _edge_params(cls_grid, lvl, lvl_prev):
    """Resolve per-edge (cls, L) maps. L falls back to the neighbour
    side's level when the near side is 0 (reference lf_apply_tmpl.c
    level selection). E/I/H derive from L in-jit (device-side LUT):
    only these two byte maps ship over the tunnel per pass."""
    L = np.where(lvl != 0, lvl, lvl_prev).astype(np.int32)
    active = (cls_grid >= 0) & (L > 0)
    cls = np.where(active, cls_grid, -1).astype(np.int8)
    return cls, L.astype(np.uint8)


def filter_values(jnp, col, cls4, E4, I4, H4, bd, luma):
    """Shared deblock edge-filter math (reference
    src/loopfilter_tmpl.c:37-162): given a tap accessor col(o) -> array
    of plane pixels at offset o from each edge (o=-1-i for p_i, o=i for
    q_i) and per-position int32 parameter maps (cls4 in {-1,0,1,2};
    E4/I4/H4 already scaled by bitdepth), compute every candidate
    output value and its write mask, all data-parallel. Returns
    (vals, masks): dicts offset -> array, offsets -6..5 (luma) /
    -2..1 (chroma). Used identically by the XLA whole-plane kernel
    (one_pass below) and the Pallas TPU kernel (ops/lf_pallas.py).
    Scalar constants are pinned to int32: with jax_enable_x64 active,
    weak-typed Python ints materialize int64 convert nodes that the
    Mosaic lowering cannot handle (same failure mode documented in
    ops/mc_pallas.py)."""
    bdm8 = bd - 8
    F = np.int32(1 << bdm8)
    px_max = np.int32((1 << bd) - 1)
    lim = np.int32(128 << bdm8)
    zero = np.int32(0)
    act = cls4 >= 0

    p0, p1, p2 = col(-1), col(-2), col(-3)
    q0, q1, q2 = col(0), col(1), col(2)
    fm = ((jnp.abs(p1 - p0) <= I4) & (jnp.abs(q1 - q0) <= I4) &
          (jnp.abs(p0 - q0) * 2 + (jnp.abs(p1 - q1) >> 1) <= E4))
    e6 = (jnp.abs(p2 - p1) <= I4) & (jnp.abs(q2 - q1) <= I4)
    if luma:
        p3, q3 = col(-4), col(3)
        e8 = (jnp.abs(p3 - p2) <= I4) & (jnp.abs(q3 - q2) <= I4)
        # luma classes: 0=wd4 1=wd8 2=wd16 (wd>4 adds e6, wd>6 e8)
        fm = fm & jnp.where(cls4 >= 1, e6 & e8, True)
    else:
        fm = fm & jnp.where(cls4 >= 1, e6, True)
    fm = fm & act

    # narrow (wd4) filter, always computed
    hev = (jnp.abs(p1 - p0) > H4) | (jnp.abs(q1 - q0) > H4)
    fdiff = jnp.clip(p1 - q1, -lim, lim - 1)
    f = jnp.where(hev,
                  jnp.clip(3 * (q0 - p0) + fdiff, -lim, lim - 1),
                  jnp.clip(3 * (q0 - p0), -lim, lim - 1))
    f1 = jnp.minimum(f + 4, lim - 1) >> 3
    f2 = jnp.minimum(f + 3, lim - 1) >> 3
    f3 = (f1 + 1) >> 1
    vals = {
        -2: jnp.where(hev, p1, jnp.clip(p1 + f3, zero, px_max)),
        -1: jnp.clip(p0 + f2, zero, px_max),
        0: jnp.clip(q0 - f1, zero, px_max),
        1: jnp.where(hev, q1, jnp.clip(q1 - f3, zero, px_max)),
    }
    masks = {o: fm for o in vals}

    flat8in = ((jnp.abs(p2 - p0) <= F) & (jnp.abs(p1 - p0) <= F) &
               (jnp.abs(q1 - q0) <= F) & (jnp.abs(q2 - q0) <= F))
    if luma:
        flat8in = flat8in & (jnp.abs(p3 - p0) <= F) & \
            (jnp.abs(q3 - q0) <= F)
        p6, p5, p4 = col(-7), col(-6), col(-5)
        q4, q5, q6 = col(4), col(5), col(6)
        flat8out = ((jnp.abs(p6 - p0) <= F) & (jnp.abs(p5 - p0) <= F) &
                    (jnp.abs(p4 - p0) <= F) & (jnp.abs(q4 - q0) <= F) &
                    (jnp.abs(q5 - q0) <= F) & (jnp.abs(q6 - q0) <= F))
        m16 = (cls4 >= 2) & flat8out & flat8in & fm
        m8 = (cls4 >= 1) & flat8in & ~m16 & fm
        v8 = {
            -3: (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3,
            -2: (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3,
            -1: (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3,
            0: (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3,
            1: (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3,
            2: (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3,
        }
        v16 = {
            -6: (p6 + p6 + p6 + p6 + p6 + p6 * 2 + p5 * 2 + p4 * 2 +
                 p3 + p2 + p1 + p0 + q0 + 8) >> 4,
            -5: (p6 + p6 + p6 + p6 + p6 + p5 * 2 + p4 * 2 + p3 * 2 +
                 p2 + p1 + p0 + q0 + q1 + 8) >> 4,
            -4: (p6 + p6 + p6 + p6 + p5 + p4 * 2 + p3 * 2 + p2 * 2 +
                 p1 + p0 + q0 + q1 + q2 + 8) >> 4,
            -3: (p6 + p6 + p6 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 +
                 p0 + q0 + q1 + q2 + q3 + 8) >> 4,
            -2: (p6 + p6 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 +
                 q0 + q1 + q2 + q3 + q4 + 8) >> 4,
            -1: (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 +
                 q1 + q2 + q3 + q4 + q5 + 8) >> 4,
            0: (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 +
                q2 + q3 + q4 + q5 + q6 + 8) >> 4,
            1: (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 +
                q3 + q4 + q5 + q6 + q6 + 8) >> 4,
            2: (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 +
                q4 + q5 + q6 + q6 + q6 + 8) >> 4,
            3: (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 +
                q5 + q6 + q6 + q6 + q6 + 8) >> 4,
            4: (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 +
                q6 + q6 + q6 + q6 + q6 + 8) >> 4,
            5: (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 2 +
                q6 + q6 + q6 + q6 + q6 + 8) >> 4,
        }
        for o in range(-6, 6):
            v, mk = vals.get(o), masks.get(o)
            if o in v8:
                v = v8[o] if v is None else jnp.where(m8, v8[o], v)
                mk = m8 if mk is None else (mk | m8)
            v = v16[o] if v is None else jnp.where(m16, v16[o], v)
            mk = m16 if mk is None else (mk | m16)
            vals[o], masks[o] = v, mk
    else:
        m6 = (cls4 >= 1) & flat8in & fm
        v6 = {
            -2: (p2 + 2 * p2 + 2 * p1 + 2 * p0 + q0 + 4) >> 3,
            -1: (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
            0: (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
            1: (p0 + 2 * q0 + 2 * q1 + 2 * q2 + q2 + 4) >> 3,
        }
        for o, v in v6.items():
            vals[o] = jnp.where(m6, v, vals[o])
    return vals, masks


@lru_cache(maxsize=None)
def _plane_fn(n4h, n4w, bd, luma):
    """Jitted single-plane deblock: vertical edges then horizontal.
    Inputs: plane int32 (n4h*4, >=n4w*4); per-edge int32 maps
    (cls, E, I, H) shaped (n4h, n4w) for the vertical pass and
    (n4w, n4h) [pre-transposed] for the horizontal pass."""
    jax = jax_mod()
    jnp = jax.numpy

    bdm8 = bd - 8
    F = 1 << bdm8
    px_max = (1 << bd) - 1
    lim = 128 << bdm8

    def one_pass(P, cls, L, lut_e, lut_i, wn):
        """P: (H, Wp) int32, padded by PAD on axis 1; edges at PAD+4x.
        cls int8 / L uint8 are the compact per-edge maps; E/I/H derive
        from L here (device-side LUT) so only two byte maps cross the
        tunnel per pass."""

        def col(o):
            return P[:, PAD + o:PAD + o + 4 * wn:4]

        rep = lambda m: jnp.repeat(m.astype(jnp.int32), 4, axis=0)
        Li = L.astype(jnp.int32)
        cls4 = rep(cls)
        E4 = rep(jnp.take(lut_e, Li)) << bdm8
        I4 = rep(jnp.take(lut_i, Li)) << bdm8
        H4 = rep(Li >> 4) << bdm8

        vals, masks = filter_values(jnp, col, cls4, E4, I4, H4, bd,
                                    luma)

        # write-back without scatters: decompose output columns by
        # phase (c mod 4). Column 4x+o belongs to phase p = o & 3 with
        # edge shift s = (o - p) / 4; since edge writes never overlap,
        # each phase is a short select chain, and the plane rebuilds
        # with one reshape (XLA-friendly; strided scatters compile
        # poorly on TPU).
        body = P[:, PAD:PAD + 4 * wn]
        P4 = body.reshape(-1, wn, 4)
        phases = []
        for p in range(4):
            cur = P4[:, :, p]
            for o in sorted(vals):
                if (o & 3) != p:
                    continue
                s = (o - p) >> 2
                v = _shift_x(jnp, vals[o], s)
                mk = _shift_x(jnp, masks[o], s)
                cur = jnp.where(mk, v, cur)
            phases.append(cur)
        body = jnp.stack(phases, axis=2).reshape(-1, wn * 4)
        return P.at[:, PAD:PAD + 4 * wn].set(body)

    def fn(plane, vmaps, hmaps, lut_e, lut_i):
        Hpx, Wpx = plane.shape
        P = jnp.pad(plane, ((0, 0), (PAD, PAD)))
        P = one_pass(P, *vmaps, lut_e, lut_i, n4w)
        plane = P[:, PAD:PAD + Wpx]
        Pt = jnp.pad(plane.T, ((0, 0), (PAD, PAD)))
        Pt = one_pass(Pt, *hmaps, lut_e, lut_i, n4h)
        return Pt[:, PAD:PAD + Hpx].T

    return jax.jit(fn)


def _pad_maps(maps, n4h, n4w):
    """Grow (cls, L) maps to the full padded-plane 4x4 grid; inactive
    positions get cls=-1 (pass-through). Narrow dtypes (the maps ship
    over the tunnel every frame; the kernel widens them)."""
    cls, L = maps
    out_cls = np.full((n4h, n4w), -1, np.int8)
    out_cls[:cls.shape[0], :cls.shape[1]] = cls
    out_l = np.zeros((n4h, n4w), np.uint8)
    out_l[:L.shape[0], :L.shape[1]] = L
    return out_cls, out_l


def deblock_planes_device(planes, plan, bd):
    """Core device deblock over int32 plane arrays (numpy or jax).
    planes: [y] or [y, u, v] full padded picture planes, int32. Edges
    near the frame boundary legitimately read the pred-overshoot pixels
    in the padding (the reference filters on its padded picture too), so
    the kernels run on the full planes with the parameter maps padded by
    inactive entries. Returns the list with filtered (jax) arrays."""
    f = plan.f
    fh = f.frame_hdr
    lflf = fh.loopfilter
    from .lf_native import build_lf_masks_native
    m = build_lf_masks_native(plan)
    if m is None:
        m = build_lf_masks(plan)
    lut_e, lut_i = calc_eih(lflf.sharpness)
    lut_e = lut_e.astype(np.int32)
    lut_i = lut_i.astype(np.int32)
    w4, h4 = f.w4, f.h4

    from . import lf_pallas
    use_pallas = lf_pallas.enabled()

    out = list(planes)
    with device_scope():
        if lflf.level_y[0] or lflf.level_y[1]:
            ah, aw = planes[0].shape
            fh4, fw4 = ah // 4, aw // 4
            lvl_v = m.lvl[:, :, 0].astype(np.int32)
            lvl_h = m.lvl[:, :, 1].astype(np.int32)
            yv = _edge_params(
                m.vcls_y, lvl_v,
                np.concatenate([lvl_v[:, :1], lvl_v[:, :-1]], axis=1))
            yv[0][:, 0] = -1
            yh = _edge_params(
                m.hcls_y, lvl_h,
                np.concatenate([lvl_h[:1], lvl_h[:-1]], axis=0))
            yh[0][0, :] = -1
            yv = _pad_maps(yv, fh4, fw4)
            yh = _pad_maps(tuple(np.ascontiguousarray(a.T) for a in yh),
                           fw4, fh4)
            if use_pallas:
                fn = lf_pallas.plane_fn(fh4, fw4, bd, True)
            else:
                fn = _plane_fn(fh4, fw4, bd, True)
            out[0] = fn(planes[0], yv, yh, lut_e, lut_i)

        if len(planes) > 1 and (lflf.level_u or lflf.level_v):
            ch4, cw4 = m.ch4, m.cw4
            ah, aw = planes[1].shape
            fh4, fw4 = ah // 4, aw // 4
            if use_pallas:
                cfn = lf_pallas.plane_fn(fh4, fw4, bd, False)
            else:
                cfn = _plane_fn(fh4, fw4, bd, False)
            for pl in range(2):
                lvl_v = m.lvl[:ch4, :cw4, 2 + pl].astype(np.int32)
                pv = _edge_params(
                    m.vcls_uv, lvl_v,
                    np.concatenate([lvl_v[:, :1], lvl_v[:, :-1]],
                                   axis=1))
                pv[0][:, 0] = -1
                ph = _edge_params(
                    m.hcls_uv, lvl_v,
                    np.concatenate([lvl_v[:1], lvl_v[:-1]], axis=0))
                ph[0][0, :] = -1
                pv = _pad_maps(pv, fh4, fw4)
                ph = _pad_maps(tuple(np.ascontiguousarray(a.T)
                                     for a in ph), fw4, fh4)
                out[1 + pl] = cfn(planes[1 + pl], pv, ph, lut_e, lut_i)
    return out


def apply_deblock_device(pic, plan) -> None:
    """Device-path frame deblock; same contract as lf_ref.apply_deblock
    (operates on the numpy picture in place)."""
    fh = plan.f.frame_hdr
    if not (fh.loopfilter.level_y[0] or fh.loopfilter.level_y[1]):
        return
    planes = [np.asarray(p, np.int32) for p in pic.planes]
    res = deblock_planes_device(planes, plan, pic.bpc)
    for i, p in enumerate(pic.planes):
        p[:] = np.asarray(res[i]).astype(p.dtype)
