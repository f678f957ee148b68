"""Loop restoration — batched device kernels.

TPU-native formulation of the reference LR (reference
src/looprestoration_tmpl.c:44-1270, lr_apply_tmpl.c:107-215): every
(restoration-unit x stripe) work item of a frame becomes one row of a
dense batch. The host builds, per item, gather tables that bake in all
of the reference's streaming-edge semantics — stripe-boundary rows
redirected to the pre-CDEF (lpf) plane, top/bottom replication, left/
right column replication, and the SGR row clamp — so the device kernel
is a single static-shape program: one 2-D gather materializes the
(N, H+6, W+6) padded sources, the Wiener/SGR math vectorizes over the
batch, and a masked scatter paints the results back into the plane.
Batch sizes are padded to powers of two to bound recompilation.

Bit-exact vs ops/restore_ref.py (the validated golden model) by tests.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import tables
from .backend import jax_mod, device_scope
from .restore_ref import (LR_HAVE_LEFT, LR_HAVE_RIGHT, LR_HAVE_TOP,
                          LR_HAVE_BOTTOM, _sgr_params_tbl)

PAD = 3


def _row_tables(y, h, edges, Hplane, bottom_min_h):
    """Source row ids for padded rows -3..h+2 (restore_ref
    build_stripe_rows semantics). Returns (row ids, is_pre flags)."""
    rows = np.zeros(h + 6, np.int64)
    pre = np.zeros(h + 6, bool)
    for i in range(h):
        rows[3 + i] = y + i
    use_bottom = (edges & LR_HAVE_BOTTOM) and h >= bottom_min_h
    if edges & LR_HAVE_TOP:
        rows[0] = rows[1] = y - 2
        rows[2] = y - 1
        pre[0] = pre[1] = pre[2] = True
    else:
        rows[0] = rows[1] = rows[2] = rows[3]
    if use_bottom:
        rows[3 + h] = y + h
        rows[4 + h] = rows[5 + h] = y + h + 1
        pre[3 + h] = pre[4 + h] = pre[5 + h] = True
    else:
        rows[3 + h] = rows[4 + h] = rows[5 + h] = rows[2 + h]
        pre[3 + h] = pre[4 + h] = pre[5 + h] = pre[2 + h]
    np.clip(rows, 0, Hplane - 1, out=rows)
    return rows, pre


def _col_table(x, w, edges, Wplane):
    """Source col ids for padded cols -3..w+2 (edge replication)."""
    cols = np.clip(np.arange(x - PAD, x + w + PAD), 0, Wplane - 1)
    if not (edges & LR_HAVE_LEFT):
        cols[:PAD] = cols[PAD]
    if not (edges & LR_HAVE_RIGHT):
        cols[PAD + w:] = cols[PAD + w - 1]
    return cols


@lru_cache(maxsize=None)
def _wiener_fn(n, hmax, wmax, bd):
    """Jitted batched Wiener. Inputs: CP (2*Hp, Wp) int32 stacked
    [cur; pre] planes; rowt (n, hmax+6) int64 row ids into CP;
    colt (n, wmax+6) int64; fh/fv (n, 7) int32; oy/ox (n,) int64 output
    origins; oh/ow (n,) item sizes. Output: scatter data + indices."""
    jax = jax_mod()
    jnp = jax.numpy
    round_bits_h = 3 + (bd == 12) * 2
    clip_limit = 1 << (bd + 1 + 7 - round_bits_h)
    round_bits_v = 11 - (bd == 12) * 2
    round_offset = 1 << (bd + round_bits_v - 1)

    def fn(CP, rowt, colt, fhc, fvc):
        S = CP[rowt[:, :, None], colt[:, None, :]]   # (n, hmax+6, wmax+6)
        hsum = jnp.full((n, hmax + 6, wmax), 1 << (bd + 6), jnp.int32)
        for i in range(7):
            hsum = hsum + fhc[:, i, None, None] * S[:, :, i:i + wmax]
        hor = jnp.clip((hsum + (1 << (round_bits_h - 1))) >> round_bits_h,
                       0, clip_limit - 1)
        vsum = jnp.full((n, hmax, wmax), -round_offset, jnp.int32)
        for i in range(7):
            vsum = vsum + fvc[:, i, None, None] * hor[:, i:i + hmax]
        return jnp.clip(
            (vsum + (1 << (round_bits_v - 1))) >> round_bits_v,
            0, (1 << bd) - 1)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _sgr_fn(n, hmax, wmax, bd):
    """Jitted batched self-guided restoration. The padded source S is
    pre-clamped by the host row table (rows -3..hmax+2 follow the
    reference's [-2, h+1] clamp), so box sums use direct shifts.
    s0/s1/w0/w1: (n,) int32 per-item params (0 = branch off)."""
    jax = jax_mod()
    jnp = jax.numpy
    bdm8 = bd - 8
    xbyx = tables.get("dav1d_sgr_x_by_x").astype(np.int64)

    def calc_ab(sumsq, ssum, s, nn, one_by_x):
        a = (sumsq + ((1 << (2 * bdm8)) >> 1)) >> (2 * bdm8)
        b = (ssum + ((1 << bdm8) >> 1)) >> bdm8
        p = jnp.maximum(a * nn - b * b, 0)
        z = (p * s[:, None, None] + (1 << 19)) >> 20
        x = jnp.take(jnp.asarray(xbyx), jnp.minimum(z, 255))
        A = (x * ssum * one_by_x + (1 << 11)) >> 12
        return A, x

    def box_cols(S64, r):
        """Column box sums of width 2r+1 at output cols -1..wmax
        (wmax+2 positions); col j covers source cols j-1-r..j-1+r in
        item space = padded cols PAD+j-1-r..."""
        ssum = jnp.zeros((n, S64.shape[1], wmax + 2), jnp.int64)
        ssq = jnp.zeros_like(ssum)
        for t in range(2 * r + 1):
            sl = S64[:, :, PAD - 1 - r + t:PAD - 1 - r + t + wmax + 2]
            ssum = ssum + sl
            ssq = ssq + sl * sl
        return ssq, ssum

    def fn(CP, rowt, colt, s0, s1, w0, w1):
        # rowt rows 0..hmax+5 map padded rows -3..hmax+2 with the
        # reference clamp baked in, so R(r) = 3 + r indexes directly
        S = CP[rowt[:, :, None], colt[:, None, :]].astype(jnp.int64)
        src = S[:, 3:3 + hmax, PAD:PAD + wmax]

        # ---- box3: A/B at rows r = -1..hmax (stacked) ----
        ssq, ssum = box_cols(S, 1)
        # rows of q/m for r: R(r-1..r+1) = r+2..r+4, r in -1..hmax
        q = ssq[:, 1:hmax + 3] + ssq[:, 2:hmax + 4] + ssq[:, 3:hmax + 5]
        m = ssum[:, 1:hmax + 3] + ssum[:, 2:hmax + 4] + ssum[:, 3:hmax + 5]
        A, B = calc_ab(q, m, s1, 9, 455)     # (n, hmax+2, wmax+2)

        def win3(M):
            c = M[:, :, 1:wmax + 1]
            e = M[:, :, 0:wmax] + M[:, :, 2:wmax + 2]
            mid = c[:, 1:hmax + 1]
            emid = e[:, 1:hmax + 1]
            up, dn = c[:, 0:hmax], c[:, 2:hmax + 2]
            eup, edn = e[:, 0:hmax], e[:, 2:hmax + 2]
            return mid * 4 + emid * 4 + up * 4 + dn * 4 + (eup + edn) * 3

        t3 = (win3(A) - win3(B) * src + (1 << 8)) >> 9

        # ---- box5: A/B at odd stripe rows r = -1, 1, ..., hmax-1 ----
        ssq, ssum = box_cols(S, 2)
        # r = 2j-1 (j = 0..hmax/2): rows R(r-2..r+2) = 2j..2j+4
        nj = hmax // 2 + 1
        q5 = None
        m5 = None
        for d in range(5):
            sl_q = ssq[:, d:d + 2 * (nj - 1) + 1:2]
            sl_m = ssum[:, d:d + 2 * (nj - 1) + 1:2]
            q5 = sl_q if q5 is None else q5 + sl_q
            m5 = sl_m if m5 is None else m5 + sl_m
        A5, B5 = calc_ab(q5, m5, s0, 25, 164)  # (n, nj, wmax+2); j=(r+1)/2

        def hwin(M, w_mid, w_edge):
            return (M[:, :, 1:wmax + 1] * w_mid +
                    (M[:, :, 0:wmax] + M[:, :, 2:wmax + 2]) * w_edge)

        # even output rows r=2j use A5[j]+A5[j+1]; odd rows use A5[j+1]
        A_lo, A_hi = A5[:, :nj - 1], A5[:, 1:nj]
        B_lo, B_hi = B5[:, :nj - 1], B5[:, 1:nj]
        Pb_even = hwin(A_lo + A_hi, 6, 5)      # (n, hmax/2, wmax)
        Pa_even = hwin(B_lo + B_hi, 6, 5)
        Pb_odd = hwin(A_hi, 6, 5)
        Pa_odd = hwin(B_hi, 6, 5)
        src_even, src_odd = src[:, 0::2], src[:, 1::2]
        t5_even = (Pb_even - Pa_even * src_even + (1 << 8)) >> 9
        t5_odd = (Pb_odd - Pa_odd * src_odd + (1 << 7)) >> 8
        t5 = jnp.zeros((n, hmax, wmax), jnp.int64)
        t5 = t5.at[:, 0::2].set(t5_even).at[:, 1::2].set(t5_odd)

        v = (w0[:, None, None] * t5 + w1[:, None, None] * t3)
        res = src + ((v + (1 << 10)) >> 11)
        return jnp.clip(res, 0, (1 << bd) - 1).astype(jnp.int32)

    return jax.jit(fn)


def _pow2(n):
    return 1 << max(0, (n - 1).bit_length())


def _collect_items(plan, plane, w, h, us_log2, ss_ver, ss_hor, sb_log2,
                   sgrp):
    """Enumerate (unit x stripe) work items for one plane (the loop
    structure of restore_ref.apply_lr / reference lr_apply_tmpl.c)."""
    f = plan.f
    us = 1 << us_log2
    max_us = us + (us >> 1)
    n_sbrows = (f.bh + f.sb_step - 1) // f.sb_step
    items = []
    for sby in range(n_sbrows):
        not_last = sby + 1 < n_sbrows
        next_row_y = (sby + 1) << sb_log2
        row_h = min(next_row_y - ((8 >> ss_ver) * not_last), h)
        offset = (8 >> ss_ver) * (sby > 0)
        y0 = (sby << sb_log2) - offset
        row_y = y0 + offset
        aligned = row_y & ~(us - 1)
        if aligned and aligned + (us >> 1) > h:
            aligned -= us
        unit_row = plan.lr_units[plane][(aligned << ss_ver) >> 6]
        x = 0
        while x < w:
            last = x + max_us > w
            unit_w = (w - x) if last else us
            u = unit_row[(x << ss_hor) >> 6]
            if u is not None and u["type"]:
                base = (LR_HAVE_LEFT if x > 0 else 0) | \
                       (0 if last else LR_HAVE_RIGHT)
                y = y0
                while y < row_h:
                    stripe_h = min((64 - 8 * (y == 0)) >> ss_ver,
                                   row_h - y)
                    e = base
                    if y > 0:
                        e |= LR_HAVE_TOP
                    if not (sby + 1 == n_sbrows and
                            y + stripe_h == row_h):
                        e |= LR_HAVE_BOTTOM
                    items.append((y, x, unit_w, stripe_h, e, u))
                    y += stripe_h
            x += unit_w
    return items


def lr_planes_device(planes, pre_cdef, plan, bd):
    """Core device LR. planes: full padded post-CDEF/superres plane
    arrays (int32, numpy or jax); pre_cdef: post-deblock (lpf) plane
    arrays. Modifies nothing; returns the restored plane list."""
    f = plan.f
    fh = f.frame_hdr
    rst = fh.restoration
    sgrp = _sgr_params_tbl()
    jnp = jax_mod().numpy
    out = list(planes)

    with device_scope():
        for plane in range(3):
            if rst.type[plane] == 0 or (plane and f.layout == 0):
                continue
            ss_ver = 1 if (plane and f.layout == 1) else 0
            ss_hor = 1 if (plane and f.layout != 3) else 0
            w = (fh.width[1] + ss_hor) >> ss_hor
            h = (fh.height + ss_ver) >> ss_ver
            us_log2 = rst.unit_size[1 if plane else 0]
            sb_log2 = 6 - ss_ver + f.sb128
            items = _collect_items(plan, plane, w, h, us_log2, ss_ver,
                                   ss_hor, sb_log2, sgrp)
            if not items:
                continue
            cur = jnp.asarray(planes[plane])
            Hp, Wp = cur.shape
            CP = jnp.concatenate(
                [cur, jnp.asarray(pre_cdef[plane], jnp.int32)[:Hp]],
                axis=0)
            hmax = 64 >> ss_ver
            wmax = (1 << us_log2) + (1 << (us_log2 - 1))
            res = cur

            for kind in ("wiener", "sgr"):
                sel = [it for it in items
                       if (it[5]["type"] == 2) == (kind == "wiener")]
                if not sel:
                    continue
                nb = _pow2(len(sel))
                rowt = np.zeros((nb, hmax + 6), np.int64)
                colt = np.zeros((nb, wmax + 2 * PAD), np.int64)
                oy = np.zeros(nb, np.int64)
                ox = np.zeros(nb, np.int64)
                ohs = np.zeros(nb, np.int64)
                ows = np.zeros(nb, np.int64)
                if kind == "wiener":
                    fhc = np.zeros((nb, 7), np.int32)
                    fvc = np.zeros((nb, 7), np.int32)
                else:
                    s0 = np.zeros(nb, np.int32)
                    s1 = np.zeros(nb, np.int32)
                    w0 = np.zeros(nb, np.int32)
                    w1 = np.zeros(nb, np.int32)
                for i, (y, x, uw, sh_, e, u) in enumerate(sel):
                    if kind == "wiener":
                        bmin = 4 if e & LR_HAVE_TOP else 6
                        r, p = _row_tables(y, sh_, e, Hp, bmin)
                        fl = u["filter_h"]
                        fhc[i] = [fl[0], fl[1], fl[2],
                                  128 - 2 * (fl[0] + fl[1] + fl[2]),
                                  fl[2], fl[1], fl[0]]
                        fl = u["filter_v"]
                        fvc[i] = [fl[0], fl[1], fl[2],
                                  128 - 2 * (fl[0] + fl[1] + fl[2]),
                                  fl[2], fl[1], fl[0]]
                    else:
                        idx = u["type"] - 3
                        ps0, ps1 = int(sgrp[idx][0]), int(sgrp[idx][1])
                        if ps0:
                            bmin = 3 if e & LR_HAVE_TOP else 5
                            if sh_ % 2:
                                bmin = sh_ + 1
                        else:
                            bmin = 3
                        r, p = _row_tables(y, sh_, e, Hp, bmin)
                        s0[i], s1[i] = ps0, ps1
                        w0[i] = u["sgr_weights"][0] if ps0 else 0
                        wf = 128 - (u["sgr_weights"][0] +
                                    u["sgr_weights"][1])
                        w1[i] = wf if ps1 else 0
                    # extend to hmax+6 rows with the reference row clamp
                    # (rows -3..hmax+2 -> clip(r, -2, h+1) for SGR; the
                    # replicated tail is harmless for Wiener)
                    rr = np.arange(-3, hmax + 3)
                    if kind == "sgr":
                        src_r = 3 + np.clip(rr, -2, sh_ + 1)
                    else:
                        src_r = np.minimum(3 + rr, sh_ + 5)
                    rowt[i] = r[src_r] + np.where(p[src_r], Hp, 0)
                    c = _col_table(x, uw, e, Wp)
                    ext_c = np.full(wmax + 2 * PAD, c[-1], np.int64)
                    ext_c[:len(c)] = c
                    colt[i] = ext_c
                    oy[i], ox[i] = y, x
                    ohs[i], ows[i] = sh_, uw

                if kind == "wiener":
                    fn = _wiener_fn(nb, hmax, wmax, bd)
                    vals = fn(CP, rowt, colt, fhc, fvc)
                else:
                    fn = _sgr_fn(nb, hmax, wmax, bd)
                    vals = fn(CP, rowt, colt, s0, s1, w0, w1)

                # masked scatter back into the live plane
                ridx = oy[:, None, None] + np.arange(hmax)[None, :, None]
                cidx = ox[:, None, None] + np.arange(wmax)[None, None, :]
                valid = ((np.arange(hmax)[None, :, None] <
                          ohs[:, None, None]) &
                         (np.arange(wmax)[None, None, :] <
                          ows[:, None, None]))
                ridx = np.where(valid, ridx, Hp)      # OOB -> dropped
                res = res.at[jnp.asarray(ridx), jnp.asarray(cidx)].set(
                    vals, mode="drop")
            out[plane] = res
    return out


def apply_lr_device(pic, pre_cdef, plan) -> None:
    """Device-path LR; same contract as restore_ref.apply_lr."""
    planes = [np.asarray(p, np.int32) for p in pic.planes]
    res = lr_planes_device(planes, pre_cdef, plan, pic.bpc)
    for i, p in enumerate(pic.planes):
        p[:] = np.asarray(res[i]).astype(p.dtype)
