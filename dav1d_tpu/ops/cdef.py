"""CDEF — whole-plane device kernel.

TPU-native formulation of the reference CDEF (reference
src/cdef_tmpl.c:37-305, cdef_apply_tmpl.c:91-330): every 8x8 block's
direction search becomes one batched integer projection — the 8x8
pixels of all blocks multiply a constant (64, 90) partial-sum matrix on
the MXU, and the 8 direction costs reduce from the 90 projection bins.
The constrained filter runs as whole-plane arithmetic: per-block
direction/strength maps expand to per-pixel parameter planes, tap
values select over the 8 possible directions from statically shifted
views of the FILL-padded source, and the result blends into the plane
under the per-block apply mask. One jitted XLA program per frame
geometry; all planes share the luma direction map inside the program.

Bit-exact vs ops/cdef_ref.py (the validated golden model) by tests.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod, device_scope
from .cdef_ref import cdef_dirs, FILL, UV_DIRS

_DIV_TABLE = (840, 420, 280, 210, 168, 140, 120)


@lru_cache(maxsize=None)
def _proj_matrix():
    """(64, 90) int32 matrix: flattened 8x8 block -> partial sums.
    Bin layout: hv[2][8], diag[2][15], alt[4][11]
    (reference cdef_tmpl.c:252-274)."""
    M = np.zeros((64, 2 * 8 + 2 * 15 + 4 * 11), np.int32)
    o_hv, o_diag, o_alt = 0, 16, 46
    for y in range(8):
        for x in range(8):
            i = y * 8 + x
            M[i, o_diag + y + x] += 1                       # diag[0]
            M[i, o_alt + 0 * 11 + y + (x >> 1)] += 1        # alt[0]
            M[i, o_hv + y] += 1                             # hv[0]
            M[i, o_alt + 1 * 11 + 3 + y - (x >> 1)] += 1    # alt[1]
            M[i, o_diag + 15 + 7 + y - x] += 1              # diag[1]
            M[i, o_alt + 2 * 11 + 3 - (y >> 1) + x] += 1    # alt[2]
            M[i, o_hv + 8 + x] += 1                         # hv[1]
            M[i, o_alt + 3 * 11 + (y >> 1) + x] += 1        # alt[3]
    return M


def _ulog2_capped(jnp, v, cap):
    """floor(log2(v)) for v>=1, 0 for v==0, capped — exact, integer."""
    out = jnp.zeros(v.shape, jnp.int32)
    for k in range(1, cap + 1):
        out = out + (v >= (1 << k)).astype(jnp.int32)
    return out


@lru_cache(maxsize=None)
def _cdef_fn(bh, bw, layout, bd, damping, has_chroma):
    """Jitted frame CDEF. Inputs: cropped planes int32 —
    y (bh*4, bw*4), u/v ((bh*4)>>ss_ver, (bw*4)>>ss_hor) — and
    per-8x8-block int32 maps (nby, nbx): y_pri, y_sec, uv_pri, uv_sec,
    need_dir (0/1), y_apply (0/1), uv_apply (0/1)."""
    jax = jax_mod()
    jnp = jax.numpy
    ss_ver = 1 if layout == 1 else 0
    ss_hor = 0 if layout == 3 else 1
    bdm8 = bd - 8
    nby, nbx = bh >> 1, bw >> 1
    dirs = np.asarray(cdef_dirs())         # (12, 2, 2) (dy, dx)
    uv_dir_tbl = np.array(UV_DIRS[1 if layout == 2 else 0], np.int32)

    def find_dirs(y_plane):
        px = ((y_plane >> bdm8) - 128).astype(jnp.int32)
        B = px.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        B = B.reshape(nby * nbx, 64)
        P = jnp.matmul(B, _proj_matrix(),
                       preferred_element_type=jnp.int32).astype(jnp.int64)
        hv = P[:, 0:16].reshape(-1, 2, 8)
        diag = P[:, 16:46].reshape(-1, 2, 15)
        alt = P[:, 46:90].reshape(-1, 4, 11)
        cost = [None] * 8
        cost[2] = jnp.sum(hv[:, 0] ** 2, axis=1) * 105
        cost[6] = jnp.sum(hv[:, 1] ** 2, axis=1) * 105
        for di in range(2):
            c = jnp.zeros(diag.shape[0], jnp.int64)
            for n in range(7):
                d = _DIV_TABLE[n]
                c = c + (diag[:, di, n] ** 2 +
                         diag[:, di, 14 - n] ** 2) * d
            c = c + diag[:, di, 7] ** 2 * 105
            cost[0 if di == 0 else 4] = c
        for n in range(4):
            c = jnp.zeros(alt.shape[0], jnp.int64)
            for m in range(5):
                c = c + alt[:, n, 3 + m] ** 2
            c = c * 105
            for m in range(3):
                d = _DIV_TABLE[2 * m + 1]
                c = c + (alt[:, n, m] ** 2 + alt[:, n, 10 - m] ** 2) * d
            cost[n * 2 + 1] = c
        costs = jnp.stack(cost, axis=1)               # (N, 8)
        best = jnp.argmax(costs, axis=1).astype(jnp.int32)
        best_cost = jnp.max(costs, axis=1)
        alt_cost = jnp.take_along_axis(costs, (best ^ 4)[:, None],
                                       axis=1)[:, 0]
        var = ((best_cost - alt_cost) >> 10)
        return (best.reshape(nby, nbx), var.reshape(nby, nbx))

    def filter_plane(plane, pri, sec, dir_map, damp, valid_h, valid_w,
                     bsz_v, bsz_h, apply_map):
        """plane: (nby*bsz_v, nbx*bsz_h) int32; pri/sec/dir/apply:
        (nby, nbx) int32 maps (strengths pre-<<bdm8)."""
        H, W = plane.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = (rows < valid_h) & (cols < valid_w)
        SP = jnp.where(inb, plane, FILL)
        SP = jnp.pad(SP, 2, constant_values=FILL)

        def expand(m):
            return jnp.repeat(jnp.repeat(m, bsz_v, axis=0), bsz_h, axis=1)

        prix = expand(pri)
        secx = expand(sec)
        dirx = expand(dir_map)
        px = plane

        def tap(dy, dx):
            return SP[2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

        def dir_tap(base, k, sign):
            v = None
            for d in range(8):
                dy, dx = int(dirs[base + d, k, 0]), int(dirs[base + d, k, 1])
                t = tap(sign * dy, sign * dx)
                v = t if v is None else jnp.where(dirx == d, t, v)
            return v

        pri_tap = 4 - ((prix >> bdm8) & 1)
        pri_shift = jnp.maximum(
            0, damp - _ulog2_capped(jnp, jnp.maximum(prix, 1), 10))
        sec_shift = damp - _ulog2_capped(jnp, jnp.maximum(secx, 1), 10)

        def constrain(diff, threshold, shift):
            adiff = jnp.abs(diff)
            v = jnp.minimum(adiff,
                            jnp.maximum(0, threshold - (adiff >> shift)))
            return jnp.where(diff < 0, -v, v)

        summ = jnp.zeros((H, W), jnp.int32)
        mn = px
        mx = px
        have_minmax = (prix != 0) & (secx != 0)

        def upd_minmax(mn, mx, s):
            mn = jnp.where(have_minmax & (s != FILL) & (s < mn), s, mn)
            mx = jnp.where(have_minmax, jnp.maximum(mx, s), mx)
            return mn, mx

        # primary taps (contribution auto-zero where pri == 0)
        ptap = pri_tap
        for k in range(2):
            for sign in (1, -1):
                s = dir_tap(2, k, sign)
                summ = summ + ptap * constrain(s - px, prix, pri_shift)
                mn, mx = upd_minmax(mn, mx, s)
            ptap = (ptap & 3) | 2
        # secondary taps
        for k in range(2):
            sec_tap = 2 - k
            for base in (4, 0):
                for sign in (1, -1):
                    s = dir_tap(base, k, sign)
                    summ = summ + sec_tap * constrain(s - px, secx,
                                                      sec_shift)
                    mn, mx = upd_minmax(mn, mx, s)

        res = px + ((summ - (summ < 0) + 8) >> 4)
        res = jnp.where(have_minmax, jnp.clip(res, mn, mx), res)
        act = expand(apply_map) != 0
        return jnp.where(act & ((prix != 0) | (secx != 0)), res, plane)

    def fn(y_plane, u_plane, v_plane, y_pri, y_sec, uv_pri, uv_sec,
           y_apply, uv_apply):
        dir_map, var = find_dirs(y_plane)
        # strength adjust by variance (reference cdef_apply_tmpl.c:91-97)
        t = (var >> 6)
        i = _ulog2_capped(jnp, jnp.minimum(t, 1 << 12), 12)
        adj = (y_pri * (4 + i) + 8) >> 4
        adj = jnp.where(var != 0, adj, 0)
        adj = jnp.where(y_pri != 0, adj, 0)
        y_dir = jnp.where(y_pri != 0, dir_map, 0)
        y_out = filter_plane(y_plane, adj, y_sec, y_dir, damping,
                             bh * 4, bw * 4, 8, 8, y_apply)
        if not has_chroma:
            return y_out, u_plane, v_plane
        uv_dir = jnp.take(jnp.asarray(uv_dir_tbl), dir_map)
        uv_dir = jnp.where(uv_pri != 0, uv_dir, 0)
        u_out = filter_plane(u_plane, uv_pri, uv_sec, uv_dir, damping - 1,
                             (bh * 4) >> ss_ver, (bw * 4) >> ss_hor,
                             8 >> ss_ver, 8 >> ss_hor, uv_apply)
        v_out = filter_plane(v_plane, uv_pri, uv_sec, uv_dir, damping - 1,
                             (bh * 4) >> ss_ver, (bw * 4) >> ss_hor,
                             8 >> ss_ver, 8 >> ss_hor, uv_apply)
        return y_out, u_out, v_out

    return jax.jit(fn)


def _block_maps(plan, bd):
    """Host-side per-8x8-block parameter maps from the frame plan."""
    f = plan.f
    cd = f.frame_hdr.cdef
    bdm8 = bd - 8
    nby, nbx = f.bh >> 1, f.bw >> 1

    # noskip at 8x8 granularity (reference cdef_apply_tmpl.c skip logic:
    # nsk row-pairs, block active if either 4x4 column has a noskip)
    b4_noskip = plan.b4_skip == 0
    nsk = b4_noskip[0::2, :].copy()
    nsk[:f.bh >> 1, :] |= b4_noskip[1::2, :]
    blk_nsk = nsk[:, 0::2].copy()
    if f.bw > 1:
        blk_nsk |= np.pad(nsk[:, 1::2], ((0, 0),
                                         (0, nbx - nsk[:, 1::2].shape[1])))

    by = np.arange(nby)[:, None]
    bx = np.arange(nbx)[None, :]
    idx = plan.cdef_idx[(by * 2) >> 4, (bx * 2) >> 4].astype(np.int32)
    valid = idx >= 0
    y_strength = np.asarray(list(cd.y_strength) + [0], np.int32)
    uv_strength = np.asarray(list(cd.uv_strength) + [0], np.int32)
    y_lvl = y_strength[np.where(valid, idx, len(y_strength) - 1)]
    uv_lvl = uv_strength[np.where(valid, idx, len(uv_strength) - 1)]

    y_pri = (y_lvl >> 2) << bdm8
    y_sec = y_lvl & 3
    y_sec += (y_sec == 3)
    y_sec <<= bdm8
    uv_pri = (uv_lvl >> 2) << bdm8
    uv_sec = uv_lvl & 3
    uv_sec += (uv_sec == 3)
    uv_sec <<= bdm8

    base = valid & blk_nsk & ((y_lvl != 0) | (uv_lvl != 0))
    y_apply = (base & (y_lvl != 0)).astype(np.int32)
    uv_apply = (base & (uv_lvl != 0)).astype(np.int32)
    return (y_pri.astype(np.int32), y_sec.astype(np.int32),
            uv_pri.astype(np.int32), uv_sec.astype(np.int32),
            y_apply, uv_apply)


def cdef_planes_device(planes, plan, bd):
    """Core device CDEF over int32 plane arrays. planes: full padded
    pictures; filtering covers the b4 grid region. Returns jax arrays."""
    f = plan.f
    fh = f.frame_hdr
    cd = fh.cdef
    maps = _block_maps(plan, bd)
    has_chroma = len(planes) > 1
    ss_ver, ss_hor = f.ss_ver, f.ss_hor
    fn = _cdef_fn(f.bh, f.bw, int(f.layout), bd, cd.damping + (bd - 8),
                  has_chroma)
    jnp = jax_mod().numpy
    with device_scope():
        y = jnp.asarray(planes[0])
        ysub = y[:f.bh * 4, :f.bw * 4]
        if has_chroma:
            ch, cw = (f.bh * 4) >> ss_ver, (f.bw * 4) >> ss_hor
            u = jnp.asarray(planes[1])
            v = jnp.asarray(planes[2])
            yo, uo, vo = fn(ysub, u[:ch, :cw], v[:ch, :cw], *maps)
            return [y.at[:f.bh * 4, :f.bw * 4].set(yo),
                    u.at[:ch, :cw].set(uo),
                    v.at[:ch, :cw].set(vo)]
        yo, _, _ = fn(ysub, ysub[:1, :1], ysub[:1, :1], *maps)
        return [y.at[:f.bh * 4, :f.bw * 4].set(yo)]


def apply_cdef_device(pic, plan) -> None:
    """Device-path frame CDEF; same contract as cdef_ref.apply_cdef."""
    f = plan.f
    cd = f.frame_hdr.cdef
    if not f.seq_hdr.cdef:
        return
    if not any(cd.y_strength[i] or cd.uv_strength[i]
               for i in range(1 << cd.n_bits)):
        return
    planes = [np.asarray(p, np.int32) for p in pic.planes]
    res = cdef_planes_device(planes, plan, pic.bpc)
    for i, p in enumerate(pic.planes):
        p[:] = np.asarray(res[i]).astype(p.dtype)
