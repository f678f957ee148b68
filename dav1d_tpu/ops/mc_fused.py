"""Single-program inter Stage B: the whole MC pass sequence in ONE jit.

Round-5 evolution of ops/mc_jobs.py. The per-group launch model (one
jitted program per (plane, size-class, bucket-chunk, pass)) costs a
fixed per-execution overhead on the tunnel-attached TPU (~10ms per
program execution, measured round 5) that multiplies into hundreds of
milliseconds per frame across the dozens of launches a 1080p frame
needs. This module replaces all of them with ONE compiled program per
frame that executes every MC pass back-to-back on device:

  pass A  single-ref puts (8-tap, per size class), bilinear, warps
  pass B  compound blocks (luma first: w_mask outputs land in an
          in-program seg plane the chroma combines gather from)
  pass C  OBMC laps (top then left), classed kernel with per-job
          geometry
  pass D  residuals: fused inverse transform + add, one loop per tx
          size with the 1-D transform kinds selected PER JOB

The program structure is STREAM-INDEPENDENT: every segment (pass x
plane-group x class) is always present as a `lax.while_loop` over
fixed-size chunks whose trip count is a runtime scalar — a frame with
no warp jobs runs a zero-trip loop, not a different program. All job
tables concatenate into one flat int32 buffer (one upload); per-segment
offsets/chunk-counts ride in a small meta vector. The only compile keys
are the plane shapes, bit depth, ref-stack depth ladder, and the pow2
ladder lengths of the flat buffer and coefficient pool — so a handful
of programs serve any content at a given resolution, and the persistent
compilation cache makes them a one-time cost.

Wedge compound masks are gathered in-jit from the device-resident mask
blob (reference wedge.h:88-91 layout), so no mask pixels cross the
tunnel. Chroma planes travel as one (2, Hc, Wc) stack so u and v share
every loop.

Semantics are bit-exact vs ops/mc_jobs.py / ops/mc_ref.py /
ops/itx_ref.py (reference src/mc_tmpl.c:51-958, src/itx_tmpl.c:43-203,
src/recon_tmpl.c:938-1985); validated by the e2e md5 suite against the
reference binary (tests/test_e2e_inter.py and friends run this path by
default on the device backend).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ..entropy import levels as lv
from ..utils import timing
from .backend import device_scope, jax_mod
from .mc import filter_banks, COMP_AVG, COMP_WAVG, COMP_SEG
from .mc_ref import (_warp_filter, obmc_masks, intermediate_bits,
                     prep_bias, BS_32X32, _masks)
from .mc_jobs import (OOB, _rnd, _dst_ids, _gather_ids, _taps,
                      res_tx_kinds)
from .itx_ref import TX1D_TYPES, TX_SHIFT

N_TX = len(lv.TXFM_INFO)

PUT_CLASSES = (16, 32, 64, 128)
PUT_CHUNK = {16: 1024, 32: 256, 64: 64, 128: 16}
COMP_CHUNK = {16: 512, 32: 128, 64: 32, 128: 8}
WARP_CHUNK = 1024
BILIN_C, BILIN_CHUNK = 128, 16
# OBMC classed caps: top laps blend the upper 3/4 of a lap whose mask
# height is <=32 (reference obmc_masks layout), left laps the left 3/4
# with mask width <=32 (mc_tmpl.c:696-722); prep windows follow
OBMC_CHUNK = 128
#   prep window (lap) caps and blend-region caps per variant
OBMC_CAPS = {1: dict(lap_h=24, lap_w=64, bh=24, bw=64, hh=32),  # top
             0: dict(lap_h=64, lap_w=32, bh=64, bw=24, hh=64)}  # left
WHT_CHUNK = 512


def _res_chunk(tx):
    t = lv.TXFM_INFO[tx]
    return max(16, min(1024, 32768 // (t.w * t.h * 16)))


# MC reads come from edge-replicated padded reference planes: the
# reference's per-element emu-edge clamp (mc_tmpl.c emu_edge) becomes a
# clamp of the window BASE into the replicated apron, which keeps every
# window a LINEAR slice — the enabling condition for the fast
# block-gather below. PAD must exceed the widest window (135).
PAD = 160
BS = 32          # gather block width (lanes); best measured on v5e


def _pad_w(w):
    return -(-(w + 2 * PAD) // BS) * BS


def _win_gather(jnp, REF4, slot, pl, rows, col_base, win_w, nblk):
    """Extract per-job linear windows (n, win_h, win_w) from a padded
    block-shaped ref (R[, 2], Hm, WB, BS). Per-element gathers run at
    ~60M elem/s on the tunnel v5e; gathering BS-wide blocks + a log2
    shift (conditional rolls) runs 4-8x faster."""
    a = col_base >> 5
    b = col_base & 31
    blks = a[:, None] + jnp.arange(nblk, dtype=jnp.int32)
    if pl is None:
        g = REF4[slot[:, None, None], rows[:, :, None],
                 blks[:, None, :]]
    else:
        g = REF4[slot[:, None, None], pl[:, None, None],
                 rows[:, :, None], blks[:, None, :]]
    n, win_h = rows.shape
    g = g.reshape(n, win_h, nblk * BS)
    for k in range(5):
        bit = ((b >> k) & 1).astype(jnp.bool_)
        g = jnp.where(bit[:, None, None],
                      jnp.roll(g, -(1 << k), axis=2), g)
    return g[:, :, :win_w]


def _nblk(win_w):
    return -(-(win_w + BS - 1) // BS)


def enabled() -> bool:
    return os.environ.get("DAV1D_TPU_FUSED", "1") != "0"


# ---------------------------------------------------------------------------
# segment schedule (shared between the packer and the program builder)
# ---------------------------------------------------------------------------

def _seg(name, kind, grp, chunk, K, **params):
    return dict(name=name, kind=kind, grp=grp, chunk=chunk, K=K, **params)


@lru_cache(maxsize=None)
def segments(n_planes):
    """Static segment schedule. Order encodes the pass semantics:
    puts/warps (disjoint writes), then luma compounds (seg plane
    producers), chroma compounds (seg consumers), OBMC blends (top
    before left, RMW on disjoint regions), then residual adds.

    Segments carry a `phase`: the schedule executes as TWO compiled
    programs ('mc' then 'res') rather than one — XLA's whole-program
    optimization goes superlinear on the single monolith (31+ min vs
    15s + 72s for the split on the same host), and two executions per
    frame still cost only one extra fixed launch overhead."""
    grps = ("y", "c") if n_planes > 1 else ("y",)
    segs = []
    for g in grps:
        for c in PUT_CLASSES:
            segs.append(_seg(f"put_{g}_{c}", "put", g, PUT_CHUNK[c], 11,
                             cls=c, phase="mc"))
        segs.append(_seg(f"bilin_{g}", "bilin", g, BILIN_CHUNK, 11,
                         cls=BILIN_C, phase="mc"))
        segs.append(_seg(f"warp_{g}", "warp", g, WARP_CHUNK, 12,
                         phase="mc"))
    for g in grps:                       # luma seg outputs before chroma
        for c in PUT_CLASSES:
            segs.append(_seg(f"comp_{g}_{c}", "comp", g, COMP_CHUNK[c],
                             25, cls=c, phase="mc"))
    for g in grps:
        for top in (1, 0):
            segs.append(_seg(f"obmc_{g}_{top}", "obmc", g, OBMC_CHUNK,
                             13, top=top, phase="mc"))
    for g in grps:
        segs.append(_seg(f"wht_{g}", "wht", g, WHT_CHUNK, 6,
                         phase="res"))
        for tx in range(N_TX):
            segs.append(_seg(f"res_{g}_{tx}", "res", g, _res_chunk(tx),
                             6, tx=tx, phase="res"))
    return tuple(segs)


# dense per-class wedge mask LUTs: every (layout, bs, sign, idx) combo
# expanded to the class square at build time, so the kernel gathers one
# whole (c, c) block per job (the fast trailing-dims pattern) instead
# of per-element blob reads. Wedge masks exist only for blocks up to
# 32x32 (reference wedge.h:39 offsets run BS_32X32..BS_8X8), so only
# classes 16 and 32 carry a LUT.
@lru_cache(maxsize=None)
def _wedge_lut(c):
    from .mc_ref import wedge_mask
    from ..entropy import levels as _lv
    out = np.zeros((3 * 11 * 32, c, c), np.int8)
    for clidx in range(3):
        ss_hor = 1 if clidx else 0
        ss_ver = 1 if clidx == 2 else 0
        for bsrel in range(11):
            dims = _lv.block_dimensions[BS_32X32 + bsrel]
            w = (int(dims[0]) * 4) >> ss_hor
            h = (int(dims[1]) * 4) >> ss_ver
            if w > c or h > c:
                continue
            for sidx in range(32):
                try:
                    m = wedge_mask(clidx, BS_32X32 + bsrel, sidx >> 4,
                                   sidx & 15, w, h)
                except Exception:
                    continue
                key = (clidx * 11 + bsrel) * 32 + sidx
                out[key, :h, :w] = m
    return out


# txtp -> (row_kind_index, col_kind_index) per tx, in res_tx_kinds order
@lru_cache(maxsize=None)
def _txtp_kidx_map():
    m = np.zeros((N_TX, 17, 2), np.int32)
    for tx in range(N_TX):
        rk, ck = res_tx_kinds(tx)
        for txtp, (ft, st) in TX1D_TYPES.items():
            if ft in rk and st in ck:
                m[tx, txtp] = (rk.index(ft), ck.index(st))
    return m


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

def _pad_seg(tbl, chunk, K, oob_cols):
    n = len(tbl)
    chunks = -(-n // chunk)
    arr = np.zeros((chunks * chunk, K), np.int32)
    arr[:n] = tbl
    for c in oob_cols:
        arr[n:, c] = OOB
    return arr, chunks


_OOB_COLS = {"put": (3, 4), "bilin": (3, 4), "warp": (1, 2),
             "comp": (3, 4), "obmc": (5, 6), "wht": (3, 4),
             "res": (3, 4)}


def _size_cls(h, w):
    m = np.maximum(h, w)
    return np.where(m <= 16, 16,
                    np.where(m <= 32, 32, np.where(m > 64, 128, 64)))


def pack(jobs, lut, bases, n_planes, buf_floor=1 << 14):
    """Group the frame's job tables into the static segment schedule and
    concatenate them into (meta, flat_buf). Returns None if a job
    exceeds a kernel's static caps (caller falls back to the per-group
    launch path). `buf_floor` pins a resolution-derived minimum length
    so nearly every frame of a stream shares ONE compiled program pair
    (ladder steps above the floor are rare dense frames)."""
    segs = segments(n_planes)
    tbls = {}

    puts = np.asarray(jobs["puts"], np.int32).reshape(-1, 11)
    if len(puts):
        puts = puts.copy()
        puts[:, 5] = lut[puts[:, 5]]
        cls = _size_cls(puts[:, 1], puts[:, 2])
        bil = puts[:, 10] < 0
        for g, msk in (("y", puts[:, 0] == 0), ("c", puts[:, 0] > 0)):
            sub = puts[msk]
            if not len(sub):
                continue
            sub = sub.copy()
            if g == "c":
                sub[:, 0] -= 1
            scls, sbil = cls[msk], bil[msk]
            for c in PUT_CLASSES:
                tbls[f"put_{g}_{c}"] = sub[(scls == c) & ~sbil]
            tbls[f"bilin_{g}"] = sub[sbil]

    warps = np.asarray(jobs["warps"], np.int32).reshape(-1, 12)
    if len(warps):
        warps = warps.copy()
        warps[:, 3] = lut[warps[:, 3]]
        for g, msk in (("y", warps[:, 0] == 0), ("c", warps[:, 0] > 0)):
            sub = warps[msk].copy()
            if len(sub) and g == "c":
                sub[:, 0] -= 1
            tbls[f"warp_{g}"] = sub

    comp = np.asarray(jobs["comp"], np.int32).reshape(-1, 25)
    if len(comp):
        comp = comp.copy()
        comp[:, 18] = lut[comp[:, 18]]
        comp[:, 24] = lut[comp[:, 24]]
        cls = _size_cls(comp[:, 1], comp[:, 2])
        if np.any((comp[:, 8] == 1) & (cls > 32)):
            return None      # wedge beyond the LUT classes: impossible
                             # by spec (32x32 max), fall back if seen
        for g, msk in (("y", comp[:, 0] == 0), ("c", comp[:, 0] > 0)):
            sub = comp[msk]
            if not len(sub):
                continue
            sub = sub.copy()
            if g == "c":
                sub[:, 0] -= 1
            scls = cls[msk]
            for c in PUT_CLASSES:
                tbls[f"comp_{g}_{c}"] = sub[scls == c]

    obmc = np.asarray(jobs["obmc"], np.int32).reshape(-1, 13)
    if len(obmc):
        top_m = obmc[:, 0] == 1
        for tval, msk in ((1, top_m), (0, ~top_m)):
            sub = obmc[msk]
            if not len(sub):
                continue
            caps = OBMC_CAPS[tval]
            if (sub[:, 2].max(initial=0) > caps["lap_w"] or
                    sub[:, 3].max(initial=0) > caps["hh"] or
                    sub[:, 4].max(initial=0) > caps["lap_h"]):
                # geometry beyond the classed kernel's static caps
                return None
        obmc = obmc.copy()
        obmc[:, 7] = lut[obmc[:, 7]]
        for g, msk in (("y", obmc[:, 1] == 0), ("c", obmc[:, 1] > 0)):
            sub = obmc[msk]
            if not len(sub):
                continue
            sub = sub.copy()
            if g == "c":
                sub[:, 1] -= 1
            for top in (1, 0):
                tbls[f"obmc_{g}_{top}"] = sub[sub[:, 0] == top]

    res = np.asarray(jobs["res"], np.int32).reshape(-1, 7)
    if len(res):
        cfoff = (bases[res[:, 6]] + res[:, 5]).astype(np.int32)
        kmap = _txtp_kidx_map()
        kidx = kmap[res[:, 1], res[:, 2]]
        # rows: [pl, ridx, cidx, py, px, cfoff]
        rows = np.stack([res[:, 0], kidx[:, 0], kidx[:, 1],
                         res[:, 3], res[:, 4], cfoff], axis=1)
        is_wht = res[:, 2] == lv.WHT_WHT
        for g, msk in (("y", res[:, 0] == 0), ("c", res[:, 0] > 0)):
            sub = rows[msk]
            if not len(sub):
                continue
            sub = sub.copy()
            if g == "c":
                sub[:, 0] -= 1
            stx, swht = res[msk, 1], is_wht[msk]
            tbls[f"wht_{g}"] = sub[swht]
            for tx in range(N_TX):
                tbls[f"res_{g}_{tx}"] = sub[(stx == tx) & ~swht]

    meta = np.zeros(2 * len(segs), np.int32)
    parts = []
    pos = 0
    for si, sd in enumerate(segs):
        t = tbls.get(sd["name"])
        if t is None or not len(t):
            continue
        arr, chunks = _pad_seg(t, sd["chunk"], sd["K"],
                               _OOB_COLS[sd["kind"]])
        meta[2 * si] = pos
        meta[2 * si + 1] = chunks
        parts.append(arr.reshape(-1))
        pos += arr.size
    if parts:
        buf = np.concatenate(parts)
    else:
        buf = np.zeros(16, np.int32)
    # floor covers the largest single chunk slice (dynamic_slice needs
    # slice_sizes <= operand shape even for zero-trip segments).
    # Returns the UNPADDED buffer + the ladder total: the zero tail is
    # materialized on device (_dev_pad) so only used bytes cross the
    # tunnel (at 4K the floor alone is ~8.3 MB/frame of int32)
    n = 1 << max(14, (buf_floor - 1).bit_length(),
                 int(len(buf) - 1).bit_length())
    return meta, buf, n


# ---------------------------------------------------------------------------
# device-resident constant tables (uploaded once per process)
# ---------------------------------------------------------------------------

_CONSTS = None


def _dev_consts(jnp):
    global _CONSTS
    if _CONSTS is None:
        _CONSTS = (jnp.asarray(np.asarray(filter_banks())),
                   jnp.asarray(_warp_filter()),
                   jnp.asarray(obmc_masks()),
                   jnp.asarray(_wedge_lut(16)),
                   jnp.asarray(_wedge_lut(32)))
    return _CONSTS


# ---------------------------------------------------------------------------
# the fused program
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _mc_program(phase, n_planes, Hy, Wy, Hc, Wc, R, bd, ss_hor, ss_ver,
                rh_y, rw_y, rh_c, rw_c, buf_len, pool_len):
    jax = jax_mod()
    jnp = jax.numpy
    lax = jax.lax
    segs = segments(n_planes)
    ib = intermediate_bits(bd)
    pb = prep_bias(bd)
    px_max = (1 << bd) - 1

    def make_body(sd, consts, REFY, REFC, pool, SPdims):
        fb, wf, om, wl16, wl32 = consts
        is_c = sd["grp"] == "c"
        rh, rw = (rh_c, rw_c) if is_c else (rh_y, rw_y)
        REF4 = REFC if is_c else REFY
        npool = pool.shape[0]

        def win(slot, pl, dy, dx, win_h, win_w, off):
            """Edge-replicated window read: clamp the BASE into the
            padded apron (bit-exact vs the per-element clamp, see PAD
            note above), then block-gather + shift."""
            row_base = jnp.clip(dy - off, -PAD, rh - 1) + PAD
            col_base = jnp.clip(dx - off, -PAD, rw - 1) + PAD
            rows = row_base[:, None] + jnp.arange(win_h,
                                                  dtype=jnp.int32)
            return _win_gather(jnp, REF4, slot, pl if is_c else None,
                               rows, col_base, win_w, _nblk(win_w))

        def cf_gather(off_vec, count):
            """Contiguous coefficient-pool reads via block gather."""
            nblk = _nblk(count)
            a = off_vec >> 5
            b = off_vec & 31
            blks = jnp.clip(a[:, None] +
                            jnp.arange(nblk, dtype=jnp.int32), 0,
                            npool // BS - 1)
            g = pool.reshape(-1, BS)[blks]
            g = g.reshape(off_vec.shape[0], nblk * BS)
            for k in range(5):
                bit = ((b >> k) & 1).astype(jnp.bool_)
                g = jnp.where(bit[:, None],
                              jnp.roll(g, -(1 << k), axis=1), g)
            return g[:, :count].astype(jnp.int32)

        def cur_gather(carry, pl, py, px, win_h, win_w):
            """Block-gather a window of the CURRENT (carry) plane for
            read-modify-write blends/adds. Bases clamp into the plane
            and the residual offset is applied by conditional rolls;
            wrapped trailing lanes only ever cover rows/cols past the
            job's valid region (which the scatter drops)."""
            P = carry[1] if is_c else carry[0]
            H, W = P.shape[-2], P.shape[-1]
            WBp = W // BS
            # nblk = ceil((31+w)/32) bounds the clamped fine shift to
            # b <= 32*nblk - win_w <= 63, covered by the 6 roll steps
            nblk = _nblk(win_w)
            rb = jnp.clip(py, 0, H - win_h)
            rr = jnp.clip(py, 0, H - 1) - rb
            a = jnp.clip(px >> 5, 0, WBp - nblk)
            b = jnp.clip(px, 0, W - 1) - (a << 5)
            rows = rb[:, None] + jnp.arange(win_h, dtype=jnp.int32)
            blks = a[:, None] + jnp.arange(nblk, dtype=jnp.int32)
            if is_c:
                P4 = P.reshape(2, H, WBp, BS)
                g = P4[pl[:, None, None], rows[:, :, None],
                       blks[:, None, :]]
            else:
                P4 = P.reshape(H, WBp, BS)
                g = P4[rows[:, :, None], blks[:, None, :]]
            n = py.shape[0]
            g = g.reshape(n, win_h, nblk * BS)
            # 7 column-shift steps: a job whose VALID region is
            # narrower than the class window can sit past W - win_w
            # (e.g. an OBMC blend cap at the right edge), where the
            # clamped base leaves b up to 32*nblk - 1 > 63; the valid
            # lanes still satisfy b + j < 32*nblk, so the wider shift
            # reaches them (found via a 24px chroma OBMC divergence on
            # the multichip dryrun stream)
            for k in range(7):
                if k < 6:
                    bit = ((rr >> k) & 1).astype(jnp.bool_)
                    g = jnp.where(bit[:, None, None],
                                  jnp.roll(g, -(1 << k), axis=1), g)
                bitc = ((b >> k) & 1).astype(jnp.bool_)
                g = jnp.where(bitc[:, None, None],
                              jnp.roll(g, -(1 << k), axis=2), g)
            return g[:, :, :win_w]

        def read(carry, pl, drows, dcols):
            Y, C, SP = carry
            if is_c:
                return C[pl[:, None, None], drows[:, :, None],
                         dcols[:, None, :]]
            return Y[drows[:, :, None], dcols[:, None, :]]

        def scatter(carry, pl, drows, dcols, vals):
            Y, C, SP = carry
            if is_c:
                C = C.at[pl[:, None, None], drows[:, :, None],
                         dcols[:, None, :]].set(vals, mode="drop")
            else:
                Y = Y.at[drows[:, :, None],
                         dcols[:, None, :]].set(vals, mode="drop")
            return (Y, C, SP)

        kind = sd["kind"]

        if kind in ("put", "bilin"):
            Cc = sd["cls"]

            def body(tbl, carry):
                pl = tbl[:, 0]
                h, w = tbl[:, 1], tbl[:, 2]
                py, px = tbl[:, 3], tbl[:, 4]
                slot, dy, dx = tbl[:, 5], tbl[:, 6], tbl[:, 7]
                amx, amy = tbl[:, 8], tbl[:, 9]
                n = tbl.shape[0]
                if kind == "bilin":
                    p = win(slot, pl, dy, dx, Cc + 1, Cc + 1, 0)
                    mid = _rnd(jnp, 16 * p[:, :, :Cc] + amx[:, None, None]
                               * (p[:, :, 1:Cc + 1] - p[:, :, :Cc]),
                               4 - ib)
                    v = 16 * mid[:, :Cc] + amy[:, None, None] * \
                        (mid[:, 1:Cc + 1] - mid[:, :Cc])
                    out = jnp.clip(_rnd(jnp, v, 4 + ib), 0, px_max)
                else:
                    ft = tbl[:, 10]
                    fh = _taps(jnp, fb, w <= 4, ft, amx)
                    fv = _taps(jnp, fb, h <= 4, ft >> 2, amy)
                    patch = win(slot, pl, dy, dx, Cc + 7, Cc + 7, 3)
                    mid = jnp.zeros((n, Cc + 7, Cc), jnp.int32)
                    for i in range(8):
                        mid = mid + fh[:, i, None, None] * \
                            patch[:, :, i:i + Cc]
                    mid = _rnd(jnp, mid, 6 - ib)
                    out = jnp.zeros((n, Cc, Cc), jnp.int32)
                    for i in range(8):
                        out = out + fv[:, i, None, None] * \
                            mid[:, i:i + Cc]
                    out = jnp.clip(_rnd(jnp, out, 6 + ib), 0, px_max)
                drows, dcols = _dst_ids(jnp, py, px, h, w, Cc, Cc)
                return scatter(carry, pl, drows, dcols, out)
            return body

        if kind == "warp":
            def body(tbl, carry):
                pl = tbl[:, 0]
                py, px, slot = tbl[:, 1], tbl[:, 2], tbl[:, 3]
                dy, dx = tbl[:, 4], tbl[:, 5]
                mx, my = tbl[:, 6], tbl[:, 7]
                alpha, beta = tbl[:, 8], tbl[:, 9]
                gamma, delta = tbl[:, 10], tbl[:, 11]
                n = tbl.shape[0]
                patch = win(slot, pl, dy, dx, 15, 15, 3)
                yy = jnp.arange(15, dtype=jnp.int32)
                xx = jnp.arange(8, dtype=jnp.int32)
                idx = 64 + ((mx[:, None, None] +
                             beta[:, None, None] * yy[:, None] +
                             alpha[:, None, None] * xx[None, :] + 512)
                            >> 10)
                F = wf[idx]
                mid = jnp.zeros((n, 15, 8), jnp.int32)
                for t in range(8):
                    mid = mid + F[:, :, :, t] * patch[:, :, t:t + 8]
                mid = _rnd(jnp, mid, 7 - ib)
                yy8 = jnp.arange(8, dtype=jnp.int32)
                idxy = 64 + ((my[:, None, None] +
                              delta[:, None, None] * yy8[:, None] +
                              gamma[:, None, None] * xx[None, :] + 512)
                             >> 10)
                Fv = wf[idxy]
                out = jnp.zeros((n, 8, 8), jnp.int32)
                for t in range(8):
                    out = out + Fv[:, :, :, t] * mid[:, t:t + 8, :]
                out = jnp.clip(_rnd(jnp, out, 7 + ib), 0, px_max)
                i8 = jnp.arange(8, dtype=jnp.int32)
                drows = jnp.where(py[:, None] >= OOB, OOB,
                                  py[:, None] + i8)
                dcols = jnp.where(px[:, None] >= OOB, OOB,
                                  px[:, None] + i8)
                return scatter(carry, pl, drows, dcols, out)
            return body

        if kind == "obmc":
            top = sd["top"]
            caps = OBMC_CAPS[top]
            LH, LW = caps["lap_h"], caps["lap_w"]
            BH, BW = caps["bh"], caps["bw"]

            def body(tbl, carry):
                pl = tbl[:, 1]
                ww, hh, lap_h = tbl[:, 2], tbl[:, 3], tbl[:, 4]
                py, px = tbl[:, 5], tbl[:, 6]
                slot, dy, dx = tbl[:, 7], tbl[:, 8], tbl[:, 9]
                amx, amy, ft = tbl[:, 10], tbl[:, 11], tbl[:, 12]
                n = tbl.shape[0]
                fh = _taps(jnp, fb, ww <= 4, ft, amx)
                fv = _taps(jnp, fb, lap_h <= 4, ft >> 2, amy)
                patch = win(slot, pl, dy, dx, LH + 7, LW + 7, 3)
                mid = jnp.zeros((n, LH + 7, LW), jnp.int32)
                for i in range(8):
                    mid = mid + fh[:, i, None, None] * \
                        patch[:, :, i:i + LW]
                mid = _rnd(jnp, mid, 6 - ib)
                lap = jnp.zeros((n, LH, LW), jnp.int32)
                for i in range(8):
                    lap = lap + fv[:, i, None, None] * \
                        mid[:, i:i + LH]
                lap = jnp.clip(_rnd(jnp, lap, 6 + ib), 0, px_max)
                lap = lap[:, :BH, :BW]
                ih = jnp.arange(BH, dtype=jnp.int32)
                iw = jnp.arange(BW, dtype=jnp.int32)
                if top:
                    hb = (hh * 3) >> 2
                    wb = ww
                    m = jnp.broadcast_to(
                        om[jnp.clip(hh[:, None] + ih[None, :], 0, 63)]
                        [:, :, None], (n, BH, BW))
                else:
                    hb = hh
                    wb = (ww * 3) >> 2
                    m = jnp.broadcast_to(
                        om[jnp.clip(ww[:, None] + iw[None, :], 0, 63)]
                        [:, None, :], (n, BH, BW))
                drows = jnp.where(ih[None, :] < hb[:, None],
                                  py[:, None] + ih, OOB)
                dcols = jnp.where(iw[None, :] < wb[:, None],
                                  px[:, None] + iw, OOB)
                dst = cur_gather(carry, pl, py, px, BH, BW)
                out = (dst * (64 - m) + lap * m + 32) >> 6
                return scatter(carry, pl, drows, dcols, out)
            return body

        if kind == "comp":
            Cc = sd["cls"]
            SPh, SPw = SPdims

            def body(tbl, carry):
                h, w = tbl[:, 1], tbl[:, 2]
                pl = tbl[:, 0]
                py, px = tbl[:, 3], tbl[:, 4]
                mode, jw, sign = tbl[:, 5], tbl[:, 6], tbl[:, 7]
                mkind = tbl[:, 8]
                clidx, mbs = tbl[:, 9], tbl[:, 10]
                msign, widx = tbl[:, 11], tbl[:, 12]
                n = tbl.shape[0]

                def prep(base):
                    dy, dx = tbl[:, base], tbl[:, base + 1]
                    amx, amy = tbl[:, base + 2], tbl[:, base + 3]
                    ft, slot = tbl[:, base + 4], tbl[:, base + 5]
                    fh = _taps(jnp, fb, w <= 4, ft, amx)
                    fv = _taps(jnp, fb, h <= 4, ft >> 2, amy)
                    patch = win(slot, pl, dy, dx, Cc + 7, Cc + 7, 3)
                    mid = jnp.zeros((n, Cc + 7, Cc), jnp.int32)
                    for i in range(8):
                        mid = mid + fh[:, i, None, None] * \
                            patch[:, :, i:i + Cc]
                    mid = _rnd(jnp, mid, 6 - ib)
                    out = jnp.zeros((n, Cc, Cc), jnp.int32)
                    for i in range(8):
                        out = out + fv[:, i, None, None] * \
                            mid[:, i:i + Cc]
                    return _rnd(jnp, out, 6) - pb

                t0 = prep(13)
                t1 = prep(19)
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
                m_seg = jnp.minimum(
                    38 + ((jnp.abs(tdiff) + mask_rnd) >> mask_sh), 64)
                drows, dcols = _dst_ids(jnp, py, px, h, w, Cc, Cc)
                # wedge masks: whole-square gather from the dense
                # per-class LUT (one (c, c) block per job — the fast
                # trailing-dims pattern); wedge masks exist only for
                # blocks up to 32x32 (reference wedge.h:39), so bigger
                # classes carry none (pack() guarantees it)
                if Cc <= 32:
                    wlut = wl16 if Cc == 16 else wl32
                    wkey = (jnp.clip(clidx, 0, 2) * 11 +
                            jnp.clip(mbs - BS_32X32, 0, 10)) * 32 + \
                        jnp.clip(msign * 16 + widx, 0, 31)
                    m_wedge = wlut[jnp.clip(wkey, 0,
                                            wlut.shape[0] - 1)]
                    m_ext = jnp.where((mkind == 1)[:, None, None],
                                      m_wedge.astype(jnp.int32), 0)
                else:
                    m_ext = jnp.zeros((n, Cc, Cc), jnp.int32)
                if is_c:
                    SP = carry[2]
                    sp = SP[jnp.clip(drows, 0, SPh - 1)[:, :, None],
                            jnp.clip(dcols, 0, SPw - 1)[:, None, :]]
                    m_ext = jnp.where((mkind == 2)[:, None, None], sp,
                                      m_ext)
                m_used = jnp.where(m3 == COMP_SEG, m_seg, m_ext)
                masked = (tdiff * m_used + ts1 * 64 +
                          ((32 << ib) + pb * 64)) >> (ib + 6)
                out = jnp.where(m3 == COMP_AVG, avg,
                                jnp.where(m3 == COMP_WAVG, wavg, masked))
                out = jnp.clip(out, 0, px_max)
                carry = scatter(carry, pl, drows, dcols, out)
                if is_c or n_planes == 1:
                    return carry
                # luma SEG jobs: subsample w_mask output into the seg
                # plane for the chroma combines
                Y, C, SP = carry
                if ss_hor:
                    mpair = m_seg[:, :, 0::2] + m_seg[:, :, 1::2]
                    if ss_ver:
                        seg_sub = (mpair[:, 0::2] + mpair[:, 1::2] +
                                   2 - sign[:, None, None]) >> 2
                    else:
                        seg_sub = (mpair + 1 - sign[:, None, None]) >> 1
                else:
                    seg_sub = m_seg
                Hc_, Wc_ = Cc >> ss_ver, Cc >> ss_hor
                is_seg = mode == COMP_SEG
                ihc = jnp.arange(Hc_, dtype=jnp.int32)
                iwc = jnp.arange(Wc_, dtype=jnp.int32)
                hc, wc = h >> ss_ver, w >> ss_hor
                pyc = jnp.where(is_seg, py >> ss_ver, OOB)
                pxc = jnp.where(is_seg, px >> ss_hor, OOB)
                sdr = jnp.where(ihc[None, :] < hc[:, None],
                                pyc[:, None] + ihc, OOB)
                sdc = jnp.where(iwc[None, :] < wc[:, None],
                                pxc[:, None] + iwc, OOB)
                SP = SP.at[sdr[:, :, None], sdc[:, None, :]].set(
                    seg_sub, mode="drop")
                return (Y, C, SP)
            return body

        if kind == "wht":
            from . import itx_core

            def body(tbl, carry):
                pl = tbl[:, 0]
                py, px, off = tbl[:, 3], tbl[:, 4], tbl[:, 5]
                n = tbl.shape[0]
                cf = cf_gather(off, 16)
                c4 = (cf.reshape(n, 4, 4) >> 2)
                rows = itx_core.wht4([c4[:, i, :] for i in range(4)])
                cols = itx_core.wht4([jnp.stack(rows, 1)[:, :, i]
                                      for i in range(4)])
                resv = jnp.stack(cols, 1)
                i4 = jnp.arange(4, dtype=jnp.int32)
                drows = jnp.where(py[:, None] >= OOB, OOB,
                                  py[:, None] + i4)
                dcols = jnp.where(px[:, None] >= OOB, OOB,
                                  px[:, None] + i4)
                cur = cur_gather(carry, pl, py, px, 4, 4)
                out = jnp.clip(cur + resv, 0, px_max)
                return scatter(carry, pl, drows, dcols, out)
            return body

        # kind == "res": fused itx + add, per-job 1-D kind selection
        from . import itx_core
        tx = sd["tx"]
        t_dim = lv.TXFM_INFO[tx]
        w_px, h_px = 4 * t_dim.w, 4 * t_dim.h
        sw, sh = min(w_px, 32), min(h_px, 32)
        shift = TX_SHIFT[tx]
        rnd = (1 << shift) >> 1
        is_rect2 = (w_px * 2 == h_px) or (h_px * 2 == w_px)
        if bd == 8:
            row_min = col_min = -(1 << 15)
        else:
            row_min = -(px_max + 1) << 7
            col_min = -(px_max + 1) << 5
        row_max, col_max = ~row_min, ~col_min
        row_kinds, col_kinds = res_tx_kinds(tx)
        lw2, lh2 = t_dim.lw + 2, t_dim.lh + 2

        def body(tbl, carry):
            pl = tbl[:, 0]
            ridx, cidx = tbl[:, 1], tbl[:, 2]
            py, px = tbl[:, 3], tbl[:, 4]
            off = tbl[:, 5]
            n = tbl.shape[0]
            cf = cf_gather(off, sw * sh)
            rows = cf.reshape(n, sw, sh).transpose(0, 2, 1)
            if is_rect2:
                rows = (rows * 181 + 128) >> 8

            def sel(idx_vec, kinds, apply, x):
                out = apply(kinds[0], x)
                for k in range(1, len(kinds)):
                    out = jnp.where((idx_vec == k)[:, None, None],
                                    apply(kinds[k], x), out)
                return out

            def row_apply(kind, x):
                f = itx_core.FNS[(lw2, kind)]
                o = f([x[:, :, i] for i in range(sw)],
                      lambda v: jnp.clip(v, row_min, row_max))
                return jnp.stack(o, axis=2)

            def col_apply(kind, x):
                f = itx_core.FNS[(lh2, kind)]
                o = f([x[:, i, :] for i in range(sh)],
                      lambda v: jnp.clip(v, col_min, col_max))
                return jnp.stack(o, axis=1)

            tmp = sel(ridx, row_kinds, row_apply, rows)
            tmp = jnp.clip((tmp + rnd) >> shift, col_min, col_max)
            resv = (sel(cidx, col_kinds, col_apply, tmp) + 8) >> 4
            drows = jnp.where(py[:, None] >= OOB, OOB, py[:, None] +
                              jnp.arange(h_px, dtype=jnp.int32))
            dcols = jnp.where(px[:, None] >= OOB, OOB, px[:, None] +
                              jnp.arange(w_px, dtype=jnp.int32))
            cur = cur_gather(carry, pl, py, px, h_px, w_px)
            out = jnp.clip(cur + resv, 0, px_max)
            return scatter(carry, pl, drows, dcols, out)
        return body

    def run_segs(carry, REFY, REFC, buf, pool, meta, consts):
        # every constant table rides as a program ARGUMENT: a captured
        # device array becomes an embedded constant that this backend
        # re-materializes on every execution (measured ~40ms/exec for
        # a captured 64MB ref stack; even small captures add fixed
        # per-exec cost across the 60+ loop bodies)
        SP = carry[2]
        for si, sd in enumerate(segs):
            if sd["phase"] != phase:
                continue
            body = make_body(sd, consts, REFY, REFC, pool,
                             (SP.shape[0], SP.shape[1]))
            off = meta[2 * si]
            n_ch = meta[2 * si + 1]
            K, chunk = sd["K"], sd["chunk"]

            def loop_body(st, body=body, off=off, K=K, chunk=chunk):
                i = st[0]
                car = st[1:]
                tbl = jax.lax.dynamic_slice(
                    buf, (off + i * chunk * K,),
                    (chunk * K,)).reshape(chunk, K)
                car = body(tbl, car)
                return (i + 1,) + tuple(car)

            st = jax.lax.while_loop(
                lambda st, n_ch=n_ch: st[0] < n_ch, loop_body,
                (jnp.asarray(0, jnp.int32),) + carry)
            carry = st[1:]
        return carry

    if phase == "mc":
        def fn(REFY, REFC, buf, pool, meta, fb, wf, om, wblob, woff):
            Y = jnp.zeros((Hy, Wy), jnp.int32)
            if n_planes > 1:
                C = jnp.zeros((2, Hc, Wc), jnp.int32)
                SP = jnp.zeros((Hc, Wc), jnp.int32)
            else:
                C = jnp.zeros((2, 8, 8), jnp.int32)
                SP = jnp.zeros((8, 8), jnp.int32)
            return run_segs((Y, C, SP), REFY, REFC, buf, pool, meta,
                            (fb, wf, om, wblob, woff))[:2]
        return jax.jit(fn)

    def fn(Y, C, buf, pool, meta, fb, wf, om, wblob, woff):
        jnpz = jnp.zeros((8, 8), jnp.int32)
        dummy_refy = jnp.zeros((1, 8, 8), jnp.int32)
        dummy_refc = jnp.zeros((1, 2, 8, 8), jnp.int32)
        carry = run_segs((Y, C, jnpz), dummy_refy, dummy_refc, buf,
                         pool, meta, (fb, wf, om, wblob, woff))
        return carry[0], carry[1]

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _pad_plane_mc(jnp, p, rh, rw):
    """Edge-replicate the valid region into a PAD apron and align the
    width to the gather block: the device copy that buys linear-window
    MC reads (see PAD note)."""
    v = p[:rh, :rw].astype(jnp.int32)
    return jnp.pad(v, ((PAD, PAD), (PAD, _pad_w(rw) - rw - PAD)),
                   mode="edge")


def _mcpad_ref(pic, jnp, n_planes, rh_y, rw_y, rh_c, rw_c):
    """Padded MC view of a reference picture, cached on the Picture
    (built once per ref per geometry; refs are immutable post-frame)."""
    cached = getattr(pic, "dev_mcpad", None)
    geom = (rh_y, rw_y, rh_c, rw_c)
    if cached is not None and cached[0] == geom:
        return cached[1], cached[2]
    dev = getattr(pic, "dev", None)
    if dev is None:
        dev = [jnp.asarray(np.asarray(p)) for p in pic.planes]
    y = _pad_plane_mc(jnp, dev[0], rh_y, rw_y)
    if n_planes > 1:
        c = jnp.stack([_pad_plane_mc(jnp, dev[1], rh_c, rw_c),
                       _pad_plane_mc(jnp, dev[2], rh_c, rw_c)])
    else:
        c = jnp.zeros((2, 8, BS), jnp.int32)
    pic.dev_mcpad = (geom, y, c)
    return y, c


def _build_refstacks_joint(recon, jnp):
    """(R, Hm, WBy, BS) padded luma stack + (R, 2, Hmc, WBc, BS) padded
    chroma stack + the refidx->slot lut, reusing device-resident ref
    planes (padded views cached per picture)."""
    n_planes = len(recon.pic.planes)
    rh_y, rw_y = recon._ref_bounds(0)
    rh_c, rw_c = recon._ref_bounds(1)
    arrs_y, arrs_c, ids = [], [], {}
    lut = np.zeros(7, np.int32)
    for i in range(7):
        s = recon.refp[i]
        if s is None or s.pic is None:
            continue
        key = id(s.pic)
        if key not in ids:
            ids[key] = len(arrs_y)
            y, c = _mcpad_ref(s.pic, jnp, n_planes, rh_y, rw_y,
                              rh_c, rw_c)
            arrs_y.append(y)
            arrs_c.append(c)
        lut[i] = ids[key]
    if not arrs_y:
        arrs_y = [jnp.zeros((rh_y + 2 * PAD, _pad_w(rw_y)), jnp.int32)]
        arrs_c = [jnp.zeros((2, 8, BS), jnp.int32)]
    # fixed depth 8: a frame-varying depth would recompile the MC
    # program whenever the number of distinct reference pictures grows
    while len(arrs_y) != 8:
        arrs_y.append(arrs_y[0])
    while len(arrs_c) != 8:
        arrs_c.append(arrs_c[0])
    REFY = jnp.stack(arrs_y)
    REFC = jnp.stack(arrs_c)
    REFY = REFY.reshape(REFY.shape[0], REFY.shape[1], -1, BS)
    REFC = REFC.reshape(REFC.shape[0], 2, REFC.shape[2], -1, BS)
    return REFY, REFC, lut


# upload-length granularity: rounding used prefixes to 64Ki elements
# keeps the per-length eager pad/join program set small (<= total/gran
# variants) while the zero ladder tail never crosses the tunnel
_PAD_GRAN = 1 << 16


def _host_round(arr, total, gran=_PAD_GRAN):
    """Zero-pad `arr` up to the next `gran` multiple (capped at
    `total`) on host, so upload shapes come from a small ladder."""
    up = min(total, -(-max(len(arr), 1) // gran) * gran)
    if up > len(arr):
        arr = np.concatenate([arr, np.zeros(up - len(arr), arr.dtype)])
    return arr


def _dev_zpad(d, total, jnp):
    """Zero-extend a device array to `total` elements on device."""
    if d.shape[0] < total:
        d = jnp.concatenate([d, jnp.zeros(total - d.shape[0], d.dtype)])
    return d


def _dev_pad(arr_np, total, jnp, gran=_PAD_GRAN):
    """Upload only the used prefix (gran-rounded) and zero-pad to
    `total` on device: the program operand keeps the ladder length
    while the tunnel carries just the used bytes."""
    return _dev_zpad(jnp.asarray(_host_round(arr_np, total, gran)),
                     total, jnp)


def execute(recon, jobs) -> bool:
    """Run the frame's MC passes as one fused program. Returns False if
    a static cap is exceeded (caller uses the per-group path)."""
    jax = jax_mod()
    jnp = jax.numpy
    f = recon.f
    n_planes = len(recon.pic.planes)
    with device_scope():
        with timing.phase("inter.fused_pack"):
            REFY, REFC, lut = _build_refstacks_joint(recon, jnp)
            pool_np, bases = recon._build_cf_pool()
            # resolution-derived floors keep the compiled-program pair
            # unique per stream (a frame-varying pow2 ladder forced a
            # program-cache load per frame in fresh processes)
            px_count = recon.pic.planes[0].size
            packed = pack(jobs, lut, bases, n_planes,
                          buf_floor=px_count // 4)
            if packed is None:
                return False
            meta, buf, buf_n = packed
            # only the used coefficient prefix crosses the tunnel; the
            # pow2-ladder tail is zeros materialized on device
            cf_used = min(len(pool_np), 64 * 64 + sum(
                int(t.get("cf_used", len(t["cf_pool"])))
                for t in recon.plan.native_tiles))
            pool_used = pool_np[:cf_used]
        with timing.phase("inter.fused_exec"):
            # 8-bit coefficients fit int16 (the reference's 8bpc coef
            # type): halves the biggest per-frame upload
            if recon.bitdepth == 8:
                pool = _dev_pad(pool_used.astype(np.int16),
                                len(pool_np), jnp)
                # leftover path wants int32: widen on device (free vs
                # the full int32 re-upload it previously paid)
                recon._cf_pool_dev = pool.astype(jnp.int32)
            else:
                # HBD dequantized coefs are clamped to +-((1<<19)-1)
                # (cf_max, entropy/decode.py:1586-1588), so the top
                # int32 half always fits int8: ship uint16 lo + int8
                # hi (3 B/coef vs 4) and rejoin on device — eager ops,
                # so the fused programs' int32 pool operand (and their
                # compile cache) is untouched
                pool_used = _host_round(pool_used, len(pool_np))
                lo = jnp.asarray((pool_used & 0xFFFF).astype(np.uint16))
                hi = jnp.asarray((pool_used >> 16).astype(np.int8))
                joined = (hi.astype(jnp.int32) << 16) | lo.astype(
                    jnp.int32)
                pool = _dev_zpad(joined, len(pool_np), jnp)
                recon._cf_pool_dev = pool
            recon._cf_bases = bases
            consts = _dev_consts(jnp)
            Hy, Wy = recon.pic.planes[0].shape
            Hc, Wc = recon.pic.planes[-1].shape
            rh_y, rw_y = recon._ref_bounds(0)
            rh_c, rw_c = recon._ref_bounds(1)
            key = (n_planes, Hy, Wy, Hc, Wc, int(REFY.shape[0]),
                   recon.bitdepth, f.ss_hor, f.ss_ver, rh_y, rw_y,
                   rh_c, rw_c, buf_n, len(pool_np))
            # the res program touches no reference state: drop those
            # key fields so ref-geometry changes don't recompile it
            res_key = (n_planes, Hy, Wy, Hc, Wc, 1, recon.bitdepth,
                       0, 0, 0, 0, 0, 0, buf_n, len(pool_np))
            _sync = (jax.block_until_ready
                     if timing.ENABLED and
                     os.environ.get("DAV1D_TPU_TIMING_SYNC") else
                     (lambda x: x))
            with timing.phase("inter.fused_upload"):
                buf_d = _dev_pad(buf, buf_n, jnp)
                meta_d = jnp.asarray(meta)
                _sync((buf_d, meta_d, pool, REFY, REFC))
            cargs = consts
            with timing.phase("inter.fused_mc"):
                Y, C = _mc_program("mc", *key)(REFY, REFC, buf_d, pool,
                                               meta_d, *cargs)
                _sync((Y, C))
            segs = segments(n_planes)
            if any(meta[2 * si + 1] for si, sd in enumerate(segs)
                   if sd["phase"] == "res"):
                with timing.phase("inter.fused_res"):
                    Y, C = _mc_program("res", *res_key)(Y, C, buf_d,
                                                        pool, meta_d,
                                                        *cargs)
                    _sync((Y, C))
        planes = [Y] if n_planes == 1 else [Y, C[0], C[1]]
        recon.pic.dev_c = C if n_planes > 1 else None
        recon._finish_device_planes(planes)
    return True
