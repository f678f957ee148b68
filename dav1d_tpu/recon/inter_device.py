"""Inter-frame reconstruction — device batch driver.

Walks the frame plan with the exact golden routing (it subclasses
InterReconstructor, so every mode decision — OBMC laps, sub-8x8 chroma,
compound types, warp eligibility — is the validated reference logic,
reference recon_tmpl.c:938-1985) but the executor leaves *collect* jobs
instead of computing pixels. The collected jobs run as batched device
kernels (ops/mc.py), bucketed by shape:

  pass A  single-ref puts: 8-tap / bilinear / warp 8x8 tiles
  pass B  compound blocks (two preps + combine, luma before chroma so
          segmentation w_mask outputs can feed the chroma combines)
  pass C  OBMC laps (top blends, then left blends — the golden
          within-block order; regions of distinct blocks are disjoint)
  pass D  residual scatter-adds (batch itx outputs)
  pass E  host leftovers, in decode order: blocks whose prediction
          reads the current picture (intra, interintra) and blocks on
          scaled (SVC) references — these run the golden eager path on
          the downloaded planes. Correctness of the split: inter
          prediction never reads the current picture, and intra edges
          only read raster-earlier pixels, so batching passes A-D
          before E reproduces the reference's sequential walk exactly.
"""
from __future__ import annotations

import numpy as np

from ..entropy import levels as lv
from ..ops import itx_ref, mc_ref
from ..ops.backend import device_scope, jax_mod
from ..ops import mc as mcdev
from .inter_ref import (InterReconstructor, COMP_INTER_NONE,
                        COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG,
                        COMP_INTER_SEG, COMP_INTER_WEDGE)


class _RetryEager(Exception):
    """Raised when a block needs the host path (scaled refs, warp-in-
    compound); the walk rolls the block's jobs back and replays it
    through the golden eager leaves."""


class DeviceInterReconstructor(InterReconstructor):
    def __init__(self, plan, refp):
        super().__init__(plan, refp)
        self.collecting = False
        self.put8 = {}        # (pl_idx, h, w) -> jobs
        self.bilin = {}       # (pl_idx, h, w) -> jobs
        self.warp = {}        # (pl_idx, put) -> jobs (8x8 tiles)
        self.comp = {}        # (pl_idx, h, w) -> jobs
        self.obmc_jobs = {}   # (top, pl_idx, ww, hh, lap_h) -> jobs
        self.res_jobs = {}    # (pl_idx, h, w) -> jobs
        self.res_fixups = []  # residuals without precomputed res
        self.leftovers = []
        self._comp_seq = 0

    # -- bucket helpers --------------------------------------------------
    def _snapshot(self):
        return tuple((d, {k: len(v) for k, v in d.items()})
                     for d in (self.put8, self.bilin, self.warp,
                               self.comp, self.obmc_jobs, self.res_jobs))

    def _rollback(self, snap):
        for d, lens in snap:
            for k in list(d):
                n = lens.get(k, 0)
                if n:
                    del d[k][n:]
                else:
                    del d[k]

    # -- phase math shared with the golden _mc ---------------------------
    def _mc_args(self, bw4, bh4, bx, by, pl, mv, refidx, filter2d):
        f = self.f
        ss_ver = int(bool(pl)) and f.ss_ver
        ss_hor = int(bool(pl)) and f.ss_hor
        if f.svc[refidx][0][0]:
            raise _RetryEager()
        h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
        mvy, mvx = mv
        mx = mvx & (15 >> (1 - ss_hor))
        my = mvy & (15 >> (1 - ss_ver))
        dx = bx * h_mul + (mvx >> (3 + ss_hor))
        dy = by * v_mul + (mvy >> (3 + ss_ver))
        amx, amy = mx << (1 - ss_hor), my << (1 - ss_ver)
        ft = mc_ref.FILTER2D_TO_TYPE[filter2d]
        return (bw4 * h_mul, bh4 * v_mul, dy, dx, amx, amy, ft, refidx)

    # -- executor leaf overrides ------------------------------------------
    def _put_mc(self, plane_idx, py, px, bw4, bh4, bx, by, pl, mv,
                refidx, filter2d):
        if not self.collecting:
            return super()._put_mc(plane_idx, py, px, bw4, bh4, bx, by,
                                   pl, mv, refidx, filter2d)
        w, h, dy, dx, amx, amy, ft, r = self._mc_args(
            bw4, bh4, bx, by, pl, mv, refidx, filter2d)
        if ft < 0:
            self.bilin.setdefault((plane_idx, h, w), []).append(
                (py, px, r, dy, dx, amx, amy))
        else:
            self.put8.setdefault((plane_idx, h, w), []).append(
                (py, px, r, dy, dx, amx, amy, ft))

    def _put_warp(self, plane_idx, py, px, b_dim, pl, refidx, wmp):
        if not self.collecting:
            return super()._put_warp(plane_idx, py, px, b_dim, pl,
                                     refidx, wmp)
        self._enqueue_warp(True, plane_idx, py, px, b_dim, pl, refidx,
                           wmp)

    def _enqueue_warp(self, put, plane_idx, py, px, b_dim, pl, refidx,
                      wmp):
        """Expand a warped block into per-8x8 jobs (the golden
        _warp_affine tiling, recon_tmpl.c:1115-1168)."""
        f = self.f
        ss_ver = int(bool(pl)) and f.ss_ver
        ss_hor = int(bool(pl)) and f.ss_hor
        h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
        mat = wmp.matrix
        bw_px = int(b_dim[0]) * h_mul
        bh_px = int(b_dim[1]) * v_mul
        jobs = self.warp.setdefault((plane_idx, put), [])
        for y in range(0, bh_px, 8):
            src_y = self.cur_by * 4 + ((y + 4) << ss_ver)
            mat3_y = mat[3] * src_y + mat[0]
            mat5_y = mat[5] * src_y + mat[1]
            for x in range(0, bw_px, 8):
                src_x = self.cur_bx * 4 + ((x + 4) << ss_hor)
                mvx = (mat[2] * src_x + mat3_y) >> ss_hor
                mvy = (mat[4] * src_x + mat5_y) >> ss_ver
                dx = (mvx >> 16) - 4
                mx = ((mvx & 0xffff) - wmp.alpha * 4 - wmp.beta * 7) \
                    & ~0x3f
                dy = (mvy >> 16) - 4
                my = ((mvy & 0xffff) - wmp.gamma * 4 - wmp.delta * 4) \
                    & ~0x3f
                jobs.append((py + y, px + x, refidx, dy, dx, mx, my,
                             wmp.alpha, wmp.beta, wmp.gamma, wmp.delta,
                             pl))

    def _obmc_lap_top(self, plane_idx, py, px, x_off, ow4, oh4, bx, by,
                      pl, mv, refidx, f2d, h_mul, v_mul):
        if not self.collecting:
            return super()._obmc_lap_top(plane_idx, py, px, x_off, ow4,
                                         oh4, bx, by, pl, mv, refidx,
                                         f2d, h_mul, v_mul)
        w, h, dy, dx, amx, amy, ft, r = self._mc_args(
            ow4, (oh4 * 3 + 3) >> 2, bx, by, pl, mv, refidx, f2d)
        if ft < 0:
            raise _RetryEager()
        hh = v_mul * oh4
        self.obmc_jobs.setdefault((True, plane_idx, w, hh, h),
                                  []).append(
            (py, px + x_off, r, dy, dx, amx, amy, ft))

    def _obmc_lap_left(self, plane_idx, py, px, y_off, ow4, oh4, bx, by,
                       pl, mv, refidx, f2d, h_mul, v_mul):
        if not self.collecting:
            return super()._obmc_lap_left(plane_idx, py, px, y_off, ow4,
                                          oh4, bx, by, pl, mv, refidx,
                                          f2d, h_mul, v_mul)
        w, h, dy, dx, amx, amy, ft, r = self._mc_args(
            ow4, oh4, bx, by, pl, mv, refidx, f2d)
        if ft < 0:
            raise _RetryEager()
        self.obmc_jobs.setdefault((False, plane_idx, w, h, h),
                                  []).append(
            (py + y_off, px, r, dy, dx, amx, amy, ft))

    def _exec_compound(self, plane_idx, py, px, descs, comp_type, jw,
                       sign, msk, ss_hor, ss_ver):
        if not self.collecting:
            return super()._exec_compound(plane_idx, py, px, descs,
                                          comp_type, jw, sign, msk,
                                          ss_hor, ss_ver)
        srcs = []
        for kind, args in descs:
            if kind == "warp":
                raise _RetryEager()
            srcs.append(self._mc_args(*args))
        w, h = srcs[0][0], srcs[0][1]
        if srcs[0][6] < 0:          # bilinear compound: host path
            raise _RetryEager()
        self._comp_seq += 1
        job_id = self._comp_seq
        job = [py, px, srcs, comp_type, jw, sign, msk, job_id]
        self.comp.setdefault((plane_idx, h, w), []).append(job)
        if comp_type == COMP_INTER_SEG and plane_idx == 0:
            return ("seg", job_id)
        return None

    def _add_residuals(self, b):
        if not self.collecting:
            return super()._add_residuals(b)
        for cb in self.plan.coefs[b.coef_start:b.coef_end]:
            if cb.eob < 0:
                continue
            if cb.res is None:
                self.res_fixups.append(cb)
                continue
            t_dim = lv.TXFM_INFO[cb.tx]
            self.res_jobs.setdefault(
                (cb.plane, t_dim.h * 4, t_dim.w * 4), []).append(
                (cb.y4 * 4, cb.x4 * 4, cb.res))

    # -- walk -------------------------------------------------------------
    def run(self):
        f = self.f
        fh = f.frame_hdr
        tiles = []
        for tr in range(fh.tiling.rows):
            for tc in range(fh.tiling.cols):
                cs = fh.tiling.col_start_sb[tc] << f.sb_shift
                ce = min(fh.tiling.col_start_sb[tc + 1] << f.sb_shift,
                         f.bw)
                rs = fh.tiling.row_start_sb[tr] << f.sb_shift
                re = min(fh.tiling.row_start_sb[tr + 1] << f.sb_shift,
                         f.bh)
                tiles.append((cs, ce, rs, re))

        def tile_of(b):
            for i, t in enumerate(tiles):
                if t[0] <= b.bx < t[1] and t[2] <= b.by < t[3]:
                    return i
            raise AssertionError

        for b in self.plan.blocks:
            bounds = tiles[tile_of(b)]
            if b.intra or b.interintra_type:
                if b.interintra_type and b.comp_type == COMP_INTER_NONE:
                    # keep the tl filter state the golden walk would have
                    self.tl_4x4_filter = b.filter2d
                self.leftovers.append((b, bounds))
                continue
            snap = self._snapshot()
            tl = self.tl_4x4_filter
            self.collecting = True
            try:
                self._recon_b_inter(b, *bounds)
            except _RetryEager:
                self._rollback(snap)
                self.tl_4x4_filter = tl
                self.collecting = False
                self._recon_b_inter(b, *bounds)
            finally:
                self.collecting = False

        self._execute()

        # leftovers: golden sequential recon in decode order
        for b, bounds in self.leftovers:
            self._recon_block(b, *bounds)
        for cb in self.res_fixups:
            t_dim = lv.TXFM_INFO[cb.tx]
            plane = self.pic.planes[cb.plane]
            ppx, ppy = cb.x4 * 4, cb.y4 * 4
            itx_ref.add_residual(
                plane[ppy:ppy + t_dim.h * 4, ppx:ppx + t_dim.w * 4],
                cb, self.bitdepth)
        return self.pic

    # -- device execution --------------------------------------------------
    def _ref_bounds(self, pl_type):
        f = self.f
        ss_hor = f.ss_hor if pl_type else 0
        ss_ver = f.ss_ver if pl_type else 0
        return ((f.frame_hdr.height + ss_ver) >> ss_ver,
                (f.frame_hdr.width[0] + ss_hor) >> ss_hor)

    def _build_refstacks(self, jnp):
        """One (R, H, W) device stack per plane index; refidx -> slot."""
        stacks = {}
        for plane_idx in range(len(self.pic.planes)):
            arrs = []
            ids = {}
            slot_of = {}
            for i in range(7):
                s = self.refp[i]
                if s is None or s.pic is None:
                    continue
                p = s.pic.planes[plane_idx]
                key = id(p)
                if key not in ids:
                    ids[key] = len(arrs)
                    arrs.append(np.asarray(p))
                slot_of[i] = ids[key]
            if not arrs:
                arrs = [np.zeros((8, 8), self.pic.planes[plane_idx].dtype)]
            stacks[plane_idx] = (jnp.asarray(np.stack(arrs)), slot_of)
        return stacks

    @staticmethod
    def _padn(n):
        return 1 << max(2, (n - 1).bit_length())

    def _execute(self):
        if not (self.put8 or self.bilin or self.warp or self.comp or
                self.obmc_jobs or self.res_jobs):
            return
        jax = jax_mod()
        jnp = jax.numpy
        bd = self.bitdepth
        OOB = 1 << 20      # scatter row sentinel for batch padding
        with device_scope():
            stacks = self._build_refstacks(jnp)
            planes = [jnp.asarray(p) for p in self.pic.planes]

            def scatter(pi, rows, cols, vals):
                planes[pi] = planes[pi].at[
                    rows[:, :, None], cols[:, None, :]].set(
                    vals.astype(planes[pi].dtype), mode="drop")

            def col(jobs, idx, np2, fill=0):
                n = len(jobs)
                a = np.full(np2, fill, np.int32)
                a[:n] = np.fromiter((j[idx] for j in jobs), np.int32, n)
                return a

            def put_tables(key, jobs, np2, win_h, win_w, off):
                """Gather tables, batch-padded to np2 (padding jobs
                write to the OOB sentinel row and are dropped)."""
                pl_type = int(bool(key[0]))
                rh, rw = self._ref_bounds(pl_type)
                REF, slot_of = stacks[key[0]]
                n = len(jobs)
                py = col(jobs, 0, np2, OOB)
                px = col(jobs, 1, np2)
                r = np.zeros(np2, np.int32)
                r[:n] = np.fromiter((slot_of[j[2]] for j in jobs),
                                    np.int32, n)
                dy = col(jobs, 3, np2)
                dx = col(jobs, 4, np2)
                rows = np.clip(dy[:, None] - off +
                               np.arange(win_h, dtype=np.int32), 0,
                               rh - 1)
                cols = np.clip(dx[:, None] - off +
                               np.arange(win_w, dtype=np.int32), 0,
                               rw - 1)
                return REF, py, px, r, rows, cols

            fb = mcdev.filter_banks()

            def taps(jobs, np2, w, h, mi=5, fi=7):
                amx = col(jobs, mi, np2)
                amy = col(jobs, mi + 1, np2)
                ft = col(jobs, fi, np2)
                fh = fb[int(w <= 4), ft & 3, amx]
                fv = fb[int(h <= 4), (ft >> 2) & 3, amy]
                return fh, fv, amx, amy

            # ---- pass A: single-ref puts --------------------------------
            for (pi, h, w), jobs in self.put8.items():
                np2 = self._padn(len(jobs))
                REF, py, px, r, rows, cols = put_tables(
                    (pi, h, w), jobs, np2, h + 7, w + 7, 3)
                fh, fv, _, _ = taps(jobs, np2, w, h)
                fn = mcdev._put8_fn(np2, h, w, bd, True)
                out = fn(REF, rows, cols, r, fh, fv)
                rr = py[:, None] + np.arange(h, dtype=np.int32)
                cc = px[:, None] + np.arange(w, dtype=np.int32)
                scatter(pi, rr, cc, out)
            for (pi, h, w), jobs in self.bilin.items():
                np2 = self._padn(len(jobs))
                REF, py, px, r, rows, cols = put_tables(
                    (pi, h, w), jobs, np2, h + 1, w + 1, 0)
                amx = col(jobs, 5, np2)
                amy = col(jobs, 6, np2)
                fn = mcdev._bilin_fn(np2, h, w, bd, True)
                out = fn(REF, rows, cols, r, amx, amy)
                rr = py[:, None] + np.arange(h, dtype=np.int32)
                cc = px[:, None] + np.arange(w, dtype=np.int32)
                scatter(pi, rr, cc, out)
            for (pi, put), jobs in self.warp.items():
                pl_type = int(bool(pi))
                rh, rw = self._ref_bounds(pl_type)
                REF, slot_of = stacks[pi]
                np2 = self._padn(len(jobs))
                n = len(jobs)
                py = col(jobs, 0, np2, OOB)
                px = col(jobs, 1, np2)
                r = np.zeros(np2, np.int32)
                r[:n] = np.fromiter((slot_of[j[2]] for j in jobs),
                                    np.int32, n)
                dy = col(jobs, 3, np2)
                dx = col(jobs, 4, np2)
                rows = np.clip(dy[:, None] - 3 +
                               np.arange(15, dtype=np.int32), 0, rh - 1)
                cols = np.clip(dx[:, None] - 3 +
                               np.arange(15, dtype=np.int32), 0, rw - 1)
                mx = col(jobs, 5, np2)
                my = col(jobs, 6, np2)
                al = col(jobs, 7, np2)
                be = col(jobs, 8, np2)
                ga = col(jobs, 9, np2)
                de = col(jobs, 10, np2)
                fn = mcdev._warp_fn(np2, bd, put)
                out = fn(REF, rows, cols, r, mx, my, al, be, ga, de)
                rr = py[:, None] + np.arange(8, dtype=np.int32)
                cc = px[:, None] + np.arange(8, dtype=np.int32)
                scatter(pi, rr, cc, out)

            # ---- pass B: compounds (luma first for seg masks) -----------
            seg_results = {}
            for luma in (True, False):
                for (pi, h, w), jobs in self.comp.items():
                    if (pi == 0) != luma:
                        continue
                    self._run_comp_bucket(pi, h, w, jobs, stacks,
                                          scatter, seg_results, bd)

            # ---- pass C: OBMC blends (top, then left) -------------------
            for top in (True, False):
                for key, jobs in self.obmc_jobs.items():
                    if key[0] != top:
                        continue
                    _, pi, ww, hh, lap_h = key
                    np2 = self._padn(len(jobs))
                    REF, py, px, r, rows, cols = put_tables(
                        (pi, lap_h, ww), jobs, np2, lap_h + 7, ww + 7, 3)
                    fh, fv, _, _ = taps(jobs, np2, ww, lap_h)
                    if top:
                        hb, wbl = (hh * 3) >> 2, ww
                    else:
                        hb, wbl = hh, (ww * 3) >> 2
                    drows = py[:, None] + np.arange(hb, dtype=np.int32)
                    dcols = px[:, None] + np.arange(wbl, dtype=np.int32)
                    fn = mcdev._obmc_blend_fn(np2, ww, hh, lap_h,
                                              bd, top)
                    out = fn(REF, rows, cols, r, fh, fv,
                             planes[pi].astype(jnp.int32),
                             np.minimum(drows, OOB - 1),
                             dcols)
                    scatter(pi, drows, dcols, out)

            # ---- pass D: residuals --------------------------------------
            for (pi, h, w), jobs in self.res_jobs.items():
                np2 = self._padn(len(jobs))
                py = col(jobs, 0, np2, OOB)
                px = col(jobs, 1, np2)
                res = np.zeros((np2, h, w), np.int32)
                res[:len(jobs)] = np.stack([j[2] for j in jobs])
                rr = py[:, None] + np.arange(h, dtype=np.int32)
                cc = px[:, None] + np.arange(w, dtype=np.int32)
                fn = mcdev._residual_fn(np2, h, w, bd)
                out = fn(planes[pi].astype(jnp.int32), rr, cc, res)
                scatter(pi, rr, cc, out)

            for i, p in enumerate(self.pic.planes):
                p[:] = np.asarray(planes[i])

    def _run_comp_bucket(self, pi, h, w, jobs, stacks, scatter,
                         seg_results, bd):
        f = self.f
        jnp = jax_mod().numpy
        pl_type = int(bool(pi))
        rh, rw = self._ref_bounds(pl_type)
        REF, slot_of = stacks[pi]
        fbk = mcdev.filter_banks()
        n = len(jobs)
        np2 = self._padn(n)
        OOB = 1 << 20

        def colv(vals, fill=0):
            a = np.full(np2, fill, np.int32)
            a[:n] = np.fromiter(vals, np.int32, n)
            return a

        py = colv((j[0] for j in jobs), OOB)
        px = colv((j[1] for j in jobs))
        srcs_t = [[], []]
        for j in jobs:
            for i in range(2):
                srcs_t[i].append(j[2][i])
        parts = []
        for i in range(2):
            dy = colv(s[2] for s in srcs_t[i])
            dx = colv(s[3] for s in srcs_t[i])
            amx = colv(s[4] for s in srcs_t[i])
            amy = colv(s[5] for s in srcs_t[i])
            ft = colv(s[6] for s in srcs_t[i])
            r = colv(slot_of[s[7]] for s in srcs_t[i])
            rows = np.clip(dy[:, None] - 3 + np.arange(h + 7,
                                                       dtype=np.int32),
                           0, rh - 1)
            cols = np.clip(dx[:, None] - 3 + np.arange(w + 7,
                                                       dtype=np.int32),
                           0, rw - 1)
            fh = fbk[int(w <= 4), ft & 3, amx]
            fv = fbk[int(h <= 4), (ft >> 2) & 3, amy]
            parts.extend([rows, cols, r, fh, fv])
        mode = colv(j[3] for j in jobs)
        jw = colv(j[4] for j in jobs)
        sign = colv(j[5] for j in jobs)
        msk = np.zeros((np2, h, w), np.int32)
        for i, j in enumerate(jobs):
            m = j[6]
            if isinstance(m, tuple) and m and m[0] == "seg":
                m = seg_results[m[1]]
            if m is not None and mode[i] not in (COMP_INTER_AVG,
                                                 COMP_INTER_WEIGHTED_AVG):
                msk[i] = m
        ss_hor = f.ss_hor if pi == 0 else 0
        ss_ver = f.ss_ver if pi == 0 else 0
        fn = mcdev._compound_fn(np2, h, w, bd, ss_hor, ss_ver)
        out, seg_sub = fn(REF, *parts, mode, jw, sign, msk)
        if pi == 0 and any(j[3] == COMP_INTER_SEG for j in jobs):
            seg_np = np.asarray(seg_sub)
            for i, j in enumerate(jobs):
                if j[3] == COMP_INTER_SEG:
                    seg_results[j[7]] = seg_np[i]
        rr = py[:, None] + np.arange(h, dtype=np.int32)
        cc = px[:, None] + np.arange(w, dtype=np.int32)
        scatter(pi, rr, cc, out)


def reconstruct_inter_frame_device(plan, refp):
    r = DeviceInterReconstructor(plan, refp)
    itx_ref.precompute_residuals(plan.coefs, r.bitdepth)
    return r.run()
