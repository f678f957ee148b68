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
from ..utils import timing
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
        self.had_eager = False   # a _RetryEager replay wrote host pixels
        self._journal = []       # bucket-append undo log

    # -- bucket helpers --------------------------------------------------
    # Rollback on _RetryEager uses an append-only journal instead of
    # per-block dict snapshots (the snapshot dict build was ~100ms/frame
    # at 1080p): every bucket append records (bucket_list,) and undo
    # pops; a fresh key records (dict, key) for deletion.
    def _push(self, d, k, item):
        lst = d.get(k)
        if lst is None:
            lst = d[k] = []
            self._journal.append((d, k, lst))
        else:
            self._journal.append((None, None, lst))
        lst.append(item)

    def _snapshot(self):
        return len(self._journal)

    def _rollback(self, snap):
        j = self._journal
        while len(j) > snap:
            d, k, lst = j.pop()
            lst.pop()
            if d is not None:
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
            self._push(self.bilin, (plane_idx, h, w),
                       (py, px, r, dy, dx, amx, amy))
        else:
            self._push(self.put8, (plane_idx, h, w),
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
        wkey = (plane_idx, put)
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
                self._push(self.warp, wkey,
                           (py + y, px + x, refidx, dy, dx, mx, my,
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
        self._push(self.obmc_jobs, (True, plane_idx, w, hh, h),
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
        self._push(self.obmc_jobs, (False, plane_idx, w, h, h),
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
        self._push(self.comp, (plane_idx, h, w), job)
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
            self._push(self.res_jobs,
                       (cb.plane, t_dim.h * 4, t_dim.w * 4),
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

        t_walk = timing.phase("inter.walk")
        t_walk.__enter__()
        for bi, b in enumerate(self.plan.blocks):
            bounds = tiles[tile_of(b)]
            self._quad_tl_restore(b)
            if b.intra or b.interintra_type:
                if b.interintra_type and b.comp_type == COMP_INTER_NONE:
                    # keep the tl filter state the golden walk would have
                    self.tl_4x4_filter = b.filter2d
                self.leftovers.append((bi, b, bounds))
                self._quad_tl_save(b)
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
                self.had_eager = True
                self._recon_b_inter(b, *bounds)
            finally:
                self.collecting = False
            self._quad_tl_save(b)
        t_walk.__exit__(None, None, None)

        self._execute()

        # leftovers: sequential recon in decode order. Pure-intra
        # leftovers run natively (one C++ call per consecutive run);
        # interintra / anything the native engine can't serve replays
        # through the golden path. Order is preserved across the mix —
        # intra edges may read pixels an earlier leftover wrote.
        with timing.phase("inter.leftovers"):
            from . import intra_native
            run = []

            def flush():
                if not run:
                    return
                idxs = [i for i, _, _ in run]
                if not intra_native.recon_blocks_native(
                        self.plan, self.pic, idxs):
                    for _i, b, bounds in run:
                        self._recon_block(b, *bounds)
                run.clear()

            for bi, b, bounds in self.leftovers:
                if b.intra:
                    run.append((bi, b, bounds))
                else:
                    flush()
                    self._recon_block(b, *bounds)
            flush()
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
        """One (R, H, W) int32 device stack per plane index;
        refidx -> slot. Reference planes that are still device-resident
        from their own decode (Picture.dev) stack with zero
        host->device traffic; refs without a cache upload once in their
        native dtype (4x fewer tunnel bytes) and widen on device."""
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
                    dev = getattr(s.pic, "dev", None)
                    if dev is not None:
                        arrs.append(dev[plane_idx])
                    else:
                        arrs.append(jnp.asarray(np.asarray(p))
                                    .astype(jnp.int32))
                slot_of[i] = ids[key]
            if not arrs:
                arrs = [jnp.zeros((8, 8), jnp.int32)]
            stacks[plane_idx] = (jnp.stack(arrs), slot_of)
        return stacks

    @staticmethod
    def _padn(n):
        return 1 << max(4, (n - 1).bit_length())

    # canonical size classes: every group pads to a FIXED (cls, cls)
    # window so the set of compiled programs is finite and saturates
    # after a few frames (per-frame max-dims made every frame compile
    # new shapes; on the tunnel-attached TPU compiles dwarf the padded
    # compute, which runs on otherwise idle VPU lanes)
    @staticmethod
    def _size_class(h, w):
        m = max(h, w)
        if m <= 16:
            return 16
        if m <= 32:
            return 32
        return 128 if m > 64 else 64

    def _regroup(self, buckets):
        """{(pi, h, w): jobs} -> {(pi, cls): [(h, w, job), ...]}."""
        groups = {}
        for (pi, h, w), jobs in buckets.items():
            g = groups.setdefault((pi, self._size_class(h, w)), [])
            for j in jobs:
                g.append((h, w, j))
        return groups

    @staticmethod
    def _pad_hw(items):
        """Canonical padded (H, W) of a group = its size class."""
        cls = DeviceInterReconstructor._size_class(
            max(h for h, _, _ in items), max(w for _, w, _ in items))
        return (cls, cls)

    _OOB = 1 << 20          # scatter sentinel: dropped by mode="drop"

    def _dst_tables(self, items, np2, H, W):
        """drows/dcols with OOB on size- and batch-padding lanes."""
        n = len(items)
        OOB = self._OOB
        drows = np.full((np2, H), OOB, np.int32)
        dcols = np.full((np2, W), OOB, np.int32)
        hs = np.fromiter((h for h, _, _ in items), np.int32, n)
        ws = np.fromiter((w for _, w, _ in items), np.int32, n)
        py = np.fromiter((j[0] for _, _, j in items), np.int32, n)
        px = np.fromiter((j[1] for _, _, j in items), np.int32, n)
        ar_h = np.arange(H, dtype=np.int32)
        ar_w = np.arange(W, dtype=np.int32)
        drows[:n] = np.where(ar_h[None, :] < hs[:, None],
                             py[:, None] + ar_h[None, :], OOB)
        dcols[:n] = np.where(ar_w[None, :] < ws[:, None],
                             px[:, None] + ar_w[None, :], OOB)
        return drows, dcols

    def _gather_tables(self, pi, items, np2, H, W, off, dyi, dxi):
        """Clamped source gather ids; window is H+7 for 8-tap (off=3),
        H+1 for bilinear (off=0)."""
        n = len(items)
        rh, rw = self._ref_bounds(int(bool(pi)))
        win_h = H + (7 if off == 3 else 1)
        win_w = W + (7 if off == 3 else 1)
        rows = np.zeros((np2, win_h), np.int32)
        cols = np.zeros((np2, win_w), np.int32)
        dy = np.fromiter((j[dyi] for _, _, j in items), np.int32, n)
        dx = np.fromiter((j[dxi] for _, _, j in items), np.int32, n)
        rows[:n] = np.clip(dy[:, None] - off +
                           np.arange(win_h, dtype=np.int32), 0, rh - 1)
        cols[:n] = np.clip(dx[:, None] - off +
                           np.arange(win_w, dtype=np.int32), 0, rw - 1)
        return rows, cols

    def _execute(self):
        if not (self.put8 or self.bilin or self.warp or self.comp or
                self.obmc_jobs or self.res_jobs):
            return
        jax = jax_mod()
        jnp = jax.numpy
        bd = self.bitdepth
        OOB = self._OOB
        fb = mcdev.filter_banks()
        from ..ops.backend import fetch_all
        import os as _os
        _sync = (lambda x: jax.block_until_ready(x)) if timing.ENABLED and \
            _os.environ.get("DAV1D_TPU_TIMING_SYNC") else (lambda x: x)
        with device_scope():
            with timing.phase("inter.upload_refs"):
                stacks = self._build_refstacks(jnp)
                _sync([s[0] for s in stacks.values()])
            with timing.phase("inter.upload_planes"):
                if self.had_eager:
                    # eager replays already wrote host pixels; bring
                    # them along (native dtype over the tunnel)
                    planes = [jnp.asarray(np.asarray(p)).astype(jnp.int32)
                              for p in self.pic.planes]
                else:
                    # fresh picture: zeros materialize on device free
                    planes = [jnp.zeros(p.shape, jnp.int32)
                              for p in self.pic.planes]
                _sync(planes)

            def ivec(vals, np2, n, fill=0):
                a = np.full(np2, fill, np.int32)
                a[:n] = np.fromiter(vals, np.int32, n)
                return a

            def job_taps(items, np2):
                """Per-job 8-tap rows; the small-block 4-tap variant is
                selected per job (mc_tmpl.c:116-133)."""
                n = len(items)
                amx = ivec((j[5] for _, _, j in items), np2, n)
                amy = ivec((j[6] for _, _, j in items), np2, n)
                ft = ivec((j[7] for _, _, j in items), np2, n)
                small_w = ivec((int(w <= 4) for _, w, _ in items), np2, n)
                small_h = ivec((int(h <= 4) for h, _, _ in items), np2, n)
                fh = fb[small_w, ft & 3, amx]
                fv = fb[small_h, (ft >> 2) & 3, amy]
                return fh, fv, amx, amy

            # ---- pass A: single-ref puts (one launch per plane/class) ---
            t_pass = timing.phase("inter.passA")
            t_pass.__enter__()
            for (pi, _cls), items in self._regroup(self.put8).items():
                H, W = self._pad_hw(items)
                np2 = self._padn(len(items))
                n = len(items)
                REF, slot_of = stacks[pi]
                rows, cols = self._gather_tables(pi, items, np2, H, W,
                                                 3, 3, 4)
                drows, dcols = self._dst_tables(items, np2, H, W)
                slot = ivec((slot_of[j[2]] for _, _, j in items), np2, n)
                fh, fv, _, _ = job_taps(items, np2)
                fn = mcdev._put8_scatter_fn(np2, H, W, bd)
                planes[pi] = fn(REF, rows, cols, slot, fh, fv,
                                planes[pi], drows, dcols)
            for (pi, _cls), items in self._regroup(self.bilin).items():
                H, W = self._pad_hw(items)
                np2 = self._padn(len(items))
                n = len(items)
                REF, slot_of = stacks[pi]
                rows, cols = self._gather_tables(pi, items, np2, H, W,
                                                 0, 3, 4)
                drows, dcols = self._dst_tables(items, np2, H, W)
                slot = ivec((slot_of[j[2]] for _, _, j in items), np2, n)
                amx = ivec((j[5] for _, _, j in items), np2, n)
                amy = ivec((j[6] for _, _, j in items), np2, n)
                fn = mcdev._bilin_scatter_fn(np2, H, W, bd)
                planes[pi] = fn(REF, rows, cols, slot, amx, amy,
                                planes[pi], drows, dcols)
            for (pi, _put), jobs in self.warp.items():
                rh, rw = self._ref_bounds(int(bool(pi)))
                REF, slot_of = stacks[pi]
                np2 = self._padn(len(jobs))
                n = len(jobs)
                py = ivec((j[0] for j in jobs), np2, n, OOB)
                px = ivec((j[1] for j in jobs), np2, n, OOB)
                slot = ivec((slot_of[j[2]] for j in jobs), np2, n)
                dy = ivec((j[3] for j in jobs), np2, n)
                dx = ivec((j[4] for j in jobs), np2, n)
                rows = np.clip(dy[:, None] +
                               np.arange(-3, 12, dtype=np.int32), 0,
                               rh - 1)
                cols = np.clip(dx[:, None] +
                               np.arange(-3, 12, dtype=np.int32), 0,
                               rw - 1)
                mx = ivec((j[5] for j in jobs), np2, n)
                my = ivec((j[6] for j in jobs), np2, n)
                al = ivec((j[7] for j in jobs), np2, n)
                be = ivec((j[8] for j in jobs), np2, n)
                ga = ivec((j[9] for j in jobs), np2, n)
                de = ivec((j[10] for j in jobs), np2, n)
                drows = np.where(py[:, None] >= OOB, OOB,
                                 py[:, None] +
                                 np.arange(8, dtype=np.int32))
                dcols = np.where(px[:, None] >= OOB, OOB,
                                 px[:, None] +
                                 np.arange(8, dtype=np.int32))
                fn = mcdev._warp_scatter_fn(np2, bd)
                planes[pi] = fn(REF, rows, cols, slot, mx, my, al, be,
                                ga, de, planes[pi], drows, dcols)

            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass B: compounds (luma first; the seg sub-masks of
            # ALL luma groups are fetched in one overlapped transfer
            # before the chroma groups run) ---------------------------
            t_pass = timing.phase("inter.passB_comp")
            t_pass.__enter__()
            comp_groups = self._regroup(self.comp)
            seg_results = {}
            seg_pending = []    # ([(i, job_id, hs, ws)], device batch)
            for (pi, _cls), items in comp_groups.items():
                if pi != 0:
                    continue
                planes[pi] = self._run_comp_group(
                    pi, items, stacks, planes[pi], seg_results, bd,
                    seg_pending)
            if seg_pending:
                for (ids, _), seg_np in zip(
                        seg_pending,
                        fetch_all([a for _, a in seg_pending])):
                    for i, job_id, hs, ws in ids:
                        seg_results[job_id] = seg_np[i, :hs, :ws]
            for (pi, _cls), items in comp_groups.items():
                if pi == 0:
                    continue
                planes[pi] = self._run_comp_group(
                    pi, items, stacks, planes[pi], seg_results, bd,
                    None)

            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass C: OBMC blends (top, then left) -------------------
            t_pass = timing.phase("inter.passC_obmc")
            t_pass.__enter__()
            for top in (True, False):
                for key, jobs in self.obmc_jobs.items():
                    if key[0] != top:
                        continue
                    _, pi, ww, hh, lap_h = key
                    rh, rw = self._ref_bounds(int(bool(pi)))
                    REF, slot_of = stacks[pi]
                    np2 = self._padn(len(jobs))
                    n = len(jobs)
                    py = ivec((j[0] for j in jobs), np2, n, OOB)
                    px = ivec((j[1] for j in jobs), np2, n, OOB)
                    slot = ivec((slot_of[j[2]] for j in jobs), np2, n)
                    dy = ivec((j[3] for j in jobs), np2, n)
                    dx = ivec((j[4] for j in jobs), np2, n)
                    rows = np.clip(dy[:, None] - 3 +
                                   np.arange(lap_h + 7, dtype=np.int32),
                                   0, rh - 1)
                    cols = np.clip(dx[:, None] - 3 +
                                   np.arange(ww + 7, dtype=np.int32),
                                   0, rw - 1)
                    amx = ivec((j[5] for j in jobs), np2, n)
                    amy = ivec((j[6] for j in jobs), np2, n)
                    ft = ivec((j[7] for j in jobs), np2, n)
                    fh = fb[int(ww <= 4), ft & 3, amx]
                    fv = fb[int(lap_h <= 4), (ft >> 2) & 3, amy]
                    if top:
                        hb, wbl = (hh * 3) >> 2, ww
                    else:
                        hb, wbl = hh, (ww * 3) >> 2
                    drows = np.where(py[:, None] >= OOB, OOB,
                                     py[:, None] +
                                     np.arange(hb, dtype=np.int32))
                    dcols = np.where(px[:, None] >= OOB, OOB,
                                     px[:, None] +
                                     np.arange(wbl, dtype=np.int32))
                    fn = mcdev._obmc_scatter_fn(np2, ww, hh, lap_h, bd,
                                                top)
                    planes[pi] = fn(REF, rows, cols, slot, fh, fv,
                                    planes[pi], drows, dcols)

            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass D: residuals (one launch per plane/class) ---------
            t_pass = timing.phase("inter.passD_residual")
            t_pass.__enter__()
            for (pi, _cls), items in self._regroup(self.res_jobs).items():
                H, W = self._pad_hw(items)
                np2 = self._padn(len(items))
                drows, dcols = self._dst_tables(items, np2, H, W)
                # padding lanes never land (OOB scatter ids), so the
                # batch buffer doesn't need zero-init
                res = np.empty((np2, H, W), np.int32)
                for i, (h, w, j) in enumerate(items):
                    res[i, :h, :w] = j[2]
                fn = mcdev._residual_scatter_fn(np2, H, W, bd)
                planes[pi] = fn(planes[pi], drows, dcols, res)

            _sync(planes)
            t_pass.__exit__(None, None, None)

            # Leftover blocks (intra/interintra/scaled) run the golden
            # host path next, so they need the host pixels: cast on
            # device (4x fewer tunnel bytes) and overlap the per-plane
            # transfers. Frames with no leftovers skip the round trip
            # entirely — the planes stay device-resident (Picture.dev)
            # and the filter chain consumes them in place.
            if self.leftovers or self.res_fixups:
                with timing.phase("inter.fetch"):
                    casts = [pl.astype(hp.dtype)
                             for hp, pl in zip(self.pic.planes, planes)]
                    for hp, a in zip(self.pic.planes, fetch_all(casts)):
                        hp[:] = a
            else:
                self.pic.dev = planes
                self.pic.host_stale = True

    def _run_comp_group(self, pi, items, stacks, plane, seg_results, bd,
                        seg_pending=None):
        """One padded compound launch for all of one plane/class's
        compound jobs; returns the updated plane."""
        f = self.f
        rh, rw = self._ref_bounds(int(bool(pi)))
        REF, slot_of = stacks[pi]
        fbk = mcdev.filter_banks()
        n = len(items)
        np2 = self._padn(n)
        H, W = self._pad_hw(items)
        OOB = self._OOB

        def colv(vals, fill=0):
            a = np.full(np2, fill, np.int32)
            a[:n] = np.fromiter(vals, np.int32, n)
            return a

        drows, dcols = self._dst_tables(items, np2, H, W)
        parts = []
        ar_h = np.arange(H + 7, dtype=np.int32)
        ar_w = np.arange(W + 7, dtype=np.int32)
        for si in range(2):
            srcs = [j[2][si] for _, _, j in items]
            rows = np.zeros((np2, H + 7), np.int32)
            cols = np.zeros((np2, W + 7), np.int32)
            dy = np.fromiter((s[2] for s in srcs), np.int32, n)
            dx = np.fromiter((s[3] for s in srcs), np.int32, n)
            rows[:n] = np.clip(dy[:, None] - 3 + ar_h[None, :], 0, rh - 1)
            cols[:n] = np.clip(dx[:, None] - 3 + ar_w[None, :], 0, rw - 1)
            amx = colv(s[4] for s in srcs)
            amy = colv(s[5] for s in srcs)
            ft = colv(s[6] for s in srcs)
            r = colv(slot_of[s[7]] for s in srcs)
            small_w = colv(int(w <= 4) for _, w, _ in items)
            small_h = colv(int(h <= 4) for h, _, _ in items)
            fh = fbk[small_w, ft & 3, amx]
            fv = fbk[small_h, (ft >> 2) & 3, amy]
            parts.extend([rows, cols, r, fh, fv])
        mode = colv(j[3] for _, _, j in items)
        jw = colv(j[4] for _, _, j in items)
        sign = colv(j[5] for _, _, j in items)
        msk = np.zeros((np2, H, W), np.int8)
        for i, (h, w, j) in enumerate(items):
            m = j[6]
            if isinstance(m, tuple) and m and m[0] == "seg":
                m = seg_results[m[1]]
            if m is not None and mode[i] not in (COMP_INTER_AVG,
                                                 COMP_INTER_WEIGHTED_AVG):
                msk[i, :h, :w] = m
        ss_hor = f.ss_hor if pi == 0 else 0
        ss_ver = f.ss_ver if pi == 0 else 0
        fn = mcdev._compound_scatter_fn(np2, H, W, bd, ss_hor, ss_ver)
        plane, seg_sub = fn(REF, *parts, mode, jw, sign, msk, plane,
                            drows, dcols)
        if pi == 0 and any(j[3] == COMP_INTER_SEG for _, _, j in items):
            ids = [(i, j[7], h >> ss_ver, w >> ss_hor)
                   for i, (h, w, j) in enumerate(items)
                   if j[3] == COMP_INTER_SEG]
            if seg_pending is not None:
                # defer the device->host fetch; the caller overlaps all
                # luma groups' transfers in one fetch_all
                seg_pending.append((ids, seg_sub))
            else:
                seg_np = np.asarray(seg_sub)
                for i, job_id, hs, ws in ids:
                    seg_results[job_id] = seg_np[i, :hs, :ws]
        return plane


def reconstruct_inter_frame_device(plan, refp):
    r = DeviceInterReconstructor(plan, refp)
    with timing.phase("inter.itx_residuals"):
        itx_ref.precompute_residuals_plan(plan, r.bitdepth)
    return r.run()
