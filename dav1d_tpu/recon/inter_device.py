"""Inter-frame reconstruction — device batch driver.

Walks the frame plan with the exact golden routing (it subclasses
InterReconstructor, so every mode decision — OBMC laps, sub-8x8 chroma,
compound types, warp eligibility — is the validated reference logic,
reference recon_tmpl.c:938-1985) but the executor leaves *collect* jobs
instead of computing pixels. Jobs are compact int32 descriptors (a
dozen scalars each — see ops/mc_jobs.py for the layouts); every
gather/scatter index tensor is built inside the jitted kernels, so the
per-frame host->device traffic is just the job tables plus the Stage-A
coefficient pool:

  pass A  single-ref puts: 8-tap / bilinear / warp 8x8 tiles
  pass B  compound blocks (two preps + combine, luma before chroma;
          luma w_mask outputs land in a device-resident seg plane that
          the chroma combines gather from — no host round trip)
  pass C  OBMC laps (top blends, then left blends — the golden
          within-block order; regions of distinct blocks are disjoint)
  pass D  residuals: fused inverse-transform + add + scatter straight
          from the uploaded Stage-A coefficient pool (residual pixels
          never exist on the host)
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
from ..ops import mc_jobs
from ..utils import timing
from .inter_ref import (InterReconstructor, COMP_INTER_NONE,
                        COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG,
                        COMP_INTER_SEG, COMP_INTER_WEDGE)

OOB = mc_jobs.OOB


class _RetryEager(Exception):
    """Raised when a block needs the host path (scaled refs, warp-in-
    compound, bilinear compound/OBMC); the walk rolls the block's jobs
    back and replays it through the golden eager leaves."""


def _size_class_vec(h, w):
    m = np.maximum(h, w)
    return np.where(m <= 16, 16,
                    np.where(m <= 32, 32, np.where(m > 64, 128, 64)))


def _pad_pow2(arr, fill_cols=()):
    """Pad a (n, K) job table to the next pow2 batch; padding rows get
    py=px=OOB (h=w=0 already from zeros) so their lanes drop."""
    n = len(arr)
    np2 = 1 << max(4, (n - 1).bit_length())
    if np2 == n:
        return arr
    out = np.zeros((np2, arr.shape[1]), np.int32)
    out[:n] = arr
    for c in fill_cols:
        out[n:, c] = OOB
    return out


# Fixed batch buckets: a group pads to the smallest fitting bucket, or
# splits into largest-bucket chunks (tail re-bucketed). Unlike pow2
# padding, the set of instantiated batch sizes is CLOSED — so the set
# of compiled programs is bounded and stream-independent, which keeps
# the first-run compile wall down and makes a warm persistent
# compilation cache serve any content (padding lanes drop in-scatter
# exactly as pow2 padding does).
MC_BUCKETS = (32, 256, 1024)
RES_BUCKETS = (16, 64, 256)


def _chunk_bounds(n, buckets=MC_BUCKETS):
    """Yield (start, end, bucket_size) spans covering n rows."""
    big = buckets[-1]
    pos = 0
    while pos < n:
        take = min(big, n - pos)
        b = next(bk for bk in buckets if bk >= take)
        yield pos, pos + take, b
        pos += take


def _chunks(arr, fill_cols=(), buckets=MC_BUCKETS):
    """Yield fixed-bucket-size padded copies covering a job table."""
    for s, e, b in _chunk_bounds(len(arr), buckets):
        sub = arr[s:e]
        if b != e - s:
            out = np.zeros((b, arr.shape[1]), np.int32)
            out[:e - s] = sub
            for c in fill_cols:
                out[e - s:, c] = OOB
            sub = out
        yield sub


class DeviceInterReconstructor(InterReconstructor):
    # collected job layouts (must match ops/mc_jobs.py and
    # native/interjobs.cpp):
    #  puts  (n, 11): plane, h, w, py, px, ref, dy, dx, amx, amy, ft
    #  warps (n, 12): plane, py, px, ref, dy, dx, mx, my, al, be, ga, de
    #  obmc  (n, 13): top, plane, ww, hh, lap_h, py, px, ref, dy, dx,
    #                 amx, amy, ft
    #  comp  (n, 25): plane, h, w, py, px, mode, jw, sign, mkind,
    #                 mk0..mk3, dy0, dx0, amx0, amy0, ft0, ref0,
    #                 dy1, dx1, amx1, amy1, ft1, ref1
    #  res   (n, 7):  plane, tx, txtp, py, px, cf_local_off, tile_idx
    def __init__(self, plan, refp):
        super().__init__(plan, refp)
        self.collecting = False
        self.puts = []
        self.warps = []
        self.obmc_jobs = []
        self.comp = []
        self.res_jobs = []
        self._lists = (self.puts, self.warps, self.obmc_jobs, self.comp,
                       self.res_jobs)
        self.res_fixups = []  # coef blocks without a native pool record
        self.leftovers = []
        self.had_eager = False   # a _RetryEager replay wrote host pixels
        self._fused_res = bool(plan.native_tiles)
        self._lo_region = None   # (r0, r1) luma rows the host replay
        self._region_spans = None  # needs; None = whole-plane fetch
        self._dev_lo = None      # device leftover plan (ipred_device)
        self._cf_pool_dev = None  # pass-D coefficient pool, reused by
        self._cf_bases = None     # the device leftover residuals

    # -- rollback ---------------------------------------------------------
    def _snapshot(self):
        return tuple(len(l) for l in self._lists)

    def _rollback(self, snap):
        for l, n in zip(self._lists, snap):
            del l[n:]

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
        self.puts.append((plane_idx, h, w, py, px, r, dy, dx, amx, amy,
                          ft))

    def _put_warp(self, plane_idx, py, px, b_dim, pl, refidx, wmp):
        if not self.collecting:
            return super()._put_warp(plane_idx, py, px, b_dim, pl,
                                     refidx, wmp)
        self._enqueue_warp(plane_idx, py, px, b_dim, pl, refidx, wmp)

    def _enqueue_warp(self, plane_idx, py, px, b_dim, pl, refidx, wmp):
        """Expand a warped block into per-8x8 jobs (the golden
        _warp_affine tiling, recon_tmpl.c:1115-1168)."""
        f = self.f
        ss_ver = int(bool(pl)) and f.ss_ver
        ss_hor = int(bool(pl)) and f.ss_hor
        h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
        mat = wmp.matrix
        bw_px = int(b_dim[0]) * h_mul
        bh_px = int(b_dim[1]) * v_mul
        warps = self.warps
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
                warps.append((plane_idx, py + y, px + x, refidx, dy, dx,
                              mx, my, wmp.alpha, wmp.beta, wmp.gamma,
                              wmp.delta))

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
        self.obmc_jobs.append((1, plane_idx, w, hh, h, py, px + x_off,
                               r, dy, dx, amx, amy, ft))

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
        self.obmc_jobs.append((0, plane_idx, w, h, h, py + y_off, px,
                               r, dy, dx, amx, amy, ft))

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
        mkind, mk = 0, (0, 0, 0, 0)
        if comp_type not in (COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG,
                             COMP_INTER_SEG):
            if isinstance(msk, tuple) and msk and msk[0] == "seg":
                mkind = 2
            else:
                mkind, mk = 1, msk      # (clidx, bs, sign, wedge_idx)
        s0, s1 = srcs
        self.comp.append((plane_idx, h, w, py, px, comp_type, jw, sign,
                          mkind, mk[0], mk[1], mk[2], mk[3],
                          s0[2], s0[3], s0[4], s0[5], s0[6], s0[7],
                          s1[2], s1[3], s1[4], s1[5], s1[6], s1[7]))
        if comp_type == COMP_INTER_SEG and plane_idx == 0:
            return ("seg",)
        return None

    def _add_residuals(self, b):
        if not self.collecting:
            if getattr(b, "_cbs", None) is not None:
                return self._add_residuals_cbs(b)
            return super()._add_residuals(b)
        res_jobs = self.res_jobs
        for cb in self.plan.coefs[b.coef_start:b.coef_end]:
            if cb.eob < 0:
                continue
            t = cb._tile
            if self._fused_res and t is not None:
                res_jobs.append((cb.plane, cb.tx, cb.txtp, cb.y4 * 4,
                                 cb.x4 * 4,
                                 int(t["coefs"][cb._idx, 6]),
                                 t["tile_idx"]))
            else:
                self.res_fixups.append(cb)

    # -- residuals for lazily-materialized leftover blocks ---------------
    def _add_residuals_cbs(self, b):
        bd = self.bitdepth
        for cb in b._cbs:
            if cb.eob < 0:
                continue
            t_dim = lv.TXFM_INFO[cb.tx]
            plane = self.pic.planes[cb.plane]
            ppx, ppy = cb.x4 * 4, cb.y4 * 4
            itx_ref.add_residual(
                plane[ppy:ppy + t_dim.h * 4, ppx:ppx + t_dim.w * 4],
                cb, bd)

    def _leftover_region(self, lo):
        """Luma row span the host leftover replay touches: block rects
        plus the intra edge reach (1 row above; the left edge extends
        up to 2*h below the block top, ipred_prepare_tmpl.c:75-203).
        Fetching/uploading just these rows instead of whole planes cuts
        the mid-frame tunnel round trip to the intra-cluster size."""
        from ..entropy import native_tile as nt
        from ..entropy import levels as lv
        tiles_rec = self.plan.native_tiles
        ymin, ymax = 1 << 30, 0
        for tidx in np.unique(lo[:, 2]):
            tr = tiles_rec[tidx]
            li = lo[lo[:, 2] == tidx, 0] - tr["block_base"]
            blocks = tr["blocks"]
            by = blocks[li, nt.BF_BY].astype(np.int64)
            bs = blocks[li, nt.BF_BS]
            bh4 = np.asarray(lv.block_dimensions)[bs, 1].astype(np.int64)
            ymin = min(ymin, int((by * 4).min()))
            ymax = max(ymax, int((by * 4 + bh4 * 12).max()))
        Hp = self.pic.planes[0].shape[0]
        r0 = max(0, ymin - 8) & ~7
        r1 = min(Hp, (ymax + 15) & ~7)
        return r0, r1

    # -- native-emitter walk (native/interjobs.cpp) -----------------------
    def run_native(self, jobs):
        """Execute pre-collected job tables from the native emitter;
        replays only the leftover blocks through the golden path."""
        self.puts = jobs["puts"]
        self.warps = jobs["warps"]
        self.obmc_jobs = jobs["obmc"]
        self.comp = jobs["comp"]
        self.res_jobs = jobs["res"]
        lo = jobs["leftovers"]
        self.leftovers = lo.tolist()
        self.had_eager = False
        if len(lo):
            # device leftover path: all-intra leftovers run as
            # dependency-levelized device batches after the inter
            # passes — no mid-frame D2H round trip (VERDICT r2 item 5)
            from . import ipred_device
            with timing.phase("inter.lo_build"):
                self._dev_lo = ipred_device.build(self, self.leftovers)
            if self._dev_lo is None:
                self._lo_region = self._leftover_region(np.asarray(lo))
        self._execute()

        if not len(lo):
            return self.pic
        if self._dev_lo is not None:
            from . import ipred_device
            with timing.phase("inter.lo_device"):
                ipred_device.execute(self, self._dev_lo)
            return self.pic
        from ..entropy import native_tile as nt
        from . import intra_native
        tiles_rec = self.plan.native_tiles
        with timing.phase("inter.leftovers"):
            run_idxs = []

            def bounds(tr):
                return (tr["col_start"], tr["col_end"],
                        tr["row_start"], tr["row_end"])

            def replay(gi, tr):
                b = nt.materialize_block(self.plan, tr,
                                         gi - tr["block_base"])
                for cb in b._cbs:
                    self.coef_by_pos.setdefault(
                        (cb.plane, cb.x4, cb.y4), cb)
                if b.intra:
                    self._recon_block(b, *bounds(tr))
                else:
                    self._recon_b_inter(b, *bounds(tr))
                    # tl filter state the next sub-8x8 replay would
                    # see was already captured by the emitter

            def flush():
                if not run_idxs:
                    return
                idxs = [g for g, _ in run_idxs]
                if not intra_native.recon_blocks_native(
                        self.plan, self.pic, idxs):
                    for g, tr in run_idxs:
                        replay(g, tr)
                run_idxs.clear()

            for gi, tlf, tidx in self.leftovers:
                tr = tiles_rec[tidx]
                li = gi - tr["block_base"]
                if tr["blocks"][li, nt.BF_INTRA] and \
                        not tr["blocks"][li, nt.BF_INTERINTRA_TYPE]:
                    run_idxs.append((gi, tr))
                else:
                    flush()
                    self.tl_4x4_filter = tlf
                    replay(gi, tr)
            flush()
        if self._region_spans is not None and self.pic.dev is not None:
            # upload the replayed rows back into the device-resident
            # planes (native dtype over the tunnel, widen on device)
            jax = jax_mod()
            jnp = jax.numpy
            with device_scope(), timing.phase("inter.region_upload"):
                devs = list(self.pic.dev)
                for i, (hp, (a, b)) in enumerate(
                        zip(self.pic.planes, self._region_spans)):
                    up = jnp.asarray(np.asarray(hp[a:b]))
                    devs[i] = devs[i].at[a:b].set(up.astype(jnp.int32))
                self.pic.dev = devs
                self.pic.dev_c = None
                self.pic.host_stale = True
        return self.pic

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

    # -- wedge mask routing (the golden _compound passes mask arrays;
    #    the collector wants the table key instead) -----------------------
    def _compound(self, b, b_dim, bw4, bh4, cbw4, cbh4, has_chroma,
                  chr_layout_idx):
        if not self.collecting:
            return super()._compound(b, b_dim, bw4, bh4, cbw4, cbh4,
                                     has_chroma, chr_layout_idx)
        f = self.f
        fh = f.frame_hdr
        ss_ver, ss_hor = f.ss_ver, f.ss_hor
        filter2d = b.filter2d
        px, py = b.bx * 4, b.by * 4

        descs = []
        for i in range(2):
            if (b.inter_mode == lv.GLOBALMV_GLOBALMV and
                    f.gmv_warp_allowed[b.ref[i]]):
                descs.append(("warp", (b_dim, 0, b.ref[i],
                                       fh.gmv[b.ref[i]])))
            else:
                descs.append(("mc", (bw4, bh4, b.bx, b.by, 0,
                                     b.mv[i], b.ref[i], filter2d)))
        jw = int(self.jnt_weights[b.ref[0]][b.ref[1]])
        msk = None
        if b.comp_type == COMP_INTER_WEDGE:
            msk = (0, b.bs, 0, b.wedge_idx)
        seg_mask = self._exec_compound(0, py, px, descs, b.comp_type,
                                       jw, b.mask_sign, msk, ss_hor,
                                       ss_ver)
        if b.comp_type == COMP_INTER_SEG:
            msk = seg_mask
        elif b.comp_type == COMP_INTER_WEDGE and has_chroma:
            msk = (chr_layout_idx, b.bs, b.mask_sign, b.wedge_idx)

        if has_chroma:
            uv_px = (b.bx >> ss_hor) * 4
            uv_py = (b.by >> ss_ver) * 4
            uv_comp = b.comp_type if b.comp_type in (
                COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG) \
                else COMP_INTER_WEDGE
            for pl in range(2):
                cdescs = []
                for i in range(2):
                    if (b.inter_mode == lv.GLOBALMV_GLOBALMV and
                            min(cbw4, cbh4) > 1 and
                            f.gmv_warp_allowed[b.ref[i]]):
                        cdescs.append(("warp", (b_dim, 1 + pl, b.ref[i],
                                                fh.gmv[b.ref[i]])))
                    else:
                        cdescs.append(("mc", (bw4, bh4, b.bx, b.by,
                                              1 + pl, b.mv[i], b.ref[i],
                                              filter2d)))
                self._exec_compound(1 + pl, uv_py, uv_px, cdescs,
                                    uv_comp, jw, b.mask_sign, msk,
                                    ss_hor, ss_ver)

    # -- device execution --------------------------------------------------
    def _ref_bounds(self, pl_type):
        f = self.f
        ss_hor = f.ss_hor if pl_type else 0
        ss_ver = f.ss_ver if pl_type else 0
        return ((f.frame_hdr.height + ss_ver) >> ss_ver,
                (f.frame_hdr.width[0] + ss_hor) >> ss_hor)

    def _build_refstacks(self, jnp):
        """One (R, H, W) int32 device stack per plane index plus a
        (7,) refidx->slot lut. Reference planes that are still
        device-resident from their own decode (Picture.dev) stack with
        zero host->device traffic; refs without a cache upload once in
        their native dtype and widen on device."""
        stacks = {}
        for plane_idx in range(len(self.pic.planes)):
            arrs = []
            ids = {}
            lut = np.zeros(7, np.int32)
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
                lut[i] = ids[key]
            if not arrs:
                arrs = [jnp.zeros((8, 8), jnp.int32)]
            # pad the stack depth to a closed ladder {1,2,4,8}: the
            # stack is a program operand, so a frame-varying depth
            # would recompile every MC program each time the set of
            # distinct reference pictures changes (padding slots just
            # repeat ref 0; nothing indexes them)
            while len(arrs) not in (1, 2, 4, 8):
                arrs.append(arrs[0])
            stacks[plane_idx] = (jnp.stack(arrs), lut)
        return stacks

    def _build_cf_pool(self):
        """Concatenate the per-tile Stage-A coefficient pools (used
        span only) into one frame pool; returns (pool, bases)."""
        tiles = self.plan.native_tiles
        bases = np.zeros(max(len(tiles), 1), np.int64)
        parts = []
        pos = 0
        for t in tiles:
            used = int(t.get("cf_used", len(t["cf_pool"])))
            bases[t["tile_idx"]] = pos
            parts.append(t["cf_pool"][:used])
            pos += used
        if not parts:
            return np.zeros(1, np.int32), bases
        parts.append(np.zeros(64 * 64, np.int32))   # gather overrun pad
        pool = np.concatenate(parts)
        # pad the pool length to a pow2 ladder: the pool is an operand
        # of every residual program, so a frame-varying length would
        # recompile all of pass D each frame (observed: +358s compile
        # wall on host XLA at frame 4 of the 1080p bench stream)
        n = 1 << max(14, int(len(pool) - 1).bit_length())
        if n != len(pool):
            pool = np.concatenate([pool, np.zeros(n - len(pool),
                                                  np.int32)])
        return pool, bases

    def _execute(self):
        if not (len(self.puts) or len(self.warps) or len(self.obmc_jobs)
                or len(self.comp) or len(self.res_jobs)):
            return
        if type(self) is DeviceInterReconstructor and \
                not self.had_eager:
            from ..ops import mc_fused
            if mc_fused.enabled():
                jobs = {
                    "puts": np.asarray(self.puts,
                                       np.int32).reshape(-1, 11),
                    "warps": np.asarray(self.warps,
                                        np.int32).reshape(-1, 12),
                    "obmc": np.asarray(self.obmc_jobs,
                                       np.int32).reshape(-1, 13),
                    "comp": np.asarray(self.comp,
                                       np.int32).reshape(-1, 25),
                    "res": np.asarray(self.res_jobs,
                                      np.int32).reshape(-1, 7),
                }
                if mc_fused.execute(self, jobs):
                    return
        jax = jax_mod()
        jnp = jax.numpy
        bd = self.bitdepth
        import os as _os
        _sync = (lambda x: jax.block_until_ready(x)) if timing.ENABLED \
            and _os.environ.get("DAV1D_TPU_TIMING_SYNC") else \
            (lambda x: x)
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

            def groups(arr, keycols):
                """Yield (keyrow, subarray) per unique key combo."""
                if not len(arr):
                    return
                keys = arr[:, keycols]
                order = np.lexsort(keys.T[::-1])
                sk = keys[order]
                bounds = np.nonzero(np.any(sk[1:] != sk[:-1], axis=1))[0]
                starts = np.concatenate(([0], bounds + 1))
                ends = np.concatenate((bounds + 1, [len(arr)]))
                for s, e in zip(starts, ends):
                    yield sk[s], arr[order[s:e]]

            # ---- pass A: single-ref puts ---------------------------------
            t_pass = timing.phase("inter.passA")
            t_pass.__enter__()
            puts = np.asarray(self.puts, np.int32).reshape(-1, 11)
            if len(puts):
                cls = _size_class_vec(puts[:, 1], puts[:, 2])
                bil = (puts[:, 10] < 0).astype(np.int32)
                key = np.stack([puts[:, 0], cls, bil], 1)
                aug = np.concatenate([puts, key[:, 1:]], 1)
                for krow, sub in groups(aug, [0, 11, 12]):
                    pi, c, isb = int(krow[0]), int(krow[1]), int(krow[2])
                    REF, lut = stacks[pi]
                    alljobs = sub[:, :11].copy()
                    alljobs[:, 5] = lut[alljobs[:, 5]]
                    rh, rw = self._ref_bounds(int(bool(pi)))
                    fn = mc_jobs.bilin_jobs_fn if isb else \
                        mc_jobs.put8_jobs_fn
                    for jobs in _chunks(alljobs, fill_cols=(3, 4)):
                        planes[pi] = fn(len(jobs), c, c, bd, rh, rw)(
                            REF, jobs, planes[pi])
            warps = np.asarray(self.warps, np.int32).reshape(-1, 12)
            for krow, sub in groups(warps, [0]):
                pi = int(krow[0])
                REF, lut = stacks[pi]
                alljobs = sub.copy()
                alljobs[:, 3] = lut[alljobs[:, 3]]
                rh, rw = self._ref_bounds(int(bool(pi)))
                for jobs in _chunks(alljobs, fill_cols=(1, 2)):
                    planes[pi] = mc_jobs.warp_jobs_fn(
                        len(jobs), bd, rh, rw)(REF, jobs, planes[pi])
            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass B: compounds (luma groups first so the seg
            # plane is populated before the chroma combines) -----------
            t_pass = timing.phase("inter.passB_comp")
            t_pass.__enter__()
            comp = np.asarray(self.comp, np.int32).reshape(-1, 25)
            segplane = None
            if len(comp):
                sp_h, sp_w = self.pic.planes[-1].shape
                segplane = jnp.zeros((sp_h, sp_w), jnp.int32)
                cls = _size_class_vec(comp[:, 1], comp[:, 2])
                aug = np.concatenate([comp, cls[:, None]], 1)
                f = self.f
                for luma in (True, False):
                    for krow, sub in groups(aug, [0, 25]):
                        pi, c = int(krow[0]), int(krow[1])
                        if (pi == 0) != luma:
                            continue
                        REF, lut = stacks[pi]
                        alljobs = np.concatenate(
                            [sub[:, :9], sub[:, 13:25]], 1)
                        alljobs[:, 14] = lut[alljobs[:, 14]]
                        alljobs[:, 20] = lut[alljobs[:, 20]]
                        rh, rw = self._ref_bounds(int(bool(pi)))
                        ssh = f.ss_hor if pi == 0 else 0
                        ssv = f.ss_ver if pi == 0 else 0
                        for s, e, n in _chunk_bounds(len(alljobs)):
                            jobs = alljobs[s:e]
                            if n != e - s:
                                out = np.zeros((n, jobs.shape[1]),
                                               np.int32)
                                out[:e - s] = jobs
                                out[e - s:, 3] = OOB
                                out[e - s:, 4] = OOB
                                jobs = out
                            wrows = np.nonzero(sub[s:e, 8] == 1)[0]
                            use_msk = bool(len(wrows))
                            if use_msk:
                                msk = np.zeros((n, c, c), np.int8)
                                for i in wrows:
                                    r = sub[s + i]
                                    h, w = int(r[1]), int(r[2])
                                    msk[i, :h, :w] = mc_ref.wedge_mask(
                                        int(r[9]), int(r[10]),
                                        int(r[11]), int(r[12]), w, h)
                            else:
                                msk = np.zeros(1, np.int8)
                            fn = mc_jobs.comp_jobs_fn(
                                n, c, c, bd, ssh, ssv, rh, rw, luma,
                                use_msk)
                            planes[pi], segplane = fn(REF, jobs, msk,
                                                      segplane,
                                                      planes[pi])
            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass C: OBMC blends (top, then left) -------------------
            t_pass = timing.phase("inter.passC_obmc")
            t_pass.__enter__()
            obmc = np.asarray(self.obmc_jobs, np.int32).reshape(-1, 13)
            for top in (1, 0):
                for krow, sub in groups(obmc, [0, 1, 2, 3, 4]):
                    if int(krow[0]) != top:
                        continue
                    pi, ww, hh, lap_h = (int(krow[1]), int(krow[2]),
                                         int(krow[3]), int(krow[4]))
                    REF, lut = stacks[pi]
                    alljobs = sub.copy()
                    alljobs[:, 7] = lut[alljobs[:, 7]]
                    rh, rw = self._ref_bounds(int(bool(pi)))
                    for jobs in _chunks(alljobs, fill_cols=(5, 6)):
                        planes[pi] = mc_jobs.obmc_jobs_fn(
                            len(jobs), ww, hh, lap_h, bd, bool(top), rh,
                            rw)(REF, jobs, planes[pi])
            _sync(planes)
            t_pass.__exit__(None, None, None)

            # ---- pass D: residuals straight from the Stage-A pool -------
            t_pass = timing.phase("inter.passD_residual")
            t_pass.__enter__()
            res = np.asarray(self.res_jobs, np.int32).reshape(-1, 7)
            if len(res):
                pool_np, bases = self._build_cf_pool()
                with timing.phase("inter.upload_cf"):
                    pool = jnp.asarray(pool_np)
                    _sync(pool)
                self._cf_pool_dev, self._cf_bases = pool, bases
                cfoff = (bases[res[:, 6]] + res[:, 5]).astype(np.int32)
                jobs6 = np.concatenate([res[:, :5], cfoff[:, None]], 1)
                from ..ops.itx_ref import TX1D_TYPES
                for krow, sub in groups(jobs6, [0, 1, 2]):
                    pi, tx, txtp = int(krow[0]), int(krow[1]), int(krow[2])
                    if txtp == lv.WHT_WHT:
                        jobs = _pad_pow2(sub, fill_cols=(3, 4))
                        planes[pi] = mc_jobs.res_jobs_fn(
                            len(jobs), tx, txtp, bd)(pool, jobs,
                                                     planes[pi])
                        continue
                    ft, st = TX1D_TYPES[txtp]
                    rk, ck = mc_jobs.res_tx_kinds(tx)
                    kidx = np.array([rk.index(ft), ck.index(st)],
                                    np.int32)
                    for jobs in _chunks(sub, fill_cols=(3, 4),
                                        buckets=RES_BUCKETS):
                        planes[pi] = mc_jobs.res_tx_fn(
                            len(jobs), tx, bd)(pool, jobs, kidx,
                                               planes[pi])
            _sync(planes)
            t_pass.__exit__(None, None, None)

            self._finish_device_planes(planes)

    def _finish_device_planes(self, planes):
        """Post-MC wrap-up shared by the fused and per-group paths.
        Leftover blocks (intra/interintra/scaled) run the golden host
        path next, so they need the host pixels: cast on device (4x
        fewer tunnel bytes) and overlap the per-plane transfers. With
        the native emitter the replay's row span is known, so only
        those rows round-trip (the planes stay device-resident and the
        replayed rows upload back in run_native). Frames with no
        leftovers (or a device leftover plan) skip the transfer."""
        with timing.phase("inter.finish"):
            if (self.leftovers and self._dev_lo is None) or \
                    self.res_fixups:
                from ..ops.backend import fetch_all
                region = self._lo_region if not self.res_fixups else None
                if region is not None:
                    r0, r1 = region
                    with timing.phase("inter.fetch_region"):
                        spans, casts = [], []
                        for i, (hp, pl) in enumerate(
                                zip(self.pic.planes, planes)):
                            ssv = self.pic.ss_ver if i else 0
                            a, b = r0 >> ssv, min(hp.shape[0], r1 >> ssv)
                            spans.append((a, b))
                            casts.append(pl[a:b].astype(hp.dtype))
                        for hp, (a, b), arr in zip(self.pic.planes,
                                                   spans,
                                                   fetch_all(casts)):
                            hp[a:b] = arr
                    self._region_spans = spans
                    self.pic.dev = planes
                else:
                    self._lo_region = None
                    with timing.phase("inter.fetch"):
                        casts = [pl.astype(hp.dtype)
                                 for hp, pl in zip(self.pic.planes,
                                                   planes)]
                        for hp, a in zip(self.pic.planes,
                                         fetch_all(casts)):
                            hp[:] = a
            else:
                self.pic.dev = planes
                self.pic.host_stale = True


def reconstruct_inter_frame_device(plan, refp):
    r = DeviceInterReconstructor(plan, refp)
    jobs = None
    if r._fused_res:
        from . import inter_jobs_native
        with timing.phase("inter.emit_jobs"):
            jobs = inter_jobs_native.emit(plan, plan.f, r.jnt_weights)
    if jobs is not None:
        return r.run_native(jobs)
    # golden Python collector walk (also the DAV1D_TPU_INTERJOBS=python
    # oracle path); needs the Python Block objects
    if getattr(plan, "lazy_blocks", False):
        from ..entropy.native_tile import materialize_pending
        with timing.phase("inter.materialize"):
            materialize_pending(plan)
    if not r._fused_res:
        with timing.phase("inter.itx_residuals"):
            itx_ref.precompute_residuals_plan(plan, r.bitdepth)
    return r.run()
