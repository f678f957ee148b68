"""Whole-pipeline multi-chip Stage B (SURVEY §2.7.7/§2.8).

Column-shards every Stage-B pixel pass of a frame over the 'tile' axis
of a jax device mesh:

- MC passes A-D (single-ref puts, warps, compounds, OBMC laps, fused
  itx residuals) run per shard on a left-apron extended local plane:
  jobs partition to every shard whose owned columns their destination
  rect intersects, destination x coordinates translate to local space,
  and writes that land outside the owned band drop at the local array
  boundary (the kernels in ops/mc_jobs.py scatter with mode="drop";
  OBMC/residual reads are elementwise in destination coordinates, so
  apron garbage only ever produces apron outputs, which are discarded).
  Reference planes are replicated over the mesh — the AV1 motion-vector
  range makes MC reads effectively global, so replication + owned-band
  writes is the classic image-decomposition recipe. No collective runs
  inside the MC passes at all.
- The in-loop filters exchange real 32-pixel halos over ICI
  (lax.ppermute) because they couple neighbouring shards: deblock
  (<=16px reads across a vertical edge, reference
  loopfilter_tmpl.c:37-162), CDEF (2px taps + 8x8 direction blocks,
  cdef_tmpl.c:37-305), and loop restoration (3px Wiener support / SGR
  box sums, looprestoration_tmpl.c:44-1270; the stripe gather tables
  translate into shard-local coordinates). Each stage computes its
  boundary region redundantly inside the halo and keeps only its owned
  columns, bit-exactly.
- Between passes the planes stay device-resident as column-sharded
  global arrays (NamedSharding over the tile axis); the finished frame
  all-gathers once into the replicated reference cache (Picture.dev)
  that the next frame's MC consumes.

The single-device path (recon/inter_device.py + recon/filters.py) is
the validated oracle: tests/test_multichip.py asserts md5 equality
across device counts {1, 2, 4, 8}.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ops import mc_jobs, mc_ref
from ..ops.backend import jax_mod
from ..utils import timing
from .inter_device import DeviceInterReconstructor, _size_class_vec

OOB = mc_jobs.OOB
HALO = 32          # filter halo (px, luma and chroma both)
APRON_L = 128      # MC left apron = max luma block width


def _flat_tile_mesh(mesh):
    """1-D ('tile',) mesh over all of `mesh`'s devices."""
    from jax.sharding import Mesh
    if mesh.axis_names == ("tile",):
        return mesh
    devs = mesh.devices.reshape(-1)
    return Mesh(devs, ("tile",))


def _shard_widths(plan, T, out=False):
    """Owned column-band widths per plane kind, covering the FULL
    128-aligned padded plane (prediction overshoot and edge filters
    live in the padding, exactly like the single-device kernels). Luma
    bands are 64-aligned so chroma stays 32-aligned (halo- and
    8x8-block-aligned)."""
    f = plan.f
    aw = (f.frame_hdr.width[1 if out else 0] + 127) & ~127
    sw = max(64, ((-(-aw // T) + 63) // 64) * 64)
    return sw, sw >> f.ss_hor


def _out_plane_width(plan, plane):
    """Padded host plane width (the golden LR column-clamp bound)."""
    f = plan.f
    ss_hor = 1 if (plane and f.layout != 3) else 0
    aw = (f.frame_hdr.width[1] + 127) & ~127
    return (aw + ss_hor) >> ss_hor


@lru_cache(maxsize=None)
def _sharding(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(*spec))


def _to_sharded(mesh, arr, Wg):
    """Host (Hp, W) -> column-sharded (Hp, Wg) device array."""
    jax = jax_mod()
    a = np.zeros((arr.shape[0], Wg), np.int32)
    a[:, :min(arr.shape[1], Wg)] = arr[:, :Wg]
    return jax.device_put(a, _sharding(mesh, None, "tile"))


def _replicate(mesh, arrs):
    jax = jax_mod()
    return [jax.device_put(a, _sharding(mesh)) for a in arrs]


# ---------------------------------------------------------------------------
# job partitioning
# ---------------------------------------------------------------------------

def _partition(tbl, px_col, py_col, widths, T, sw, apron):
    """Distribute an (n, K) job table to shards: each job lands on every
    shard whose owned band [s*sw, (s+1)*sw) its dst rect [px, px+w)
    intersects, with px translated to px - s*sw + apron (>= 1 for every
    assigned job since apron covers the widest block). Returns
    ((T, m, K) int32, (T, m) source-row map or -1); padding rows carry
    py=px=OOB so their scatter lanes drop in the kernels."""
    K = tbl.shape[1]
    n = len(tbl)
    if n == 0:
        out = np.zeros((T, 1, K), np.int32)
        out[:, :, px_col] = OOB
        out[:, :, py_col] = OOB
        return out, np.full((T, 1), -1, np.int64)
    px = tbl[:, px_col].astype(np.int64)
    w = np.broadcast_to(np.asarray(widths, np.int64), (n,))
    lo = np.clip(px // sw, 0, T - 1)
    hi = np.clip((px + w - 1) // sw, 0, T - 1)
    reps = hi - lo + 1
    rows = np.repeat(np.arange(n), reps)
    cum = np.cumsum(reps)
    offs = np.arange(cum[-1]) - np.repeat(cum - reps, reps)
    shards = lo[rows] + offs
    order = np.argsort(shards, kind="stable")
    rows_s = rows[order]
    shards_s = shards[order]
    counts = np.bincount(shards_s, minlength=T)
    m = 1 << max(2, int(counts.max() - 1).bit_length())
    out = np.zeros((T, m, K), np.int32)
    out[:, :, px_col] = OOB
    out[:, :, py_col] = OOB
    src = np.full((T, m), -1, np.int64)
    pos = np.arange(len(rows_s)) - np.repeat(np.cumsum(counts) - counts,
                                             counts)
    out[shards_s, pos] = tbl[rows_s]
    out[shards_s, pos, px_col] = (tbl[rows_s, px_col]
                                  - shards_s * sw + apron).astype(np.int32)
    src[shards_s, pos] = rows_s
    return out, src


# ---------------------------------------------------------------------------
# MC passes A-D: one shard_map program per plane
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _mc_plane_program(mesh, sig, Hp, sw, apron, bd, rh, rw, ss_hor,
                      ss_ver, is_luma, seg_apron):
    """Jitted sharded MC program for one plane. `sig` is the static
    launch list, tuples of
      ('put'|'bilin', c, m) | ('warp', m) | ('comp', c, m, use_msk)
      | ('obmc', top, ww, hh, lap_h, m) | ('res', tx, txtp, m)
    executed in order on the apron-extended local plane."""
    jax = jax_mod()
    jnp = jax.numpy
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P

    def shard_fn(REF, pool, tables, msks, segplane, plane_shard):
        ext = jnp.concatenate(
            [jnp.zeros((Hp, apron), jnp.int32), plane_shard], axis=1)
        seg_ext = jnp.concatenate(
            [jnp.zeros((segplane.shape[0], seg_apron), jnp.int32),
             segplane], axis=1)
        ti = mi = 0
        for launch in sig:
            kind = launch[0]
            tblv = tables[ti][0]
            ti += 1
            if kind in ("put", "bilin"):
                _k, c, m = launch
                fn = mc_jobs.bilin_jobs_fn if kind == "bilin" else \
                    mc_jobs.put8_jobs_fn
                ext = fn(m, c, c, bd, rh, rw)(REF, tblv, ext)
            elif kind == "warp":
                _k, m = launch
                ext = mc_jobs.warp_jobs_fn(m, bd, rh, rw)(REF, tblv, ext)
            elif kind == "comp":
                _k, c, m, use_msk = launch
                if use_msk:
                    msk = msks[mi][0]
                    mi += 1
                else:
                    msk = jnp.zeros(1, jnp.int8)
                fn = mc_jobs.comp_jobs_fn(m, c, c, bd, ss_hor, ss_ver,
                                          rh, rw, is_luma, use_msk)
                ext, seg_ext = fn(REF, tblv, msk, seg_ext, ext)
            elif kind == "obmc":
                _k, top, ww, hh, lap_h, m = launch
                ext = mc_jobs.obmc_jobs_fn(
                    m, ww, hh, lap_h, bd, bool(top), rh, rw)(REF, tblv,
                                                             ext)
            else:                                      # res
                _k, tx, txtp, m = launch
                ext = mc_jobs.res_jobs_fn(m, tx, txtp, bd)(pool, tblv,
                                                           ext)
        return ext[:, apron:], seg_ext[:, seg_apron:]

    body = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("tile"), P("tile"), P(None, "tile"),
                  P(None, "tile")),
        out_specs=(P(None, "tile"), P(None, "tile")))
    return jax.jit(body)


class ShardedInterReconstructor(DeviceInterReconstructor):
    """Inter Stage B with passes A-D column-sharded over the mesh."""

    def __init__(self, plan, refp, mesh):
        super().__init__(plan, refp)
        self.mesh = _flat_tile_mesh(mesh)

    def _execute(self):
        if not (len(self.puts) or len(self.warps) or len(self.obmc_jobs)
                or len(self.comp) or len(self.res_jobs)):
            return
        jax = jax_mod()
        jnp = jax.numpy
        bd = self.bitdepth
        mesh = self.mesh
        T = mesh.shape["tile"]
        sw_l, sw_c = _shard_widths(self.plan, T)
        f = self.f

        from ..entropy import levels as lv

        with timing.phase("inter.sharded_exec"):
            stacks = self._build_refstacks(jnp)
            rep = _sharding(mesh)
            stacks = {pi: (jax.device_put(R, rep), lut)
                      for pi, (R, lut) in stacks.items()}

            n_planes = len(self.pic.planes)
            sws = [sw_l] + [sw_c] * (n_planes - 1)
            aprons = [APRON_L] + [APRON_L >> f.ss_hor] * (n_planes - 1)
            planes = []
            for pi, hp in enumerate(self.pic.planes):
                src = np.asarray(hp, np.int32) if self.had_eager else \
                    np.zeros(hp.shape, np.int32)
                planes.append(_to_sharded(mesh, src, T * sws[pi]))

            # ---- host-side partition of every job table ----------------
            puts = np.asarray(self.puts, np.int32).reshape(-1, 11)
            warps = np.asarray(self.warps, np.int32).reshape(-1, 12)
            obmc = np.asarray(self.obmc_jobs, np.int32).reshape(-1, 13)
            comp = np.asarray(self.comp, np.int32).reshape(-1, 25)
            res = np.asarray(self.res_jobs, np.int32).reshape(-1, 7)
            pool_np = np.zeros(1, np.int32)
            if len(res):
                pool_np, bases = self._build_cf_pool()
                cfoff = (bases[res[:, 6]] + res[:, 5]).astype(np.int32)
                res = np.concatenate([res[:, :5], cfoff[:, None]], 1)
            pool = jax.device_put(pool_np, rep)

            # the w_mask seg plane crosses from the luma compound pass
            # to the chroma combines, so luma's program runs first
            seg_h = self.pic.planes[-1].shape[0]
            seg_apron = aprons[-1]
            segplane = _to_sharded(mesh, np.zeros((seg_h, 1), np.int32),
                                   T * sws[-1])

            for pi in range(n_planes):
                sw, apron = sws[pi], aprons[pi]
                sig = []
                tables = []
                msks = []
                shard0 = _sharding(mesh, "tile")

                def add(kind_tuple, tbl):
                    sig.append(kind_tuple)
                    tables.append(jax.device_put(tbl, shard0))

                # pass A: puts (grouped by size class / bilin), warps
                _REF, lut = stacks[pi]
                p_pl = puts[puts[:, 0] == pi]
                if len(p_pl):
                    cls = _size_class_vec(p_pl[:, 1], p_pl[:, 2])
                    bil = (p_pl[:, 10] < 0).astype(np.int32)
                    for c in np.unique(cls):
                        for isb in (0, 1):
                            sub = p_pl[(cls == c) & (bil == isb)]
                            if not len(sub):
                                continue
                            sub = sub.copy()
                            sub[:, 5] = lut[sub[:, 5]]
                            t, _src = _partition(sub, 4, 3, sub[:, 2],
                                                 T, sw, apron)
                            add(("bilin" if isb else "put", int(c),
                                 t.shape[1]), t)
                w_pl = warps[warps[:, 0] == pi]
                if len(w_pl):
                    sub = w_pl.copy()
                    sub[:, 3] = lut[sub[:, 3]]
                    t, _src = _partition(sub, 2, 1, 8, T, sw, apron)
                    add(("warp", t.shape[1]), t)

                # pass B: compounds
                c_pl = comp[comp[:, 0] == pi]
                if len(c_pl):
                    cls = _size_class_vec(c_pl[:, 1], c_pl[:, 2])
                    for c in np.unique(cls):
                        sub = c_pl[cls == c]
                        jobs = np.concatenate([sub[:, :9], sub[:, 13:25]],
                                              1)
                        jobs[:, 14] = lut[jobs[:, 14]]
                        jobs[:, 20] = lut[jobs[:, 20]]
                        use_msk = bool(np.any(sub[:, 8] == 1))
                        t, src = _partition(jobs, 4, 3, jobs[:, 2], T,
                                            sw, apron)
                        m = t.shape[1]
                        if use_msk:
                            cc = int(c)
                            msk_all = np.zeros((len(sub), cc, cc), np.int8)
                            for i in np.nonzero(sub[:, 8] == 1)[0]:
                                h_, w_ = int(sub[i, 1]), int(sub[i, 2])
                                msk_all[i, :h_, :w_] = mc_ref.wedge_mask(
                                    int(sub[i, 9]), int(sub[i, 10]),
                                    int(sub[i, 11]), int(sub[i, 12]),
                                    w_, h_)
                            msk_sh = np.zeros((T, m, cc, cc), np.int8)
                            valid = src >= 0
                            msk_sh[valid] = msk_all[src[valid]]
                            msks.append(jax.device_put(msk_sh, shard0))
                        add(("comp", int(c), m, use_msk), t)

                # pass C: OBMC (top then left, grouped by geometry)
                o_pl = obmc[obmc[:, 1] == pi]
                if len(o_pl):
                    for top in (1, 0):
                        sel = o_pl[o_pl[:, 0] == top]
                        if not len(sel):
                            continue
                        keys = sel[:, 2:5]
                        for krow in np.unique(keys, axis=0):
                            sub = sel[np.all(keys == krow, axis=1)].copy()
                            sub[:, 7] = lut[sub[:, 7]]
                            ww, hh, lap_h = (int(krow[0]), int(krow[1]),
                                             int(krow[2]))
                            wb = ww if top else (ww * 3) >> 2
                            t, _src = _partition(sub, 6, 5, wb, T, sw,
                                                 apron)
                            add(("obmc", top, ww, hh, lap_h,
                                 t.shape[1]), t)

                # pass D: residuals (grouped by tx/txtp)
                if len(res):
                    r_pl = res[res[:, 0] == pi]
                    if len(r_pl):
                        keys = r_pl[:, 1:3]
                        for krow in np.unique(keys, axis=0):
                            sub = r_pl[np.all(keys == krow, axis=1)]
                            tx, txtp = int(krow[0]), int(krow[1])
                            wpx = 4 * lv.TXFM_INFO[tx].w
                            t, _src = _partition(sub, 4, 3, wpx, T, sw,
                                                 apron)
                            add(("res", tx, txtp, t.shape[1]), t)

                if not sig:
                    continue
                rh, rw = self._ref_bounds(int(bool(pi)))
                prog = _mc_plane_program(
                    mesh, tuple(sig), self.pic.planes[pi].shape[0], sw,
                    apron, bd, rh, rw,
                    f.ss_hor if pi == 0 else 0,
                    f.ss_ver if pi == 0 else 0, pi == 0, seg_apron)
                planes[pi], segplane = prog(_REF, pool, tuple(tables),
                                            tuple(msks), segplane,
                                            planes[pi])

            if self.leftovers or self.res_fixups:
                from ..ops.backend import fetch_all
                crops = [p[:, :hp.shape[1]]
                         for p, hp in zip(planes, self.pic.planes)]
                casts = [pl.astype(hp.dtype)
                         for hp, pl in zip(self.pic.planes, crops)]
                for hp, a in zip(self.pic.planes, fetch_all(casts)):
                    hp[:] = a
            else:
                # planes stay on the full shard grid; the filter chain
                # consumes them sharded and crops at the output boundary
                self.pic.dev = planes
                self.pic.dev_grid = True
                self.pic.host_stale = True


def reconstruct_inter_frame_sharded(plan, refp, mesh):
    r = ShardedInterReconstructor(plan, refp, mesh)
    jobs = None
    if r._fused_res:
        from . import inter_jobs_native
        with timing.phase("inter.emit_jobs"):
            jobs = inter_jobs_native.emit(plan, plan.f, r.jnt_weights)
    if jobs is not None:
        return r.run_native(jobs)
    if getattr(plan, "lazy_blocks", False):
        from ..entropy.native_tile import materialize_pending
        materialize_pending(plan)
    if not r._fused_res:
        from ..ops import itx_ref
        itx_ref.precompute_residuals_plan(plan, r.bitdepth)
    return r.run()


# ---------------------------------------------------------------------------
# sharded in-loop filter chain
# ---------------------------------------------------------------------------

def _halo_exchange(jnp, lax, pshard, T):
    """Extend an owned (H, sw) shard by HALO real neighbour columns on
    both sides (zeros at the mesh edges)."""
    fwd = [(j, j + 1) for j in range(T - 1)]
    bwd = [(j + 1, j) for j in range(T - 1)]
    left = lax.ppermute(pshard[:, -HALO:], "tile", fwd)
    right = lax.ppermute(pshard[:, :HALO], "tile", bwd)
    return jnp.concatenate([left, pshard, right], axis=1)


@lru_cache(maxsize=None)
def _deblock_sharded_fn(mesh, Hp, sw, bd, luma):
    """Owned (Hp, T*sw) sharded plane -> deblocked, via the validated
    whole-plane kernel (ops/lf.py:_plane_fn) on the halo-extended shard
    with an ownership-shifted stitch-back."""
    jax = jax_mod()
    jnp = jax.numpy
    from jax import lax
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P
    from ..ops.lf import _plane_fn

    T = mesh.shape["tile"]
    n4h = Hp // 4
    swe = sw // 4
    he = HALO // 4
    inner = _plane_fn(n4h, swe + 2 * he, bd, luma)
    SHIFT = 8

    def shard_fn(pshard, *maps):
        vms, hms, luts = maps[:2], maps[2:4], maps[4:]
        idx = lax.axis_index("tile")
        ext = _halo_exchange(jnp, lax, pshard, T)
        e0 = idx * swe
        z = e0 * 0
        vslice = [lax.dynamic_slice(m, (z, e0), (n4h, swe + 2 * he))
                  for m in vms]
        hslice = [lax.dynamic_slice(m, (e0, z), (swe + 2 * he, n4h))
                  for m in hms]
        out_ext = inner(ext, tuple(vslice), tuple(hslice), *luts)
        # stitch: boundary columns are owned by the left shard's result
        trusted = out_ext[:, HALO - SHIFT:HALO - SHIFT + sw]
        send = trusted[:, :SHIFT]
        recv = lax.ppermute(send, "tile",
                            [(j + 1, j) for j in range(T - 1)])
        own_tail = out_ext[:, HALO + sw - SHIFT:HALO + sw]
        tail = jnp.where(idx == T - 1, own_tail, recv)
        return jnp.concatenate([trusted[:, SHIFT:], tail], axis=1)

    specs = (P(None, "tile"),) + (P(None, None),) * 4 + (P(None),) * 2
    fn = shard_map(shard_fn, mesh=mesh, in_specs=specs,
                   out_specs=P(None, "tile"))
    return jax.jit(fn)


def _deblock_maps(plan, kind, grid_h4, grid_w4, m):
    """Per-edge parameter maps padded to the shard grid + halo edges.
    kind: 0=y 1=u 2=v."""
    from ..ops.lf import _edge_params, calc_eih
    lflf = plan.f.frame_hdr.loopfilter
    lut_e, lut_i = calc_eih(lflf.sharpness)
    he = HALO // 4
    if kind == 0:
        lvl_v = m.lvl[:, :, 0].astype(np.int32)
        lvl_h = m.lvl[:, :, 1].astype(np.int32)
        vcls, hcls = m.vcls_y, m.hcls_y
    else:
        lvl = m.lvl[:m.ch4, :m.cw4, 1 + kind].astype(np.int32)
        lvl_v = lvl_h = lvl
        vcls, hcls = m.vcls_uv, m.hcls_uv
    vmaps = _edge_params(vcls, lvl_v,
                         np.concatenate([lvl_v[:, :1], lvl_v[:, :-1]],
                                        axis=1))
    vmaps[0][:, 0] = -1
    hmaps = _edge_params(hcls, lvl_h,
                         np.concatenate([lvl_h[:1], lvl_h[:-1]], axis=0))
    hmaps[0][0, :] = -1

    def grow(maps, gh, gw, pad_axis):
        cls, L = maps
        out_cls = np.full((gh, gw), -1, np.int32)
        out_cls[:cls.shape[0], :cls.shape[1]] = cls
        out_l = np.zeros((gh, gw), np.int32)
        out_l[:L.shape[0], :L.shape[1]] = L
        pad = ((0, 0), (he, he)) if pad_axis == 1 else ((he, he), (0, 0))
        return [np.pad(a, pad, constant_values=(-1 if i == 0 else 0))
                for i, a in enumerate((out_cls, out_l))]

    vm = grow(vmaps, grid_h4, grid_w4, 1)
    hm = grow(tuple(np.ascontiguousarray(a.T) for a in hmaps),
              grid_w4, grid_h4, 0)
    return vm, hm, (lut_e.astype(np.int32), lut_i.astype(np.int32))


def deblock_planes_sharded(planes, plan, bd, mesh):
    """Sharded deblock over column-sharded (Hp, T*sw) plane arrays."""
    from ..ops.lf import build_lf_masks
    from ..ops.lf_native import build_lf_masks_native
    f = plan.f
    lflf = f.frame_hdr.loopfilter
    m = build_lf_masks_native(plan)
    if m is None:
        m = build_lf_masks(plan)
    T = mesh.shape["tile"]
    out = list(planes)
    if lflf.level_y[0] or lflf.level_y[1]:
        Hp, Wg = planes[0].shape
        vm, hm, luts = _deblock_maps(plan, 0, Hp // 4, Wg // 4, m)
        fn = _deblock_sharded_fn(mesh, Hp, Wg // T, bd, True)
        out[0] = fn(planes[0], *vm, *hm, *luts)
    if len(planes) > 1 and (lflf.level_u or lflf.level_v):
        Hp, Wg = planes[1].shape
        fn = _deblock_sharded_fn(mesh, Hp, Wg // T, bd, False)
        for pl in range(2):
            vm, hm, luts = _deblock_maps(plan, 1 + pl, Hp // 4, Wg // 4,
                                         m)
            out[1 + pl] = fn(planes[1 + pl], *vm, *hm, *luts)
    return out


@lru_cache(maxsize=None)
def _cdef_sharded_fn(mesh, Hp, sw, layout, bd, damping, has_chroma,
                     valid_h, valid_w):
    """Sharded CDEF: one program filters Y (+UV) on halo-extended
    shards, re-deriving the whole-plane kernel math (ops/cdef.py) with
    FILL masks driven by GLOBAL column coordinates so frame-boundary
    semantics match the single-device kernel bit-exactly."""
    jax = jax_mod()
    jnp = jax.numpy
    from jax import lax
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P
    from ..ops.cdef import _proj_matrix, _ulog2_capped, _DIV_TABLE
    from ..ops.cdef_ref import cdef_dirs, FILL, UV_DIRS

    T = mesh.shape["tile"]
    ss_ver = 1 if layout == 1 else 0
    ss_hor = 0 if layout == 3 else 1
    bdm8 = bd - 8
    dirs = np.asarray(cdef_dirs())
    uv_dir_tbl = np.array(UV_DIRS[1 if layout == 2 else 0], np.int32)
    extw = sw + 2 * HALO                       # luma ext width (mult 8)
    nby, nbx = Hp // 8, extw // 8

    def find_dirs(y_ext):
        px = ((y_ext >> bdm8) - 128).astype(jnp.int32)
        B = px.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        B = B.reshape(nby * nbx, 64)
        Pm = jnp.matmul(B, _proj_matrix(),
                        preferred_element_type=jnp.int32).astype(jnp.int64)
        hv = Pm[:, 0:16].reshape(-1, 2, 8)
        diag = Pm[:, 16:46].reshape(-1, 2, 15)
        alt = Pm[:, 46:90].reshape(-1, 4, 11)
        cost = [None] * 8
        cost[2] = jnp.sum(hv[:, 0] ** 2, axis=1) * 105
        cost[6] = jnp.sum(hv[:, 1] ** 2, axis=1) * 105
        for di in range(2):
            c = jnp.zeros(diag.shape[0], jnp.int64)
            for nn in range(7):
                d = _DIV_TABLE[nn]
                c = c + (diag[:, di, nn] ** 2 +
                         diag[:, di, 14 - nn] ** 2) * d
            c = c + diag[:, di, 7] ** 2 * 105
            cost[0 if di == 0 else 4] = c
        for nn in range(4):
            c = jnp.zeros(alt.shape[0], jnp.int64)
            for mm in range(5):
                c = c + alt[:, nn, 3 + mm] ** 2
            c = c * 105
            for mm in range(3):
                d = _DIV_TABLE[2 * mm + 1]
                c = c + (alt[:, nn, mm] ** 2 +
                         alt[:, nn, 10 - mm] ** 2) * d
            cost[nn * 2 + 1] = c
        costs = jnp.stack(cost, axis=1)
        best = jnp.argmax(costs, axis=1).astype(jnp.int32)
        best_cost = jnp.max(costs, axis=1)
        alt_cost = jnp.take_along_axis(costs, (best ^ 4)[:, None],
                                       axis=1)[:, 0]
        var = ((best_cost - alt_cost) >> 10)
        return best.reshape(nby, nbx), var.reshape(nby, nbx)

    def filter_plane(ext, pri, sec, dir_map, damp, vh, vw, col0,
                     bsz_v, bsz_h, apply_map):
        H, W = ext.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) + col0
        inb = (rows < vh) & (cols < vw) & (cols >= 0)
        SP = jnp.where(inb, ext, FILL)
        SP = jnp.pad(SP, 2, constant_values=FILL)

        def expand(mp):
            return jnp.repeat(jnp.repeat(mp, bsz_v, axis=0), bsz_h,
                              axis=1)

        prix = expand(pri)
        secx = expand(sec)
        dirx = expand(dir_map)
        px = ext

        def tap(dy, dx):
            return SP[2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

        def dir_tap(base, k, sign):
            v = None
            for d in range(8):
                dy, dx = (int(dirs[base + d, k, 0]),
                          int(dirs[base + d, k, 1]))
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

        ptap = pri_tap
        for k in range(2):
            for sign in (1, -1):
                s = dir_tap(2, k, sign)
                summ = summ + ptap * constrain(s - px, prix, pri_shift)
                mn, mx = upd_minmax(mn, mx, s)
            ptap = (ptap & 3) | 2
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
        return jnp.where(act & ((prix != 0) | (secx != 0)), res, ext)

    def shard_fn(y, u, v, y_pri, y_sec, uv_pri, uv_sec, y_apply,
                 uv_apply):
        idx = lax.axis_index("tile")
        y_ext = _halo_exchange(jnp, lax, y, T)
        col0 = idx * sw - HALO                 # global col of ext col 0
        dir_map, var = find_dirs(y_ext)

        b0 = idx * (sw // 8)
        z = b0 * 0

        def bslice(mp):
            return lax.dynamic_slice(mp, (z, b0), (nby, nbx))

        y_pri_l = bslice(y_pri)
        y_sec_l = bslice(y_sec)
        y_app_l = bslice(y_apply)
        t = (var >> 6)
        i = _ulog2_capped(jnp, jnp.minimum(t, 1 << 12), 12)
        adj = (y_pri_l * (4 + i) + 8) >> 4
        adj = jnp.where(var != 0, adj, 0)
        adj = jnp.where(y_pri_l != 0, adj, 0)
        y_dir = jnp.where(y_pri_l != 0, dir_map, 0)
        y_out = filter_plane(y_ext, adj, y_sec_l, y_dir, damping,
                             valid_h, valid_w, col0, 8, 8, y_app_l)
        y_out = y_out[:, HALO:HALO + sw]
        if not has_chroma:
            return y_out, u, v
        uv_pri_l = bslice(uv_pri)
        uv_sec_l = bslice(uv_sec)
        uv_app_l = bslice(uv_apply)
        uv_dir = jnp.take(jnp.asarray(uv_dir_tbl), dir_map)
        uv_dir = jnp.where(uv_pri_l != 0, uv_dir, 0)
        hc = HALO >> ss_hor
        outs = []
        for cpl in (u, v):
            c_ext = _halo_exchange(jnp, lax, cpl, T)
            # trim the chroma ext to the block-aligned window the luma
            # direction grid covers
            c_ext = c_ext[:, HALO - hc:HALO - hc + (extw >> ss_hor)]
            c0 = idx * (sw >> ss_hor) - hc
            o = filter_plane(c_ext, uv_pri_l, uv_sec_l, uv_dir,
                             damping - 1, valid_h >> ss_ver,
                             valid_w >> ss_hor, c0, 8 >> ss_ver,
                             8 >> ss_hor, uv_app_l)
            outs.append(o[:, hc:hc + (sw >> ss_hor)])
        return y_out, outs[0], outs[1]

    specs_in = (P(None, "tile"), P(None, "tile"), P(None, "tile")) + \
        (P(None, None),) * 6
    fn = shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                   out_specs=(P(None, "tile"), P(None, "tile"),
                              P(None, "tile")))
    return jax.jit(fn)


def cdef_planes_sharded(planes, plan, bd, mesh):
    from ..ops.cdef import _block_maps
    f = plan.f
    cd = f.frame_hdr.cdef
    maps = _block_maps(plan, bd)
    T = mesh.shape["tile"]
    Hp, Wg = planes[0].shape
    sw = Wg // T
    # grow the per-8x8-block maps to the shard grid + halo blocks
    gby, gbx = Hp // 8, Wg // 8
    hb = HALO // 8
    grown = []
    for a in maps:
        o = np.zeros((gby, gbx + 2 * hb), np.int32)
        o[:a.shape[0], hb:hb + a.shape[1]] = a
        grown.append(o)
    has_chroma = len(planes) > 1
    fn = _cdef_sharded_fn(mesh, Hp, sw, int(f.layout), bd,
                          cd.damping + (bd - 8), has_chroma,
                          f.bh * 4, f.bw * 4)
    if has_chroma:
        y, u, v = fn(planes[0], planes[1], planes[2], *grown)
        return [y, u, v]
    y, _u, _v = fn(planes[0], planes[0], planes[0], *grown)
    return [y]


@lru_cache(maxsize=None)
def _lr_sharded_fn(mesh, kind, nb, hmax, wmax, bd, sw):
    """Sharded LR: per-shard item batches run the validated batched
    kernels (ops/lr.py) on halo-extended local planes; gather/scatter
    tables arrive pre-translated into shard-local columns."""
    jax = jax_mod()
    jnp = jax.numpy
    from jax import lax
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P
    from ..ops.lr import _wiener_fn, _sgr_fn

    T = mesh.shape["tile"]
    inner = _wiener_fn(nb, hmax, wmax, bd, tbl_cols=True) \
        if kind == "wiener" else _sgr_fn(nb, hmax, wmax, bd,
                                         tbl_cols=True)

    def shard_fn(cur, resin, pre, rowt, colt, p0, p1, p2, p3, oy, ox,
                 ohs, ows):
        # gathers always read the pre-LR pixels (cur/pre); scatters
        # land in the running result
        cur_ext = _halo_exchange(jnp, lax, cur, T)
        pre_ext = _halo_exchange(jnp, lax, pre, T)
        res_ext = _halo_exchange(jnp, lax, resin, T)
        if kind == "wiener":
            out_ext = inner(cur_ext, pre_ext, res_ext, rowt[0], colt[0],
                            p0[0], p1[0], oy[0], ox[0], ohs[0], ows[0])
        else:
            out_ext = inner(cur_ext, pre_ext, res_ext, rowt[0], colt[0],
                            p0[0], p1[0], p2[0], p3[0], oy[0], ox[0],
                            ohs[0], ows[0])
        return out_ext[:, HALO:HALO + sw]

    specs_in = (P(None, "tile"),) * 3 + (P("tile"),) * 10
    fn = shard_map(shard_fn, mesh=mesh, in_specs=specs_in,
                   out_specs=P(None, "tile"))
    return jax.jit(fn)


def _lr_tables(y, x, uw, sh_, e, kind, hmax, wmax, Hp, Wp, u, sgrp):
    """Single-item row/col gather tables with GLOBAL column ids — the
    scalar equivalent of the batched build in ops/lr.py."""
    from ..ops.restore_ref import (LR_HAVE_LEFT, LR_HAVE_RIGHT,
                                   LR_HAVE_TOP, LR_HAVE_BOTTOM)
    from ..ops.lr import PAD
    have_top = bool(e & LR_HAVE_TOP)
    rr = np.arange(-3, hmax + 3)
    if kind == "sgr":
        j = 3 + np.clip(rr, -2, sh_ + 1)
        s0v = int(sgrp[u["type"] - 3, 0])
        if s0v != 0:
            bmin = sh_ + 1 if sh_ % 2 else (3 if have_top else 5)
        else:
            bmin = 3
    else:
        j = np.minimum(3 + rr, sh_ + 5)
        bmin = 4 if have_top else 6
    use_b = bool(e & LR_HAVE_BOTTOM) and sh_ >= bmin
    mid = y + (j - 3)
    top_val = np.where(j <= 1, y - 2, y - 1) if have_top else \
        np.full_like(j, y)
    bot_val = (np.where(j == sh_ + 3, y + sh_, y + sh_ + 1) if use_b
               else np.full_like(j, y + sh_ - 1))
    val = np.where(j < 3, top_val, np.where(j < sh_ + 3, mid, bot_val))
    from_lpf = np.where(j < 3, have_top,
                        np.where(j < sh_ + 3, False, use_b))
    np.clip(val, 0, Hp - 1, out=val)
    rowt = (val + np.where(from_lpf, Hp, 0)).astype(np.int32)

    jj = np.minimum(np.arange(wmax + 2 * PAD), uw + 5)
    cval = np.clip(x + jj - PAD, 0, Wp - 1)
    if not (e & LR_HAVE_LEFT):
        cval = np.where(jj < PAD, min(max(x, 0), Wp - 1), cval)
    if not (e & LR_HAVE_RIGHT):
        cval = np.where(jj >= PAD + uw, min(max(x + uw - 1, 0), Wp - 1),
                        cval)
    return rowt, cval.astype(np.int32)


def lr_planes_sharded(planes, pre_cdef, plan, bd, mesh):
    """Sharded LR over column-sharded plane arrays; mirrors
    ops/lr.py:lr_planes_device with per-item shard assignment."""
    from ..ops.lr import _collect_items, _pow2, PAD
    from ..ops.restore_ref import _sgr_params_tbl
    jax = jax_mod()
    f = plan.f
    fh = f.frame_hdr
    rst = fh.restoration
    sgrp = _sgr_params_tbl()
    T = mesh.shape["tile"]
    out = list(planes)

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
        Hp, Wg = planes[plane].shape
        sw = Wg // T
        Wp_host = _out_plane_width(plan, plane)
        hmax = 64 >> ss_ver
        wmax = (1 << us_log2) + (1 << (us_log2 - 1))
        cur = planes[plane]
        res = cur
        pre = pre_cdef[plane]
        locW = sw + 2 * HALO

        for kind in ("wiener", "sgr"):
            sel = [it for it in items
                   if (it[5]["type"] == 2) == (kind == "wiener")]
            if not sel:
                continue
            per_shard = [[] for _ in range(T)]
            for it in sel:
                x, uw = it[1], it[2]
                lo = max(0, x // sw)
                hi = min((x + uw - 1) // sw, T - 1)
                for s in range(lo, hi + 1):
                    per_shard[s].append(it)
            nb = _pow2(max(max(len(p) for p in per_shard), 1))
            pshape = (T, nb, 7) if kind == "wiener" else (T, nb)
            rowt = np.zeros((T, nb, hmax + 6), np.int32)
            colt = np.zeros((T, nb, wmax + 2 * PAD), np.int32)
            p0 = np.zeros(pshape, np.int32)
            p1 = np.zeros(pshape, np.int32)
            p2 = np.zeros((T, nb), np.int32)
            p3 = np.zeros((T, nb), np.int32)
            oy = np.zeros((T, nb), np.int32)
            ox = np.zeros((T, nb), np.int32)
            ohs = np.zeros((T, nb), np.int32)
            ows = np.ones((T, nb), np.int32)
            for s in range(T):
                for i, it in enumerate(per_shard[s]):
                    y, x, uw, sh_, e, u = it
                    rt, ct = _lr_tables(y, x, uw, sh_, e, kind, hmax,
                                        wmax, Hp, Wp_host, u, sgrp)
                    colt[s, i] = np.clip(ct - s * sw + HALO, 0, locW - 1)
                    rowt[s, i] = rt
                    oy[s, i] = y
                    ox[s, i] = x - s * sw + HALO
                    ohs[s, i] = sh_
                    ows[s, i] = uw
                    if kind == "wiener":
                        fl = u["filter_h"]
                        p0[s, i] = (fl[0], fl[1], fl[2],
                                    128 - 2 * (fl[0] + fl[1] + fl[2]),
                                    fl[2], fl[1], fl[0])
                        fl = u["filter_v"]
                        p1[s, i] = (fl[0], fl[1], fl[2],
                                    128 - 2 * (fl[0] + fl[1] + fl[2]),
                                    fl[2], fl[1], fl[0])
                    else:
                        ty = u["type"] - 3
                        s0v, s1v = int(sgrp[ty, 0]), int(sgrp[ty, 1])
                        sw0, sw1 = u["sgr_weights"]
                        p0[s, i] = s0v
                        p1[s, i] = s1v
                        p2[s, i] = sw0 if s0v else 0
                        p3[s, i] = 128 - (sw0 + sw1) if s1v else 0
            sh0 = _sharding(mesh, "tile")
            args = [jax.device_put(a, sh0) for a in
                    (rowt, colt, p0, p1, p2, p3, oy, ox, ohs, ows)]
            fn = _lr_sharded_fn(mesh, kind, nb, hmax, wmax, bd, sw)
            res = fn(cur, res, pre, *args)
        out[plane] = res
    return out


def run_filter_chain_sharded(pic, plan, inloop_filters, mesh):
    """Sharded equivalent of recon/filters.py:run_filter_chain_device.
    pic.dev holds column-sharded shard-grid arrays on entry (set by the
    sharded MC) or None (host pixels); the finished planes all-gather
    into the replicated reference cache (Picture.dev)."""
    f = plan.f
    fh = f.frame_hdr
    jax = jax_mod()
    jnp = jax.numpy
    mesh = _flat_tile_mesh(mesh)
    T = mesh.shape["tile"]
    sw_l, sw_c = _shard_widths(plan, T)

    lflf = fh.loopfilter
    do_deblock = bool(inloop_filters & 1) and \
        (lflf.level_y[0] or lflf.level_y[1])
    cd = fh.cdef
    do_cdef = bool(inloop_filters & 2) and f.seq_hdr.cdef and \
        any(cd.y_strength[i] or cd.uv_strength[i]
            for i in range(1 << cd.n_bits))
    do_sr = fh.width[0] != fh.width[1]
    do_lr = bool(inloop_filters & 4) and \
        any(t != 0 for t in fh.restoration.type)

    def to_sharded_all():
        if getattr(pic, "dev", None) is not None and \
                getattr(pic, "dev_grid", False):
            return list(pic.dev)
        src = pic.dev if getattr(pic, "dev", None) is not None \
            else [np.asarray(p, np.int32) for p in pic.planes]
        return [_to_sharded(mesh, np.asarray(p, np.int32),
                            T * (sw_l if pi == 0 else sw_c))
                for pi, p in enumerate(src)]

    def finish(planes, out_pic):
        crops = [p[:, :hp.shape[1]]
                 for p, hp in zip(planes, out_pic.planes)]
        rep = _replicate(mesh, crops)
        casts = [pl.astype(hp.dtype)
                 for hp, pl in zip(out_pic.planes, rep)]
        for a in casts:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        out_pic.pending_fetch = casts
        out_pic.dev = rep
        out_pic.dev_grid = False
        out_pic.host_stale = True
        return out_pic

    if not (do_deblock or do_cdef or do_sr or do_lr):
        if getattr(pic, "dev", None) is not None and \
                getattr(pic, "host_stale", False):
            return finish(to_sharded_all(), pic)
        return pic

    planes = to_sharded_all()

    if do_deblock:
        planes = deblock_planes_sharded(planes, plan, pic.bpc, mesh)

    pre_cdef = planes if do_lr else None

    if do_cdef:
        planes = cdef_planes_sharded(planes, plan, pic.bpc, mesh)

    out_pic = pic
    if do_sr:
        # super-res is a whole-row horizontal resample: all-gather the
        # coded-width planes, run the validated single-device kernel,
        # re-shard at the output width
        from ..ops.superres import (_resize_tables, _resize_fn,
                                    scale_fac, get_upscale_x0)
        from .picture import Picture
        in_w, out_w = fh.width[0], fh.width[1]
        newpic = Picture(out_w, fh.height, pic.layout, pic.bpc)
        newpic.props = pic.props
        ss_hor, ss_ver = pic.ss_hor, pic.ss_ver
        step = [scale_fac(in_w, out_w),
                scale_fac((in_w + ss_hor) >> ss_hor,
                          (out_w + ss_hor) >> ss_hor)]
        x0 = [get_upscale_x0(in_w, out_w, step[0]),
              get_upscale_x0((in_w + ss_hor) >> ss_hor,
                             (out_w + ss_hor) >> ss_hor, step[1])]
        rep = _replicate(mesh, planes)
        pre_rep = _replicate(mesh, pre_cdef) if do_lr else None
        new_planes = []
        new_pre = [] if do_lr else None
        sh_col = _sharding(mesh, None, "tile")
        osw_l, osw_c = _shard_widths(plan, T, out=True)
        for pl in range(len(planes)):
            c = int(bool(pl))
            src_w = (4 * f.bw) >> (ss_hor * c)
            dst_w = (out_w + (ss_hor * c)) >> (ss_hor * c)
            h = (fh.height + (ss_ver * c)) >> (ss_ver * c)
            idx, flt = _resize_tables(dst_w, src_w, step[c], x0[c])
            fnr = _resize_fn(h, dst_w, pic.bpc)
            Wg = T * (osw_l if pl == 0 else osw_c)
            Hn = newpic.planes[pl].shape[0]
            full = jnp.zeros((Hn, Wg), jnp.int32)
            full = full.at[:h, :dst_w].set(fnr(rep[pl][:h], idx, flt))
            new_planes.append(jax.device_put(full, sh_col))
            if do_lr:
                prefull = jnp.zeros((Hn, Wg), jnp.int32)
                prefull = prefull.at[:h, :dst_w].set(
                    fnr(pre_rep[pl][:h], idx, flt))
                new_pre.append(jax.device_put(prefull, sh_col))
        planes = new_planes
        pre_cdef = new_pre
        out_pic = newpic

    if do_lr:
        planes = lr_planes_sharded(planes, pre_cdef, plan, pic.bpc, mesh)

    out_pic = finish(planes, out_pic)
    if out_pic is not pic:
        pic.dev = None
    return out_pic
