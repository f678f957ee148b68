"""Multi-chip decode sharding (SURVEY §2.7.7/§2.8).

Decode parallelism for AV1 maps onto a ('gop', 'tile') device mesh:

- 'tile': Stage-B pixel work column-shards each plane across chips.
  The in-loop filters couple neighbouring shards — a vertical deblock
  edge reads up to 7 and writes up to 6 pixels across the boundary
  (reference loopfilter_tmpl.c:37-162; boundary state per
  decode.c:2732-2740) — so shards exchange 32-pixel halos over ICI
  (lax.ppermute), each shard filters the boundary edges it owns
  redundantly inside the halo, and an 8-pixel ownership shift stitches
  the result back to the canonical sharding, bit-exactly.
- 'gop': batched residual (itx) work data-parallels over frames /
  independent GOPs; here the real coefficient batch of the frame is
  sharded over ('gop', 'tile') and a residual-energy psum rides the
  full mesh.

The parameter maps (per-edge filter class/strength) are replicated —
they are 1/16th of plane bytes; sharding them is follow-up work.

`sharded_decode_md5` decodes a real stream with the WHOLE Stage-B
pipeline sharded (recon/sharded_stageb.py: MC passes A-D on
apron-extended shards, deblock/CDEF/LR with ppermute halos, super-res
via all-gather) and returns the output md5, which must equal the
single-device decode md5 (asserted by
__graft_entry__.dryrun_multichip and tests/test_multichip.py). This
module keeps the halo/stitch reference formulation and the gop-axis
psum check those tests also exercise.
"""
from __future__ import annotations

import numpy as np

from ..ops.backend import jax_mod

HALO = 32           # px halo each side: covers wide16 reads of every
                    # edge within 2 edge-cols of the trusted region
SHIFT = 8           # ownership shift for the stitch-back ppermute


def _pad_edge_maps(maps, n4h, n4w):
    cls, L = maps
    out_cls = np.full((n4h, n4w), -1, np.int32)
    out_cls[:cls.shape[0], :cls.shape[1]] = cls
    out_l = np.zeros((n4h, n4w), np.int32)
    out_l[:L.shape[0], :L.shape[1]] = L
    return [out_cls, out_l]


def _shard_plane_deblock(mesh, plane, vmaps, hmaps, lut_e, lut_i, bd,
                         luma):
    """Column-sharded single-plane deblock over mesh axis 'tile'.
    plane: (Hp, Wp) int32 numpy. Returns filtered (Hp, Wp) numpy."""
    jax = jax_mod()
    jnp = jax.numpy
    from jax import lax
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P
    from ..ops.lf import _plane_fn

    T = mesh.shape["tile"]
    Hp, Wp = plane.shape
    sw = max(HALO, -(-Wp // T // 32) * 32)      # shard width, 32-aligned
    Wpad = sw * T
    swe = sw // 4                               # shard width in edges
    he = HALO // 4                              # halo width in edges

    pl = np.zeros((Hp, Wpad), np.int32)
    pl[:, :Wp] = plane
    n4h = Hp // 4
    # v maps (n4h, edges): pad to Wpad/4 + halo on both sides
    vm = _pad_edge_maps(vmaps, n4h, Wpad // 4)
    vm = [np.pad(a, ((0, 0), (he, he)),
                 constant_values=(-1 if i == 0 else 0))
          for i, a in enumerate(vm)]
    # h maps (edges, n4h): pre-transposed; pad rows the same way
    hm = _pad_edge_maps(hmaps, Wpad // 4, n4h)
    hm = [np.pad(a, ((he, he), (0, 0)),
                 constant_values=(-1 if i == 0 else 0))
          for i, a in enumerate(hm)]

    fwd = [(j, j + 1) for j in range(T - 1)]    # send right
    bwd = [(j + 1, j) for j in range(T - 1)]    # send left
    inner = _plane_fn(n4h, swe + 2 * he, bd, luma)

    def shard_fn(pshard, *maps):
        vms, hms, luts = maps[:2], maps[2:4], maps[4:]
        idx = lax.axis_index("tile")
        # --- halo exchange over ICI ---------------------------------
        left = lax.ppermute(pshard[:, -HALO:], "tile", fwd)
        right = lax.ppermute(pshard[:, :HALO], "tile", bwd)
        ext = jnp.concatenate([left, pshard, right], axis=1)
        # --- replicated maps -> this shard's extended slice ---------
        e0 = idx * swe
        z = e0 * 0                          # 0 with matching dtype
        vslice = [lax.dynamic_slice(m, (z, e0), (n4h, swe + 2 * he))
                  for m in vms]
        hslice = [lax.dynamic_slice(m, (e0, z), (swe + 2 * he, n4h))
                  for m in hms]
        out_ext = inner(ext, tuple(vslice), tuple(hslice), *luts)
        # --- ownership-shifted stitch-back --------------------------
        # trusted region of this shard: px [P-8, P+sw-8)
        trusted = out_ext[:, HALO - SHIFT:HALO - SHIFT + sw]
        send = trusted[:, :SHIFT]               # px [P-8, P)
        recv = lax.ppermute(send, "tile", bwd)  # from right neighbour
        own_tail = out_ext[:, HALO + sw - SHIFT:HALO + sw]
        tail = jnp.where(idx == T - 1, own_tail, recv)
        return jnp.concatenate([trusted[:, SHIFT:], tail], axis=1)

    specs = (P(None, "tile"),) + (P(None, None),) * 4 + (P(None),) * 2
    fn = shard_map(shard_fn, mesh=mesh, in_specs=specs,
                   out_specs=P(None, "tile"))
    with mesh:
        out = jax.jit(fn)(pl, *vm, *hm, lut_e.astype(np.int32),
                          lut_i.astype(np.int32))
        out = np.asarray(out)
    return out[:, :Wp]


def deblock_sharded(pic, plan, mesh) -> None:
    """Sharded equivalent of lf_ref.apply_deblock / lf.apply_deblock_
    device: filters pic.planes in place, column-sharded over the
    mesh's 'tile' axis with halo exchange."""
    from ..ops.lf import (_edge_params, _pad_maps, build_lf_masks,
                          calc_eih)
    f = plan.f
    fh = f.frame_hdr
    lflf = fh.loopfilter
    if not (lflf.level_y[0] or lflf.level_y[1]):
        return
    m = build_lf_masks(plan)
    lut_e, lut_i = calc_eih(lflf.sharpness)

    ah, aw = pic.planes[0].shape
    fh4, fw4 = ah // 4, aw // 4
    lvl_v = m.lvl[:, :, 0].astype(np.int32)
    lvl_h = m.lvl[:, :, 1].astype(np.int32)
    yv = _edge_params(m.vcls_y, lvl_v,
                      np.concatenate([lvl_v[:, :1], lvl_v[:, :-1]],
                                     axis=1))
    yv[0][:, 0] = -1
    yh = _edge_params(m.hcls_y, lvl_h,
                      np.concatenate([lvl_h[:1], lvl_h[:-1]], axis=0))
    yh[0][0, :] = -1
    yv = _pad_maps(yv, fh4, fw4)
    yh = _pad_maps(tuple(np.ascontiguousarray(a.T) for a in yh),
                   fw4, fh4)
    res = _shard_plane_deblock(mesh, np.asarray(pic.planes[0], np.int32),
                               yv, yh, lut_e, lut_i, pic.bpc, True)
    pic.planes[0][:] = res.astype(pic.planes[0].dtype)

    if len(pic.planes) > 1 and (lflf.level_u or lflf.level_v):
        ch4, cw4 = m.ch4, m.cw4
        ah, aw = pic.planes[1].shape
        fh4, fw4 = ah // 4, aw // 4
        for pl in range(2):
            lvl = m.lvl[:ch4, :cw4, 2 + pl].astype(np.int32)
            pv = _edge_params(m.vcls_uv, lvl,
                              np.concatenate([lvl[:, :1], lvl[:, :-1]],
                                             axis=1))
            pv[0][:, 0] = -1
            ph = _edge_params(m.hcls_uv, lvl,
                              np.concatenate([lvl[:1], lvl[:-1]],
                                             axis=0))
            ph[0][0, :] = -1
            pv = _pad_maps(pv, fh4, fw4)
            ph = _pad_maps(tuple(np.ascontiguousarray(a.T)
                                 for a in ph), fw4, fh4)
            res = _shard_plane_deblock(
                mesh, np.asarray(pic.planes[1 + pl], np.int32), pv, ph,
                lut_e, lut_i, pic.bpc, False)
            pic.planes[1 + pl][:] = res.astype(pic.planes[1 + pl].dtype)


def itx_sharded_check(plan, bitdepth, mesh):
    """Shard the frame's largest real coefficient bucket over the FULL
    ('gop', 'tile') mesh (batch data-parallel) and verify the residuals
    are bit-identical to the single-device batched kernel; returns the
    psum'd residual energy (exercises ICI collectives on real data)."""
    jax = jax_mod()
    jnp = jax.numpy
    from ..utils.shmap import shard_map
    from jax.sharding import PartitionSpec as P
    from ..entropy import levels as lv
    from ..ops.itx import residual_fn

    buckets = {}
    for cb in plan.coefs:
        if cb.eob >= 0 and cb.txtp != lv.WHT_WHT:
            buckets.setdefault((cb.tx, cb.txtp), []).append(cb)
    if not buckets:
        return 0.0
    (tx, txtp), blocks = max(buckets.items(), key=lambda kv: len(kv[1]))
    cf = np.stack([b.cf for b in blocks]).astype(np.int32)
    B = cf.shape[0]
    n_dev = mesh.devices.size
    Bp = -(-B // n_dev) * n_dev
    cf_pad = np.zeros((Bp, cf.shape[1]), np.int32)
    cf_pad[:B] = cf
    inner = residual_fn(tx, txtp, bitdepth)

    def shard_fn(cfs):
        res = inner(cfs)
        energy = jnp.sum(jnp.abs(res).astype(jnp.float32))
        energy = jax.lax.psum(jax.lax.psum(energy, "tile"), "gop")
        return res, energy

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=P(("gop", "tile")),
                   out_specs=(P(("gop", "tile")), P()))
    with mesh:
        res_sh, energy = jax.jit(fn)(cf_pad)
        res_sh = np.asarray(res_sh)[:B]
    res_ref = np.asarray(inner(cf))
    assert np.array_equal(res_sh, res_ref.reshape(res_sh.shape)), \
        "sharded itx diverged from single-device itx"
    return float(energy)


def _decode_md5(data: bytes, settings) -> str:
    from ..bitstream.ivf import IvfReader
    from ..decoder import ObuStreamDecoder
    from ..utils.muxers import Md5Muxer
    dec = ObuStreamDecoder(settings=settings)
    mux = Md5Muxer()
    for fr in IvfReader(data):
        for _p, pic in dec.decode_temporal_unit(fr.data):
            if pic is not None:
                mux.write_picture(pic)
    return mux._md5.hexdigest()


def sharded_decode_md5(data: bytes, mesh) -> str:
    """Decode an IVF stream on the DEVICE backend with the whole
    Stage-B pixel pipeline (MC passes A-D, deblock, CDEF, super-res,
    loop restoration) column-sharded over the mesh's devices
    (recon/sharded_stageb.py) and return the output md5. The
    gop-sharded itx psum check (itx_sharded_check) is exercised
    separately by tests/test_multichip.py."""
    from ..api import Settings
    return _decode_md5(data, Settings(n_threads=1, sharding_mesh=mesh))


def single_device_md5(data: bytes) -> str:
    """Single-device decode md5 on the DEVICE backend (the sharded
    decode's oracle; the device backend itself is validated against
    the golden host path and the reference binary by the e2e suite)."""
    from ..api import Settings
    return _decode_md5(data, Settings(n_threads=1))
