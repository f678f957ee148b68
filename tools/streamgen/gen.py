"""Synthesize AV1 intra test streams.

Headers are written with PutBits in exactly the field order the parser
(and the reference obu.c) reads. Tile payloads are produced by running
dav1d_tpu's TileParser with a GenCoder: every decode_* call samples a
value from the current CDF distribution (mixed with uniform exploration)
and encodes it through MsacEncoder — so the decoder's own syntax walk IS
the encoder, and any stream produced here is decodable by construction.
"""
from __future__ import annotations

import io
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from dav1d_tpu.bitstream import ivf
from dav1d_tpu.bitstream.getbits import GetBits, inv_recenter
from dav1d_tpu.bitstream import obu as obu_mod
from dav1d_tpu.bitstream.headers import ObuType
from dav1d_tpu.entropy.cdf import CdfContext
from dav1d_tpu.entropy.decode import FrameContext, FramePlan, TileParser
from dav1d_tpu.entropy.msac import MsacEncoder, EC_PROB_SHIFT, EC_MIN_PROB

from .putbits import PutBits, wrap_obu


class GenCoder:
    """Duck-types MsacDecoder for TileParser, but *chooses* each symbol
    (sampled from the live CDF, mixed with uniform exploration) and
    encodes it via MsacEncoder."""

    def __init__(self, seed: int, uniform_mix: float = 0.5,
                 disable_cdf_update: bool = False,
                 force: dict | None = None):
        self.rng = np.random.default_rng(seed)
        self.enc = MsacEncoder(allow_update_cdf=not disable_cdf_update)
        self.mix = uniform_mix
        self.cnt = 0                      # overread check stub
        self.allow_update_cdf = not disable_cdf_update
        # optional forced outcomes: maps id(root cdf array) -> value
        self.force = force or {}
        # forbidden symbol values: id(cdf array, any view level) -> set
        self.forbid = {}
        # forced value for raw decode_bool (422 edge partitions)
        self.force_bool = None

    # -- helpers --------------------------------------------------------
    def _forbidden(self, cdf):
        a = cdf
        while a is not None:
            bad = self.forbid.get(id(a))
            if bad:
                return bad
            a = getattr(a, "base", None)
        return ()

    def _forced_value(self, root):
        """force entry for a cdf root: a plain int applies always; a
        (value, prob) tuple applies with probability prob (else the
        symbol samples normally) — used to bias mode statistics toward
        encoder-shaped content (e.g. mostly-inter frames)."""
        v = self.force.get(id(root))
        if isinstance(v, tuple):
            val, p = v
            return val if self.rng.random() < p else None
        return v

    def _pick_symbol(self, cdf, n_symbols: int) -> int:
        root = cdf.base if cdf.base is not None else cdf
        fv = self._forced_value(root)
        if fv is not None:
            return min(fv, n_symbols)
        bad = self._forbidden(cdf)
        if self.rng.random() < self.mix:
            allowed = [v for v in range(n_symbols + 1) if v not in bad]
            return int(self.rng.choice(allowed))
        # sample from the actual distribution: cdf[i] = Q15 inverse cdf
        probs = np.empty(n_symbols + 1, np.float64)
        prev = 32768
        for i in range(n_symbols):
            cur = int(cdf[i])
            probs[i] = max(prev - cur, 1)
            prev = cur
        probs[n_symbols] = max(prev, 1)
        for v in bad:
            if v <= n_symbols:
                probs[v] = 0
        probs /= probs.sum()
        return int(self.rng.choice(n_symbols + 1, p=probs))

    def _pick_bool(self, f: int) -> int:
        if self.rng.random() < self.mix:
            return int(self.rng.integers(0, 2))
        return int(self.rng.random() < f / 32768.0)

    # -- MsacDecoder interface ------------------------------------------
    def decode_symbol_adapt(self, cdf, n_symbols: int) -> int:
        val = self._pick_symbol(cdf, n_symbols)
        self.enc.encode_symbol(cdf, val, n_symbols)
        return val

    def decode_bool_adapt(self, cdf) -> int:
        root = cdf.base if cdf.base is not None else cdf
        bit = self._forced_value(root)
        if bit is None:
            bit = self._pick_bool(int(cdf[0]))
        self.enc.encode_bool_adapt(bit, cdf)
        return bit

    def decode_bool(self, f: int) -> int:
        bit = self.force_bool if self.force_bool is not None \
            else self._pick_bool(f)
        self.enc.encode_bool(bit, f)
        return bit

    def decode_bool_equi(self) -> int:
        bit = int(self.rng.integers(0, 2))
        self.enc.encode_bool_equi(bit)
        return bit

    def decode_bools(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bool_equi()
        return v

    def decode_uniform(self, n: int) -> int:
        assert n > 0
        l = n.bit_length()
        m = (1 << l) - n
        val = int(self.rng.integers(0, n))
        self.enc.encode_uniform(val, n)
        return val

    def decode_subexp(self, ref: int, n: int, k: int) -> int:
        assert n >> k == 8
        a = 0
        if self.decode_bool_equi():
            if self.decode_bool_equi():
                k += self.decode_bool_equi() + 1
            a = 1 << k
        v = self.decode_bools(k) + a
        from dav1d_tpu.bitstream.getbits import inv_recenter
        return (inv_recenter(ref, v) if ref * 2 <= n
                else n - 1 - inv_recenter(n - 1 - ref, v))

    def decode_hi_tok(self, cdf) -> int:
        # mirror MsacDecoder.decode_hi_tok's chunking
        tok_br = self.decode_symbol_adapt(cdf, 3)
        tok = 3 + tok_br
        if tok_br == 3:
            tok_br = self.decode_symbol_adapt(cdf, 3)
            tok = 6 + tok_br
            if tok_br == 3:
                tok_br = self.decode_symbol_adapt(cdf, 3)
                tok = 9 + tok_br
                if tok_br == 3:
                    tok = 12 + self.decode_symbol_adapt(cdf, 3)
        return tok


def apply_coder_restrictions(coder, seq, cdf):
    """Keep sampled symbols inside what the reference accepts:
    4:2:2 forbids vertical partition shapes (reference decode.c:2151-2156,
    2356-2357)."""
    from dav1d_tpu.entropy import levels as lv
    if int(seq.layout) == 2:   # I422
        coder.forbid[id(cdf.m.partition)] = {
            lv.PARTITION_V, lv.PARTITION_V4,
            lv.PARTITION_T_LEFT_SPLIT, lv.PARTITION_T_RIGHT_SPLIT}
        coder.force_bool = 1   # edge-branch !is_split would imply V


# ---------------------------------------------------------------------------
# header writers
# ---------------------------------------------------------------------------

def write_seq_hdr(width: int, height: int, *, sb128=0, filter_intra=1,
                  intra_edge_filter=1, cdef=0, restoration=0, hbd=0,
                  order_hint=0, screen_content=0, monochrome=0,
                  inter_intra=0, masked_compound=0, warped_motion=0,
                  dual_filter=0, jnt_comp=0, ref_frame_mvs=0,
                  film_grain=0, super_res=0, layout=1,
                  operating_points=None) -> bytes:
    """Sequence header matching parse_seq_hdr field order (reference
    obu.c:72-300). layout: 0=I400(monochrome) 1=I420 2=I422 3=I444;
    hbd: 0=8-bit 1=10-bit 2=12-bit. The profile is derived:
    420/mono 8-10bit -> 0, 444 8-10bit -> 1, 422 or 12-bit -> 2."""
    if monochrome:
        layout = 0
    if hbd == 2 or layout == 2:
        profile = 2
    elif layout == 3:
        profile = 1
    else:
        profile = 0
    pb = PutBits()
    pb.put_bits(profile, 3)
    pb.put_bit(0)            # still_picture
    pb.put_bit(0)            # reduced_still_picture_header
    pb.put_bit(0)            # timing_info_present
    pb.put_bit(0)            # display_model_info_present
    # operating points (SVC layer filtering, reference obu.c:1203-1210):
    # each entry is a 12-bit idc — bits 0-7 temporal-layer mask,
    # bits 8-11 spatial-layer mask; idc 0 = "applies to all"
    ops = operating_points or [0]
    pb.put_bits(len(ops) - 1, 5)   # num_operating_points - 1
    for idc in ops:
        pb.put_bits(idc, 12)       # op[i].idc
        pb.put_bits(0, 3)          # major_level - 2 (level 2.0)
        pb.put_bits(0, 2)          # minor_level
    # no tier (major_level <= 3), no decoder/display model params
    pb.put_bits(15, 4)       # width_n_bits - 1 = 16 bits
    pb.put_bits(15, 4)       # height_n_bits - 1
    pb.put_bits(width - 1, 16)
    pb.put_bits(height - 1, 16)
    pb.put_bit(0)            # frame_id_numbers_present
    pb.put_bit(sb128)
    pb.put_bit(filter_intra)
    pb.put_bit(intra_edge_filter)
    pb.put_bit(inter_intra)
    pb.put_bit(masked_compound)
    pb.put_bit(warped_motion)
    pb.put_bit(dual_filter)
    pb.put_bit(order_hint)   # order_hint
    if order_hint:
        pb.put_bit(jnt_comp)
        pb.put_bit(ref_frame_mvs)
    # screen_content_tools: 0 => write (0,0); 2 (adaptive) => (1)
    if screen_content == 2:
        pb.put_bit(1)
    else:
        pb.put_bit(0)
        pb.put_bit(screen_content)
    if screen_content:
        # force_integer_mv: adaptive => 1; else (0, value)
        pb.put_bit(1)
    if order_hint:
        pb.put_bits(6, 3)    # order_hint_n_bits - 1 = 7
    pb.put_bit(super_res)    # super_res
    pb.put_bit(cdef)
    pb.put_bit(restoration)
    pb.put_bit(1 if hbd else 0)   # hbd
    if profile == 2 and hbd:
        pb.put_bit(1 if hbd == 2 else 0)   # twelve_bit
    if profile != 1:
        pb.put_bit(monochrome)
    pb.put_bit(0)            # color_description_present
    if monochrome:
        pb.put_bit(0)        # color_range
    else:
        pb.put_bit(0)        # color_range (studio)
        ss_hor = 1 if layout in (1, 2) else 0
        ss_ver = 1 if layout == 1 else 0
        if profile == 2 and hbd == 2:
            pb.put_bit(ss_hor)
            if ss_hor:
                pb.put_bit(ss_ver)
        if ss_hor and ss_ver:
            pb.put_bits(0, 2)    # chroma sample position (420)
        pb.put_bit(0)        # separate_uv_delta_q
    pb.put_bit(film_grain)   # film_grain_present
    pb.trailing_bits()
    return wrap_obu(ObuType.SEQ_HDR, pb.data())






def _write_segmentation(pb, seg_cfg, primary_none, update_map=1,
                        temporal=0, update_data=1):
    """Segmentation params mirroring _parse_segmentation (obu.py) /
    reference obu.c:600-660. seg_cfg: list of up to 8 per-seg dicts."""
    pb.put_bit(1)                       # enabled
    if not primary_none:
        pb.put_bit(update_map)
        if update_map:
            pb.put_bit(temporal)
        pb.put_bit(update_data)
        if not update_data:
            return
    for i in range(8):
        d = seg_cfg[i] if i < len(seg_cfg) else {}
        dq = d.get("delta_q", 0)
        pb.put_bit(1 if dq else 0)
        if dq:
            pb.put_bits(dq & 0x1FF, 9)
        for k in ("delta_lf_y_v", "delta_lf_y_h", "delta_lf_u",
                  "delta_lf_v"):
            v = d.get(k, 0)
            pb.put_bit(1 if v else 0)
            if v:
                pb.put_bits(v & 0x7F, 7)
        ref = d.get("ref", -1)
        pb.put_bit(1 if ref >= 0 else 0)
        if ref >= 0:
            pb.put_bits(ref, 3)
        pb.put_bit(d.get("skip", 0))
        pb.put_bit(d.get("globalmv", 0))


def _write_film_grain(pb, seq, fg, is_inter):
    """Film grain payload mirroring _parse_film_grain (obu.py) /
    reference obu.c:1066-1145. fg: dict of FilmGrainData-ish fields."""
    pb.put_bit(1)                       # film_grain_present
    pb.put_bits(fg["seed"], 16)
    if is_inter:
        pb.put_bit(1)                   # update (fresh params)
    ypts = fg.get("y_points", [])
    pb.put_bits(len(ypts), 4)
    for v, sc in ypts:
        pb.put_bits(v, 8)
        pb.put_bits(sc, 8)
    csfl = fg.get("chroma_scaling_from_luma", 0)
    if not seq.monochrome:
        pb.put_bit(csfl)
    uvpts = fg.get("uv_points", [[], []])
    if not (seq.monochrome or csfl or
            (seq.ss_ver == 1 and seq.ss_hor == 1 and not ypts)):
        for pl in range(2):
            pb.put_bits(len(uvpts[pl]), 4)
            for v, sc in uvpts[pl]:
                pb.put_bits(v, 8)
                pb.put_bits(sc, 8)
    else:
        uvpts = [[], []]
    pb.put_bits(fg.get("scaling_shift", 8) - 8, 2)
    lag = fg.get("ar_coeff_lag", 0)
    pb.put_bits(lag, 2)
    n_y = 2 * lag * (lag + 1)
    if ypts:
        for c in fg.get("ar_coeffs_y", [0] * n_y)[:n_y]:
            pb.put_bits(c + 128, 8)
    for pl in range(2):
        if uvpts[pl] or csfl:
            n_uv = n_y + (1 if ypts else 0)
            for c in fg.get("ar_coeffs_uv", [[0] * 25, [0] * 25])[pl][:n_uv]:
                pb.put_bits(c + 128, 8)
    pb.put_bits(fg.get("ar_coeff_shift", 6) - 6, 2)
    pb.put_bits(fg.get("grain_scale_shift", 0), 2)
    for pl in range(2):
        if uvpts[pl]:
            pb.put_bits(fg.get("uv_mult", [0, 0])[pl] + 128, 8)
            pb.put_bits(fg.get("uv_luma_mult", [64, 64])[pl] + 128, 8)
            pb.put_bits(fg.get("uv_offset", [0, 0])[pl] + 256, 9)
    pb.put_bit(fg.get("overlap_flag", 1))
    pb.put_bit(fg.get("clip_to_restricted_range", 0))


def write_key_frame_hdr(seq, *, qidx=100, disable_cdf_update=0,
                        txfm_switchable=1, reduced_txtp=0, qm=0,
                        lf_levels=(0, 0, 0, 0), lf_sharpness=0,
                        mode_ref_delta=0, cdef_params=None,
                        lr_types=(0, 0, 0), lr_unit_shift=0,
                        lr_uv_shift=0, film_grain=None, allow_sct=0,
                        force_integer_mv=0, allow_intrabc=0,
                        segmentation=None,
                        write_render_size=0, superres_denom=8,
                        tile_log2_cols=0, tile_log2_rows=0,
                        delta_q=0, delta_lf=0) -> PutBits:
    """Key-frame header payload (no OBU wrap), matching parse_frame_hdr.
    cdef_params: (damping-3, n_bits, [y...], [uv...]) or None."""
    pb = PutBits()
    pb.put_bit(0)            # show_existing_frame
    pb.put_bits(0, 2)        # frame_type = KEY
    pb.put_bit(1)            # show_frame
    # error_resilient: implied (KEY && show), no bit
    pb.put_bit(disable_cdf_update)
    if seq.screen_content_tools == 2:  # ADAPTIVE -> per-frame bit
        pb.put_bit(allow_sct)
    else:
        allow_sct = int(seq.screen_content_tools)
    if allow_sct and seq.force_integer_mv == 2:
        pb.put_bit(force_integer_mv)
    pb.put_bit(0)            # frame_size_override
    if seq.order_hint:
        pb.put_bits(0, seq.order_hint_n_bits)  # frame_offset
    # primary_ref: KEY -> none; refresh flags: KEY+show -> 0xff, no bits
    # frame size: override=0 -> from seq
    if seq.super_res:
        pb.put_bit(1 if superres_denom > 8 else 0)
        if superres_denom > 8:
            pb.put_bits(superres_denom - 9, 3)
    pb.put_bit(write_render_size)  # have_render_size
    if allow_sct and superres_denom == 8:
        # super-res on -> no allow_intrabc bit (parser forces 0)
        pb.put_bit(allow_intrabc)
    if not disable_cdf_update:
        pb.put_bit(0)        # 1 - refresh_context => refresh on
    # tiling: uniform
    pb.put_bit(1)
    sbsz_log2 = 6 + seq.sb128
    cw = seq.max_width
    if superres_denom > 8:     # tiling runs on the coded (downscaled) width
        cw = max((cw * 8 + (superres_denom >> 1)) // superres_denom,
                 min(16, cw))
    sbw = (cw + (1 << sbsz_log2) - 1) >> sbsz_log2
    sbh = (seq.max_height + (1 << sbsz_log2) - 1) >> sbsz_log2
    from dav1d_tpu.bitstream.obu import tile_log2
    max_tw_sb = 4096 >> sbsz_log2
    min_log2_cols = tile_log2(max_tw_sb, sbw)
    max_log2_cols = tile_log2(1, min(sbw, 64))
    max_log2_rows = tile_log2(1, min(sbh, 64))
    min_log2_tiles = max(tile_log2((4096 * 2304) >> (2 * sbsz_log2), sbw * sbh),
                         min_log2_cols)
    assert tile_log2_cols >= min_log2_cols
    for _ in range(tile_log2_cols - min_log2_cols):
        pb.put_bit(1)
    if tile_log2_cols < max_log2_cols:
        pb.put_bit(0)
    min_log2_rows = max(min_log2_tiles - tile_log2_cols, 0)
    assert tile_log2_rows >= min_log2_rows
    for _ in range(tile_log2_rows - min_log2_rows):
        pb.put_bit(1)
    if tile_log2_rows < max_log2_rows:
        pb.put_bit(0)
    if tile_log2_cols or tile_log2_rows:
        pb.put_bits(0, tile_log2_cols + tile_log2_rows)  # update tile id
        pb.put_bits(3, 2)    # tile size n_bytes - 1 = 4 bytes
    # quant
    pb.put_bits(qidx, 8)
    pb.put_bit(0)            # ydc_delta present
    if not seq.monochrome:
        # no diff_uv (separate off); udc/uac present bits
        pb.put_bit(0)
        pb.put_bit(0)
    pb.put_bit(qm)
    if qm:
        pb.put_bits(8, 4)    # qm_y
        pb.put_bits(8, 4)    # qm_u  (qm_v = qm_u, separate off)
    if segmentation is None:
        pb.put_bit(0)        # segmentation enabled
    else:
        _write_segmentation(pb, segmentation, primary_none=True)
    all_lossless = qidx == 0 and segmentation is None
    if qidx:
        pb.put_bit(delta_q)  # delta_q present
        if delta_q:
            pb.put_bits(0, 2)    # res_log2
            if not allow_intrabc:
                pb.put_bit(delta_lf)
                if delta_lf:
                    pb.put_bits(0, 2)
                    pb.put_bit(1)    # multi
    if not all_lossless and not allow_intrabc:
        # loopfilter (skipped entirely when all_lossless/intrabc)
        pb.put_bits(lf_levels[0], 6)
        pb.put_bits(lf_levels[1], 6)
        if not seq.monochrome and (lf_levels[0] or lf_levels[1]):
            pb.put_bits(lf_levels[2], 6)
            pb.put_bits(lf_levels[3], 6)
        pb.put_bits(lf_sharpness, 3)
        pb.put_bit(mode_ref_delta)   # mode_ref_delta_enabled
        if mode_ref_delta:
            pb.put_bit(0)            # no update (defaults / primary-ref)
    # cdef (only when not lossless/intrabc)
    if seq.cdef and not all_lossless and not allow_intrabc:
        damping, n_bits, ys, uvs = cdef_params or (0, 0, [0], [0])
        pb.put_bits(damping, 2)
        pb.put_bits(n_bits, 2)
        for i in range(1 << n_bits):
            pb.put_bits(ys[i], 6)
            if not seq.monochrome:
                pb.put_bits(uvs[i], 6)
    # restoration
    if seq.restoration and not all_lossless:
        t0, t1, t2 = lr_types
        pb.put_bits(t0, 2)
        if not seq.monochrome:
            pb.put_bits(t1, 2)
            pb.put_bits(t2, 2)
        if t0 or t1 or t2:
            pb.put_bit(1 if lr_unit_shift else 0)
            if lr_unit_shift and not seq.sb128:
                pb.put_bit(lr_unit_shift - 1)
            if (t1 or t2) and seq.layout == 1:
                pb.put_bit(lr_uv_shift)
    if not all_lossless:
        pb.put_bit(txfm_switchable)   # txfm mode
    # KEY: no comp refs / skip mode / warp / gmv
    pb.put_bit(reduced_txtp)
    if seq.film_grain_present:
        if film_grain:
            _write_film_grain(pb, seq, film_grain, is_inter=False)
        else:
            pb.put_bit(0)
    return pb


def generate_intra_stream(width, height, *, qidx=100, seed=0, sb128=0,
                          n_frames=1, uniform_mix=0.5, filter_intra=1,
                          qm=0, txfm_switchable=1, reduced_txtp=0,
                          disable_cdf_update=0, tile_log2_cols=0,
                          tile_log2_rows=0, delta_q=0, delta_lf=0,
                          hbd=0, force_skip=None, lf_levels=(0, 0, 0, 0),
                          lf_sharpness=0, mode_ref_delta=0,
                          cdef_params=None, lr_types=(0, 0, 0),
                          lr_unit_shift=0, lr_uv_shift=0,
                          film_grain=None, screen_content=0,
                          allow_intrabc=0, segmentation=None,
                          superres_denom=None, layout=1, monochrome=0):
    """Returns (ivf_bytes, list[(seq_hdr, frame_hdr, FramePlan)])."""
    seq_obu = write_seq_hdr(width, height, sb128=sb128,
                            filter_intra=filter_intra, hbd=hbd,
                            cdef=1 if cdef_params else 0,
                            restoration=1 if any(lr_types) else 0,
                            film_grain=1 if film_grain else 0,
                            screen_content=screen_content,
                            super_res=1 if superres_denom else 0,
                            layout=layout, monochrome=monochrome)
    # parse back our own header for a single source of truth
    seq = obu_mod.parse_sequence_header_standalone(seq_obu)

    out = io.BytesIO()
    w = ivf.IvfWriter(out, width, height)
    results = []
    for fi in range(n_frames):
        fh_pb = write_key_frame_hdr(
            seq, qidx=qidx, disable_cdf_update=disable_cdf_update,
            txfm_switchable=txfm_switchable, reduced_txtp=reduced_txtp,
            qm=qm, tile_log2_cols=tile_log2_cols,
            tile_log2_rows=tile_log2_rows, delta_q=delta_q,
            delta_lf=delta_lf, lf_levels=lf_levels,
            lf_sharpness=lf_sharpness, mode_ref_delta=mode_ref_delta,
            cdef_params=cdef_params, lr_types=lr_types,
            lr_unit_shift=lr_unit_shift, lr_uv_shift=lr_uv_shift,
            film_grain=film_grain, allow_sct=1 if screen_content else 0,
            force_integer_mv=1 if allow_intrabc else 0,
            allow_intrabc=allow_intrabc, segmentation=segmentation,
            superres_denom=superres_denom or 8)
        fh_pb.trailing_bits()
        fh_obu_payload = fh_pb.data()

        # parse the frame header back with our parser
        st = obu_mod.ParserState(seq_hdr=seq)
        from dav1d_tpu.bitstream.headers import FrameHeader
        st.frame_hdr = FrameHeader()
        gb = GetBits(fh_obu_payload)
        obu_mod.parse_frame_hdr(st, gb)
        fh = st.frame_hdr

        # generate tile payloads
        f = FrameContext(seq, fh)
        if fh.allow_intrabc:
            from dav1d_tpu.entropy.refmvs import RefMvsFrame
            f.rf = RefMvsFrame(seq, fh, [0] * 7,
                               [[0] * 7 for _ in range(7)], [None] * 7)
        plan = FramePlan(f)
        in_cdf = CdfContext.default(fh.quant.yac)
        tile_payloads = []
        n_cols, n_rows = fh.tiling.cols, fh.tiling.rows
        for tr in range(n_rows):
            for tc in range(n_cols):
                cdf = in_cdf.copy()
                coder = GenCoder(seed * 1000 + fi * 100 + tr * 10 + tc,
                                 uniform_mix=uniform_mix,
                                 disable_cdf_update=disable_cdf_update)
                if force_skip is not None:
                    coder.force[id(cdf.m.skip)] = force_skip
                apply_coder_restrictions(coder, seq, cdf)
                tp = TileParser(f, plan, b"", tr, tc, cdf)
                tp.msac = coder
                tp.parse_tile()
                tile_payloads.append(coder.enc.finalize())

        # assemble tile group OBU: no tile_start_and_end (full group);
        # per-tile sizes (n_bytes=4) except last
        tg = PutBits()
        n_tiles = n_cols * n_rows
        if n_tiles > 1:
            tg.put_bit(0)    # tile_start_and_end_present
        tg.bytealign()
        body = tg.data()
        for i, pay in enumerate(tile_payloads):
            if i < n_tiles - 1:
                # tile_size_minus_1, little-endian n_bytes (reference
                # decode.c:3158-3166)
                body += (len(pay) - 1).to_bytes(4, "little") + pay
            else:
                body += pay
        frame_data = (seq_obu if fi == 0 else b"") + \
            wrap_obu(ObuType.FRAME_HDR, fh_obu_payload) + \
            wrap_obu(ObuType.TILE_GRP, body)
        w.write_frame(frame_data)
        results.append((seq, fh, plan))
    w.finalize()
    return out.getvalue(), results


# ---------------------------------------------------------------------------
# inter frames
# ---------------------------------------------------------------------------

def _recenter(r: int, v: int) -> int:
    """Inverse of inv_recenter (getbits.py)."""
    if v > 2 * r:
        return v
    d = v - r
    return 2 * d if d >= 0 else 2 * (-d) - 1


def _put_uniform(pb: PutBits, mx: int, val: int) -> None:
    """Inverse of GetBits.get_uniform."""
    assert mx > 1 and 0 <= val < mx
    l = mx.bit_length()
    m = (1 << l) - mx
    if val < m:
        pb.put_bits(val, l - 1)
    else:
        w = val + m
        pb.put_bits(w >> 1, l - 1)
        pb.put_bit(w & 1)


def _put_subexp_u(pb: PutBits, t: int, ref: int, n: int) -> None:
    """Inverse of GetBits._subexp_u: emit value t in [0, n]."""
    v = _recenter(ref, t) if ref * 2 <= n else _recenter(n - ref, n - t)
    acc, i = 0, 0
    while True:
        b = 3 + i - 1 if i else 3
        if n < acc + 3 * (1 << b):
            _put_uniform(pb, n - acc + 1, v - acc)
            return
        if v - acc < (1 << b):
            pb.put_bit(0)
            pb.put_bits(v - acc, b)
            return
        pb.put_bit(1)
        acc += 1 << b
        i += 1


def put_bits_subexp(pb: PutBits, value: int, ref: int, n: int) -> None:
    """Inverse of GetBits.get_bits_subexp (value in [-(1<<n), 1<<n])."""
    _put_subexp_u(pb, value + (1 << n), ref + (1 << n), 2 << n)


def _write_gmv(pb: PutBits, gmv, ref_gmv_list, hp: int) -> None:
    """Global motion params writer mirroring _parse_gmv (obu.py) /
    reference obu.c:1011-1060. gmv: list of 7 WarpedMotionParams;
    ref_gmv_list: the primary-ref frame's gmv (or identity list)."""
    from dav1d_tpu.bitstream.headers import WarpedMotionType as WMT
    for i in range(7):
        g = gmv[i]
        if g.type == WMT.IDENTITY:
            pb.put_bit(0)
            continue
        pb.put_bit(1)
        if g.type == WMT.ROT_ZOOM:
            pb.put_bit(1)
        else:
            pb.put_bit(0)
            pb.put_bit(1 if g.type == WMT.TRANSLATION else 0)
        ref_mat = ref_gmv_list[i].matrix
        mat = g.matrix
        if g.type >= WMT.ROT_ZOOM:
            assert (mat[2] - (1 << 16)) % 2 == 0 and mat[3] % 2 == 0
            put_bits_subexp(pb, (mat[2] - (1 << 16)) >> 1,
                            (ref_mat[2] - (1 << 16)) >> 1, 12)
            put_bits_subexp(pb, mat[3] >> 1, ref_mat[3] >> 1, 12)
            bits, shift = 12, 10
        else:
            bits = 9 - (not hp)
            shift = 13 + (not hp)
        if g.type == WMT.AFFINE:
            put_bits_subexp(pb, mat[4] >> 1, ref_mat[4] >> 1, 12)
            put_bits_subexp(pb, (mat[5] - (1 << 16)) >> 1,
                            (ref_mat[5] - (1 << 16)) >> 1, 12)
        assert mat[0] % (1 << shift) == 0 and mat[1] % (1 << shift) == 0
        put_bits_subexp(pb, mat[0] >> shift, ref_mat[0] >> shift, bits)
        put_bits_subexp(pb, mat[1] >> shift, ref_mat[1] >> shift, bits)


def make_gmv(rng, types, hp=1):
    """Build 7 random-but-representable WarpedMotionParams.
    types: list of 7 WarpedMotionType values."""
    from dav1d_tpu.bitstream.headers import (WarpedMotionParams,
                                             WarpedMotionType as WMT)
    out = []
    for t in types:
        g = WarpedMotionParams()
        g.type = t
        m = g.matrix
        if t >= WMT.ROT_ZOOM:
            shift = 10
            m[2] = (1 << 16) + 2 * rng.integers(-40, 41)
            m[3] = 2 * rng.integers(-40, 41)
            if t == WMT.AFFINE:
                m[4] = 2 * rng.integers(-40, 41)
                m[5] = (1 << 16) + 2 * rng.integers(-40, 41)
            else:
                m[4] = -m[3]
                m[5] = m[2]
        else:
            shift = 13 + (not hp)
        if t != WMT.IDENTITY:
            m[0] = rng.integers(-8, 9) * (1 << shift)
            m[1] = rng.integers(-8, 9) * (1 << shift)
        out.append(g)
    return out


def write_inter_frame_hdr(seq, *, poc, refidx=(0,) * 7, qidx=100,
                          primary_ref=7, refresh_flags=0x01,
                          disable_cdf_update=0, txfm_switchable=1,
                          reduced_txtp=0, qm=0, hp=1,
                          subpel_filter_switchable=1, subpel_filter=0,
                          switchable_motion_mode=0, use_ref_frame_mvs=0,
                          switchable_comp_refs=0, skip_mode_allowed=0,
                          skip_mode=0, warp_motion=0, gmv=None,
                          ref_gmv=None, error_resilient=0,
                          tile_log2_cols=0, tile_log2_rows=0,
                          delta_q=0, delta_lf=0,
                          lf_levels=(0, 0, 0, 0), lf_sharpness=0,
                          mode_ref_delta=0, cdef_params=None,
                          lr_types=(0, 0, 0), lr_unit_shift=0,
                          lr_uv_shift=0, film_grain=None, allow_sct=0,
                          force_integer_mv=0, segmentation=None,
                          seg_update_map=1, seg_temporal=0,
                          seg_update_data=1, superres_denom=8,
                          frame_size=None) -> PutBits:
    """Inter frame header payload matching parse_frame_hdr's inter branch
    (reference obu.c:308-1152). skip_mode_allowed must be the value the
    parser will derive (it depends on ref-slot POCs the writer can't see)."""
    from dav1d_tpu.bitstream.headers import WarpedMotionParams
    pb = PutBits()
    pb.put_bit(0)                     # show_existing_frame
    pb.put_bits(1, 2)                 # frame_type = INTER
    pb.put_bit(1)                     # show_frame
    pb.put_bit(error_resilient)
    pb.put_bit(disable_cdf_update)
    if seq.screen_content_tools == 2:
        pb.put_bit(allow_sct)
    else:
        allow_sct = int(seq.screen_content_tools)
    if allow_sct and seq.force_integer_mv == 2:
        pb.put_bit(force_integer_mv)
    pb.put_bit(1 if frame_size else 0)  # frame_size_override
    if seq.order_hint:
        pb.put_bits(poc & ((1 << seq.order_hint_n_bits) - 1),
                    seq.order_hint_n_bits)
    if not error_resilient:
        pb.put_bits(primary_ref, 3)
    pb.put_bits(refresh_flags, 8)
    if error_resilient and seq.order_hint:
        for _ in range(8):
            pb.put_bits(0, seq.order_hint_n_bits)
    if seq.order_hint:
        pb.put_bit(0)                 # frame_ref_short_signaling
    for i in range(7):
        pb.put_bits(refidx[i], 3)
    # read_frame_size: override=1 -> 7 "use ref size" bits (all 0) then
    # an explicit size; else size from seq
    if frame_size:
        if not error_resilient:
            for _ in range(7):
                pb.put_bit(0)
        pb.put_bits(frame_size[0] - 1, seq.width_n_bits)
        pb.put_bits(frame_size[1] - 1, seq.height_n_bits)
    if seq.super_res:
        pb.put_bit(1 if superres_denom > 8 else 0)
        if superres_denom > 8:
            pb.put_bits(superres_denom - 9, 3)
    pb.put_bit(0)                     # have_render_size
    if not (allow_sct and force_integer_mv):
        pb.put_bit(hp)
    if subpel_filter_switchable:
        pb.put_bit(1)
    else:
        pb.put_bit(0)
        pb.put_bits(subpel_filter, 2)
    pb.put_bit(switchable_motion_mode)
    if not error_resilient and seq.ref_frame_mvs and seq.order_hint:
        pb.put_bit(use_ref_frame_mvs)
    if not disable_cdf_update:
        pb.put_bit(0)                 # !refresh_context
    # tiling (uniform), mirroring write_key_frame_hdr
    pb.put_bit(1)
    from dav1d_tpu.bitstream.obu import tile_log2
    sbsz_log2 = 6 + seq.sb128
    fw = frame_size[0] if frame_size else seq.max_width
    fhh = frame_size[1] if frame_size else seq.max_height
    if superres_denom > 8:
        fw = max((fw * 8 + (superres_denom >> 1)) // superres_denom,
                 min(16, fw))
    sbw = (fw + (1 << sbsz_log2) - 1) >> sbsz_log2
    sbh = (fhh + (1 << sbsz_log2) - 1) >> sbsz_log2
    max_tw_sb = 4096 >> sbsz_log2
    min_log2_cols = tile_log2(max_tw_sb, sbw)
    max_log2_cols = tile_log2(1, min(sbw, 64))
    max_log2_rows = tile_log2(1, min(sbh, 64))
    min_log2_tiles = max(
        tile_log2((4096 * 2304) >> (2 * sbsz_log2), sbw * sbh),
        min_log2_cols)
    assert tile_log2_cols >= min_log2_cols
    for _ in range(tile_log2_cols - min_log2_cols):
        pb.put_bit(1)
    if tile_log2_cols < max_log2_cols:
        pb.put_bit(0)
    min_log2_rows = max(min_log2_tiles - tile_log2_cols, 0)
    assert tile_log2_rows >= min_log2_rows
    for _ in range(tile_log2_rows - min_log2_rows):
        pb.put_bit(1)
    if tile_log2_rows < max_log2_rows:
        pb.put_bit(0)
    if tile_log2_cols or tile_log2_rows:
        pb.put_bits(0, tile_log2_cols + tile_log2_rows)
        pb.put_bits(3, 2)
    # quant
    pb.put_bits(qidx, 8)
    pb.put_bit(0)                     # ydc delta
    if not seq.monochrome:
        pb.put_bit(0)                 # udc
        pb.put_bit(0)                 # uac
    pb.put_bit(qm)
    if qm:
        pb.put_bits(8, 4)
        pb.put_bits(8, 4)
    if segmentation is None:
        pb.put_bit(0)                 # segmentation enabled
    else:
        _write_segmentation(pb, segmentation, primary_none=False,
                            update_map=seg_update_map,
                            temporal=seg_temporal,
                            update_data=seg_update_data)
    all_lossless = qidx == 0 and segmentation is None
    if qidx:
        pb.put_bit(delta_q)
        if delta_q:
            pb.put_bits(0, 2)
            pb.put_bit(delta_lf)
            if delta_lf:
                pb.put_bits(0, 2)
                pb.put_bit(1)        # multi
    if not all_lossless:
        pb.put_bits(lf_levels[0], 6)
        pb.put_bits(lf_levels[1], 6)
        if not seq.monochrome and (lf_levels[0] or lf_levels[1]):
            pb.put_bits(lf_levels[2], 6)
            pb.put_bits(lf_levels[3], 6)
        pb.put_bits(lf_sharpness, 3)
        pb.put_bit(mode_ref_delta)   # mode_ref_delta_enabled
        if mode_ref_delta:
            pb.put_bit(0)            # no update (inherit/defaults)
    if seq.cdef and not all_lossless:
        damping, n_bits, ys, uvs = cdef_params or (0, 0, [0], [0])
        pb.put_bits(damping, 2)
        pb.put_bits(n_bits, 2)
        for i in range(1 << n_bits):
            pb.put_bits(ys[i], 6)
            if not seq.monochrome:
                pb.put_bits(uvs[i], 6)
    if seq.restoration and not all_lossless:
        t0, t1, t2 = lr_types
        pb.put_bits(t0, 2)
        if not seq.monochrome:
            pb.put_bits(t1, 2)
            pb.put_bits(t2, 2)
        if t0 or t1 or t2:
            pb.put_bit(1 if lr_unit_shift else 0)
            if lr_unit_shift and not seq.sb128:
                pb.put_bit(lr_unit_shift - 1)
            if (t1 or t2) and seq.layout == 1:
                pb.put_bit(lr_uv_shift)
    if not all_lossless:
        pb.put_bit(txfm_switchable)
    pb.put_bit(switchable_comp_refs)
    if skip_mode_allowed:
        pb.put_bit(skip_mode)
    if not error_resilient and seq.warped_motion:
        pb.put_bit(warp_motion)
    pb.put_bit(reduced_txtp)
    if gmv is None:
        gmv = [WarpedMotionParams() for _ in range(7)]
    if ref_gmv is None:
        ref_gmv = [WarpedMotionParams() for _ in range(7)]
    _write_gmv(pb, gmv, ref_gmv, hp)
    if seq.film_grain_present:
        if film_grain:
            _write_film_grain(pb, seq, film_grain, is_inter=True)
        else:
            pb.put_bit(0)
    return pb


def _skip_mode_allowed(dec, seq, fh_like) -> int:
    """Derive skip_mode_allowed exactly as the parser will, using the
    generator-owned decoder's ref slots."""
    st = dec.state
    saved = st.frame_hdr
    st.frame_hdr = fh_like
    try:
        obu_mod._derive_skip_mode(st)
    finally:
        st.frame_hdr = saved
    return fh_like.skip_mode_allowed


def generate_stream(width, height, *, n_frames=4, qidx=100, seed=0,
                    sb128=0, uniform_mix=0.35, hp=1,
                    switchable_comp_refs=1, ref_frame_mvs=0,
                    use_ref_frame_mvs=0, jnt_comp=0, inter_intra=0,
                    masked_compound=0, warped_motion=0, dual_filter=0,
                    switchable_motion_mode=0, allow_skip_mode=0,
                    order_hints=None, refidx_fn=None, refresh_fn=None,
                    gmv_types=None, txfm_switchable=1, reduced_txtp=0,
                    disable_cdf_update=0, tile_log2_cols=0,
                    tile_log2_rows=0, force_skip=None, filter_intra=1,
                    primary_ref=0, subpel_filter_switchable=1,
                    subpel_filter=0, delta_q=0, delta_lf=0, hbd=0,
                    lf_levels=(0, 0, 0, 0), lf_sharpness=0,
                    mode_ref_delta=0, cdef_params=None,
                    lr_types=(0, 0, 0), lr_unit_shift=0, lr_uv_shift=0,
                    film_grain=None, screen_content=0, segmentation=None,
                    seg_update_map=1, seg_temporal=0, seg_update_data=1,
                    superres_denom=None, frame_size_fn=None, layout=1,
                    monochrome=0, temporal_ids=None,
                    operating_points=None, intra_prob=None):
    """Key frame + (n_frames-1) inter frames, generated by driving OUR
    decoder's own frame pipeline with a GenCoder (so generator ref/CDF
    state == decoder state by construction).

    order_hints: optional list of POCs (default 0..n-1).
    refidx_fn(fi) -> 7-tuple; refresh_fn(fi) -> refresh mask.
    gmv_types: optional fn(fi, rng) -> list of 7 WarpedMotionType.
    Returns (ivf_bytes, list[(seq, fh, FramePlan)])."""
    import numpy as _np
    from dav1d_tpu.bitstream.headers import (FrameHeader,
                                             WarpedMotionParams)
    from dav1d_tpu.decoder import ObuStreamDecoder

    seq_obu = write_seq_hdr(
        width, height, sb128=sb128, order_hint=1, jnt_comp=jnt_comp,
        ref_frame_mvs=ref_frame_mvs, inter_intra=inter_intra,
        masked_compound=masked_compound, warped_motion=warped_motion,
        dual_filter=dual_filter, filter_intra=filter_intra, hbd=hbd,
        cdef=1 if cdef_params else 0,
        restoration=1 if any(lr_types) else 0,
        operating_points=operating_points,
        film_grain=1 if film_grain else 0,
        screen_content=screen_content,
        super_res=1 if superres_denom else 0,
        layout=layout, monochrome=monochrome)
    seq = obu_mod.parse_sequence_header_standalone(seq_obu)

    dec = ObuStreamDecoder(do_recon=False)
    dec.state.seq_hdr = seq

    out = io.BytesIO()
    w = ivf.IvfWriter(out, width, height)
    results = []
    for fi in range(n_frames):
        poc = fi if order_hints is None else order_hints[fi]
        rng = _np.random.default_rng(seed * 77 + fi)
        if fi == 0:
            fh_pb = write_key_frame_hdr(
                seq, qidx=qidx, disable_cdf_update=disable_cdf_update,
                txfm_switchable=txfm_switchable,
                reduced_txtp=reduced_txtp,
                tile_log2_cols=tile_log2_cols,
                tile_log2_rows=tile_log2_rows,
                delta_q=delta_q, delta_lf=delta_lf, lf_levels=lf_levels,
                lf_sharpness=lf_sharpness, mode_ref_delta=mode_ref_delta,
                cdef_params=cdef_params, lr_types=lr_types,
                lr_unit_shift=lr_unit_shift, lr_uv_shift=lr_uv_shift,
                film_grain=film_grain,
                allow_sct=1 if screen_content else 0,
                segmentation=segmentation,
                superres_denom=superres_denom or 8)
        else:
            refidx = refidx_fn(fi) if refidx_fn else (0,) * 7
            refresh = refresh_fn(fi) if refresh_fn else 0x02
            # probe skip-mode allowance with a throwaway header
            probe = FrameHeader()
            probe.frame_type = 1
            probe.frame_offset = poc
            probe.switchable_comp_refs = switchable_comp_refs
            probe.refidx = list(refidx)
            sm_allowed = _skip_mode_allowed(dec, seq, probe)
            gmv = None
            ref_gmv = None
            if gmv_types is not None:
                gmv = make_gmv(rng, gmv_types(fi, rng), hp=hp)
                if primary_ref != 7:
                    ref_hdr = dec.state.refs[refidx[primary_ref]].frame_hdr
                    ref_gmv = ref_hdr.gmv if ref_hdr is not None and \
                        ref_hdr.gmv else None
            fh_pb = write_inter_frame_hdr(
                seq, poc=poc, refidx=refidx, qidx=qidx,
                primary_ref=primary_ref, refresh_flags=refresh, hp=hp,
                disable_cdf_update=disable_cdf_update,
                txfm_switchable=txfm_switchable,
                reduced_txtp=reduced_txtp,
                subpel_filter_switchable=subpel_filter_switchable,
                subpel_filter=subpel_filter,
                switchable_comp_refs=switchable_comp_refs,
                switchable_motion_mode=switchable_motion_mode,
                use_ref_frame_mvs=use_ref_frame_mvs,
                skip_mode_allowed=sm_allowed,
                skip_mode=allow_skip_mode and sm_allowed,
                warp_motion=warped_motion, gmv=gmv, ref_gmv=ref_gmv,
                tile_log2_cols=tile_log2_cols,
                tile_log2_rows=tile_log2_rows,
                delta_q=delta_q, delta_lf=delta_lf, lf_levels=lf_levels,
                lf_sharpness=lf_sharpness, mode_ref_delta=mode_ref_delta,
                cdef_params=cdef_params, lr_types=lr_types,
                lr_unit_shift=lr_unit_shift, lr_uv_shift=lr_uv_shift,
                film_grain=film_grain,
                allow_sct=1 if screen_content else 0,
                segmentation=segmentation,
                seg_update_map=seg_update_map, seg_temporal=seg_temporal,
                seg_update_data=seg_update_data,
                superres_denom=superres_denom or 8,
                frame_size=frame_size_fn(fi) if frame_size_fn else None)
        fh_pb.trailing_bits()
        fh_payload = fh_pb.data()

        st = dec.state
        st.frame_hdr = FrameHeader()
        gb = GetBits(fh_payload)
        obu_mod.parse_frame_hdr(st, gb)
        fh = st.frame_hdr

        def factory(tile_idx, cdf, _fi=fi):
            c = GenCoder(seed * 1000 + _fi * 100 + tile_idx,
                         uniform_mix=uniform_mix,
                         disable_cdf_update=disable_cdf_update)
            if force_skip is not None:
                c.force[id(cdf.m.skip)] = force_skip
            if intra_prob is not None:
                # encoder-shaped mode statistics: force the is-inter
                # bool (1 = inter) except with probability intra_prob,
                # where the symbol samples normally
                c.force[id(cdf.m.intra)] = (1, 1.0 - intra_prob)
            apply_coder_restrictions(c, seq, cdf)
            return c

        plan = dec._decode_frame(coder_factory=factory)
        payloads = dec.last_tile_payloads
        results.append((seq, fh, plan))

        tg = PutBits()
        n_tiles = fh.tiling.cols * fh.tiling.rows
        if n_tiles > 1:
            tg.put_bit(0)    # tile_start_and_end_present
        tg.bytealign()
        body = tg.data()
        for i, pay in enumerate(payloads):
            if i < n_tiles - 1:
                body += (len(pay) - 1).to_bytes(4, "little") + pay
            else:
                body += pay
        tid = temporal_ids[fi] if temporal_ids else 0
        frame_data = (seq_obu if fi == 0 else b"") + \
            wrap_obu(ObuType.FRAME_HDR, fh_payload,
                     has_extension=tid > 0, temporal_id=tid) + \
            wrap_obu(ObuType.TILE_GRP, body,
                     has_extension=tid > 0, temporal_id=tid)
        w.write_frame(frame_data)
    w.finalize()
    return out.getvalue(), results
