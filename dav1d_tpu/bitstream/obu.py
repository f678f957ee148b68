"""AV1 OBU parsing: sequence/frame/tile headers and metadata.

Behavioral parity with the reference parser (reference src/obu.c:72-300
parse_seq_hdr, 341-400 read_frame_size, 409-1152 parse_frame_hdr,
1154-1167 parse_tile_hdr, 1169+ dav1d_parse_obus), written fresh for this
codebase. Operates on a ParserState that carries the 8-slot reference
header state needed for inter-frame header fields.
"""
from __future__ import annotations

import copy
from dataclasses import dataclass, field

from .getbits import GetBits
from .headers import (
    AdaptiveBoolean, ChromaSamplePosition, ColorPrimaries, ContentLightLevel,
    FilmGrainData, FilterMode, FrameHeader, FrameType, ITUTT35,
    MasteringDisplay, MatrixCoefficients, MAX_CDEF_STRENGTHS, MAX_SEGMENTS,
    MAX_TILE_COLS, MAX_TILE_ROWS, ObuType, OperatingPoint, PixelLayout,
    PRIMARY_REF_NONE, RestorationType, SequenceHeader, SegmentationData,
    TransferCharacteristics, TxfmMode, WarpedMotionParams, WarpedMotionType,
)


class ParseError(Exception):
    pass


def get_poc_diff(order_hint_n_bits: int, poc0: int, poc1: int) -> int:
    """Signed order-hint distance (reference src/env.h:237-244)."""
    if not order_hint_n_bits:
        return 0
    mask = 1 << (order_hint_n_bits - 1)
    diff = poc0 - poc1
    return (diff & (mask - 1)) - (diff & mask)


def iclip_u8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def tile_log2(sz: int, tgt: int) -> int:
    k = 0
    while (sz << k) < tgt:
        k += 1
    return k


# ---------------------------------------------------------------------------
# sequence header
# ---------------------------------------------------------------------------

def parse_seq_hdr(gb: GetBits, strict: bool = False) -> SequenceHeader:
    h = SequenceHeader()
    h.profile = gb.get_bits(3)
    if h.profile > 2:
        raise ParseError("bad profile")
    h.still_picture = gb.get_bit()
    h.reduced_still_picture_header = gb.get_bit()
    if h.reduced_still_picture_header and not h.still_picture:
        raise ParseError("reduced_still_picture without still_picture")

    h.operating_points = [OperatingPoint() for _ in range(32)]
    if h.reduced_still_picture_header:
        h.num_operating_points = 1
        op = h.operating_points[0]
        op.major_level = gb.get_bits(3)
        op.minor_level = gb.get_bits(2)
        op.initial_display_delay = 10
    else:
        h.timing_info_present = gb.get_bit()
        if h.timing_info_present:
            h.num_units_in_tick = gb.get_bits(32)
            h.time_scale = gb.get_bits(32)
            if strict and (not h.num_units_in_tick or not h.time_scale):
                raise ParseError("bad timing info")
            h.equal_picture_interval = gb.get_bit()
            if h.equal_picture_interval:
                v = gb.get_vlc()
                if v == 0xFFFFFFFF:
                    raise ParseError("bad num_ticks_per_picture")
                h.num_ticks_per_picture = v + 1
            h.decoder_model_info_present = gb.get_bit()
            if h.decoder_model_info_present:
                h.encoder_decoder_buffer_delay_length = gb.get_bits(5) + 1
                h.num_units_in_decoding_tick = gb.get_bits(32)
                if strict and not h.num_units_in_decoding_tick:
                    raise ParseError("bad decoding tick")
                h.buffer_removal_delay_length = gb.get_bits(5) + 1
                h.frame_presentation_delay_length = gb.get_bits(5) + 1
        h.display_model_info_present = gb.get_bit()
        h.num_operating_points = gb.get_bits(5) + 1
        for i in range(h.num_operating_points):
            op = h.operating_points[i]
            op.idc = gb.get_bits(12)
            if op.idc and (not (op.idc & 0xFF) or not (op.idc & 0xF00)):
                raise ParseError("bad operating point idc")
            op.major_level = 2 + gb.get_bits(3)
            op.minor_level = gb.get_bits(2)
            if op.major_level > 3:
                op.tier = gb.get_bit()
            if h.decoder_model_info_present:
                op.decoder_model_param_present = gb.get_bit()
                if op.decoder_model_param_present:
                    op.decoder_buffer_delay = gb.get_bits(h.encoder_decoder_buffer_delay_length)
                    op.encoder_buffer_delay = gb.get_bits(h.encoder_decoder_buffer_delay_length)
                    op.low_delay_mode = gb.get_bit()
            if h.display_model_info_present:
                op.display_model_param_present = gb.get_bit()
            op.initial_display_delay = gb.get_bits(4) + 1 if op.display_model_param_present else 10

    h.width_n_bits = gb.get_bits(4) + 1
    h.height_n_bits = gb.get_bits(4) + 1
    h.max_width = gb.get_bits(h.width_n_bits) + 1
    h.max_height = gb.get_bits(h.height_n_bits) + 1
    if not h.reduced_still_picture_header:
        h.frame_id_numbers_present = gb.get_bit()
        if h.frame_id_numbers_present:
            h.delta_frame_id_n_bits = gb.get_bits(4) + 2
            h.frame_id_n_bits = gb.get_bits(3) + h.delta_frame_id_n_bits + 1

    h.sb128 = gb.get_bit()
    h.filter_intra = gb.get_bit()
    h.intra_edge_filter = gb.get_bit()
    if h.reduced_still_picture_header:
        h.screen_content_tools = AdaptiveBoolean.ADAPTIVE
        h.force_integer_mv = AdaptiveBoolean.ADAPTIVE
    else:
        h.inter_intra = gb.get_bit()
        h.masked_compound = gb.get_bit()
        h.warped_motion = gb.get_bit()
        h.dual_filter = gb.get_bit()
        h.order_hint = gb.get_bit()
        if h.order_hint:
            h.jnt_comp = gb.get_bit()
            h.ref_frame_mvs = gb.get_bit()
        h.screen_content_tools = AdaptiveBoolean.ADAPTIVE if gb.get_bit() else gb.get_bit()
        h.force_integer_mv = (
            (AdaptiveBoolean.ADAPTIVE if gb.get_bit() else gb.get_bit())
            if h.screen_content_tools else 2)
        if h.order_hint:
            h.order_hint_n_bits = gb.get_bits(3) + 1
    h.super_res = gb.get_bit()
    h.cdef = gb.get_bit()
    h.restoration = gb.get_bit()

    h.hbd = gb.get_bit()
    if h.profile == 2 and h.hbd:
        h.hbd += gb.get_bit()
    if h.profile != 1:
        h.monochrome = gb.get_bit()
    h.color_description_present = gb.get_bit()
    if h.color_description_present:
        h.pri = gb.get_bits(8)
        h.trc = gb.get_bits(8)
        h.mtrx = gb.get_bits(8)
    else:
        h.pri = ColorPrimaries.UNKNOWN
        h.trc = TransferCharacteristics.UNKNOWN
        h.mtrx = MatrixCoefficients.UNKNOWN
    if h.monochrome:
        h.color_range = gb.get_bit()
        h.layout = PixelLayout.I400
        h.ss_hor = h.ss_ver = 1
        h.chr = ChromaSamplePosition.UNKNOWN
    elif (h.pri == ColorPrimaries.BT709 and h.trc == TransferCharacteristics.SRGB
          and h.mtrx == MatrixCoefficients.IDENTITY):
        h.layout = PixelLayout.I444
        h.color_range = 1
        if h.profile != 1 and not (h.profile == 2 and h.hbd == 2):
            raise ParseError("identity matrix requires 4:4:4-capable profile")
    else:
        h.color_range = gb.get_bit()
        if h.profile == 0:
            h.layout = PixelLayout.I420
            h.ss_hor = h.ss_ver = 1
        elif h.profile == 1:
            h.layout = PixelLayout.I444
        else:
            if h.hbd == 2:
                h.ss_hor = gb.get_bit()
                if h.ss_hor:
                    h.ss_ver = gb.get_bit()
            else:
                h.ss_hor = 1
            h.layout = (PixelLayout.I420 if h.ss_ver else PixelLayout.I422) \
                if h.ss_hor else PixelLayout.I444
        h.chr = gb.get_bits(2) if (h.ss_hor & h.ss_ver) else ChromaSamplePosition.UNKNOWN
    if strict and h.mtrx == MatrixCoefficients.IDENTITY and h.layout != PixelLayout.I444:
        raise ParseError("identity matrix requires 4:4:4")
    if not h.monochrome:
        h.separate_uv_delta_q = gb.get_bit()
    h.film_grain_present = gb.get_bit()

    # trailing bit
    trailing_one = gb.get_bit()
    if gb.error:
        raise ParseError("overrun in sequence header")
    if strict and not trailing_one:
        raise ParseError("bad trailing bit")
    return h


# ---------------------------------------------------------------------------
# frame header
# ---------------------------------------------------------------------------

@dataclass
class RefSlot:
    """Header-level reference slot state (subset of Dav1dThreadPicture
    needed by the parser; reference src/internal.h:168-175)."""
    frame_hdr: FrameHeader | None = None


@dataclass
class ParserState:
    """Cross-OBU parser state (subset of Dav1dContext used by obu.c)."""
    seq_hdr: SequenceHeader | None = None
    frame_hdr: FrameHeader | None = None
    refs: list = field(default_factory=lambda: [RefSlot() for _ in range(8)])
    operating_point: int = 0
    operating_point_idc: int = 0
    max_spatial_id: int = 0
    strict: bool = False
    frame_size_limit: int = 0
    content_light: ContentLightLevel | None = None
    mastering_display: MasteringDisplay | None = None
    itut_t35: list = field(default_factory=list)


def read_frame_size(c: ParserState, gb: GetBits, use_ref: bool) -> None:
    """reference obu.c:341-400."""
    seqhdr = c.seq_hdr
    hdr = c.frame_hdr
    if use_ref:
        for i in range(7):
            if gb.get_bit():
                ref_hdr = c.refs[hdr.refidx[i]].frame_hdr
                if ref_hdr is None:
                    raise ParseError("ref frame size from empty slot")
                hdr.width[1] = ref_hdr.width[1]
                hdr.height = ref_hdr.height
                hdr.render_width = ref_hdr.render_width
                hdr.render_height = ref_hdr.render_height
                hdr.super_res_enabled = seqhdr.super_res and gb.get_bit()
                if hdr.super_res_enabled:
                    d = hdr.super_res_width_scale_denominator = 9 + gb.get_bits(3)
                    hdr.width[0] = max((hdr.width[1] * 8 + (d >> 1)) // d,
                                       min(16, hdr.width[1]))
                else:
                    hdr.super_res_width_scale_denominator = 8
                    hdr.width[0] = hdr.width[1]
                return
    if hdr.frame_size_override:
        hdr.width[1] = gb.get_bits(seqhdr.width_n_bits) + 1
        hdr.height = gb.get_bits(seqhdr.height_n_bits) + 1
    else:
        hdr.width[1] = seqhdr.max_width
        hdr.height = seqhdr.max_height
    hdr.super_res_enabled = seqhdr.super_res and gb.get_bit()
    if hdr.super_res_enabled:
        d = hdr.super_res_width_scale_denominator = 9 + gb.get_bits(3)
        hdr.width[0] = max((hdr.width[1] * 8 + (d >> 1)) // d, min(16, hdr.width[1]))
    else:
        hdr.super_res_width_scale_denominator = 8
        hdr.width[0] = hdr.width[1]
    hdr.have_render_size = gb.get_bit()
    if hdr.have_render_size:
        hdr.render_width = gb.get_bits(16) + 1
        hdr.render_height = gb.get_bits(16) + 1
    else:
        hdr.render_width = hdr.width[1]
        hdr.render_height = hdr.height


def _is_key_or_intra(hdr: FrameHeader) -> bool:
    return not (hdr.frame_type & 1)


def _is_inter_or_switch(hdr: FrameHeader) -> bool:
    return bool(hdr.frame_type & 1)


def parse_frame_hdr(c: ParserState, gb: GetBits) -> None:  # noqa: C901
    seqhdr = c.seq_hdr
    hdr = c.frame_hdr

    hdr.show_existing_frame = (0 if seqhdr.reduced_still_picture_header
                               else gb.get_bit())
    if hdr.show_existing_frame:
        hdr.existing_frame_idx = gb.get_bits(3)
        if seqhdr.decoder_model_info_present and not seqhdr.equal_picture_interval:
            hdr.frame_presentation_delay = gb.get_bits(seqhdr.frame_presentation_delay_length)
        if seqhdr.frame_id_numbers_present:
            hdr.frame_id = gb.get_bits(seqhdr.frame_id_n_bits)
            ref_hdr = c.refs[hdr.existing_frame_idx].frame_hdr
            if ref_hdr is None or ref_hdr.frame_id != hdr.frame_id:
                raise ParseError("show_existing frame_id mismatch")
        return

    if seqhdr.reduced_still_picture_header:
        hdr.frame_type = FrameType.KEY
        hdr.show_frame = 1
    else:
        hdr.frame_type = gb.get_bits(2)
        hdr.show_frame = gb.get_bit()
    if hdr.show_frame:
        if seqhdr.decoder_model_info_present and not seqhdr.equal_picture_interval:
            hdr.frame_presentation_delay = gb.get_bits(seqhdr.frame_presentation_delay_length)
        hdr.showable_frame = int(hdr.frame_type != FrameType.KEY)
    else:
        hdr.showable_frame = gb.get_bit()
    hdr.error_resilient_mode = int(
        (hdr.frame_type == FrameType.KEY and hdr.show_frame) or
        hdr.frame_type == FrameType.SWITCH or
        seqhdr.reduced_still_picture_header or gb.get_bit())
    hdr.disable_cdf_update = gb.get_bit()
    hdr.allow_screen_content_tools = (
        gb.get_bit() if seqhdr.screen_content_tools == AdaptiveBoolean.ADAPTIVE
        else int(seqhdr.screen_content_tools))
    if hdr.allow_screen_content_tools:
        hdr.force_integer_mv = (
            gb.get_bit() if seqhdr.force_integer_mv == AdaptiveBoolean.ADAPTIVE
            else int(seqhdr.force_integer_mv))
    else:
        hdr.force_integer_mv = 0
    if _is_key_or_intra(hdr):
        hdr.force_integer_mv = 1
    if seqhdr.frame_id_numbers_present:
        hdr.frame_id = gb.get_bits(seqhdr.frame_id_n_bits)
    if not seqhdr.reduced_still_picture_header:
        hdr.frame_size_override = (1 if hdr.frame_type == FrameType.SWITCH
                                   else gb.get_bit())
    if seqhdr.order_hint:
        hdr.frame_offset = gb.get_bits(seqhdr.order_hint_n_bits)
    hdr.primary_ref_frame = (gb.get_bits(3)
                             if not hdr.error_resilient_mode and _is_inter_or_switch(hdr)
                             else PRIMARY_REF_NONE)

    hdr.operating_points = [0] * 32
    if seqhdr.decoder_model_info_present:
        hdr.buffer_removal_time_present = gb.get_bit()
        if hdr.buffer_removal_time_present:
            for i in range(seqhdr.num_operating_points):
                seqop = seqhdr.operating_points[i]
                if seqop.decoder_model_param_present:
                    in_temporal = (seqop.idc >> hdr.temporal_id) & 1
                    in_spatial = (seqop.idc >> (hdr.spatial_id + 8)) & 1
                    if not seqop.idc or (in_temporal and in_spatial):
                        hdr.operating_points[i] = gb.get_bits(seqhdr.buffer_removal_delay_length)

    if _is_key_or_intra(hdr):
        hdr.refresh_frame_flags = (
            0xFF if hdr.frame_type == FrameType.KEY and hdr.show_frame
            else gb.get_bits(8))
        if hdr.refresh_frame_flags != 0xFF and hdr.error_resilient_mode and seqhdr.order_hint:
            for _ in range(8):
                gb.get_bits(seqhdr.order_hint_n_bits)
        if (c.strict and hdr.frame_type == FrameType.INTRA and
                hdr.refresh_frame_flags == 0xFF):
            raise ParseError("intra-only frame refreshing all slots")
        read_frame_size(c, gb, False)
        if hdr.allow_screen_content_tools and not hdr.super_res_enabled:
            hdr.allow_intrabc = gb.get_bit()
    else:
        hdr.refresh_frame_flags = (0xFF if hdr.frame_type == FrameType.SWITCH
                                   else gb.get_bits(8))
        if hdr.error_resilient_mode and seqhdr.order_hint:
            for _ in range(8):
                gb.get_bits(seqhdr.order_hint_n_bits)
        hdr.frame_ref_short_signaling = 0
        if seqhdr.order_hint:
            hdr.frame_ref_short_signaling = gb.get_bit()
            if hdr.frame_ref_short_signaling:
                _short_ref_signaling(c, gb)
        for i in range(7):
            if not hdr.frame_ref_short_signaling:
                hdr.refidx[i] = gb.get_bits(3)
            if seqhdr.frame_id_numbers_present:
                delta = gb.get_bits(seqhdr.delta_frame_id_n_bits) + 1
                ref_frame_id = (hdr.frame_id + (1 << seqhdr.frame_id_n_bits) - delta) \
                    & ((1 << seqhdr.frame_id_n_bits) - 1)
                ref_hdr = c.refs[hdr.refidx[i]].frame_hdr
                if ref_hdr is None or ref_hdr.frame_id != ref_frame_id:
                    raise ParseError("ref frame_id mismatch")
        use_ref = not hdr.error_resilient_mode and hdr.frame_size_override
        read_frame_size(c, gb, use_ref)
        if not hdr.force_integer_mv:
            hdr.hp = gb.get_bit()
        hdr.subpel_filter_mode = (FilterMode.SWITCHABLE if gb.get_bit()
                                  else gb.get_bits(2))
        hdr.switchable_motion_mode = gb.get_bit()
        if (not hdr.error_resilient_mode and seqhdr.ref_frame_mvs and
                seqhdr.order_hint and _is_inter_or_switch(hdr)):
            hdr.use_ref_frame_mvs = gb.get_bit()

    if not seqhdr.reduced_still_picture_header and not hdr.disable_cdf_update:
        hdr.refresh_context = int(not gb.get_bit())
    else:
        hdr.refresh_context = 0

    _parse_tiling(c, gb)
    _parse_quant(c, gb)
    _parse_segmentation(c, gb)
    _parse_delta(c, gb)
    _derive_lossless(c)
    _parse_loopfilter(c, gb)
    _parse_cdef(c, gb)
    _parse_restoration(c, gb)

    if not hdr.all_lossless:
        hdr.txfm_mode = TxfmMode.SWITCHABLE if gb.get_bit() else TxfmMode.LARGEST
    else:
        hdr.txfm_mode = TxfmMode.ONLY_4X4
    if _is_inter_or_switch(hdr):
        hdr.switchable_comp_refs = gb.get_bit()
    _derive_skip_mode(c)
    if hdr.skip_mode_allowed:
        hdr.skip_mode_enabled = gb.get_bit()
    if not hdr.error_resilient_mode and _is_inter_or_switch(hdr) and seqhdr.warped_motion:
        hdr.warp_motion = gb.get_bit()
    hdr.reduced_txtp_set = gb.get_bit()

    hdr.gmv = [WarpedMotionParams() for _ in range(7)]
    if _is_inter_or_switch(hdr):
        _parse_gmv(c, gb)
    _parse_film_grain(c, gb)


def _short_ref_signaling(c: ParserState, gb: GetBits) -> None:
    """frame_refs_short_signaling algorithm (reference obu.c:527-594).

    The reference leans on C 32-bit int/unsigned wraparound: "used" slots
    are marked INT_MIN (0x80000000 unsigned), which makes them ineligible
    for both the future-ref search (wants unsigned < 255) and the
    latest-past search (wants unsigned >= 0xFFFFFF00, i.e. offsets in
    [-256,-1]). We replicate that arithmetic with explicit u32 casts.
    """
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    INT_MIN32 = -0x80000000
    hdr.refidx[0] = gb.get_bits(3)
    hdr.refidx[1] = hdr.refidx[2] = -1
    hdr.refidx[3] = gb.get_bits(3)

    frame_offset = [0] * 8
    earliest_ref = -1
    earliest_offset = 0x7FFFFFFF
    for i in range(8):
        refhdr = c.refs[i].frame_hdr
        if refhdr is None:
            raise ParseError("short signaling with empty ref slot")
        diff = get_poc_diff(seqhdr.order_hint_n_bits, refhdr.frame_offset,
                            hdr.frame_offset)
        frame_offset[i] = diff
        if diff < earliest_offset:
            earliest_offset = diff
            earliest_ref = i
    frame_offset[hdr.refidx[0]] = INT_MIN32
    frame_offset[hdr.refidx[3]] = INT_MIN32

    def as_u32(v):
        return v & 0xFFFFFFFF

    # ALTREF: latest (signed) offset >= 0; may stay -1
    refidx, latest = -1, 0
    for i in range(8):
        if frame_offset[i] >= latest:
            latest = frame_offset[i]
            refidx = i
    if refidx >= 0:
        frame_offset[refidx] = INT_MIN32
    hdr.refidx[6] = refidx

    # BWDREF / ALTREF2: two earliest future refs (unsigned hint < 255)
    for i in range(4, 6):
        earliest_u, refidx = 0xFF, -1
        for j in range(8):
            hint = as_u32(frame_offset[j])
            if hint < earliest_u:
                earliest_u = hint
                refidx = j
        if refidx >= 0:
            frame_offset[refidx] = INT_MIN32
        hdr.refidx[i] = refidx

    # Remaining slots: latest past ref (unsigned hint >= 0xFFFFFF00)
    for i in range(1, 7):
        refidx = hdr.refidx[i]
        if refidx < 0:
            latest_u = 0xFFFFFF00  # ~UINT8_MAX
            for j in range(8):
                hint = as_u32(frame_offset[j])
                if hint >= latest_u:
                    latest_u = hint
                    refidx = j
            if refidx >= 0:
                frame_offset[refidx] = INT_MIN32
                hdr.refidx[i] = refidx
            else:
                hdr.refidx[i] = earliest_ref


def _parse_tiling(c: ParserState, gb: GetBits) -> None:
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    t = hdr.tiling
    t.uniform = gb.get_bit()
    sbsz_min1 = (64 << seqhdr.sb128) - 1
    sbsz_log2 = 6 + seqhdr.sb128
    sbw = (hdr.width[0] + sbsz_min1) >> sbsz_log2
    sbh = (hdr.height + sbsz_min1) >> sbsz_log2
    max_tile_width_sb = 4096 >> sbsz_log2
    max_tile_area_sb = (4096 * 2304) >> (2 * sbsz_log2)
    t.min_log2_cols = tile_log2(max_tile_width_sb, sbw)
    t.max_log2_cols = tile_log2(1, min(sbw, MAX_TILE_COLS))
    t.max_log2_rows = tile_log2(1, min(sbh, MAX_TILE_ROWS))
    min_log2_tiles = max(tile_log2(max_tile_area_sb, sbw * sbh), t.min_log2_cols)
    t.min_log2 = min_log2_tiles
    t.col_start_sb = [0] * (MAX_TILE_COLS + 1)
    t.row_start_sb = [0] * (MAX_TILE_ROWS + 1)
    if t.uniform:
        t.log2_cols = t.min_log2_cols
        while t.log2_cols < t.max_log2_cols and gb.get_bit():
            t.log2_cols += 1
        tile_w = 1 + ((sbw - 1) >> t.log2_cols)
        t.cols = 0
        sbx = 0
        while sbx < sbw:
            t.col_start_sb[t.cols] = sbx
            sbx += tile_w
            t.cols += 1
        t.min_log2_rows = max(min_log2_tiles - t.log2_cols, 0)
        t.log2_rows = t.min_log2_rows
        while t.log2_rows < t.max_log2_rows and gb.get_bit():
            t.log2_rows += 1
        tile_h = 1 + ((sbh - 1) >> t.log2_rows)
        t.rows = 0
        sby = 0
        while sby < sbh:
            t.row_start_sb[t.rows] = sby
            sby += tile_h
            t.rows += 1
    else:
        t.cols = 0
        widest_tile = 0
        max_area = sbw * sbh
        sbx = 0
        while sbx < sbw and t.cols < MAX_TILE_COLS:
            tile_width_sb = min(sbw - sbx, max_tile_width_sb)
            tile_w = 1 + gb.get_uniform(tile_width_sb) if tile_width_sb > 1 else 1
            t.col_start_sb[t.cols] = sbx
            sbx += tile_w
            widest_tile = max(widest_tile, tile_w)
            t.cols += 1
        t.log2_cols = tile_log2(1, t.cols)
        if min_log2_tiles:
            max_area >>= min_log2_tiles + 1
        max_tile_height_sb = max(max_area // widest_tile, 1)
        t.rows = 0
        sby = 0
        while sby < sbh and t.rows < MAX_TILE_ROWS:
            tile_height_sb = min(sbh - sby, max_tile_height_sb)
            tile_h = 1 + gb.get_uniform(tile_height_sb) if tile_height_sb > 1 else 1
            t.row_start_sb[t.rows] = sby
            sby += tile_h
            t.rows += 1
        t.log2_rows = tile_log2(1, t.rows)
    t.col_start_sb[t.cols] = sbw
    t.row_start_sb[t.rows] = sbh
    if t.log2_cols or t.log2_rows:
        t.update = gb.get_bits(t.log2_cols + t.log2_rows)
        if t.update >= t.cols * t.rows:
            raise ParseError("bad context update tile id")
        t.n_bytes = gb.get_bits(2) + 1
    else:
        t.n_bytes = t.update = 0


def _parse_quant(c: ParserState, gb: GetBits) -> None:
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    q = hdr.quant
    q.yac = gb.get_bits(8)
    q.ydc_delta = gb.get_sbits(7) if gb.get_bit() else 0
    if not seqhdr.monochrome:
        diff_uv_delta = gb.get_bit() if seqhdr.separate_uv_delta_q else 0
        q.udc_delta = gb.get_sbits(7) if gb.get_bit() else 0
        q.uac_delta = gb.get_sbits(7) if gb.get_bit() else 0
        if diff_uv_delta:
            q.vdc_delta = gb.get_sbits(7) if gb.get_bit() else 0
            q.vac_delta = gb.get_sbits(7) if gb.get_bit() else 0
        else:
            q.vdc_delta = q.udc_delta
            q.vac_delta = q.uac_delta
    q.qm = gb.get_bit()
    if q.qm:
        q.qm_y = gb.get_bits(4)
        q.qm_u = gb.get_bits(4)
        q.qm_v = gb.get_bits(4) if seqhdr.separate_uv_delta_q else q.qm_u


def _parse_segmentation(c: ParserState, gb: GetBits) -> None:
    hdr = c.frame_hdr
    s = hdr.segmentation
    s.enabled = gb.get_bit()
    if s.enabled:
        if hdr.primary_ref_frame == PRIMARY_REF_NONE:
            s.update_map = 1
            s.update_data = 1
        else:
            s.update_map = gb.get_bit()
            s.temporal = gb.get_bit() if s.update_map else 0
            s.update_data = gb.get_bit()
        if s.update_data:
            s.seg_data.last_active_segid = -1
            s.seg_data.preskip = 0
            for i in range(MAX_SEGMENTS):
                seg = s.seg_data.d[i]
                if gb.get_bit():
                    seg.delta_q = gb.get_sbits(9)
                    s.seg_data.last_active_segid = i
                else:
                    seg.delta_q = 0
                for attr in ("delta_lf_y_v", "delta_lf_y_h", "delta_lf_u", "delta_lf_v"):
                    if gb.get_bit():
                        setattr(seg, attr, gb.get_sbits(7))
                        s.seg_data.last_active_segid = i
                    else:
                        setattr(seg, attr, 0)
                if gb.get_bit():
                    seg.ref = gb.get_bits(3)
                    s.seg_data.last_active_segid = i
                    s.seg_data.preskip = 1
                else:
                    seg.ref = -1
                seg.skip = gb.get_bit()
                if seg.skip:
                    s.seg_data.last_active_segid = i
                    s.seg_data.preskip = 1
                seg.globalmv = gb.get_bit()
                if seg.globalmv:
                    s.seg_data.last_active_segid = i
                    s.seg_data.preskip = 1
        else:
            pri_ref = hdr.refidx[hdr.primary_ref_frame]
            ref_hdr = c.refs[pri_ref].frame_hdr
            if ref_hdr is None:
                raise ParseError("segmentation copy from empty ref")
            s.seg_data = copy.deepcopy(ref_hdr.segmentation.seg_data)
    else:
        for i in range(MAX_SEGMENTS):
            s.seg_data.d[i].ref = -1


def _parse_delta(c: ParserState, gb: GetBits) -> None:
    hdr = c.frame_hdr
    d = hdr.delta
    if hdr.quant.yac:
        d.q_present = gb.get_bit()
        if d.q_present:
            d.q_res_log2 = gb.get_bits(2)
            if not hdr.allow_intrabc:
                d.lf_present = gb.get_bit()
                if d.lf_present:
                    d.lf_res_log2 = gb.get_bits(2)
                    d.lf_multi = gb.get_bit()


def _derive_lossless(c: ParserState) -> None:
    hdr = c.frame_hdr
    q = hdr.quant
    delta_lossless = (not q.ydc_delta and not q.udc_delta and not q.uac_delta
                      and not q.vdc_delta and not q.vac_delta)
    hdr.all_lossless = 1
    for i in range(MAX_SEGMENTS):
        hdr.segmentation.qidx[i] = (
            iclip_u8(q.yac + hdr.segmentation.seg_data.d[i].delta_q)
            if hdr.segmentation.enabled else q.yac)
        hdr.segmentation.lossless[i] = int(
            not hdr.segmentation.qidx[i] and delta_lossless)
        hdr.all_lossless &= hdr.segmentation.lossless[i]


def _parse_loopfilter(c: ParserState, gb: GetBits) -> None:
    from .headers import LoopfilterModeRefDeltas
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    lf = hdr.loopfilter
    if hdr.all_lossless or hdr.allow_intrabc:
        lf.level_y = [0, 0]
        lf.level_u = lf.level_v = 0
        lf.mode_ref_delta_enabled = 1
        lf.mode_ref_delta_update = 1
        lf.mode_ref_deltas = LoopfilterModeRefDeltas()
    else:
        lf.level_y = [gb.get_bits(6), gb.get_bits(6)]
        if not seqhdr.monochrome and (lf.level_y[0] or lf.level_y[1]):
            lf.level_u = gb.get_bits(6)
            lf.level_v = gb.get_bits(6)
        lf.sharpness = gb.get_bits(3)
        if hdr.primary_ref_frame == PRIMARY_REF_NONE:
            lf.mode_ref_deltas = LoopfilterModeRefDeltas()
        else:
            ref = hdr.refidx[hdr.primary_ref_frame]
            ref_hdr = c.refs[ref].frame_hdr
            if ref_hdr is None:
                raise ParseError("lf deltas from empty ref")
            lf.mode_ref_deltas = copy.deepcopy(ref_hdr.loopfilter.mode_ref_deltas)
        lf.mode_ref_delta_enabled = gb.get_bit()
        if lf.mode_ref_delta_enabled:
            lf.mode_ref_delta_update = gb.get_bit()
            if lf.mode_ref_delta_update:
                for i in range(8):
                    if gb.get_bit():
                        lf.mode_ref_deltas.ref_delta[i] = gb.get_sbits(7)
                for i in range(2):
                    if gb.get_bit():
                        lf.mode_ref_deltas.mode_delta[i] = gb.get_sbits(7)


def _parse_cdef(c: ParserState, gb: GetBits) -> None:
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    cd = hdr.cdef
    if not hdr.all_lossless and seqhdr.cdef and not hdr.allow_intrabc:
        cd.damping = gb.get_bits(2) + 3
        cd.n_bits = gb.get_bits(2)
        for i in range(1 << cd.n_bits):
            cd.y_strength[i] = gb.get_bits(6)
            if not seqhdr.monochrome:
                cd.uv_strength[i] = gb.get_bits(6)
    else:
        cd.n_bits = 0
        cd.y_strength[0] = 0
        cd.uv_strength[0] = 0


def _parse_restoration(c: ParserState, gb: GetBits) -> None:
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    r = hdr.restoration
    if ((not hdr.all_lossless or hdr.super_res_enabled) and
            seqhdr.restoration and not hdr.allow_intrabc):
        r.type[0] = gb.get_bits(2)
        if not seqhdr.monochrome:
            r.type[1] = gb.get_bits(2)
            r.type[2] = gb.get_bits(2)
        if r.type[0] or r.type[1] or r.type[2]:
            r.unit_size[0] = 6 + seqhdr.sb128
            if gb.get_bit():
                r.unit_size[0] += 1
                if not seqhdr.sb128:
                    r.unit_size[0] += gb.get_bit()
            r.unit_size[1] = r.unit_size[0]
            if ((r.type[1] or r.type[2]) and seqhdr.ss_hor == 1 and seqhdr.ss_ver == 1):
                r.unit_size[1] -= gb.get_bit()
        else:
            r.unit_size[0] = 8
    else:
        r.type = [RestorationType.NONE] * 3


def _derive_skip_mode(c: ParserState) -> None:
    """Skip-mode ref derivation (reference obu.c:941-993)."""
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    hdr.skip_mode_allowed = 0
    if not (hdr.switchable_comp_refs and _is_inter_or_switch(hdr) and seqhdr.order_hint):
        return
    poc = hdr.frame_offset
    off_before = off_after = -1
    off_before_idx = off_after_idx = 0
    for i in range(7):
        ref_hdr = c.refs[hdr.refidx[i]].frame_hdr
        if ref_hdr is None:
            raise ParseError("skip mode with empty ref")
        refpoc = ref_hdr.frame_offset
        diff = get_poc_diff(seqhdr.order_hint_n_bits, refpoc, poc)
        if diff > 0:
            if off_after < 0 or get_poc_diff(seqhdr.order_hint_n_bits,
                                             off_after, refpoc) > 0:
                off_after = refpoc
                off_after_idx = i
        elif diff < 0 and (off_before < 0 or
                           get_poc_diff(seqhdr.order_hint_n_bits,
                                        refpoc, off_before) > 0):
            off_before = refpoc
            off_before_idx = i
    if off_before >= 0 and off_after >= 0:
        hdr.skip_mode_refs = [min(off_before_idx, off_after_idx),
                              max(off_before_idx, off_after_idx)]
        hdr.skip_mode_allowed = 1
    elif off_before >= 0:
        off_before2 = -1
        off_before2_idx = 0
        for i in range(7):
            ref_hdr = c.refs[hdr.refidx[i]].frame_hdr
            if ref_hdr is None:
                raise ParseError("skip mode with empty ref")
            refpoc = ref_hdr.frame_offset
            if get_poc_diff(seqhdr.order_hint_n_bits, refpoc, off_before) < 0:
                if off_before2 < 0 or get_poc_diff(seqhdr.order_hint_n_bits,
                                                   refpoc, off_before2) > 0:
                    off_before2 = refpoc
                    off_before2_idx = i
        if off_before2 >= 0:
            hdr.skip_mode_refs = [min(off_before_idx, off_before2_idx),
                                  max(off_before_idx, off_before2_idx)]
            hdr.skip_mode_allowed = 1


def _parse_gmv(c: ParserState, gb: GetBits) -> None:
    """Global motion params (reference obu.c:1011-1060)."""
    hdr = c.frame_hdr
    for i in range(7):
        g = hdr.gmv[i]
        g.type = (WarpedMotionType.IDENTITY if not gb.get_bit() else
                  WarpedMotionType.ROT_ZOOM if gb.get_bit() else
                  WarpedMotionType.TRANSLATION if gb.get_bit() else
                  WarpedMotionType.AFFINE)
        if g.type == WarpedMotionType.IDENTITY:
            continue
        if hdr.primary_ref_frame == PRIMARY_REF_NONE:
            ref_gmv = WarpedMotionParams()
        else:
            pri_ref = hdr.refidx[hdr.primary_ref_frame]
            ref_hdr = c.refs[pri_ref].frame_hdr
            if ref_hdr is None:
                raise ParseError("gmv from empty ref")
            ref_gmv = ref_hdr.gmv[i]
        mat = g.matrix
        ref_mat = ref_gmv.matrix

        def _asr(v, s):  # arithmetic shift right for signed python ints
            return v >> s

        if g.type >= WarpedMotionType.ROT_ZOOM:
            mat[2] = (1 << 16) + 2 * gb.get_bits_subexp(_asr(ref_mat[2] - (1 << 16), 1), 12)
            mat[3] = 2 * gb.get_bits_subexp(_asr(ref_mat[3], 1), 12)
            bits, shift = 12, 10
        else:
            bits = 9 - (not hdr.hp)
            shift = 13 + (not hdr.hp)
        if g.type == WarpedMotionType.AFFINE:
            mat[4] = 2 * gb.get_bits_subexp(_asr(ref_mat[4], 1), 12)
            mat[5] = (1 << 16) + 2 * gb.get_bits_subexp(_asr(ref_mat[5] - (1 << 16), 1), 12)
        else:
            mat[4] = -mat[3]
            mat[5] = mat[2]
        mat[0] = gb.get_bits_subexp(_asr(ref_mat[0], shift), bits) * (1 << shift)
        mat[1] = gb.get_bits_subexp(_asr(ref_mat[1], shift), bits) * (1 << shift)


def _parse_film_grain(c: ParserState, gb: GetBits) -> None:
    """Film grain params (reference obu.c:1066-1145)."""
    seqhdr, hdr = c.seq_hdr, c.frame_hdr
    if not (seqhdr.film_grain_present and (hdr.show_frame or hdr.showable_frame)):
        return
    hdr.film_grain_present = gb.get_bit()
    if not hdr.film_grain_present:
        return
    seed = gb.get_bits(16)
    hdr.film_grain_update = int(hdr.frame_type != FrameType.INTER or gb.get_bit())
    if not hdr.film_grain_update:
        refidx = gb.get_bits(3)
        found = any(hdr.refidx[i] == refidx for i in range(7))
        ref_hdr = c.refs[refidx].frame_hdr
        if not found or ref_hdr is None:
            raise ParseError("film grain ref not in refidx")
        hdr.film_grain_data = copy.deepcopy(ref_hdr.film_grain_data)
        hdr.film_grain_data.seed = seed
        return
    fgd = hdr.film_grain_data
    fgd.seed = seed
    fgd.num_y_points = gb.get_bits(4)
    if fgd.num_y_points > 14:
        raise ParseError("bad num_y_points")
    fgd.y_points = []
    for i in range(fgd.num_y_points):
        v = gb.get_bits(8)
        if i and fgd.y_points[i - 1][0] >= v:
            raise ParseError("y_points not increasing")
        fgd.y_points.append([v, gb.get_bits(8)])
    if not seqhdr.monochrome:
        fgd.chroma_scaling_from_luma = gb.get_bit()
    fgd.uv_points = [[], []]
    if (seqhdr.monochrome or fgd.chroma_scaling_from_luma or
            (seqhdr.ss_ver == 1 and seqhdr.ss_hor == 1 and not fgd.num_y_points)):
        fgd.num_uv_points = [0, 0]
    else:
        for pl in range(2):
            fgd.num_uv_points[pl] = gb.get_bits(4)
            if fgd.num_uv_points[pl] > 10:
                raise ParseError("bad num_uv_points")
            for i in range(fgd.num_uv_points[pl]):
                v = gb.get_bits(8)
                if i and fgd.uv_points[pl][i - 1][0] >= v:
                    raise ParseError("uv_points not increasing")
                fgd.uv_points[pl].append([v, gb.get_bits(8)])
    if (seqhdr.ss_hor == 1 and seqhdr.ss_ver == 1 and
            bool(fgd.num_uv_points[0]) != bool(fgd.num_uv_points[1])):
        raise ParseError("inconsistent uv points for 4:2:0")
    fgd.scaling_shift = gb.get_bits(2) + 8
    fgd.ar_coeff_lag = gb.get_bits(2)
    num_y_pos = 2 * fgd.ar_coeff_lag * (fgd.ar_coeff_lag + 1)
    fgd.ar_coeffs_y = []
    if fgd.num_y_points:
        fgd.ar_coeffs_y = [gb.get_bits(8) - 128 for _ in range(num_y_pos)]
    fgd.ar_coeffs_uv = [[], []]
    for pl in range(2):
        if fgd.num_uv_points[pl] or fgd.chroma_scaling_from_luma:
            num_uv_pos = num_y_pos + (1 if fgd.num_y_points else 0)
            fgd.ar_coeffs_uv[pl] = [gb.get_bits(8) - 128 for _ in range(num_uv_pos)]
            if not fgd.num_y_points:
                fgd.ar_coeffs_uv[pl].append(0)
    fgd.ar_coeff_shift = gb.get_bits(2) + 6
    fgd.grain_scale_shift = gb.get_bits(2)
    for pl in range(2):
        if fgd.num_uv_points[pl]:
            fgd.uv_mult[pl] = gb.get_bits(8) - 128
            fgd.uv_luma_mult[pl] = gb.get_bits(8) - 128
            fgd.uv_offset[pl] = gb.get_bits(9) - 256
    fgd.overlap_flag = gb.get_bit()
    fgd.clip_to_restricted_range = gb.get_bit()


# ---------------------------------------------------------------------------
# OBU-level loop
# ---------------------------------------------------------------------------

@dataclass
class TileGroup:
    start: int
    end: int
    data: bytes


@dataclass
class ObuEvent:
    """What one parse_obu() call produced."""
    kind: str                    # 'seq', 'frame_hdr', 'tile_grp', 'meta',
                                 # 'show_existing', 'skip', 'td', 'padding'
    consumed: int = 0


def parse_tile_hdr(c: ParserState, gb: GetBits) -> tuple:
    n_tiles = c.frame_hdr.tiling.cols * c.frame_hdr.tiling.rows
    have_tile_pos = gb.get_bit() if n_tiles > 1 else 0
    if have_tile_pos:
        n_bits = c.frame_hdr.tiling.log2_cols + c.frame_hdr.tiling.log2_rows
        start = gb.get_bits(n_bits)
        end = gb.get_bits(n_bits)
    else:
        start, end = 0, n_tiles - 1
    return start, end


OBU_META_HDR_CLL = 1
OBU_META_HDR_MDCV = 2
OBU_META_SCALABILITY = 3
OBU_META_ITUT_T35 = 4
OBU_META_TIMECODE = 5


def parse_metadata(c: ParserState, payload: bytes) -> None:
    """Metadata OBU payloads (reference obu.c:1356-1515): HDR content
    light level, mastering display color volume, ITU-T T.35 user data.
    Scalability/timecode and unknown types are ignored like the
    reference."""
    gb = GetBits(payload)
    meta_type = gb.get_uleb128()
    if meta_type == OBU_META_HDR_CLL:
        cll = ContentLightLevel()
        cll.max_content_light_level = gb.get_bits(16)
        cll.max_frame_average_light_level = gb.get_bits(16)
        if not gb.error:
            c.content_light = cll
    elif meta_type == OBU_META_HDR_MDCV:
        md = MasteringDisplay()
        md.primaries = [[gb.get_bits(16), gb.get_bits(16)]
                        for _ in range(3)]
        md.white_point = [gb.get_bits(16), gb.get_bits(16)]
        md.max_luminance = gb.get_bits(32)
        md.min_luminance = gb.get_bits(32)
        if not gb.error:
            c.mastering_display = md
    elif meta_type == OBU_META_ITUT_T35:
        # strip trailing zero bytes, then the 0x80 terminator byte
        size = len(payload) - gb.byte_pos()
        base = gb.byte_pos()
        while size > 0 and payload[base + size - 1] == 0:
            size -= 1
        size -= 1
        t35 = ITUTT35()
        t35.country_code = gb.get_bits(8)
        size -= 1
        if t35.country_code == 0xFF:
            t35.country_code_extension_byte = gb.get_bits(8)
            size -= 1
        if size <= 0 or payload[gb.byte_pos() + size] != 0x80:
            return            # malformed: log-and-ignore in the reference
        t35.payload = payload[gb.byte_pos():gb.byte_pos() + size]
        c.itut_t35.append(t35)


def parse_sequence_header_standalone(data: bytes) -> SequenceHeader:
    """Equivalent of dav1d_parse_sequence_header (reference obu.c:302-339):
    scan OBUs in the buffer, return the last sequence header found."""
    gb = GetBits(data)
    result = None
    while gb.byte_pos() < len(data):
        start = gb.byte_pos()
        gb.bitpos = start * 8
        gb.get_bit()  # forbidden
        type_ = gb.get_bits(4)
        has_extension = gb.get_bit()
        has_length = gb.get_bit()
        gb.get_bits(1 + 8 * has_extension)
        obu_end = len(data)
        if has_length:
            ln = gb.get_uleb128()
            if ln > len(data) - gb.byte_pos():
                raise ParseError("bad obu length")
            obu_end = gb.byte_pos() + ln
        if type_ == ObuType.SEQ_HDR:
            result = parse_seq_hdr(gb, strict=False)
            if gb.byte_pos() > obu_end:
                raise ParseError("seq hdr overruns obu")
        if gb.error:
            raise ParseError("bitstream error")
        gb.bitpos = obu_end * 8
    if result is None:
        raise ParseError("no sequence header found")
    return result
