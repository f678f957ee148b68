"""Stage C lite: OBU stream → per-frame symbol plans (and, once recon is
wired, pictures).

Mirrors the reference's dav1d_parse_obus / dav1d_submit_frame control
flow (reference obu.c:1169-1695, decode.c:3327+) for the currently
supported feature set. The full ref-slot state machine (8 pictures,
8 CDFs, show_existing, SVC layer selection) lands with the inter path.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .bitstream.getbits import GetBits
from .bitstream import obu as obu_mod
from .bitstream.headers import FrameHeader, ObuType
from .entropy.cdf import CdfContext
from .entropy.decode import FrameContext, FramePlan, TileParser


@dataclass
class TileGroupData:
    start: int
    end: int
    data: bytes


class ObuStreamDecoder:
    """Parses temporal units into frames; runs Stage A on each."""

    def __init__(self):
        self.state = obu_mod.ParserState()
        self.tile_groups: list[TileGroupData] = []
        self.n_tiles = 0

    def _split_tiles(self, fh) -> list:
        """Split accumulated tile-group payloads into per-tile byte
        ranges (reference decode.c:3152-3181)."""
        tiles = []
        n_bytes = fh.tiling.n_bytes
        for tg in self.tile_groups:
            data = tg.data
            pos = 0
            for j in range(tg.start, tg.end + 1):
                if j == tg.end:
                    tile_sz = len(data) - pos
                else:
                    tile_sz = int.from_bytes(data[pos:pos + n_bytes],
                                             "little") + 1
                    pos += n_bytes
                tiles.append(data[pos:pos + tile_sz])
                pos += tile_sz
        return tiles

    def decode_temporal_unit(self, data: bytes) -> list:
        """Feed one temporal unit; returns list of FramePlan completed."""
        plans = []
        pos = 0
        while pos < len(data):
            consumed, plan = self._parse_obu(data[pos:])
            if plan is not None:
                plans.append(plan)
            pos += consumed
        return plans

    def _parse_obu(self, data: bytes):
        st = self.state
        gb = GetBits(data)
        gb.get_bit()                       # forbidden
        obu_type = gb.get_bits(4)
        has_extension = gb.get_bit()
        has_length = gb.get_bit()
        gb.get_bit()                       # reserved
        temporal_id = spatial_id = 0
        if has_extension:
            temporal_id = gb.get_bits(3)
            spatial_id = gb.get_bits(2)
            gb.get_bits(3)
        if has_length:
            ln = gb.get_uleb128()
            payload_start = gb.byte_pos()
            end = payload_start + ln
        else:
            payload_start = gb.byte_pos()
            end = len(data)
        if gb.error or end > len(data):
            raise obu_mod.ParseError("truncated OBU")

        plan = None
        if obu_type == ObuType.SEQ_HDR:
            st.seq_hdr = obu_mod.parse_seq_hdr(
                GetBits(data[payload_start:end]), st.strict)
        elif obu_type in (ObuType.FRAME_HDR, ObuType.FRAME,
                          ObuType.REDUNDANT_FRAME_HDR):
            if obu_type == ObuType.REDUNDANT_FRAME_HDR and st.frame_hdr:
                return end, None
            if st.seq_hdr is None:
                raise obu_mod.ParseError("frame header before sequence header")
            st.frame_hdr = FrameHeader()
            st.frame_hdr.temporal_id = temporal_id
            st.frame_hdr.spatial_id = spatial_id
            fgb = GetBits(data[payload_start:end])
            obu_mod.parse_frame_hdr(st, fgb)
            self.tile_groups = []
            self.n_tiles = 0
            if st.frame_hdr.show_existing_frame:
                raise NotImplementedError("show_existing_frame (stage C)")
            if obu_type == ObuType.FRAME:
                fgb.bytealign()
                plan = self._handle_tile_group(
                    data[payload_start + fgb.byte_pos():end])
        elif obu_type == ObuType.TILE_GRP:
            plan = self._handle_tile_group(data[payload_start:end])
        elif obu_type in (ObuType.METADATA, ObuType.TD, ObuType.PADDING):
            pass
        return end, plan

    def _handle_tile_group(self, payload: bytes):
        st = self.state
        if st.frame_hdr is None:
            raise obu_mod.ParseError("tile group without frame header")
        gb = GetBits(payload)
        start, end = obu_mod.parse_tile_hdr(st, gb)
        gb.bytealign()
        self.tile_groups.append(
            TileGroupData(start, end, payload[gb.byte_pos():]))
        self.n_tiles += end - start + 1
        n_expected = st.frame_hdr.tiling.cols * st.frame_hdr.tiling.rows
        if self.n_tiles == n_expected:
            return self._decode_frame()
        return None

    def _decode_frame(self) -> FramePlan:
        st = self.state
        fh = st.frame_hdr
        if fh.primary_ref_frame != 7:
            raise NotImplementedError("primary-ref CDF inheritance")
        tiles = self._split_tiles(fh)
        f = FrameContext(st.seq_hdr, fh)
        plan = FramePlan(f)
        in_cdf = CdfContext.default(fh.quant.yac)
        tile_idx = 0
        for tr in range(fh.tiling.rows):
            for tc in range(fh.tiling.cols):
                cdf = in_cdf.copy()
                tp = TileParser(f, plan, tiles[tile_idx], tr, tc, cdf)
                tp.parse_tile()
                tile_idx += 1
        st.frame_hdr = None
        self.tile_groups = []
        self.n_tiles = 0
        # ref-slot updates (segmaps/cdfs) land with the inter path
        return plan
