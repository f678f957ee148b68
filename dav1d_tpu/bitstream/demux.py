"""Input demuxers with content probing (reference tools/input/input.c,
ivf.c, annexb.c, section5.c): IVF, length-delimited Annex B, and
Section-5 (low-overhead) OBU streams. Each reader yields Frame objects
whose .data is one temporal unit of size-fielded OBUs, ready for
ObuStreamDecoder.decode_temporal_unit."""
from __future__ import annotations

from dataclasses import dataclass

from .ivf import IvfReader

OBU_TD = 2
OBU_SEQ_HDR = 1
OBU_FRAME_HDR = 3
OBU_FRAME = 6
OBU_TILE_GRP = 4


@dataclass
class Frame:
    data: bytes


def _leb(data, pos):
    """uleb128; returns (value, new_pos) or (None, pos) on error."""
    v = 0
    for i in range(8):
        if pos >= len(data):
            return None, pos
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << (7 * i)
        if not (b & 0x80):
            return v, pos
    return None, pos


def _obu_header(data, pos):
    """Returns (type, has_extension, has_size, hdr_len) or None."""
    if pos >= len(data):
        return None
    b = data[pos]
    if b & 0x80:                  # forbidden bit
        return None
    typ = (b >> 3) & 0xF
    has_ext = (b >> 2) & 1
    has_size = (b >> 1) & 1
    return typ, has_ext, has_size, 1 + has_ext


def _add_size_field(obu: bytes) -> bytes:
    """Annex-B OBUs have obu_has_size_field=0; rewrap with an explicit
    size so the OBU parser can delimit them."""
    hdr = _obu_header(obu, 0)
    if hdr is None:
        return obu
    typ, has_ext, has_size, hlen = hdr
    if has_size:
        return obu
    payload = obu[hlen:]
    out = bytearray([obu[0] | 0x02])        # set has_size_field
    out += obu[1:hlen]
    v = len(payload)
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    return bytes(out) + payload


class AnnexBReader:
    """reference tools/input/annexb.c: temporal_unit_size {
    frame_unit_size { obu_length obu } } with length-field-less OBUs."""

    def __init__(self, data: bytes):
        self.data = data

    def __iter__(self):
        data, pos = self.data, 0
        while pos < len(data):
            tu_size, pos = _leb(data, pos)
            if tu_size is None or pos + tu_size > len(data):
                return
            tu_end = pos + tu_size
            obus = []
            while pos < tu_end:
                fu_size, pos = _leb(data, pos)
                if fu_size is None:
                    return
                fu_end = min(pos + fu_size, tu_end)
                while pos < fu_end:
                    ob_size, pos = _leb(data, pos)
                    if ob_size is None or pos + ob_size > fu_end:
                        return
                    obus.append(_add_size_field(data[pos:pos + ob_size]))
                    pos += ob_size
            yield Frame(b"".join(obus))


class Section5Reader:
    """reference tools/input/section5.c: raw size-fielded OBU stream,
    temporal units delimited by Temporal Delimiter OBUs."""

    def __init__(self, data: bytes):
        self.data = data

    def __iter__(self):
        data, pos = self.data, 0
        cur = []
        while pos < len(data):
            hdr = _obu_header(data, pos)
            if hdr is None:
                break
            typ, has_ext, has_size, hlen = hdr
            if not has_size:
                break                     # section 5 requires size fields
        # (re-scan loop with OBU sizes)
            sz, after = _leb(data, pos + hlen)
            if sz is None or after + sz > len(data):
                break
            obu = data[pos:after + sz]
            pos = after + sz
            if typ == OBU_TD and cur:
                yield Frame(b"".join(cur))
                cur = []
            cur.append(obu)
        if cur:
            yield Frame(b"".join(cur))


def probe_annexb(data: bytes) -> bool:
    """reference annexb.c:47-116 annexb_probe."""
    tu_size, pos = _leb(data, 0)
    if tu_size is None:
        return False
    mark = pos
    fu_size, pos = _leb(data, pos)
    if fu_size is None or fu_size + (pos - mark) > tu_size:
        return False
    tu_size -= pos - mark
    mark = pos
    ob_size, pos = _leb(data, pos)
    if ob_size is None or ob_size + (pos - mark) >= fu_size:
        return False
    hdr = _obu_header(data, pos)
    if hdr is None or hdr[0] != OBU_TD:
        return False
    tu_size -= ob_size + (pos - mark)
    fu_size -= ob_size + (pos - mark)
    pos += ob_size
    seq = False
    limit = min(len(data), 2048)
    while pos < limit:
        mark = pos
        ob_size, pos = _leb(data, pos)
        if ob_size is None or ob_size + (pos - mark) > fu_size:
            return False
        hdr = _obu_header(data, pos)
        if hdr is None:
            return False
        typ = hdr[0]
        if typ == OBU_SEQ_HDR:
            seq = True
        elif typ in (OBU_FRAME, OBU_FRAME_HDR):
            return seq
        elif typ in (OBU_TD, OBU_TILE_GRP):
            return False
        pos += ob_size
        fu_size -= ob_size + (pos - mark - ob_size)
        if fu_size <= 0:
            return False
    return seq


def probe_section5(data: bytes) -> bool:
    """reference section5.c:46-81: first OBU must be a zero-size TD
    with a size field, followed by a sequence header before any frame."""
    hdr = _obu_header(data, 0)
    if hdr is None:
        return False
    typ, has_ext, has_size, hlen = hdr
    if typ != OBU_TD or not has_size:
        return False
    sz, pos = _leb(data, hlen)
    if sz != 0:
        return False
    seq = False
    limit = min(len(data), 2048)
    while pos < limit:
        hdr = _obu_header(data, pos)
        if hdr is None or not hdr[2]:
            return False
        typ, _e, _s, hlen = hdr
        sz, after = _leb(data, pos + hlen)
        if sz is None:
            return False
        if typ == OBU_SEQ_HDR:
            seq = True
        elif typ in (OBU_FRAME, OBU_FRAME_HDR):
            return seq
        elif typ == OBU_TILE_GRP:
            return False
        pos = after + sz
    return seq


def open_input(data: bytes, demuxer: str | None = None):
    """Content-probing demuxer dispatch (reference tools/input/input.c).
    Returns an iterable of Frame."""
    if demuxer == "ivf" or (demuxer is None and data[:4] == b"DKIF"):
        return IvfReader(data)
    if demuxer == "annexb" or (demuxer is None and probe_annexb(data)):
        return AnnexBReader(data)
    if demuxer == "section5" or (demuxer is None and probe_section5(data)):
        return Section5Reader(data)
    raise ValueError("unrecognized input format")
