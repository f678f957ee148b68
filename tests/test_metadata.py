"""Metadata OBU parsing (reference obu.c:1356-1515): HDR CLL, HDR
MDCV, ITU-T T.35 — attached to the next output picture. The assembled
stream is also fed to the reference decoder to prove the OBUs are
well-formed."""
import io
import os
import struct
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_intra_stream, wrap_obu
from dav1d_tpu.bitstream import ivf
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.bitstream.obu import ObuType
from dav1d_tpu.decoder import ObuStreamDecoder

ORACLE = "/root/repo/oracle-build/dav1d"


def _uleb(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def meta_obu(meta_type, body, terminator=b"\x80"):
    return wrap_obu(ObuType.METADATA, _uleb(meta_type) + body + terminator)


def _stream_with(meta_obus):
    data, _ = generate_intra_stream(64, 64, qidx=120, seed=5, n_frames=1)
    frames = list(IvfReader(data))
    out = io.BytesIO()
    w = ivf.IvfWriter(out, 64, 64)
    w.write_frame(meta_obus + frames[0].data)
    w.finalize()
    return out.getvalue()


def _decode_one(blob):
    dec = ObuStreamDecoder()
    pics = []
    for fr in IvfReader(blob):
        for _p, pic in dec.decode_temporal_unit(fr.data):
            pics.append(pic)
    assert len(pics) == 1
    return pics[0]


def test_metadata_attached():
    cll = meta_obu(1, struct.pack(">HH", 1000, 400))
    mdcv = meta_obu(2, struct.pack(">8H2I", 100, 200, 300, 400, 500, 600,
                                   700, 800, 10000000, 50))
    t35 = meta_obu(4, bytes([0xB5]) + b"hello-t35")
    blob = _stream_with(cll + mdcv + t35)
    pic = _decode_one(blob)
    assert pic.content_light.max_content_light_level == 1000
    assert pic.content_light.max_frame_average_light_level == 400
    assert pic.mastering_display.primaries == [[100, 200], [300, 400],
                                               [500, 600]]
    assert pic.mastering_display.white_point == [700, 800]
    assert pic.mastering_display.max_luminance == 10000000
    assert pic.mastering_display.min_luminance == 50
    assert len(pic.itut_t35) == 1
    assert pic.itut_t35[0].country_code == 0xB5
    assert pic.itut_t35[0].payload == b"hello-t35"
    if os.path.exists(ORACLE):
        path = "/tmp/meta_test.ivf"
        open(path, "wb").write(blob)
        r = subprocess.run([ORACLE, "-q", "-i", path, "--muxer", "md5",
                            "-o", "-"], capture_output=True, timeout=120)
        assert r.returncode == 0 and b"Error" not in r.stderr


def test_t35_extension_and_accumulation():
    a = meta_obu(4, bytes([0xFF, 0x01]) + b"ext-payload")
    b = meta_obu(4, bytes([0xB4]) + b"second")
    pic = _decode_one(_stream_with(a + b))
    assert len(pic.itut_t35) == 2
    assert pic.itut_t35[0].country_code == 0xFF
    assert pic.itut_t35[0].country_code_extension_byte == 0x01
    assert pic.itut_t35[0].payload == b"ext-payload"
    assert pic.itut_t35[1].country_code == 0xB4


def test_malformed_t35_ignored():
    # missing 0x80 terminator: the reference logs and drops it
    bad = meta_obu(4, bytes([0xB5]) + b"x", terminator=b"")
    pic = _decode_one(_stream_with(bad))
    assert pic.itut_t35 == []


def test_unknown_meta_type_ignored():
    unk = meta_obu(23, b"\x01\x02\x03")
    pic = _decode_one(_stream_with(unk))
    assert pic.content_light is None and pic.itut_t35 == []
