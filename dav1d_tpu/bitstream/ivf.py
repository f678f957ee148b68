"""IVF container demuxer/muxer (reference tools/input/ivf.c behavior).

IVF layout: 32-byte file header ("DKIF", version, header size, fourcc AV01,
width, height, fps_num/den, frame count), then per frame an 12-byte header
(4-byte LE size, 8-byte LE timestamp) followed by the temporal unit bytes.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator


@dataclass
class IvfFrame:
    data: bytes
    timestamp: int


class IvfReader:
    def __init__(self, data: bytes):
        if len(data) < 32 or data[:4] != b"DKIF":
            raise ValueError("not an IVF file")
        (self.version, self.hdr_sz) = struct.unpack_from("<HH", data, 4)
        self.fourcc = data[8:12]
        if self.fourcc != b"AV01":
            raise ValueError(f"not AV1: fourcc={self.fourcc!r}")
        (self.width, self.height, self.fps_num, self.fps_den,
         self.n_frames) = struct.unpack_from("<HHIII", data, 12)
        self.data = data
        self.offset = self.hdr_sz if self.hdr_sz >= 32 else 32

    def __iter__(self) -> Iterator[IvfFrame]:
        off = self.offset
        data = self.data
        while off + 12 <= len(data):
            sz, ts = struct.unpack_from("<IQ", data, off)
            off += 12
            if off + sz > len(data):
                break
            yield IvfFrame(data[off:off + sz], ts)
            off += sz


class IvfWriter:
    def __init__(self, fh, width: int, height: int,
                 fps_num: int = 25, fps_den: int = 1):
        self.fh = fh
        self.n_frames = 0
        self.width = width
        self.height = height
        fh.write(struct.pack("<4sHH4sHHIII4x", b"DKIF", 0, 32, b"AV01",
                             width, height, fps_num, fps_den, 0))

    def write_frame(self, data: bytes, timestamp: int = None) -> None:
        if timestamp is None:
            timestamp = self.n_frames
        self.fh.write(struct.pack("<IQ", len(data), timestamp))
        self.fh.write(data)
        self.n_frames += 1

    def finalize(self) -> None:
        if self.fh.seekable():
            self.fh.seek(24)
            self.fh.write(struct.pack("<I", self.n_frames))
            self.fh.seek(0, 2)


def probe(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"DKIF" and data[8:12] == b"AV01"
