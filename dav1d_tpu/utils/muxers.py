"""Output muxers: md5 (the conformance oracle), y4m, raw yuv, null.

Behavioral parity with reference tools/output/{md5,y4m2,yuv,null}.c:
- md5: one rolling MD5 over every visible frame's planes, row by row,
  w << hbd bytes per row (little-endian uint16 for high bitdepth),
  Y then U then V cropped to the visible w/h (md5.c:194-247).
- y4m: YUV4MPEG2 with C-param per layout/bitdepth (y4m2.c).
"""
from __future__ import annotations

import hashlib

import numpy as np


def _ensure_host(pic):
    """Materialize a deferred device->host transfer before reading
    planes (pictures can arrive with the output download still in
    flight; see recon/filters.py)."""
    if getattr(pic, "host_stale", False):
        from ..ops.backend import fetch_pic_host
        fetch_pic_host(pic)


class Md5Muxer:
    def __init__(self, fh=None):
        self._md5 = hashlib.md5()
        self.fh = fh

    def write_picture(self, pic) -> None:
        """pic: Picture with .planes (list of np arrays), .w, .h, .layout,
        .bpc, .ss_hor, .ss_ver."""
        _ensure_host(pic)
        hbd = pic.bpc > 8
        dtype = "<u2" if hbd else "u1"
        y = pic.planes[0][: pic.h, : pic.w]
        self._md5.update(np.ascontiguousarray(y, dtype=np.uint16 if hbd else np.uint8)
                         .astype(dtype, copy=False).tobytes())
        if len(pic.planes) > 1:
            cw = (pic.w + pic.ss_hor) >> pic.ss_hor
            ch = (pic.h + pic.ss_ver) >> pic.ss_ver
            for pl in (1, 2):
                c = pic.planes[pl][:ch, :cw]
                self._md5.update(np.ascontiguousarray(
                    c, dtype=np.uint16 if hbd else np.uint8)
                    .astype(dtype, copy=False).tobytes())

    def digest(self) -> str:
        return self._md5.hexdigest()

    def finalize(self) -> str:
        d = self.digest()
        if self.fh is not None:
            self.fh.write((d + "\n").encode())
        return d

    def verify(self, expected: str) -> bool:
        return self.digest() == expected.strip().lower()


class Xxh3Muxer(Md5Muxer):
    """XXH3-128 over the same byte stream as the md5 muxer (reference
    tools/output/xxhash.c:84-116: one stream-level hash, visible rows
    Y/U/V, canonical big-endian hex)."""

    def __init__(self, fh=None):
        import xxhash
        self._md5 = xxhash.xxh3_128()   # reuse Md5Muxer's plane walk
        self.fh = fh


class YuvMuxer:
    def __init__(self, fh):
        self.fh = fh

    def write_picture(self, pic) -> None:
        _ensure_host(pic)
        hbd = pic.bpc > 8
        dtype = "<u2" if hbd else "u1"
        self.fh.write(np.ascontiguousarray(pic.planes[0][: pic.h, : pic.w])
                      .astype(dtype, copy=False).tobytes())
        if len(pic.planes) > 1:
            cw = (pic.w + pic.ss_hor) >> pic.ss_hor
            ch = (pic.h + pic.ss_ver) >> pic.ss_ver
            for pl in (1, 2):
                self.fh.write(np.ascontiguousarray(pic.planes[pl][:ch, :cw])
                              .astype(dtype, copy=False).tobytes())

    def finalize(self) -> None:
        pass


class Y4mMuxer:
    _CSP = {
        # (layout, bpc, mono) -> y4m colorspace tag
        ("I400", 8): "mono",
        ("I420", 8): "420jpeg",
        ("I422", 8): "422",
        ("I444", 8): "444",
        ("I420", 10): "420p10",
        ("I422", 10): "422p10",
        ("I444", 10): "444p10",
        ("I420", 12): "420p12",
        ("I422", 12): "422p12",
        ("I444", 12): "444p12",
        ("I400", 10): "mono10",
        ("I400", 12): "mono12",
    }

    def __init__(self, fh, fps=(25, 1)):
        self.fh = fh
        self.fps = fps
        self.wrote_header = False

    def write_picture(self, pic) -> None:
        _ensure_host(pic)
        if not self.wrote_header:
            csp = self._CSP[(pic.layout_name, pic.bpc)]
            if pic.layout_name == "I420" and pic.bpc == 8 and \
                    pic.seq_hdr is not None:
                # reference y4m2.c:69-73 chroma-position names
                csp = {1: "420mpeg2", 2: "420"}.get(
                    int(pic.seq_hdr.chr), "420jpeg")
            aw, ah = 0, 0
            if pic.frame_hdr is not None:
                # pixel aspect from render size (reference y4m2.c:80-87)
                import math
                aw = pic.h * pic.frame_hdr.render_width
                ah = pic.w * pic.frame_hdr.render_height
                g = math.gcd(aw, ah) or 1
                aw //= g
                ah //= g
            hdr = (f"YUV4MPEG2 W{pic.w} H{pic.h} "
                   f"F{self.fps[0]}:{self.fps[1]} Ip A{aw}:{ah} C{csp}\n")
            self.fh.write(hdr.encode())
            self.wrote_header = True
        self.fh.write(b"FRAME\n")
        YuvMuxer(self.fh).write_picture(pic)

    def finalize(self) -> None:
        pass


class NullMuxer:
    def write_picture(self, pic) -> None:
        _ensure_host(pic)
        pass

    def finalize(self) -> None:
        pass
