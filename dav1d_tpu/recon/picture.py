"""Output picture container (reference src/picture.c buffer geometry:
planes padded to 128-aligned dimensions; we keep exact-size numpy planes
plus the visible-geometry metadata the muxers need)."""
from __future__ import annotations

import numpy as np


class Picture:
    __slots__ = ("planes", "w", "h", "bpc", "layout", "layout_name",
                 "ss_hor", "ss_ver", "content_light", "mastering_display",
                 "itut_t35", "seq_hdr", "frame_hdr", "props")

    _NAMES = {0: "I400", 1: "I420", 2: "I422", 3: "I444"}

    def __init__(self, w, h, layout, bpc):
        self.w = w
        self.h = h
        self.bpc = bpc
        self.layout = layout
        self.layout_name = self._NAMES[int(layout)]
        self.ss_hor = 0 if layout == 3 else 1
        self.ss_ver = 1 if layout == 1 else 0
        self.content_light = None       # HDR CLL metadata OBU
        self.mastering_display = None   # HDR MDCV metadata OBU
        self.itut_t35 = []              # ITU-T T.35 metadata OBUs
        self.seq_hdr = None             # set by the decoder on output
        self.frame_hdr = None
        self.props = None               # DataProps of the source input
        dtype = np.uint8 if bpc == 8 else np.uint16
        # padded to 128-aligned dims like the reference allocator
        # (reference picture.c:46-49) — edge tx/pred blocks overshoot the
        # visible area into the padding
        aw = (w + 127) & ~127
        ah = (h + 127) & ~127
        self.planes = [np.zeros((ah, aw), dtype)]
        if layout != 0:
            cw = (aw + self.ss_hor) >> self.ss_hor
            chh = (ah + self.ss_ver) >> self.ss_ver
            self.planes += [np.zeros((chh, cw), dtype),
                            np.zeros((chh, cw), dtype)]
