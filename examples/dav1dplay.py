#!/usr/bin/env python3
"""Minimal playback example — the dav1dplay analog (reference
examples/dav1dplay.c): decode with the public API, pace presentation
to the stream frame rate, and hand frames to a pluggable sink.

This environment has no display server, so the default sink pipes
Y4M to stdout (play with `python examples/dav1dplay.py -i s.ivf | mpv -`),
and `--sink stats` presents to a timing meter instead — the decode /
pace / present loop structure is the same as the SDL renderer's.

Usage:
  python examples/dav1dplay.py -i stream.ivf [--sink y4m|stats]
                               [--untimed] [--oppoint N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from dav1d_tpu.api import Decoder, Settings  # noqa: E402
from dav1d_tpu.bitstream.demux import open_input  # noqa: E402
from dav1d_tpu.utils.muxers import Y4mMuxer  # noqa: E402


class StatsSink:
    """Presentation meter: per-frame lateness vs the pace clock."""

    def __init__(self):
        self.n = 0
        self.late = 0

    def present(self, pic, lag_s):
        self.n += 1
        if lag_s > 0.002:
            self.late += 1

    def close(self):
        print(f"presented {self.n} frames, {self.late} late",
              file=sys.stderr)


class Y4mSink:
    def __init__(self):
        self.mux = Y4mMuxer(sys.stdout.buffer)

    def present(self, pic, lag_s):
        self.mux.write_picture(pic)

    def close(self):
        sys.stdout.buffer.flush()


def main(argv=None):
    p = argparse.ArgumentParser(prog="dav1dplay")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--sink", choices=["y4m", "stats"], default="y4m")
    p.add_argument("--untimed", action="store_true",
                   help="present as fast as decode allows")
    p.add_argument("--oppoint", type=int, default=0)
    args = p.parse_args(argv)

    data = open(args.input, "rb").read()
    frames = open_input(data)
    num = getattr(frames, "fps_num", 0)
    den = getattr(frames, "fps_den", 1) or 1
    fps = (num / den) if num else 25.0

    sink = Y4mSink() if args.sink == "y4m" else StatsSink()
    dec = Decoder(Settings(operating_point=args.oppoint))

    t0 = None
    n = 0
    for fr in frames:
        dec.send_data(fr.data)
        for pic in dec.pictures():
            now = time.monotonic()
            if t0 is None:
                t0 = now
            due = t0 + n / fps
            if not args.untimed and now < due:
                time.sleep(due - now)
                now = due
            sink.present(pic, now - due)
            n += 1
    sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
