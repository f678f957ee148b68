"""Command-line decoder mirroring the reference dav1d CLI
(reference tools/dav1d.c, tools/dav1d_cli_parse.c): demuxer probing,
muxer selection by extension, film grain / operating point / layer /
in-loop-filter / frame-type options, md5 verification.

Usage: python -m dav1d_tpu.cli -i in.ivf -o out.y4m [options]
"""
from __future__ import annotations

import argparse
import sys
import time

from .api import Decoder, Settings
from .bitstream.demux import open_input
from .utils.muxers import (Md5Muxer, NullMuxer, Xxh3Muxer, Y4mMuxer,
                           YuvMuxer)

_ILF = {"none": 0, "deblock": 1, "nodeblock": 6, "cdef": 2, "nocdef": 5,
        "restoration": 4, "norestoration": 3, "all": 7}
_DFT = {"all": 0, "reference": 1, "intra": 2, "key": 3}


def _pick_muxer(name, path):
    if name is None:
        if path in (None, "-"):
            name = "md5"
        elif path.endswith(".y4m"):
            name = "yuv4mpeg2"
        elif path.endswith(".yuv"):
            name = "yuv"
        elif path.endswith(".md5"):
            name = "md5"
        else:
            name = "null"
    return name


class _NegStrideAllocator:
    """--negstride: hand out bottom-up views (negative row stride) of
    caller-owned buffers — the reference tool's allocator-flexibility
    exercise (tools/dav1d.c --negstride, dav1d_cli_parse.c)."""

    def alloc_picture_data(self, pic):
        import numpy as np
        planes = []
        for shape in pic.plane_shapes():
            base = np.empty(shape, pic.dtype())
            planes.append(base[::-1])      # negative-stride view
        return planes


def main(argv=None):
    p = argparse.ArgumentParser(prog="dav1d_tpu")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--output", "-o", default=None)
    p.add_argument("--demuxer", choices=["ivf", "annexb", "section5"])
    p.add_argument("--muxer",
                   choices=["md5", "xxh3", "yuv", "yuv4mpeg2", "null"])
    p.add_argument("--quiet", "-q", action="store_true")
    p.add_argument("--frametimes", type=str, default=None,
                   help="dump per-frame decode times (ns) to file")
    p.add_argument("--limit", "-l", type=int, default=0)
    p.add_argument("--skip", "-s", type=int, default=0)
    p.add_argument("--filmgrain", type=int, default=None)
    p.add_argument("--oppoint", type=int, default=0)
    p.add_argument("--alllayers", type=int, default=1)
    p.add_argument("--sizelimit", type=str, default=None,
                   help="max frame size (pixels, or WxH)")
    p.add_argument("--strict", type=int, default=1)
    p.add_argument("--verify", type=str, default=None)
    p.add_argument("--outputinvisible", type=int, default=0)
    p.add_argument("--inloopfilters", type=str, default="all")
    p.add_argument("--decodeframetype", type=str, default="all")
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--framedelay", type=int, default=0)
    # parity flags (reference tools/dav1d.c):
    p.add_argument("--cpumask", type=str, default=None,
                   help="accepted for parity; ISA dispatch is XLA's "
                        "job on this backend, so the mask is a no-op")
    p.add_argument("--negstride", action="store_true",
                   help="decode into bottom-up negative-stride "
                        "buffers (exercises the custom allocator)")
    p.add_argument("--realtime", nargs="?", const="decode", default=None,
                   help="pace output to the stream frame rate; "
                        "reports late frames")
    args = p.parse_args(argv)

    ilf = 7
    for part in args.inloopfilters.split(","):
        part = part.strip()
        if part not in _ILF:
            p.error(f"unknown in-loop filter '{part}'")
        v = _ILF[part]
        ilf = v if part in ("none", "all") or not part.startswith("no") \
            else (ilf & v)

    size_limit = 0
    if args.sizelimit:
        if "x" in args.sizelimit:
            w, h = args.sizelimit.split("x", 1)
            size_limit = int(w) * int(h)
        else:
            size_limit = int(args.sizelimit)

    muxer_name = _pick_muxer(args.muxer, args.output)
    if args.verify is not None:
        muxer_name = "md5"

    apply_grain = args.filmgrain if args.filmgrain is not None \
        else (muxer_name != "md5")
    allocator = _NegStrideAllocator() if args.negstride else None
    settings = Settings(
        n_threads=args.threads, max_frame_delay=args.framedelay,
        apply_grain=bool(apply_grain), operating_point=args.oppoint,
        all_layers=bool(args.alllayers), frame_size_limit=size_limit,
        strict_std_compliance=bool(args.strict),
        output_invisible_frames=bool(args.outputinvisible),
        inloop_filters=ilf, decode_frame_type=_DFT[args.decodeframetype],
        allocator=allocator)

    try:
        data = sys.stdin.buffer.read() if args.input == "-" else \
            open(args.input, "rb").read()
    except OSError as e:
        print(f"Failed to open input file {args.input}: {e.strerror}",
              file=sys.stderr)
        return 1
    try:
        frames = open_input(data, args.demuxer)
    except ValueError as e:
        print(f"Failed to open input file {args.input}: {e}",
              file=sys.stderr)
        return 1

    out_fh = None
    if muxer_name == "md5":
        mux = Md5Muxer()
    elif muxer_name == "xxh3":
        mux = Xxh3Muxer()
    elif muxer_name == "null":
        mux = NullMuxer()
    else:
        out_fh = sys.stdout.buffer if args.output in (None, "-") else \
            open(args.output, "wb")
        mux = Y4mMuxer(out_fh) if muxer_name == "yuv4mpeg2" else \
            YuvMuxer(out_fh)

    dec = Decoder(settings)
    ft_fh = open(args.frametimes, "w") if args.frametimes else None
    t_prev = time.monotonic_ns()
    n = 0
    n_tu = 0
    to_skip = args.skip
    seq_seen = to_skip == 0
    seq_skip = 0
    t0 = time.monotonic()
    err = 0
    n_late = 0
    fps_target = 0.0
    if args.realtime is not None:
        num = getattr(frames, "fps_num", 0)
        den = getattr(frames, "fps_den", 1) or 1
        fps_target = (num / den) if num else 25.0
    for fr in frames:
        n_tu += 1
        # --skip drops input packets, then keeps dropping until a
        # packet with a sequence header (reference dav1d.c:231-257)
        if to_skip > 0:
            to_skip -= 1
            continue
        if not seq_seen:
            from .api import parse_sequence_header
            try:
                parse_sequence_header(fr.data)
                seq_seen = True
            except Exception:
                seq_skip += 1
                continue
        try:
            dec.send_data(fr.data)
            for pic in dec.pictures():
                if args.realtime is not None and fps_target > 0:
                    # pace to the stream frame rate (reference
                    # tools/dav1d.c synchronize())
                    due = t0 + n / fps_target
                    lag = time.monotonic() - due
                    if lag < 0:
                        time.sleep(-lag)
                    elif n:
                        n_late += 1
                mux.write_picture(pic)
                n += 1
                if ft_fh is not None:
                    now = time.monotonic_ns()
                    print(now - t_prev, file=ft_fh)
                    t_prev = now
                if args.limit and n >= args.limit:
                    break
        except Exception as e:
            print(f"Error decoding frame: {e}", file=sys.stderr)
            err = 1
            break
        if args.limit and n >= args.limit:
            break
    if seq_skip and not args.quiet:
        print(f"skipped {seq_skip} packets due to missing sequence"
              " header", file=sys.stderr)
    if n_tu == 0:
        print(f"Failed to open input file {args.input}: "
              "no temporal units found", file=sys.stderr)
        return 1
    if n == 0 and not err:
        print("No data decoded", file=sys.stderr)
        err = 1
    dt = time.monotonic() - t0

    rc = err
    if muxer_name in ("md5", "xxh3"):
        digest = mux.digest()
        if args.verify is not None:
            if not mux.verify(args.verify):
                print(f"MD5 mismatch: got {digest}, "
                      f"expected {args.verify}", file=sys.stderr)
                rc = 1
            elif not args.quiet:
                print("Verified", file=sys.stderr)
        else:
            out = sys.stdout if args.output in (None, "-") else \
                open(args.output, "w")
            print(digest, file=out)
    if ft_fh is not None:
        ft_fh.close()
    if out_fh is not None and out_fh is not sys.stdout.buffer:
        out_fh.close()
    if not args.quiet:
        fps = n / dt if dt > 0 else 0.0
        print(f"Decoded {n} frames in {dt:.2f}s ({fps:.2f} fps)",
              file=sys.stderr)
        if args.realtime is not None:
            print(f"realtime: {n_late}/{n} frames late of "
                  f"{fps_target:.2f} fps target", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
