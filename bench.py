#!/usr/bin/env python3
"""Decode benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current scope (round 1): full decode fps (key + inter frames, all
coding tools in the parse/recon path) on a synthesized 8-bit 4:2:0
stream. Stage A runs in Python (the C++ port is the next perf
milestone); vs_baseline is fps / 60 (the 60fps real-time target at
this resolution class).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, N_FRAMES, SEED, QIDX = 640, 360, 8, 7, 100
CACHE = f"/tmp/dav1d_tpu_bench_inter_{W}x{H}_{SEED}.ivf"


def main():
    from tools.streamgen.gen import generate_stream
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.utils.muxers import Md5Muxer

    if os.path.exists(CACHE):
        data = open(CACHE, "rb").read()
    else:
        data, _ = generate_stream(W, H, qidx=QIDX, seed=SEED,
                                  n_frames=N_FRAMES)
        with open(CACHE, "wb") as f:
            f.write(data)

    # warm-up decode (jit compiles etc. when the TPU path is used)
    frames = [fr.data for fr in IvfReader(data)]
    dec = ObuStreamDecoder()
    dec.decode_temporal_unit(frames[0])

    t0 = time.perf_counter()
    n = 0
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    for fd in frames:
        for _plan, pic in dec.decode_temporal_unit(fd):
            mux.write_picture(pic)
            n += 1
    dt = time.perf_counter() - t0
    fps = n / dt
    print(json.dumps({
        "metric": f"decode_{W}x{H}_fps",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
