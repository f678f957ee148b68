#!/usr/bin/env python3
"""Per-phase wall-time profile of a full-stream decode.

Usage: python tools/profile_decode.py [ivf_path] [--frames N]

Wraps the decoder's phase boundaries (Stage A parse, intra recon,
inter device recon, filter chain, film grain, D2H fetches) with
timers and prints a table. Synchronous decode (n_threads=1) so the
phases don't overlap and the attribution is exact.
"""
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def wrap(mod, name, label):
    fn = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            TIMES[label] += time.perf_counter() - t0
            COUNTS[label] += 1
    setattr(mod, name, timed)
    return fn


def main():
    path = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("-") else None
    if path is None:
        import bench
        # default: the primary (1080p 8-bit) bench stream
        path = os.path.join(ROOT, bench.CONFIGS[-1]["stream"])
    data = open(path, "rb").read()

    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu import decoder as dec_mod
    from dav1d_tpu.recon import intra_ref, inter_device, filters
    from dav1d_tpu.ops import backend

    wrap(intra_ref, "reconstruct_intra_frame", "recon_intra(host)")
    wrap(inter_device, "reconstruct_inter_frame_device",
         "recon_inter(dev)")
    wrap(filters, "run_filter_chain_device", "filters(dev)")
    wrap(backend, "fetch_all", "d2h_fetch")
    # the output-boundary wait: this is where queued device work
    # actually drains, so its wall time = device execution + transfer
    wrap(backend, "fetch_pic_host", "d2h_output_wait")
    orig_decode = dec_mod.ObuStreamDecoder._decode_frame

    def timed_decode(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_decode(self, *a, **k)
        finally:
            TIMES["frame_total"] += time.perf_counter() - t0
            COUNTS["frame_total"] += 1
    dec_mod.ObuStreamDecoder._decode_frame = timed_decode

    # Stage A = TileParser walk (native per-tile)
    from dav1d_tpu.entropy import decode as ed

    orig_parse = ed.TileParser.parse_tile

    def timed_parse(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig_parse(self, *a, **k)
        finally:
            TIMES["stageA_parse"] += time.perf_counter() - t0
            COUNTS["stageA_parse"] += 1
    ed.TileParser.parse_tile = timed_parse

    from dav1d_tpu.entropy import native_tile
    orig_prep = native_tile.prepare_tile_native

    def timed_prep(tp):
        r = orig_prep(tp)
        if r is None:
            return None

        class TimedRun:
            def run(s):
                t0 = time.perf_counter()
                try:
                    return r.run()
                finally:
                    TIMES["stageA_native_run"] += time.perf_counter() - t0
                    COUNTS["stageA_native_run"] += 1

            def materialize(s):
                t0 = time.perf_counter()
                try:
                    return r.materialize()
                finally:
                    TIMES["stageA_materialize"] += \
                        time.perf_counter() - t0
                    COUNTS["stageA_materialize"] += 1
        return TimedRun()
    native_tile.prepare_tile_native = timed_prep

    from dav1d_tpu.api import Decoder, Settings

    n_runs = int(os.environ.get("PROF_RUNS", "2"))
    for run in range(n_runs):   # run 0 = warm-up/compile
        if run == n_runs - 1:
            TIMES.clear()
            COUNTS.clear()
            from dav1d_tpu.utils import timing as _timing
            _timing.reset()
        t0 = time.perf_counter()
        n = 0
        with Decoder(Settings(n_threads=1)) as d:
            for fr in IvfReader(data):
                d.send_data(fr.data)
            for _ in d.pictures():
                n += 1
        wall = time.perf_counter() - t0
        print(f"run {run}: {n} frames in {wall:.2f}s "
              f"({n / wall:.2f} fps)", flush=True)

    print(f"\n{'phase':26s} {'total_s':>9s} {'count':>6s} {'ms/call':>9s}")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"{k:26s} {TIMES[k]:9.3f} {COUNTS[k]:6d} "
              f"{1000 * TIMES[k] / max(1, COUNTS[k]):9.2f}")


if __name__ == "__main__":
    main()
