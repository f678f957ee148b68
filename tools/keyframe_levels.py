"""Measure the device-path cost model for whole-keyframe intra.

VERDICT r4 item 3 asked either for keyframes on device, or for a
measured write-up showing host native wins. This tool produces the
quantitative half of that write-up: it parses the keyframe of a given
stream (Stage A only) and computes the dependency-level count the
device intra scheduler (recon/ipred_device.py) would need to run the
WHOLE frame, at prediction-block granularity (a lower bound — the
real scheduler levelizes at tx-unit granularity, which is strictly
deeper because CFL/residual units split blocks further).

Each level costs >=3 serialized device executions (edge gather,
predict per mode-group, scatter + fused itx) whose measured queued
cost on the tunnel v5e is ~0.5-1.5 ms each; levels cannot overlap by
data dependence (reference ipred edge semantics, ipred_prepare.h).
So `3 * levels * ~1ms` is the serial floor of a device keyframe,
compared against the native C++ engine's wall time (phase
intra.frame_recon under DAV1D_TPU_TIMING=1), which additionally
overlaps Stage A of the next frame in the pipeline.

Usage: python tools/keyframe_levels.py [stream.ivf]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def keyframe_plan(path):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")   # Stage A only
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder

    dec = ObuStreamDecoder()
    for fr in IvfReader(open(path, "rb").read()):
        for plan, _pic in dec.decode_temporal_unit(fr.data):
            if plan is not None:
                return plan
    raise SystemExit("no frame decoded")


def block_levels(plan):
    """Wavefront level of every prediction block: 1 + max(level of the
    4x4 row above the block and the 4x4 column to its left)."""
    from dav1d_tpu.entropy.levels import block_dimensions

    bs_grid = plan.b4_bs
    bh, bw = bs_grid.shape
    lvl = np.zeros((bh + 1, bw + 1), np.int32)   # 1-based halo = level 0
    claimed = np.zeros((bh, bw), bool)
    n_blocks = 0
    # raster scan hits every block's top-left corner first, and every
    # top/left neighbor's corner earlier still, so levels resolve in
    # one pass
    for y in range(bh):
        for x in range(bw):
            if claimed[y, x]:
                continue
            w4 = min(int(block_dimensions[bs_grid[y, x]][0]), bw - x)
            h4 = min(int(block_dimensions[bs_grid[y, x]][1]), bh - y)
            top = lvl[y, x + 1:x + 1 + w4].max()
            left = lvl[y + 1:y + 1 + h4, x].max()
            val = 1 + max(int(top), int(left))
            lvl[y + 1:y + 1 + h4, x + 1:x + 1 + w4] = val
            claimed[y:y + h4, x:x + w4] = True
            n_blocks += 1
    return n_blocks, int(lvl.max())


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "bench_streams/1920x1080_8b_flt_s31_enc.ivf"
    t0 = time.perf_counter()
    plan = keyframe_plan(path)
    t_parse = time.perf_counter() - t0
    n_blocks, levels = block_levels(plan)
    f = plan.f
    per_exec_ms = (0.5, 1.5)
    floor = tuple(3 * levels * ms / 1000 for ms in per_exec_ms)
    print(f"stream: {path}")
    print(f"keyframe: {f.frame_hdr.width[0]}x{f.frame_hdr.height}, "
          f"{n_blocks} prediction blocks (Stage A parse {t_parse:.2f}s)")
    print(f"dependency levels (block granularity, LOWER bound): {levels}")
    print(f"device serial floor at 3 execs/level x {per_exec_ms} ms: "
          f"{floor[0]:.2f}-{floor[1]:.2f} s/frame")
    print("compare: native host recon = phase intra.frame_recon under "
          "DAV1D_TPU_TIMING=1 (overlaps next frame's Stage A)")


if __name__ == "__main__":
    main()
