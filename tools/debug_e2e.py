#!/usr/bin/env python3
"""E2E triage: decode a generated stream with our decoder + the oracle,
find the first block (in decode order) whose luma pixels differ."""
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from tools.streamgen.gen import generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.entropy import levels as lv

ORACLE = "/root/repo/oracle-build/dav1d"


def run(w, h, frame=0, **kw):
    data, _ = generate_intra_stream(w, h, **kw)
    open("/tmp/dbg.ivf", "wb").write(data)
    subprocess.run([ORACLE, "-q", "-i", "/tmp/dbg.ivf", "--muxer", "yuv",
                    "-o", "/tmp/dbg.yuv"], check=True)
    raw = np.fromfile("/tmp/dbg.yuv", np.uint8)
    fsz = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    raw = raw[frame * fsz:(frame + 1) * fsz]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    oy = raw[:w * h].reshape(h, w)
    ou = raw[w * h:w * h + cw * ch].reshape(ch, cw)
    ov = raw[w * h + cw * ch:].reshape(ch, cw)
    dec = ObuStreamDecoder()
    results = []
    for fr in IvfReader(data):
        results.extend(dec.decode_temporal_unit(fr.data))
    plan, pic = results[frame]
    my = pic.planes[0]
    found = False
    for b in plan.blocks:
        bd = lv.block_dimensions[b.bs]
        y0, x0 = b.by * 4, b.bx * 4
        h_px = min(int(bd[1]) * 4, h - y0)
        w_px = min(int(bd[0]) * 4, w - x0)
        if h_px <= 0 or w_px <= 0:
            continue
        m = my[y0:y0 + h_px, x0:x0 + w_px]
        o = oy[y0:y0 + h_px, x0:x0 + w_px]
        if not np.array_equal(m, o):
            print(f"FIRST LUMA DIFF bx={b.bx} by={b.by} bs={b.bs} "
                  f"ymode={b.y_mode} angle={b.y_angle} uvmode={b.uv_mode} "
                  f"uvangle={b.uv_angle} skip={b.skip} tx={b.tx} "
                  f"uvtx={b.uvtx} ef={b.edge_flags} cfl={b.cfl_alpha}")
            d = np.nonzero(m.astype(int) - o.astype(int))
            print("  at", d[0][0], d[1][0], "mine", m[d[0][0], d[1][0]],
                  "oracle", o[d[0][0], d[1][0]], "ndiff", len(d[0]))
            print("  mine:\n", m[:6, :10])
            print("  oracle:\n", o[:6, :10])
            found = True
            break
    if not found:
        print("luma OK")
        for pl, (mp, op) in enumerate([(pic.planes[1], ou),
                                       (pic.planes[2], ov)]):
            mm = mp[:ch, :cw]
            if not np.array_equal(mm, op):
                d = np.nonzero(mm.astype(int) - op.astype(int))
                cy, cx = d[0][0], d[1][0]
                print(f"chroma{pl} diff at {cy},{cx} (b4 {cy//2},{cx//2}) "
                      f"mine={mm[cy,cx]} oracle={op[cy,cx]} ndiff={len(d[0])}")
                b4y, b4x = cy * 2 // 4, cx * 2 // 4
                for b in plan.blocks:
                    bdm = lv.block_dimensions[b.bs]
                    if (b.bx <= b4x < b.bx + bdm[0] and
                            b.by <= b4y < b.by + bdm[1]):
                        print(f"  in block bx={b.bx} by={b.by} bs={b.bs} "
                              f"uvmode={b.uv_mode} uvangle={b.uv_angle} "
                              f"cfl={b.cfl_alpha} skip={b.skip} uvtx={b.uvtx}")
                        break
                return
        print("all planes OK")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("w", type=int)
    ap.add_argument("h", type=int)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--qidx", type=int, default=100)
    ap.add_argument("--sb128", type=int, default=0)
    a = ap.parse_args()
    run(a.w, a.h, seed=a.seed, qidx=a.qidx, sb128=a.sb128)
