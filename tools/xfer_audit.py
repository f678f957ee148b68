#!/usr/bin/env python3
"""Per-frame tunnel-traffic audit for a full-stream decode.

Runs a decode in a subprocess with JAX_TRANSFER_GUARD=log and parses
the guard's stderr lines (guard_lib.cc logs EVERY host<->device
transfer with shape+dtype, including the implicit uploads of numpy
operands at jit-call boundaries that in-process counters can't see).
Prints total/per-picture MB each way plus the top transfer signatures,
so "the decode is transfer-bound" is auditable rather than asserted.

Usage: python tools/xfer_audit.py [ivf_path] [--frames N]

The decode itself is the same synchronous path profile_decode uses
(n_threads=1); traffic is direction-tagged by the guard, not by us.
Reference analog: dav1d has no transfer axis to audit -- this is the
TPU-design equivalent of its memory-bandwidth accounting in checkasm
--bench (tests/checkasm/checkasm.c).
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# XLA primitive-type names (d2h lines) and numpy names (h2d avals)
_ITEM = {
    "PRED": 1, "S8": 1, "U8": 1, "S16": 2, "U16": 2, "F16": 2,
    "BF16": 2, "S32": 4, "U32": 4, "F32": 4, "S64": 8, "U64": 8,
    "F64": 8,
    "bool": 1, "int8": 1, "uint8": 1, "int16": 2, "uint16": 2,
    "float16": 2, "bfloat16": 2, "int32": 4, "uint32": 4,
    "float32": 4, "int64": 8, "uint64": 8, "float64": 8,
}

_H2D = re.compile(r"host-to-device transfer: aval=ShapedArray\("
                  r"([a-z0-9]+)\[([0-9,]*)\]")
_D2H = re.compile(r"device-to-host transfer: shape=\(([0-9, ]*)\), "
                  r"dtype=([A-Z0-9]+)")

_CHILD = """
import sys
sys.path.insert(0, %(root)r)
from dav1d_tpu import api
from dav1d_tpu.bitstream.ivf import IvfReader
dec = api.Decoder(api.Settings(n_threads=1))
data = open(%(path)r, "rb").read()
n = 0
for fr in IvfReader(data):
    dec.send_data(fr.data)
    while True:
        pic = dec.get_picture()
        if pic is None:
            break
        for p in pic.planes:
            p[0, 0]        # touch: materialize any pending fetch
        n += 1
        print("AUDIT_PIC", n, flush=True)
        if n >= %(frames)d:
            break
    if n >= %(frames)d:
        break
dec.close()
print("AUDIT_DONE", n, flush=True)
"""


def _nbytes_h2d(m):
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _ITEM.get(dt, 4)


def _nbytes_d2h(m):
    dims, dt = m.groups()
    n = 1
    for d in dims.replace(" ", "").split(","):
        if d:
            n *= int(d)
    return n * _ITEM.get(dt, 4)


def main():
    argv = sys.argv[1:]
    frames = 8
    if "--frames" in argv:
        i = argv.index("--frames")
        frames = int(argv[i + 1])
        del argv[i:i + 2]
    path = argv[0] if argv else os.path.join(
        ROOT, "bench_streams/1920x1080_8b_flt_s31_enc.ivf")

    env = dict(os.environ)
    # log_explicit: also log jnp.asarray/device_put uploads -- plain
    # "log" only reports implicit transfers and misses most of the
    # decode's uploads (job buffer, coef pool, filter maps)
    env["JAX_TRANSFER_GUARD"] = "log_explicit"
    src = _CHILD % dict(root=ROOT, path=path, frames=frames)
    proc = subprocess.Popen([sys.executable, "-c", src],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, env=env, text=True)

    # per-signature accumulation; picture boundaries come from stdout,
    # but the guard writes to stderr -- read both, attribute traffic
    # to "warmup" (before first pic) vs "steady" (after)
    import threading
    pics = [0]

    def pump_out():
        for line in proc.stdout:
            if line.startswith("AUDIT_PIC"):
                pics[0] = int(line.split()[1])
    t = threading.Thread(target=pump_out, daemon=True)
    t.start()

    tot = {"up": 0, "down": 0}
    steady = {"up": 0, "down": 0}
    steady_from = [None]
    sig = {}
    for line in proc.stderr:
        m = _H2D.search(line)
        kind = None
        if m:
            nb, kind = _nbytes_h2d(m), "up"
            key = ("up", m.group(1), m.group(2))
        else:
            m = _D2H.search(line)
            if m:
                nb, kind = _nbytes_d2h(m), "down"
                key = ("down", m.group(2), m.group(1))
        if kind is None:
            continue
        tot[kind] += nb
        # steady state: everything after the 2nd picture (first
        # pictures carry one-time table/ref-cache uploads + compiles)
        if pics[0] >= 2:
            if steady_from[0] is None:
                steady_from[0] = pics[0]
            steady[kind] += nb
        s = sig.setdefault(key, [0, 0])
        s[0] += 1
        s[1] += nb
    proc.wait()
    t.join(timeout=5)

    n = pics[0]
    ns = max(1, n - (steady_from[0] or n))
    mb = 1.0 / (1 << 20)
    print(f"\npictures decoded: {n} ({path})")
    print(f"total   : up {tot['up']*mb:9.2f} MB   "
          f"down {tot['down']*mb:9.2f} MB")
    print(f"steady  : up {steady['up']*mb:9.2f} MB   "
          f"down {steady['down']*mb:9.2f} MB over {ns} pics "
          f"=> {steady['up']*mb/ns:6.2f} / {steady['down']*mb/ns:6.2f} "
          f"MB/frame")
    print(f"\n{'dir':4s} {'dtype':9s} {'shape':24s} {'count':>6s} "
          f"{'MB':>9s}")
    for key, (cnt, nb) in sorted(sig.items(), key=lambda kv: -kv[1][1])[:18]:
        print(f"{key[0]:4s} {key[1]:9s} {key[2][:24]:24s} {cnt:6d} "
              f"{nb*mb:9.2f}")
    if proc.returncode:
        print(f"child exit code {proc.returncode}", file=sys.stderr)
        sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
