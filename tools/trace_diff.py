#!/usr/bin/env python3
"""Symbol-trace triage: run the DEBUG_BLOCK_INFO oracle build and our
TileParser (dbg=True) on the same generated stream; print the first
diverging trace line. This validates the parse path symbol-by-symbol
(each line carries the msac range, so any divergence is caught at the
exact symbol)."""
import contextlib
import io
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

BLK = "/tmp/dav1d_blk"


def oracle_trace(path):
    r = subprocess.run([BLK, "-i", path, "--muxer", "null", "-o",
                        "/dev/null", "--threads", "1"],
                       capture_output=True, timeout=300)
    lines = []
    for ln in r.stdout.decode(errors="replace").splitlines():
        # strip pixel-dump rows (hex byte dumps) and keep trace lines
        if ": r=" in ln:
            # pixel dumps can be glued to the front of a trace line
            m = re.search(r"(poc=|Post-|Start|Refmvs)", ln)
            if m:
                ln = ln[m.start():]
            ln = re.sub(r"^poc=\d+,", "", ln)
            # pixel-dump runs (hex pairs / decimal) can be glued mid-line
            # by stdout mixing; trace values never follow a bare space
            ln = re.sub(r"(?: +-?[0-9a-f]+\b)+", "", ln)
            ln = re.sub(r" \[x=\d+,cbx4=\d+\]$", "", ln)
            if "Post-cdef_idx" in ln:
                continue
            lines.append(ln)
    return lines, r.stderr.decode(errors="replace")


def my_trace(data):
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.entropy.decode import TileParser

    orig_init = TileParser.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        self.dbg = True

    TileParser.__init__ = patched
    buf = io.StringIO()
    err = None
    try:
        with contextlib.redirect_stdout(buf):
            dec = ObuStreamDecoder(do_recon=False)
            for fr in IvfReader(data):
                dec.decode_temporal_unit(fr.data)
    except Exception as e:  # noqa: BLE001 - report where we stopped
        err = e
    finally:
        TileParser.__init__ = orig_init
    return [l for l in buf.getvalue().splitlines() if ": r=" in l], err


def _tag(ln):
    m = re.match(r"[^\[:]*", ln)
    return m.group(0)


def _norm(ln):
    # GLOBALMV (mode 2): the reference prints a stale drl_idx (never
    # assigned on that path) — mask it on both sides
    return re.sub(r"^Post-intermode\[2,drl=\d+,", "Post-intermode[2,drl=*,",
                  ln)


def diff(data, path="/tmp/trace.ivf", ctx=6):
    open(path, "wb").write(data)
    olines, ostderr = oracle_trace(path)
    mlines, merr = my_trace(data)
    # restrict the oracle trace to the line kinds our parser emits
    mtags = {_tag(l) for l in mlines}
    olines = [_norm(l) for l in olines
              if _tag(l) in mtags or l.startswith("y=")]
    mlines = [_norm(l) for l in mlines]
    if merr:
        print("MY PARSER RAISED:", repr(merr))
    n = min(len(olines), len(mlines))
    for i in range(n):
        if olines[i] != mlines[i]:
            print(f"FIRST DIFF at line {i}:")
            for j in range(max(0, i - ctx), min(n, i + 3)):
                tag = ">>" if j == i else "  "
                print(f"{tag} oracle: {olines[j]}")
                print(f"{tag} mine  : {mlines[j]}")
            return i
    if len(olines) != len(mlines):
        print(f"PREFIX MATCHES; lengths differ: oracle={len(olines)} "
              f"mine={len(mlines)}")
        src = olines if len(olines) > len(mlines) else mlines
        who = "oracle" if len(olines) > len(mlines) else "mine"
        for j in range(max(0, n - ctx), min(len(src), n + 5)):
            print(f"  {who} extra: {src[j]}")
        return n
    print(f"traces identical ({n} lines)")
    if "Error" in ostderr:
        print("oracle stderr tail:",
              [l for l in ostderr.splitlines() if l][-3:])
    return None


if __name__ == "__main__":
    from tools.streamgen.gen import generate_stream
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--qidx", type=int, default=100)
    a = ap.parse_args()
    data, _ = generate_stream(a.w, a.h, n_frames=a.frames, seed=a.seed,
                              qidx=a.qidx)
    diff(data)
