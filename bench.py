#!/usr/bin/env python3
"""Decode benchmark. Prints one JSON line per metric class, the
BASELINE primary (1080p 8-bit) LAST:

{"metric": "decode_3840x2160_10b_fps", ...}   # 4K 10-bit class
{"metric": "decode_1920x1080_fps", ...}        # primary metric line

Both measure full-stream decode fps on the DEFAULT path — device (TPU)
Stage B, native C++ Stage A, tile-parallel parse, frame pipeline on —
over synthesized streams with all in-loop filters (deblock + CDEF +
loop restoration) active. vs_baseline is fps / 60 (the realtime target
for each class; BASELINE.md: Chimera-class 1080p and 4K60 10-bit).

The decode runs in a child process under a watchdog: the TPU in this
environment sits behind a tunnel that can wedge indefinitely (observed
mid-round); if the device run exceeds its budget the bench falls back
to the same decode on host XLA (axon plugin bypassed) so a number is
always produced rather than a hang. The first pass decodes the whole
stream once as warm-up (XLA compiles are amortized by the persistent
compilation cache across runs); the timed pass measures steady-state
throughput.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

DEVICE_BUDGET_S = int(os.environ.get("DAV1D_TPU_BENCH_BUDGET", "1800"))

CONFIGS = [
    # (metric suffix printed first..last; the LAST line is the primary)
    dict(metric="decode_3840x2160_10b_fps", w=3840, h=2160, n_frames=4,
         seed=11, qidx=80, hbd=1, budget_frac=0.5),
    dict(metric="decode_1920x1080_fps", w=1920, h=1080, n_frames=8,
         seed=7, qidx=100, hbd=0, budget_frac=1.0),
]

_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
from dav1d_tpu.api import Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader

data = open(%(cache)r, 'rb').read()
frames = [fr.data for fr in IvfReader(data)]

def decode():
    n = 0
    with Decoder(Settings()) as dec:
        for fd in frames:
            dec.send_data(fd)
        for _pic in dec.pictures():
            n += 1
    return n

decode()                        # warm-up: compiles + cache fill
t0 = time.perf_counter()
n = decode()
dt = time.perf_counter() - t0
print('BENCH_RESULT ' + json.dumps({'n': n, 'dt': dt}), flush=True)
"""


def _stream_path(cfg):
    if cfg["hbd"] == 0:      # round-2 cache name, kept for reuse
        return f"/tmp/dav1d_tpu_bench_{cfg['w']}x{cfg['h']}_flt_{cfg['seed']}.ivf"
    return (f"/tmp/dav1d_tpu_bench_{cfg['w']}x{cfg['h']}"
            f"_hbd{cfg['hbd']}_flt_{cfg['seed']}.ivf")


def _ensure_stream(cfg):
    path = _stream_path(cfg)
    if os.path.exists(path):
        return path
    from tools.streamgen.gen import generate_stream
    data, _ = generate_stream(cfg["w"], cfg["h"], n_frames=cfg["n_frames"],
                              seed=cfg["seed"], qidx=cfg["qidx"],
                              hbd=cfg["hbd"], tile_log2_cols=1,
                              tile_log2_rows=1,
                              lf_levels=(28, 28, 16, 16),
                              cdef_params=(2, 1, [9, 25], [5, 13]),
                              lr_types=(1, 2, 2))
    with open(path, "wb") as f:
        f.write(data)
    return path


def _run_child(cache, env, timeout):
    script = _CHILD % {"root": ROOT, "cache": cache}
    try:
        out = subprocess.run([sys.executable, "-u", "-c", script],
                             capture_output=True, text=True,
                             timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    return None


def _bench_config(cfg, budget):
    try:
        cache = _ensure_stream(cfg)
    except Exception:
        return None

    env = dict(os.environ)
    res = _run_child(cache, env, budget)

    if res is None:
        # TPU path hung or failed (wedged tunnel): same device program
        # on host XLA with the axon plugin bypassed
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["DAV1D_TPU_DEVICE"] = "cpu"
        res = _run_child(cache, env, budget)

    if res is None:
        # last resort: the golden host-numpy path (jax never imported)
        env["DAV1D_TPU_BACKEND"] = "numpy"
        res = _run_child(cache, env, budget)
    return res


def main():
    for cfg in CONFIGS:
        res = _bench_config(cfg, int(DEVICE_BUDGET_S * cfg["budget_frac"]))
        fps = (res["n"] / res["dt"]) if res and res["dt"] > 0 else 0.0
        print(json.dumps({
            "metric": cfg["metric"],
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
