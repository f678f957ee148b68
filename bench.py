#!/usr/bin/env python3
"""Decode benchmark. Prints one JSON line per metric class, the
BASELINE primary (1080p 8-bit) LAST:

{"metric": "decode_3840x2160_10b_fps", ...}   # 4K 10-bit class
{"metric": "decode_1920x1080_fps", ...}        # primary metric line

Both measure full-stream decode fps on the DEFAULT path — device (TPU)
Stage B, native C++ Stage A, tile-parallel parse, frame pipeline on —
over pre-generated streams (bench_streams/, committed) with all
in-loop filters (deblock + CDEF + loop restoration) active.
vs_baseline is fps / 60 (the realtime target for each class;
BASELINE.md: Chimera-class 1080p and 4K60 10-bit).

Robustness contract (round-3 postmortem: the driver's timeout killed
the bench before a single line printed, rc=124):
  - streams are loaded from the repo, never generated (generation cost
    ~minutes at 4K was inside the old budget);
  - a quick probe child decides whether the TPU/tunnel is usable at
    all (the axon tunnel has twice been observed to wedge such that
    every jax client hangs forever);
  - each decode child prints a progress line per picture; the parent
    kills it on output inactivity (a mid-decode tunnel wedge) or when
    its share of the hard TOTAL budget is spent;
  - a JSON line is ALWAYS printed for each config, best number first
    available from: device decode, host-XLA decode (axon plugin
    bypassed), golden numpy decode, or 0.0;
  - the primary 1080p line prints last (the driver records the last
    line), the 4K line as soon as it is known.

Throughput is honest wall clock: after a full-stream warm-up pass
(which touches the whole compiled-program set, including late-stream
buffer-ladder variants), the timed pass decodes the full stream and
reports
n_pictures / total_wall including the first picture. Partial results
(child killed on inactivity/budget) need >=2 timed pictures, else >=1
warm picture, and are flagged "partial". Every JSON line carries the
backend that produced it ("device" TPU / "host-xla" / "numpy").
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

TOTAL_BUDGET_S = int(os.environ.get("DAV1D_TPU_BENCH_BUDGET", "480"))
PROBE_TIMEOUT_S = int(os.environ.get("DAV1D_TPU_BENCH_PROBE", "75"))
# Output inactivity window: first picture may sit behind whole-chain
# jit compiles; later pictures should tick steadily.
FIRST_PIC_S = 290
NEXT_PIC_S = 150

CONFIGS = [
    # Printed first..last; the LAST line is the primary metric.
    # Encoder-shaped streams (CDF-skewed sampling, intra_prob 3%,
    # full tool mix, all in-loop filters) — the Chimera-class profile
    # BASELINE.md names; the older uniform_mix=0.35 torture streams
    # remain in bench_streams/ for the slow e2e tier.
    dict(metric="decode_3840x2160_10b_fps",
         stream="bench_streams/3840x2160_10b_flt_s33_enc.ivf",
         budget_frac=0.68),
    dict(metric="decode_1920x1080_fps",
         stream="bench_streams/1920x1080_8b_flt_s31_enc.ivf",
         budget_frac=1.0),
]

_PROBE = """
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print('PROBE_OK', jax.default_backend(), flush=True)
"""

_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
from dav1d_tpu.api import Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader

data = open(%(stream)r, 'rb').read()
frames = [fr.data for fr in IvfReader(data)]

def decode(tag, fs):
    times = []
    t0 = time.perf_counter()
    with Decoder(Settings()) as dec:
        for fd in fs:
            dec.send_data(fd)
        for _pic in dec.pictures():
            times.append(time.perf_counter() - t0)
            print('PIC %%s %%d %%.3f' %% (tag, len(times), times[-1]),
                  flush=True)
    return len(times), times[-1] if times else 0.0

# warm-up decodes the FULL stream once: program/buffer-ladder variants
# can first appear on any frame, and a fresh process pays a
# persistent-cache load (or remote compile) per variant — the timed
# pass must only measure steady-state decode
decode('warm', frames)
n, dt = decode('timed', frames)   # honest full-stream wall clock
fps = n / dt if n and dt > 0 else 0.0
print('BENCH_RESULT ' + json.dumps({'n': n, 'fps': fps}), flush=True)
"""


def _run_watched(script, env, deadline):
    """Run a child; kill on global deadline or output inactivity.
    Returns the BENCH_RESULT dict, a partial result reconstructed from
    PIC progress lines (>=2 timed pictures, else >=1 warm picture,
    decoded before the kill), or None.

    The child's stdout fd is read NON-BLOCKING and drained fully after
    every select wakeup: a buffered readline() would pull a burst of
    lines into the Python-level buffer where select can't see them, and
    the inactivity timer would fire with progress already received
    (round-4 advisor finding)."""
    import selectors
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    fd = proc.stdout.fileno()
    os.set_blocking(fd, False)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    result = None
    last_out = time.time()
    pics = []                             # (tag, idx, t) progress marks
    tail = b""
    eof = False

    def handle(line):
        nonlocal result
        if line.startswith("PIC "):
            try:
                _, tag, idx, t = line.split()
                pics.append((tag, int(idx), float(t)))
            except ValueError:
                pass
        elif line.startswith("BENCH_RESULT "):
            result = json.loads(line[len("BENCH_RESULT "):])

    try:
        while result is None and not eof:
            now = time.time()
            # the whole warm pass may stall on compiles / cache loads
            # between pictures; only the timed pass must tick steadily
            in_timed = bool(pics) and pics[-1][0] == "timed"
            inact = NEXT_PIC_S if in_timed else FIRST_PIC_S
            limit = min(deadline, last_out + inact)
            if now >= limit:
                break
            if not sel.select(timeout=min(5.0, limit - now)):
                if proc.poll() is not None:
                    break
                continue
            # drain everything available before sleeping again
            got = False
            while True:
                try:
                    chunk = os.read(fd, 65536)
                except BlockingIOError:
                    break
                if not chunk:
                    eof = True
                    break
                got = True
                tail += chunk
                while b"\n" in tail:
                    raw, tail = tail.split(b"\n", 1)
                    handle(raw.decode("utf-8", "replace"))
            if got:
                last_out = time.time()
            elif eof and proc.poll() is not None:
                break
    finally:
        sel.close()
        if proc.poll() is None:
            proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:
            pass
    if result is None and pics:
        # killed mid-run: prefer a full timed-pass estimate, else a
        # conservative whole-run estimate from the warm pass (includes
        # compile wall; better than reporting nothing)
        timed = [(i, t) for tag, i, t in pics if tag == "timed"]
        warm = [(i, t) for tag, i, t in pics if tag == "warm"]
        use = timed if len(timed) >= 2 else warm
        if use and use[-1][1] > 0:
            i1, t1 = use[-1]
            result = {"n": i1, "fps": i1 / t1, "partial": True}
    return result


def _cpu_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # bypass the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["DAV1D_TPU_DEVICE"] = "cpu"
    # persistent cache turns the host-XLA fallback's multi-minute
    # first-frame compile wall into a warm start on repeat runs
    env.setdefault("DAV1D_TPU_JIT_CACHE", "/tmp/dav1d_tpu_jit_cache_cpubench")
    env.setdefault("DAV1D_TPU_JIT_CACHE_MIN", "0")
    return env


class _Probe:
    """Async tunnel-TPU liveness probe: a wedged tunnel blocks the
    probe child until its timeout, so it runs in a thread while the
    first host-XLA decode already makes progress."""

    def __init__(self):
        import threading
        self.result = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        try:
            out = subprocess.run(
                [sys.executable, "-u", "-c", _PROBE],
                capture_output=True, text=True,
                timeout=PROBE_TIMEOUT_S, env=dict(os.environ))
            self.result = "PROBE_OK" in out.stdout
        except Exception:
            self.result = False

    def wait(self, timeout):
        self._t.join(timeout)
        return self.result


def _bench_config(cfg, deadline, probe):
    stream = os.path.join(ROOT, cfg["stream"])
    if not os.path.exists(stream):
        return None
    script = _CHILD % {"root": ROOT, "stream": stream}

    def tag(res, backend):
        if res is not None:
            res["backend"] = backend
        return res

    if probe.wait(0) is True:
        # tunnel alive: device first, leave fallback room (a slow-but-
        # alive device run still yields a partial from its PIC lines).
        # 85%: the warm pass legitimately spends minutes loading the
        # persistent-cache executables through the tunnel at 4K, and a
        # killed device run still yields a warm-pass partial
        dev_deadline = min(deadline,
                           time.time() + 0.85 * (deadline - time.time()))
        res = tag(_run_watched(script, dict(os.environ), dev_deadline),
                  "device")
        if res is not None:
            return res
    else:
        # probe unresolved or dead: host XLA now (axon bypassed),
        # probe keeps running in parallel
        cpu_deadline = min(deadline,
                           time.time() + 0.8 * (deadline - time.time()))
        res = tag(_run_watched(script, _cpu_env(), cpu_deadline),
                  "host-xla")
        if probe.wait(0) is True and time.time() < deadline - 45:
            dres = tag(_run_watched(script, dict(os.environ), deadline),
                       "device")
            if dres is not None:
                return dres
        if res is not None:
            return res
    if time.time() < deadline - 30:
        res = tag(_run_watched(script, _cpu_env(), deadline), "host-xla")
        if res is not None:
            return res
    if time.time() < deadline - 30:
        env = _cpu_env()
        env["DAV1D_TPU_BACKEND"] = "numpy"
        return tag(_run_watched(script, env, deadline), "numpy")
    return None


def main():
    t_end = time.time() + TOTAL_BUDGET_S
    probe = _Probe()
    for i, cfg in enumerate(CONFIGS):
        left = t_end - time.time()
        # budget_frac = fraction of the REMAINING budget this config
        # may spend (the last config always gets everything left)
        frac = cfg["budget_frac"] if i < len(CONFIGS) - 1 else 1.0
        # clamp to the hard total budget: a sub-30s remainder must not
        # push the per-config deadline past t_end (rc=124 guard)
        res = _bench_config(
            cfg, min(t_end, time.time() + max(30.0, left * frac)),
            probe)
        fps = res["fps"] if res else 0.0
        line = {
            "metric": cfg["metric"],
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 4),
            "backend": res.get("backend", "none") if res else "none",
            "n_pics": res.get("n", 0) if res else 0,
        }
        if res and res.get("partial"):
            line["partial"] = True
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
