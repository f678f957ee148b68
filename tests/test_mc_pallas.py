"""Pallas 8-tap MC kernel vs the golden XLA batch formulation.

The kernel runs in Pallas interpret mode off-TPU (compiled through Mosaic
on a directly-attached TPU). pytest's assertion-rewriting/tracing interacts
badly with interpret mode's deep tracing stacks (RecursionError), so
the comparison runs in a clean subprocess."""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
from dav1d_tpu.ops import mc as mcdev
from dav1d_tpu.ops.mc_pallas import put8_pallas

# interpret mode everywhere: the axon tunnel's remote Mosaic compile
# service rejects this kernel (see ops/mc_pallas.py docstring); the
# kernel logic itself is what the test pins down
interpret = True
fails = 0
for bd, (h, w) in ((8, (8, 8)), (10, (16, 8))):
    rng = np.random.default_rng(13 * h + w + bd)
    Hr, Wr = 128, 160
    n = 8
    px_max = (1 << bd) - 1
    REF = rng.integers(0, px_max + 1, (2, Hr, Wr)).astype(np.int32)
    fb = mcdev.filter_banks()
    rows = (rng.integers(3, Hr - h - 12, (n, 1)) +
            np.arange(h + 7)).astype(np.int32)
    cols = (rng.integers(3, Wr - w - 12, (n, 1)) +
            np.arange(w + 7)).astype(np.int32)
    slot = rng.integers(0, 2, n).astype(np.int32)
    fh = fb[int(w <= 4), 0, rng.integers(0, 16, n)].astype(np.int32)
    fv = fb[int(h <= 4), 0, rng.integers(0, 16, n)].astype(np.int32)
    got = np.asarray(put8_pallas(REF, rows, cols, slot, fh, fv, bd,
                                 interpret=interpret))
    fn = mcdev._put8_fn(n, h, w, bd, True)
    want = np.asarray(fn(REF, rows, cols, slot, fh, fv))
    ok = np.array_equal(got, want)
    print(f"bd={bd} {h}x{w}: {'ok' if ok else 'MISMATCH'}", flush=True)
    fails += not ok
sys.exit(1 if fails else 0)
"""


def test_put8_pallas_vs_golden():
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-c", _SCRIPT],
                       capture_output=True, text=True, timeout=600,
                       env=env)
    assert r.returncode == 0, r.stdout + r.stderr
