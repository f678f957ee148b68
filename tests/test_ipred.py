"""Intra predictor kernel tests vs the reference oracle
(checkasm-style randomized sweeps over modes, sizes, angles)."""
import os
import struct
import subprocess

import numpy as np
import pytest

from dav1d_tpu.ops import ipred_ref

HARNESS = "/root/repo/oracle-build/ipred_harness"

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
         (4, 16), (16, 4), (8, 32), (32, 16), (16, 64), (64, 16)]


def run_oracle(mode, bpc, w, h, angle, max_w, max_h, edge_arr):
    req = struct.pack("<BBiiiii", mode, bpc, w, h, angle, max_w, max_h)
    req += edge_arr.astype("<u2").tobytes()
    with open("/tmp/ipred_in.bin", "wb") as f:
        f.write(req)
    subprocess.run([HARNESS, "/tmp/ipred_in.bin", "/tmp/ipred_out.bin"],
                   check=True)
    return np.fromfile("/tmp/ipred_out.bin", dtype="<u2").reshape(h, w)


def make_edge(rng, bpc):
    e = ipred_ref.Edge()
    vals = rng.integers(0, 1 << bpc, 257)
    e.buf[e.center - 128:e.center + 129] = vals
    arr = vals.astype(np.uint16)
    return e, arr


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="oracle not built")
@pytest.mark.parametrize("bpc", [8, 10])
@pytest.mark.parametrize("mode", list(range(14)))
def test_ipred_matches_oracle(mode, bpc):
    rng = np.random.default_rng(mode * 10 + bpc)
    for (w, h) in SIZES:
        if mode == ipred_ref.FILTER_PRED and (w > 32 or h > 32):
            continue
        for trial in range(3):
            e, arr = make_edge(rng, bpc)
            if mode in (ipred_ref.Z1_PRED, ipred_ref.Z2_PRED,
                        ipred_ref.Z3_PRED):
                # only spec-reachable angles: base + 3*delta, delta -3..3
                bases = {ipred_ref.Z1_PRED: [45, 67, 90],
                         ipred_ref.Z2_PRED: [113, 135, 157],
                         ipred_ref.Z3_PRED: [203, 225, 247]}[mode]
                while True:
                    base_angle = int(rng.choice(bases)) + \
                        3 * int(rng.integers(-3, 4))
                    if mode == ipred_ref.Z1_PRED and base_angle < 90:
                        break
                    if mode == ipred_ref.Z2_PRED and 90 < base_angle < 180:
                        break
                    if mode == ipred_ref.Z3_PRED and base_angle > 180:
                        break
                angle = base_angle | (int(rng.integers(0, 2)) << 9) | (1 << 10)
            elif mode == ipred_ref.FILTER_PRED:
                angle = int(rng.integers(0, 5))
            else:
                angle = 0
            max_w = int(rng.integers(1, w + 1)) * 4 if mode == ipred_ref.Z2_PRED else w
            max_h = int(rng.integers(1, h + 1)) * 4 if mode == ipred_ref.Z2_PRED else h
            max_w = min(max_w, w * 2)
            max_h = min(max_h, h * 2)
            oracle = run_oracle(mode, bpc, w, h, angle, max_w, max_h, arr)
            if mode == ipred_ref.Z2_PRED:
                mine = ipred_ref.ipred_z2(e, w, h, angle, bpc, max_w, max_h)
            else:
                mine = ipred_ref.PREDICTORS[mode](e, w, h, angle, bpc)
            np.testing.assert_array_equal(
                mine.astype(np.uint16), oracle,
                err_msg=f"mode={mode} w={w} h={h} angle={angle} bpc={bpc} "
                        f"mw={max_w} mh={max_h}")
