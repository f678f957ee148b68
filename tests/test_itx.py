"""Inverse-transform kernel tests vs the reference oracle
(checkasm-style randomized sweeps, SURVEY.md §4 tier 1)."""
import os
import struct
import subprocess

import numpy as np
import pytest

from dav1d_tpu import tables
from dav1d_tpu.entropy import levels as lv
from dav1d_tpu.ops import itx_ref

HARNESS = "/root/repo/oracle-build/itx_harness"


def allowed_txtps(tx):
    t = lv.TXFM_INFO[tx]
    mx = max(t.w, t.h) * 4
    mn = min(t.w, t.h) * 4
    if mx == 64:
        return [lv.DCT_DCT]
    if mx == 32:
        return [lv.DCT_DCT, lv.IDTX]
    if mn == 16:
        return list(range(12))          # fn16 set
    return list(range(16))              # fn84 set


def run_oracle(tx, txtp, eob, bpc, dst, cf):
    req = struct.pack("<BBiB", tx, txtp, eob, bpc)
    req += dst.astype("<u2").tobytes()
    req += cf.astype("<i4").tobytes()
    with open("/tmp/itx_in.bin", "wb") as f:
        f.write(req)
    subprocess.run([HARNESS, "/tmp/itx_in.bin", "/tmp/itx_out.bin"],
                   check=True)
    return np.fromfile("/tmp/itx_out.bin", dtype="<u2")


def random_case(rng, tx, txtp, bpc):
    t = lv.TXFM_INFO[tx]
    w, h = t.w * 4, t.h * 4
    sw, sh = min(w, 32), min(h, 32)
    bd_max = (1 << bpc) - 1
    cf_max = (1 << (7 + (8 if bpc == 8 else bpc))) - 1
    # 8bpc coef buffer is int16 in the reference
    lim = min(cf_max, 0x7FFF) if bpc == 8 else cf_max
    n = sw * sh
    eob = int(rng.integers(0, n))
    cf = np.zeros(n, np.int32)
    if txtp == lv.WHT_WHT:
        # lossless residuals are small
        cf[:] = rng.integers(-1000, 1000, n)
        eob = n - 1
    else:
        scan = tables.scan(tx)
        k = int(rng.integers(1, eob + 2))
        idxs = scan[rng.choice(eob + 1, size=min(k, eob + 1), replace=False)]
        cf[idxs] = rng.integers(-lim, lim + 1, len(idxs))
        cf[scan[eob]] = int(rng.integers(1, lim))
    dst = rng.integers(0, bd_max + 1, w * h).astype(np.uint16)
    return eob, cf, dst


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="oracle not built")
@pytest.mark.parametrize("tx", range(lv.N_RECT_TX_SIZES))
@pytest.mark.parametrize("bpc", [8, 10])
def test_itx_matches_oracle(tx, bpc):
    rng = np.random.default_rng(tx * 100 + bpc)
    t = lv.TXFM_INFO[tx]
    w, h = t.w * 4, t.h * 4
    txtps = allowed_txtps(tx)
    if tx == lv.TX_4X4:
        txtps = txtps + [lv.WHT_WHT]
    for txtp in txtps:
        for trial in range(3):
            eob, cf, dst = random_case(rng, tx, txtp, bpc)
            oracle = run_oracle(tx, txtp, eob, bpc, dst, cf)
            mine = dst.reshape(h, w).astype(np.uint16).copy()
            itx_ref.inv_txfm_add(mine, cf.copy(), eob, tx, txtp, bpc)
            np.testing.assert_array_equal(
                mine.reshape(-1), oracle,
                err_msg=f"tx={tx} txtp={txtp} eob={eob} bpc={bpc}")


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="oracle not built")
def test_itx_dc_only():
    rng = np.random.default_rng(7)
    for tx in [lv.TX_4X4, lv.TX_8X8, lv.RTX_4X8, lv.TX_64X64, lv.RTX_32X64]:
        t = lv.TXFM_INFO[tx]
        w, h = t.w * 4, t.h * 4
        cf = np.zeros(min(w, 32) * min(h, 32), np.int32)
        cf[0] = int(rng.integers(-30000, 30000))
        dst = rng.integers(0, 256, w * h).astype(np.uint16)
        oracle = run_oracle(tx, lv.DCT_DCT, 0, 8, dst, cf)
        mine = dst.reshape(h, w).copy()
        itx_ref.inv_txfm_add(mine, cf.copy(), 0, tx, lv.DCT_DCT, 8)
        np.testing.assert_array_equal(mine.reshape(-1), oracle,
                                      err_msg=f"tx={tx}")
