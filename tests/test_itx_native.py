"""Native C++ inverse transforms vs the numpy golden (ops/itx_ref.py).

The golden is itself oracle-validated (tests/test_itx.py harness +
e2e md5), so exact equality here transfers that validation to the
native engine."""
import numpy as np
import pytest

from dav1d_tpu.entropy import levels as lv
from dav1d_tpu.ops import itx_native, itx_ref

pytestmark = pytest.mark.skipif(not itx_native.available(),
                                reason="native itx not built")

# legal txtp sets per tx size follow the golden's own dispatch: any
# (tx, txtp) the decoder can produce; 64-wide/high blocks only DCT_DCT
ALL_TX = list(range(19))


def _legal_txtps(tx):
    from dav1d_tpu.ops import itx_core
    t = lv.TXFM_INFO[tx]
    txtps = []
    for txtp in range(16):
        first, second = itx_ref.TX1D_TYPES[txtp]
        if (t.lw + 2, first) in itx_core.FNS and \
                (t.lh + 2, second) in itx_core.FNS:
            txtps.append(txtp)
    if t.w == 1 and t.h == 1:       # 4x4 also has WHT (lossless)
        txtps.append(lv.WHT_WHT)
    return txtps


def _golden(cf, eob, tx, txtp, bd):
    t = lv.TXFM_INFO[tx]
    h, w = t.h * 4, t.w * 4
    # run the full inv_txfm_add against a zero destination with a wide
    # dtype so the (unclipped) residual is observable modulo the pixel
    # clip; compare post-clip pixel results instead for exactness
    dst = np.full((h, w), 77 if bd == 8 else 517, np.uint16)
    itx_ref.inv_txfm_add(dst, cf, eob, tx, txtp, bd)
    return dst


def _native(cf, eob, tx, txtp, bd):
    t = lv.TXFM_INFO[tx]
    h, w = t.h * 4, t.w * 4
    res = itx_native.block_residual(cf, eob, tx, txtp, bd)
    base = 77 if bd == 8 else 517
    return np.clip(base + res, 0, (1 << bd) - 1).astype(np.uint16)


@pytest.mark.parametrize("tx", ALL_TX)
def test_all_txtps_random(tx):
    rng = np.random.default_rng(1234 + tx)
    t = lv.TXFM_INFO[tx]
    sw, sh = min(t.w * 4, 32), min(t.h * 4, 32)
    n = sw * sh
    for txtp in _legal_txtps(tx):
        for bd in (8, 10, 12):
            hi = 1 << (bd + 4)
            for eob in {0, 1, n // 3, n - 1}:
                cf = np.zeros(n, np.int32)
                # populate up to eob in the decoder's rc (x-major) order
                k = eob + 1
                vals = rng.integers(-hi, hi, size=k, dtype=np.int32)
                cf[:k] = vals            # rc layout is opaque to both
                got = _native(cf, eob, tx, txtp, bd)
                want = _golden(cf, eob, tx, txtp, bd)
                assert np.array_equal(got, want), \
                    (tx, txtp, bd, eob)


def test_dc_only_and_extremes():
    rng = np.random.default_rng(7)
    for tx in ALL_TX:
        t = lv.TXFM_INFO[tx]
        n = min(t.w * 4, 32) * min(t.h * 4, 32)
        for bd in (8, 10):
            cf = np.zeros(n, np.int32)
            cf[0] = int(rng.integers(-(1 << (bd + 7)), 1 << (bd + 7)))
            got = _native(cf, 0, tx, lv.DCT_DCT, bd)
            want = _golden(cf, 0, tx, lv.DCT_DCT, bd)
            assert np.array_equal(got, want), (tx, bd, "dc")


def test_batch_matches_per_block():
    """itx_batch_residuals over synthetic coef records == per-block."""
    import ctypes as ct
    rng = np.random.default_rng(42)
    recs = []
    cf_pool = []
    pos = 0
    for tx in (0, 2, 7, 10, 4):
        t = lv.TXFM_INFO[tx]
        n = min(t.w * 4, 32) * min(t.h * 4, 32)
        cf = rng.integers(-4096, 4096, size=n, dtype=np.int32)
        eob = n - 1
        recs.append([0, 0, 0, tx, lv.DCT_DCT, eob, pos])
        cf_pool.append(cf)
        pos += n
    recs.append([0, 0, 0, 0, 0, -1, 0])          # skipped block
    coefs = np.asarray(recs, np.int32)
    pool = np.concatenate(cf_pool).astype(np.int32)

    st, _, wh = itx_native._ctx()
    cap = int(wh[coefs[coefs[:, 5] >= 0, 3]].sum())
    res_pool = np.empty(cap, np.int32)
    res_off = np.empty(len(coefs), np.int64)
    itx_native._lib.itx_batch_residuals(
        ct.addressof(st), coefs.ctypes.data_as(itx_native.i32p),
        len(coefs), pool.ctypes.data_as(itx_native.i32p), 8,
        res_pool.ctypes.data_as(itx_native.i32p),
        res_off.ctypes.data_as(itx_native.i64p))
    assert res_off[-1] == -1
    for i, (tx, cf) in enumerate(zip((0, 2, 7, 10, 4), cf_pool)):
        t = lv.TXFM_INFO[tx]
        h, w = t.h * 4, t.w * 4
        got = res_pool[int(res_off[i]):int(res_off[i]) + h * w] \
            .reshape(h, w)
        want = itx_native.block_residual(cf, len(cf) - 1, tx,
                                         lv.DCT_DCT, 8)
        assert np.array_equal(got, want)
