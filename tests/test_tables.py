"""Spec-table integrity checks."""
import numpy as np

from dav1d_tpu import tables


def test_cdf_tables_loaded():
    ym = tables.get("cdf.m.y_mode")
    assert ym.shape == (4, 16)
    # CDFs are stored as 32768 - cumulative-prob, strictly decreasing
    # across real symbols, with trailing zeros (count/padding cells)
    assert ym.dtype == np.uint16
    row = ym[0]
    real = row[row > 0]
    assert np.all(np.diff(real.astype(np.int32)) < 0)


def test_dq_table_monotone():
    dq = tables.dq_tbl()
    assert dq.shape == (3, 256, 2)
    # lossless q0: dc dequant is 4 (8-bit)
    assert dq[0, 0, 0] == 4 and dq[0, 0, 1] == 4


def test_scan_is_permutation():
    for tx in range(tables.N_RECT_TX_SIZES):
        s = tables.scan(tx)
        assert sorted(s.tolist()) == list(range(len(s)))


def test_subpel_filter_shape_and_dc():
    f = tables.get("dav1d_mc_subpel_filters")
    assert f.shape == (6, 15, 8)
    # every 8-tap filter sums to 64 (dav1d stores 6-bit-precision taps;
    # the sharp filter's 7-bit taps are halved with odd taps folded)
    sums = f.astype(np.int32).sum(-1)
    assert np.all(sums == 64)


def test_gaussian_sequence():
    g = tables.get("dav1d_gaussian_sequence")
    assert g.shape == (2048,)
    assert g.dtype == np.int16
