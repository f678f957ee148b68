"""AV1 specification constant tables.

Loaded from tables_data.npz, which is produced by tools/oracle/
{dump_tables.c,pack_tables.py} from the reference decoder's compiled
constants. All of these are normative AV1 data (default CDFs, dequant
LUTs, quant matrices, scan orders, interpolation filter taps, film-grain
gaussian sequence, mode-context LUTs); every bit-exact AV1 decoder
embeds the same numbers.

Semantic documentation per table cites the reference declaration
(src/tables.h, src/cdf.h, src/scan.h, src/dequant_tables.h, src/qm.h).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_NPZ_PATH = os.path.join(os.path.dirname(__file__), "tables_data.npz")


@lru_cache(maxsize=1)
def _data():
    return np.load(_NPZ_PATH)


_CACHE: dict = {}


def get(name: str) -> np.ndarray:
    """Memoized: NpzFile.__getitem__ decompresses on every access."""
    arr = _CACHE.get(name)
    if arr is None:
        arr = _CACHE[name] = _data()[name]
        arr.setflags(write=False)
    return arr


def __getattr__(name: str):
    """Module-level lazy attributes for the flat dav1d_* tables."""
    d = _data()
    key = "dav1d_" + name
    if key in d:
        val = get(key)
    elif name in d:
        val = get(name)
    else:
        raise AttributeError(name)
    globals()[name] = val      # cache as a real module attribute
    return val


# ---- geometry helpers ------------------------------------------------------

N_TX_SIZES = 5
N_RECT_TX_SIZES = 19
N_BS_SIZES = 22

# TxfmInfo struct fields (reference src/tables.h:41-44): w, h (4px units),
# lw, lh (log2), min, max (of lw/lh), sub, ctx
TXFM_W, TXFM_H, TXFM_LW, TXFM_LH, TXFM_MIN, TXFM_MAX, TXFM_SUB, TXFM_CTX = range(8)


@lru_cache(maxsize=1)
def txfm_dimensions() -> np.ndarray:
    return get("dav1d_txfm_dimensions")


@lru_cache(maxsize=1)
def block_dimensions() -> np.ndarray:
    """[N_BS_SIZES][w4, h4, log2w4, log2h4] (reference tables.h:40)."""
    return get("dav1d_block_dimensions")


@lru_cache(maxsize=None)
def scan(tx: int) -> np.ndarray:
    """Coefficient scan order for rect tx size `tx`, flattened
    (reference src/scan.h:35). Length = min(w,32)*min(h,32)."""
    return get(f"scan.{tx}")


@lru_cache(maxsize=None)
def lastcol_from_eob(tx: int) -> np.ndarray:
    return get(f"lastcol_from_eob.{tx}")


@lru_cache(maxsize=None)
def qm(level: int, plane: int, tx: int):
    """Quantizer matrix, or None for the identity (level 15) / 64-pt txs
    (reference src/qm.h:33)."""
    try:
        return get(f"qm.{level}.{plane}.{tx}")
    except KeyError:
        return None


@lru_cache(maxsize=1)
def dq_tbl() -> np.ndarray:
    """[bitdepth(0=8,1=10,2=12)][qindex][dc,ac] dequantizer values
    (reference src/dequant_tables.h:35)."""
    return get("dav1d_dq_tbl")


# Default warped-motion params (reference src/tables.c dav1d_default_wm_params):
# identity matrix, type IDENTITY.
DEFAULT_WM_MATRIX = (0, 0, 1 << 16, 0, 0, 1 << 16)
