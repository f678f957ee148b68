"""ctypes bindings for the native Stage-A core (native/stagea.cpp):
msac + coefficient-block decoding. The native code mirrors the Python
reference implementation in this package (msac.py, decode.py
_decode_coefs) and is validated by the same oracle e2e suite — the
Python path remains as the golden reference and the generator path.
"""
from __future__ import annotations

import ctypes as ct
import os

import numpy as np

from .. import tables
from . import levels as lv

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libstagea.so")

u8p = ct.POINTER(ct.c_uint8)
u16p = ct.POINTER(ct.c_uint16)
i32p = ct.POINTER(ct.c_int32)


class _Msac(ct.Structure):
    _fields_ = [("buf", ct.c_void_p), ("pos", ct.c_int64),
                ("end", ct.c_int64), ("dif", ct.c_uint64),
                ("rng", ct.c_uint32), ("cnt", ct.c_int32),
                ("allow_update", ct.c_int32)]


class _CoefCtx(ct.Structure):
    _fields_ = [
        ("msac", _Msac),
        ("skip", u16p), ("eob_bin", u16p * 7),
        ("eob_bin_stride", ct.c_int32 * 7),
        ("eob_hi_bit", u16p), ("eob_base_tok", u16p), ("base_tok", u16p),
        ("dc_sign", u16p), ("br_tok", u16p),
        ("txtp_intra1", u16p), ("txtp_intra2", u16p),
        ("txtp_inter1", u16p), ("txtp_inter2", u16p), ("txtp_inter3", u16p),
        ("txfm_dim", u8p), ("scans", u16p * 19), ("lo_ctx_offsets", u8p),
        ("tx_types_per_set", i32p), ("skip_ctx_tbl", u8p),
        ("txtp_from_uvmode", u8p), ("filter_mode_to_y_mode", u8p),
        ("tx_type_class", i32p), ("block_dimensions", i32p),
        ("dq", i32p), ("qm", u8p * 57),
        ("seg_lossless", u8p), ("seg_qidx", i32p),
        ("ss_hor", ct.c_int32), ("ss_ver", ct.c_int32),
        ("bitdepth", ct.c_int32), ("reduced_txtp_set", ct.c_int32),
        ("levels_buf", u8p),
    ]


def _build():
    """Best-effort `make` of the native engine (fresh checkouts have
    the sources but not the .so; every consumer degrades gracefully to
    the Python golden paths if this fails)."""
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       capture_output=True, timeout=300, check=True)
    except Exception:
        pass


def _load():
    if not os.path.exists(_LIB_PATH):
        _build()
    else:
        # stale .so (older than any source) -> rebuild
        d = os.path.dirname(_LIB_PATH)
        try:
            so_mtime = os.path.getmtime(_LIB_PATH)
            if any(os.path.getmtime(os.path.join(d, f)) > so_mtime
                   for f in os.listdir(d)
                   if f.endswith((".cpp", ".h"))):
                _build()
        except OSError:
            pass
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ct.CDLL(_LIB_PATH)
    lib.coef_decode.restype = ct.c_int
    lib.coef_decode.argtypes = [
        ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int, ct.c_int,
        ct.c_int, ct.c_int, ct.c_int, ct.c_int, ct.c_int, ct.c_int,
        ct.c_int, ct.c_void_p, ct.c_void_p, ct.c_void_p]
    return lib


_lib = _load()


def available() -> bool:
    return _lib is not None


def _p16(arr):
    return arr.ctypes.data_as(u16p)


_STATIC = {}


def _static_tables():
    """Frame-independent tables, converted once to the C-side dtypes."""
    if _STATIC:
        return _STATIC
    _STATIC["txfm_dim"] = np.ascontiguousarray(
        tables.get("dav1d_txfm_dimensions"), np.uint8)
    _STATIC["scans"] = [np.ascontiguousarray(tables.scan(t), np.uint16)
                        for t in range(19)]
    _STATIC["lo_ctx_offsets"] = np.ascontiguousarray(
        np.asarray(lv.lo_ctx_offsets), np.uint8)
    _STATIC["tx_types_per_set"] = np.ascontiguousarray(
        np.asarray(lv.tx_types_per_set), np.int32)
    _STATIC["skip_ctx_tbl"] = np.ascontiguousarray(
        np.asarray(lv.skip_ctx_tbl), np.uint8)
    _STATIC["txtp_from_uvmode"] = np.ascontiguousarray(
        np.asarray(lv.txtp_from_uvmode), np.uint8)
    _STATIC["filter_mode_to_y_mode"] = np.ascontiguousarray(
        np.asarray(lv.filter_mode_to_y_mode), np.uint8)
    _STATIC["tx_type_class"] = np.ascontiguousarray(
        np.asarray(lv.tx_type_class), np.int32)
    _STATIC["block_dimensions"] = np.ascontiguousarray(
        lv.block_dimensions, np.int32)
    return _STATIC


class NativeCoefTile:
    """Per-tile native coefficient decoder; shares the tile's CDF
    arrays (adaptation happens in native code, in place) and ping-pongs
    the msac state across calls."""

    def __init__(self, tp):
        st = _static_tables()
        self.tp = tp
        self._keep = []                    # keep converted arrays alive
        c = self.ctx = _CoefCtx()
        f = tp.f
        cdf = tp.cdf
        co = cdf.coef

        c.skip = _p16(co.skip)
        ebins = (co.eob_bin_16, co.eob_bin_32, co.eob_bin_64,
                 co.eob_bin_128, co.eob_bin_256, co.eob_bin_512,
                 co.eob_bin_1024)
        for i, e in enumerate(ebins):
            c.eob_bin[i] = _p16(e)
            c.eob_bin_stride[i] = e.shape[-1]
        c.eob_hi_bit = _p16(co.eob_hi_bit)
        c.eob_base_tok = _p16(co.eob_base_tok)
        c.base_tok = _p16(co.base_tok)
        c.dc_sign = _p16(co.dc_sign)
        c.br_tok = _p16(co.br_tok)
        c.txtp_intra1 = _p16(cdf.m.txtp_intra1)
        c.txtp_intra2 = _p16(cdf.m.txtp_intra2)
        c.txtp_inter1 = _p16(cdf.m.txtp_inter1)
        c.txtp_inter2 = _p16(cdf.m.txtp_inter2)
        c.txtp_inter3 = _p16(cdf.m.txtp_inter3)

        c.txfm_dim = st["txfm_dim"].ctypes.data_as(u8p)
        for t in range(19):
            c.scans[t] = st["scans"][t].ctypes.data_as(u16p)
        c.lo_ctx_offsets = st["lo_ctx_offsets"].ctypes.data_as(u8p)
        c.tx_types_per_set = st["tx_types_per_set"].ctypes.data_as(i32p)
        c.skip_ctx_tbl = st["skip_ctx_tbl"].ctypes.data_as(u8p)
        c.txtp_from_uvmode = st["txtp_from_uvmode"].ctypes.data_as(u8p)
        c.filter_mode_to_y_mode = \
            st["filter_mode_to_y_mode"].ctypes.data_as(u8p)
        c.tx_type_class = st["tx_type_class"].ctypes.data_as(i32p)
        c.block_dimensions = st["block_dimensions"].ctypes.data_as(i32p)

        for tx in range(19):
            for pl in range(3):
                q = f.qm[tx][pl] if f.qm is not None else None
                if q is None:
                    c.qm[tx * 3 + pl] = None
                else:
                    qa = np.ascontiguousarray(np.asarray(q).ravel(),
                                              np.uint8)
                    self._keep.append(qa)
                    c.qm[tx * 3 + pl] = qa.ctypes.data_as(u8p)

        fh = f.frame_hdr
        lossless = np.ascontiguousarray(
            np.asarray(fh.segmentation.lossless, np.uint8))
        qidx = np.ascontiguousarray(
            np.asarray(fh.segmentation.qidx, np.int32))
        self._keep += [lossless, qidx]
        c.seg_lossless = lossless.ctypes.data_as(u8p)
        c.seg_qidx = qidx.ctypes.data_as(i32p)
        c.ss_hor = f.ss_hor
        c.ss_ver = f.ss_ver
        c.bitdepth = 8 + 2 * f.seq_hdr.hbd if f.seq_hdr.hbd < 2 else 12
        c.reduced_txtp_set = int(fh.reduced_txtp_set)
        c.levels_buf = tp.levels_buf.ctypes.data_as(u8p)

        m = tp.msac
        self._buf = m.buf if isinstance(m.buf, bytes) else bytes(m.buf)
        c.msac.buf = ct.cast(ct.c_char_p(self._buf), ct.c_void_p)
        c.msac.end = m.end
        self._out = np.empty(2, np.int32)
        self._out0 = self._out.ctypes.data
        self._out1 = self._out0 + 4
        self._ctx_ptr = ct.addressof(c)
        self._dq_ptr_of = None
        # TXFM_INFO coded sizes: cf length per tx
        self._cf_len = [min(lv.TXFM_INFO[t].w, 8) *
                        min(lv.TXFM_INFO[t].h, 8) * 16 for t in range(19)]
        self._decode_fn = _lib.coef_decode
        self._empty = np.empty

    def decode(self, a_slice, l_slice, tx, bs, b, intra, plane, ytxtp):
        tp = self.tp
        m = tp.msac
        c = self.ctx
        cm = c.msac
        cm.pos = m.pos
        cm.dif = m.dif
        cm.rng = m.rng
        cm.cnt = m.cnt
        cm.allow_update = m.allow_update_cdf
        dq = tp.dq                        # may be sb-local (delta_q)
        if dq is not self._dq_ptr_of:
            c.dq = ct.cast(dq.ctypes.data, i32p)
            self._dq_ptr_of = dq
        cf = self._empty(self._cf_len[tx], np.int32)
        cf_ctx = self._decode_fn(
            self._ctx_ptr,
            a_slice.__array_interface__["data"][0],
            l_slice.__array_interface__["data"][0],
            tx, bs, intra, plane, ytxtp, b.seg_id,
            b.uv_mode, b.y_mode, b.y_angle,
            cf.__array_interface__["data"][0], self._out0, self._out1)
        m.pos = cm.pos
        m.dif = cm.dif
        m.rng = cm.rng
        m.cnt = cm.cnt
        out = self._out
        eob = int(out[1])
        return int(out[0]), eob, (cf if eob >= 0 else None), cf_ctx
