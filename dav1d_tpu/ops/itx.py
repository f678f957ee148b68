"""Inverse transforms — JAX/TPU batched kernels.

The TPU-native itx path: all coefficient blocks of a frame are bucketed
by (tx, txtp, bitdepth) and each bucket's residuals are computed in one
fused, jitted program — the 1-D butterflies (shared with the scalar
reference via ops/itx_core.py) vectorize over the batch on the VPU, with
XLA fusing the two passes, the inter-pass rounding, and the final
(x + 8) >> 4 into a single HBM-resident kernel. No eob-dependent control
flow: zero rows transform to zero and the DC-only fast path is
bit-identical to the generic path (verified vs the reference), so the
whole bucket runs one static program — exactly the XLA-friendly shape
(SURVEY.md §7: bucketing by tx size/type dissolves dav1d's per-block
dispatch).

int32 arithmetic: the plain rotation forms can wrap for out-of-spec
12-bit streams, matching the reference's own SIMD policy
(itx_1d.c:53-62 — wrapping is acceptable, only UB isn't).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod

# route through backend.jax_mod() so the persistent compilation cache is
# configured before the first jit compile (keyframes hit itx first)
jax = jax_mod()
jnp = jax.numpy

from ..entropy import levels as lv
from . import itx_core
from .itx_core import DCT, ADST, FLIPADST, IDENTITY
from .itx_ref import TX1D_TYPES, TX_SHIFT


def _clip_bounds(tx: int, bitdepth: int):
    bd_max = (1 << bitdepth) - 1
    if bitdepth == 8:
        row_min = col_min = -(1 << 15)
    else:
        row_min = -(bd_max + 1) << 7
        col_min = -(bd_max + 1) << 5
    return row_min, ~row_min, col_min, ~col_min


@lru_cache(maxsize=None)
def residual_fn(tx: int, txtp: int, bitdepth: int):
    """Returns a jitted fn: cf (B, sw*sh) int32 -> residual (B, h, w)
    int32, where residual = (itx(cf) + 8) >> 4 (pre-clip, pre-add)."""
    t_dim = lv.TXFM_INFO[tx]
    w, h = 4 * t_dim.w, 4 * t_dim.h
    sw, sh = min(w, 32), min(h, 32)
    shift = TX_SHIFT[tx]
    rnd = (1 << shift) >> 1
    is_rect2 = (w * 2 == h) or (h * 2 == w)
    row_min, row_max, col_min, col_max = _clip_bounds(tx, bitdepth)
    first_t, second_t = TX1D_TYPES[txtp]
    first_fn = itx_core.FNS[(t_dim.lw + 2, first_t)]
    second_fn = itx_core.FNS[(t_dim.lh + 2, second_t)]

    def fn(cf):
        B = cf.shape[0]
        cfm = cf.reshape(B, sw, sh)              # [x][y] layout
        rows = cfm.transpose(0, 2, 1)            # (B, sh, sw)
        if is_rect2:
            rows = (rows * 181 + 128) >> 8

        def C_row(v):
            return jnp.clip(v, row_min, row_max)

        cols_in = [rows[:, :, i] for i in range(sw)]   # each (B, sh)
        row_out = first_fn(cols_in, C_row)             # w arrays of (B, sh)
        tmp = jnp.stack(row_out, axis=2)               # (B, sh, w)
        tmp = jnp.clip((tmp + rnd) >> shift, col_min, col_max)

        def C_col(v):
            return jnp.clip(v, col_min, col_max)

        col_in = [tmp[:, i, :] for i in range(sh)]     # sh arrays of (B, w)
        col_out = second_fn(col_in, C_col)             # h arrays of (B, w)
        res = jnp.stack(col_out, axis=1)               # (B, h, w)
        return (res + 8) >> 4

    return jax.jit(fn)


def _target_device():
    """DAV1D_TPU_DEVICE=cpu pins the itx kernels to host XLA (used by
    the parity tests; the axon TPU plugin ignores JAX_PLATFORMS)."""
    import os
    name = os.environ.get("DAV1D_TPU_DEVICE")
    if name:
        try:
            return jax.devices(name)[0]
        except RuntimeError:
            return None
    return None


def compute_frame_residuals(coefs, bitdepth: int):
    """Batch all non-skip coefficient blocks of a FramePlan through the
    TPU itx kernels. Returns {id(coef_block): np residual (h, w)}.

    Two-phase: dispatch every bucket's kernel asynchronously (XLA
    queues them back-to-back on device), then overlap all the
    device->host transfers (backend.fetch_all) instead of paying the
    tunnel round-trip latency once per bucket.
    """
    from .backend import fetch_all
    buckets = {}
    for cb in coefs:
        if cb.eob < 0:
            continue
        buckets.setdefault((cb.tx, cb.txtp), []).append(cb)
    out = {}
    pending = []        # block list per dispatched bucket
    arrs = []
    dev = _target_device()
    ctx = jax.default_device(dev) if dev is not None else None
    if ctx is not None:
        ctx.__enter__()
    try:
        for (tx, txtp), blocks in buckets.items():
            cf = np.stack([b.cf for b in blocks]).astype(np.int32)
            if txtp == lv.WHT_WHT:
                res = np.asarray(_wht_batch(cf))
                for b, r in zip(blocks, res):
                    out[id(b)] = r
                continue
            # pad the batch to the next power of two: bounds the number
            # of XLA compilations per (tx, txtp) bucket to log2(B_max)
            B = cf.shape[0]
            Bp = 1 << (B - 1).bit_length()
            if Bp != B:
                cf = np.concatenate(
                    [cf, np.zeros((Bp - B, cf.shape[1]), np.int32)])
            r = residual_fn(tx, txtp, bitdepth)(jnp.asarray(cf))
            pending.append(blocks)
            arrs.append(r[:B])
        fetched = fetch_all(arrs)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    for blocks, res in zip(pending, fetched):
        for b, r in zip(blocks, res):
            out[id(b)] = r
    return out


def _wht_batch(cf):
    """Lossless WHT blocks are rare; reuse the scalar reference."""
    from .itx_ref import _wht_block
    return np.stack([_wht_block(cf[i]) for i in range(cf.shape[0])])
