"""Motion compensation — Pallas TPU kernel for the 8-tap put family.

The hottest DSP family by call volume (reference src/mc_tmpl.c:51-197
put_8tap; ~44.9k LoC of x86 asm in the reference tree), with the
compute stage expressed as a hand-written TPU kernel: the grid runs
one program per MC job, the job's (h+7, w+7) source patch lands in
VMEM, the per-job resolved filter rows sit in SMEM, and the separable
8-tap MAC + two rounding stages + clip run on the VPU. The source
gather (clamped window read out of the reference-plane stack — the
emu_edge equivalent) stays an XLA gather feeding the kernel: patch
extraction is a data-movement problem XLA already schedules well,
while the MAC pipeline is the part worth owning.

Bit-exact with ops/mc.py `_put8_fn` (the batched XLA formulation) and
ops/mc_ref.py (the golden model) — tests run the kernel in interpret
mode off-TPU and compiled through Mosaic on TPU.

On the current tunnel-attached part the decode is transfer/host bound,
not kernel bound (tools/benchkernels.py: XLA put8 ~0.4ms per 2048-job
batch), so the XLA formulation stays the default; call `put8_pallas`
directly to use this kernel. Known environment limitation: the axon
tunnel's *remote* Mosaic compile service (tpu_compile_helper) exits 1
on this kernel even with hardware-tile-aligned buffers — simple
lane-aligned kernels compile fine through the same tunnel, so this is
a service-side restriction, not a kernel-shape violation; on a
directly-attached TPU the kernel compiles through the normal local
Mosaic path. Interpret mode validates the kernel bit-exactly
everywhere (tests/test_mc_pallas.py).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .backend import jax_mod
from .mc_ref import intermediate_bits


@lru_cache(maxsize=None)
def _put8_pallas_fn(n, h, w, bd, interpret):
    """pallas_call wrapper: one grid step per MC job. Inputs:
    patches (n, h+7, w+7) int32 pre-gathered source windows;
    fh/fv (n, 8) int32 resolved filter rows. Output (n, h, w) int32."""
    import sys

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # pallas kernel tracing recurses deeply (observed RecursionError at
    # the default limit both in interpret mode and Mosaic lowering)
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))
    jnp = jax_mod().numpy
    ib = intermediate_bits(bd)
    px_max = (1 << bd) - 1
    rnd_h = (1 << (6 - ib)) >> 1
    rnd_v = (1 << (6 + ib)) >> 1

    # dtype-pinned constants: with jax_enable_x64 active, weakly-typed
    # Python ints can materialize int64 convert_element_type nodes that
    # the Mosaic lowering cannot handle (observed as infinite recursion
    # in jaxpr_subcomp)
    i32 = jnp.int32

    # hardware-tile-aligned buffer geometry: int32 VMEM tiles are
    # (8, 128), and the tunnel's remote Mosaic compiler rejects
    # sub-tile block shapes — inputs/outputs pad to (sublane x lane)
    # multiples, values inside the kernel keep their natural shapes
    def r8(v):
        return (v + 7) & ~7

    hp = r8(h + 7)
    wp = max(128, -(-(w + 7) // 128) * 128)
    ho = r8(h)

    def kernel(patch_ref, fh_ref, fv_ref, out_ref):
        i = pl.program_id(0)
        patch = patch_ref[0]                    # (hp, wp) int32
        # horizontal 8-tap into (h+7, w)
        mid = fh_ref[i, 0] * patch[:h + 7, 0:w]
        for t in range(1, 8):
            mid = mid + fh_ref[i, t] * patch[:h + 7, t:t + w]
        mid = (mid + i32(rnd_h)) >> i32(6 - ib)
        # vertical 8-tap into (h, w)
        acc = fv_ref[i, 0] * mid[0:h]
        for t in range(1, 8):
            acc = acc + fv_ref[i, t] * mid[t:t + h]
        acc = (acc + i32(rnd_v)) >> i32(6 + ib)
        res = jnp.minimum(jnp.maximum(acc, i32(0)), i32(px_max))
        # partial store; the caller slices the padding off
        out_ref[0, :h, :w] = res

    def fn(patches, fh, fv):
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),   # fh (n, 8)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # fv (n, 8)
            ],
            out_specs=pl.BlockSpec((1, ho, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, ho, wp), jnp.int32),
            interpret=interpret,
        )(patches, fh, fv)
        return out[:, :h, :w]

    return jax.jit(fn), hp, wp


def put8_pallas(REF, rows, cols, slot, fh, fv, bd, interpret=False):
    """Batched 8-tap put matching mc.py `_put8_fn`'s contract:
    REF (R, Hr, Wr) plane stack; rows (n, h+7) / cols (n, w+7) clamped
    gather ids; slot (n,); fh/fv (n, 8) resolved taps.
    Returns (n, h, w) int32."""
    jnp = jax_mod().numpy
    n, hw7 = np.asarray(rows).shape
    w7 = np.asarray(cols).shape[1]
    h, w = hw7 - 7, w7 - 7
    REF = jnp.asarray(REF)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    slot = jnp.asarray(slot)
    patches = REF[slot[:, None, None], rows[:, :, None],
                  cols[:, None, :]].astype(jnp.int32)
    fn, hp, wp = _put8_pallas_fn(n, h, w, bd, interpret)
    patches = jnp.pad(patches, ((0, 0), (0, hp - (h + 7)),
                                (0, wp - (w + 7))))
    return fn(patches, np.asarray(fh, np.int32),
              np.asarray(fv, np.int32))
