#!/usr/bin/env python3
"""Per-kernel device benchmark — the checkasm `--bench` analog
(reference tests/checkasm/checkasm.c:—; meson `--bench` target,
tests/meson.build:94-95). Times each DSP family's *production* device
kernel in isolation on 1080p-shaped inputs and prints one row per
kernel: wall ms/call (post-warmup, compute synced) and effective
megapixels per second.

Filter-family kernels run with the exact argument tensors the decoder
builds for a real 1080p stream (Stage A of the bench stream feeds the
same host-side table builders); MC/itx batches are synthesized at
production batch shapes.

Usage: python tools/benchkernels.py [--reps N]
"""
import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def timed(fn, args, reps, sync):
    fn(*args)               # compile + warm
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    reps = args.reps

    import bench
    bench._ensure_stream()
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder
    from dav1d_tpu.ops.backend import jax_mod, device_scope

    jax = jax_mod()
    jnp = jax.numpy
    sync = jax.block_until_ready

    data = open(bench.CACHE, "rb").read()
    dec = ObuStreamDecoder(do_recon=False)
    plans = []
    for fr in IvfReader(data):
        plans.extend(dec.decode_temporal_unit(fr.data))
    kplan = plans[0]            # keyframe: filters exercise everything
    f = kplan.f
    H, W = 1088, 1920
    mpx = (1920 * 1080) / 1e6
    rows = []

    with device_scope():
        planes = [jnp.asarray(np.random.randint(0, 255, (H, W), np.uint8)
                              .astype(np.int32)),
                  jnp.asarray(np.random.randint(0, 255, (H // 2, W // 2),
                                                np.uint8).astype(np.int32)),
                  jnp.asarray(np.random.randint(0, 255, (H // 2, W // 2),
                                                np.uint8).astype(np.int32))]
        sync(planes)

        # ---- deblock (production entry, real plan maps) --------------
        # both formulations where available: XLA whole-plane vs the
        # Pallas phase-split kernel (ops/lf_pallas.py)
        from dav1d_tpu.ops.lf import deblock_planes_device
        from dav1d_tpu.ops import lf_pallas
        lf_modes = ["xla"]
        if not lf_pallas._interpret() and lf_pallas._probe():
            lf_modes.append("pallas")
        prev_lf = os.environ.get("DAV1D_TPU_LF")
        for mode in lf_modes:
            os.environ["DAV1D_TPU_LF"] = mode
            dt = timed(lambda p: deblock_planes_device(list(p), kplan, 8),
                       (planes,), reps, sync)
            rows.append((f"deblock 3-plane [{mode}]", dt, mpx * 1.5))
        if prev_lf is None:
            os.environ.pop("DAV1D_TPU_LF", None)
        else:
            os.environ["DAV1D_TPU_LF"] = prev_lf

        # ---- CDEF ----------------------------------------------------
        from dav1d_tpu.ops.cdef import cdef_planes_device
        dt = timed(lambda p: cdef_planes_device(list(p), kplan, 8),
                   (planes,), reps, sync)
        rows.append(("cdef 3-plane", dt, mpx * 1.5))

        # ---- loop restoration ----------------------------------------
        from dav1d_tpu.ops.lr import lr_planes_device
        pre = [p for p in planes]
        dt = timed(lambda p: lr_planes_device(list(p), pre, kplan, 8),
                   (planes,), reps, sync)
        rows.append(("loop-restoration 3-plane", dt, mpx * 1.5))

        # ---- MC: 8-tap puts, production batch shapes -----------------
        from dav1d_tpu.ops import mc as mcdev
        fb = mcdev.filter_banks()
        rng = np.random.default_rng(7)
        REF = jnp.asarray(rng.integers(0, 255, (4, H, W)).astype(np.int32))
        sync(REF)
        for cls, n in ((16, 2048), (32, 512)):
            hw = cls
            rows_t = rng.integers(0, H - hw - 8, (n, hw + 7)).astype(np.int32)
            cols_t = rng.integers(0, W - hw - 8, (n, hw + 7)).astype(np.int32)
            rows_t.sort(axis=1)
            cols_t.sort(axis=1)
            slot = rng.integers(0, 4, n).astype(np.int32)
            fh = fb[0, 0, rng.integers(0, 16, n)].astype(np.int32)
            fv = fb[0, 0, rng.integers(0, 16, n)].astype(np.int32)
            drows = rng.integers(0, H - hw, (n, 1)).astype(np.int32) + \
                np.arange(hw, dtype=np.int32)
            dcols = rng.integers(0, W - hw, (n, 1)).astype(np.int32) + \
                np.arange(hw, dtype=np.int32)
            fn = mcdev._put8_scatter_fn(n, hw, hw, 8)
            dt = timed(fn, (REF, rows_t, cols_t, slot, fh, fv, planes[0],
                            drows, dcols), reps, sync)
            rows.append((f"mc put8 n={n} {cls}x{cls}", dt,
                         n * hw * hw / 1e6))

        # ---- compound ------------------------------------------------
        n, hw = 512, 16
        parts = []
        for _ in range(2):
            parts += [rng.integers(0, H - hw - 8, (n, hw + 7))
                      .astype(np.int32),
                      rng.integers(0, W - hw - 8, (n, hw + 7))
                      .astype(np.int32),
                      rng.integers(0, 4, n).astype(np.int32),
                      fb[0, 0, rng.integers(0, 16, n)].astype(np.int32),
                      fb[0, 0, rng.integers(0, 16, n)].astype(np.int32)]
        mode = np.full(n, 2, np.int32)
        jw = np.full(n, 8, np.int32)
        sign = np.zeros(n, np.int32)
        msk = np.zeros((n, hw, hw), np.int8)
        drows = rng.integers(0, H - hw, (n, 1)).astype(np.int32) + \
            np.arange(hw, dtype=np.int32)
        dcols = rng.integers(0, W - hw, (n, 1)).astype(np.int32) + \
            np.arange(hw, dtype=np.int32)
        fn = mcdev._compound_scatter_fn(n, hw, hw, 8, 1, 1)
        dt = timed(lambda *a: fn(*a)[0],
                   (REF, *parts, mode, jw, sign, msk, planes[0], drows,
                    dcols), reps, sync)
        rows.append((f"mc compound n={n} {hw}x{hw}", dt,
                     n * hw * hw / 1e6))

        # ---- itx (batched residuals, device backend) -----------------
        from dav1d_tpu.ops import itx as itxdev
        for tx, hw_t in ((0, 4), (3, 32)):
            nb = 1024 if hw_t == 4 else 128
            cf = jnp.asarray(rng.integers(-512, 512,
                                          (nb, hw_t * hw_t))
                             .astype(np.int32))
            sync(cf)
            jfn = jax.jit(itxdev.residual_fn(tx, 0, 8))
            dt = timed(jfn, (cf,), reps, sync)
            rows.append((f"itx dct{hw_t}x{hw_t} n={nb}", dt,
                         nb * hw_t * hw_t / 1e6))

        # ---- film grain ----------------------------------------------
        from dav1d_tpu.ops.fg import _fgy_fn, _block_offsets
        from dav1d_tpu.ops.fg_ref import GRAIN_WIDTH

        class _FGD:
            seed = 7

        n_rows = (1080 + 31) // 32
        n_bx = (1920 + 31) // 32
        off = jnp.asarray(_block_offsets(_FGD, n_rows, n_bx))
        lut = jnp.asarray(rng.integers(-128, 128, (73, GRAIN_WIDTH))
                          .astype(np.int32))
        scaling = jnp.asarray(rng.integers(0, 255, 256).astype(np.int32))
        sync([off, lut, scaling])
        fn = _fgy_fn(1080, 1920, 8, 8, True, False, GRAIN_WIDTH)
        dt = timed(fn, (planes[0][:1080, :1920], lut, scaling, off),
                   reps, sync)
        rows.append(("film-grain luma 1080p", dt, mpx))

    print(f"\n{'kernel':34s} {'ms/call':>9s} {'Mpix/s':>9s}")
    for name, dt, work in rows:
        print(f"{name:34s} {1000 * dt:9.2f} {work / dt:9.1f}")


if __name__ == "__main__":
    main()
