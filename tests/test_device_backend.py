"""Device-backend parity: the production XLA Stage-B path (filters,
inter MC, film grain, super-res) must be bit-exact against the golden
numpy reference path on every plane of every frame (SURVEY.md §4 tier 1
checkasm philosophy, applied to whole-frame device programs)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream, generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)

FG = dict(seed=1234, y_points=[(0, 64), (128, 96), (255, 48)],
          ar_coeff_lag=2,
          ar_coeffs_y=[3, -2, 5, 1, -4, 2, 0, 6, -1, 2, 4, -3],
          scaling_shift=9,
          uv_points=[[(0, 32), (255, 80)], [(16, 48), (200, 64)]],
          ar_coeffs_uv=[[1, -1, 2, 0, 3, -2, 1, 0, 2, -1, 0, 1, 5],
                        [0, 2, -3, 1, 0, 4, -1, 2, 0, 1, -2, 3, 7]],
          uv_mult=[20, -10], uv_luma_mult=[60, 80],
          uv_offset=[30, -40], overlap_flag=1,
          clip_to_restricted_range=0)

CONFIGS = [
    dict(name="filters", intra=True, width=96, height=96, qidx=120,
         seed=201, n_frames=2, lf_levels=(24, 20, 30, 16),
         cdef_params=(2, 1, [9, 20], [5, 13]), lr_types=(2, 3, 1)),
    dict(name="inter-tools", width=128, height=96, n_frames=5, seed=202,
         jnt_comp=1, masked_compound=1, allow_skip_mode=1,
         lf_levels=(20, 20, 14, 14), **PYR),
    dict(name="warp-obmc", width=96, height=96, n_frames=4, seed=203,
         warped_motion=1, switchable_motion_mode=1,
         cdef_params=(2, 0, [17], [9])),
    dict(name="interintra", width=128, height=128, n_frames=4, seed=204,
         inter_intra=1, masked_compound=1, **PYR),
    dict(name="hbd", width=96, height=96, n_frames=4, seed=205, hbd=1,
         jnt_comp=1, lf_levels=(18, 18, 12, 12), lr_types=(2, 0, 2),
         **PYR),
    dict(name="odd-dual", width=132, height=68, n_frames=4, seed=206,
         dual_filter=1, lf_levels=(30, 26, 22, 24), **PYR),
    dict(name="superres-grain", intra=True, width=160, height=96,
         qidx=120, seed=207, n_frames=2, superres_denom=11,
         lr_types=(2, 0, 2), film_grain=FG),
    dict(name="i444", width=96, height=96, n_frames=3, seed=208,
         layout=3, lf_levels=(24, 24, 24, 24),
         cdef_params=(1, 1, [9, 20], [5, 13])),
    dict(name="i422", width=96, height=96, n_frames=3, seed=209,
         layout=2, lf_levels=(24, 24, 24, 24)),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_device_matches_golden(cfg):
    cfg = dict(cfg)
    cfg.pop("name")
    intra = cfg.pop("intra", False)
    gen = generate_intra_stream if intra else generate_stream
    data, _ = gen(**cfg)
    frames = [fr.data for fr in IvfReader(data)]
    outs = {}
    old = os.environ.get("DAV1D_TPU_BACKEND")
    try:
        for backend in ("numpy", "device"):
            os.environ["DAV1D_TPU_BACKEND"] = backend
            dec = ObuStreamDecoder()
            pics = []
            for fd in frames:
                for plan, pic in dec.decode_temporal_unit(fd):
                    if pic is not None:
                        pics.append([p.copy() for p in pic.planes])
            outs[backend] = pics
    finally:
        if old is None:
            os.environ.pop("DAV1D_TPU_BACKEND", None)
        else:
            os.environ["DAV1D_TPU_BACKEND"] = old
    assert len(outs["numpy"]) == len(outs["device"])
    for fi, (a, b) in enumerate(zip(outs["numpy"], outs["device"])):
        for pi, (pa, pb) in enumerate(zip(a, b)):
            assert np.array_equal(pa, pb), \
                f"frame {fi} plane {pi}: device != golden"
