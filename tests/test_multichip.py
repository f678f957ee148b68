"""Multi-chip sharding correctness: a real decode with the WHOLE
Stage-B pixel pipeline column-sharded over a device mesh — MC passes
A-D (apron-extended shards, replicated refs), deblock, CDEF and loop
restoration (32px ppermute halo exchange each) — must be md5-identical
to the single-device device-backend decode for every device count
(SURVEY §2.7.7; reference boundary state per src/decode.c:2732-2740,
lr_apply_tmpl.c:36-167). conftest forces 8 virtual CPU devices."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from dav1d_tpu.parallel.sharded import (itx_sharded_check,
                                        single_device_md5,
                                        sharded_decode_md5)
from tools.streamgen.gen import generate_stream

# every inter tool + the full filter chain: compounds (avg/wedge/seg),
# OBMC, warp, interintra (host-leftover path), deblock + CDEF + LR
RICH = dict(n_frames=4, seed=5, tile_log2_cols=1, tile_log2_rows=1,
            warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
            inter_intra=1, masked_compound=1, allow_skip_mode=1,
            lf_levels=(32, 32, 20, 20),
            cdef_params=(2, 1, [9, 25], [5, 13]), lr_types=(1, 2, 2))


@pytest.fixture(scope="module")
def stream():
    data, _ = generate_stream(256, 128, **RICH)
    return data


@pytest.fixture(scope="module")
def ref_md5(stream):
    return single_device_md5(stream)


def _cpu_devices():
    # the axon TPU plugin ignores JAX_PLATFORMS; ask for the virtual
    # 8-device CPU platform explicitly
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return jax.devices()


def _mesh(n):
    devs = np.array(_cpu_devices()[:n])
    gop = 2 if n % 2 == 0 else 1
    return Mesh(devs.reshape(gop, n // gop), ("gop", "tile"))


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_decode_md5_invariant(stream, ref_md5, n_devices):
    if len(_cpu_devices()) < n_devices:
        pytest.skip("not enough virtual devices")
    assert sharded_decode_md5(stream, _mesh(n_devices)) == ref_md5


def test_sharded_decode_superres():
    """Super-res re-shards through the all-gather + resample stage."""
    if len(_cpu_devices()) < 4:
        pytest.skip("not enough virtual devices")
    data, _ = generate_stream(192, 96, n_frames=3, seed=9,
                              superres_denom=12,
                              lf_levels=(24, 24, 12, 12),
                              lr_types=(1, 1, 1))
    assert sharded_decode_md5(data, _mesh(4)) == single_device_md5(data)


def test_itx_sharded_psum(stream):
    """GOP-sharded itx over the full mesh with a psum residual-energy
    collective on real coefficients (ICI collective exercise)."""
    if len(_cpu_devices()) < 4:
        pytest.skip("not enough virtual devices")
    import os
    from dav1d_tpu.bitstream.ivf import IvfReader
    from dav1d_tpu.decoder import ObuStreamDecoder

    prev = os.environ.get("DAV1D_TPU_BACKEND")
    os.environ["DAV1D_TPU_BACKEND"] = "numpy"   # materialized coef blocks
    try:
        dec = ObuStreamDecoder()
        for fr in IvfReader(stream):
            for plan, pic in dec.decode_temporal_unit(fr.data):
                if plan is not None and plan.coefs:
                    energy = itx_sharded_check(plan, pic.bpc, _mesh(4))
                    assert energy > 0
                    return
    finally:
        if prev is None:
            os.environ.pop("DAV1D_TPU_BACKEND", None)
        else:
            os.environ["DAV1D_TPU_BACKEND"] = prev
    pytest.skip("no coefficient blocks in stream")
