"""Multi-chip sharding correctness: a real multi-tile decode with the
deblock stage column-sharded over a ('gop', 'tile') mesh (32px halo
exchange via ppermute) must be md5-identical to the single-device
decode for every device count (SURVEY §2.7.7; reference boundary state
per src/decode.c:2732-2740). conftest forces 8 virtual CPU devices."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from dav1d_tpu.parallel.sharded import (itx_sharded_check,
                                        single_device_md5,
                                        sharded_decode_md5)
from tools.streamgen.gen import generate_stream


@pytest.fixture(scope="module")
def stream():
    data, _ = generate_stream(192, 128, n_frames=4, seed=5,
                              tile_log2_cols=1, tile_log2_rows=1,
                              lf_levels=(32, 32, 20, 20))
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
