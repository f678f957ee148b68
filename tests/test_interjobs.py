"""Native inter-job emitter (native/interjobs.cpp) parity vs the
golden Python collector walk (recon/inter_device.py): decoding the
same stream through both job-collection paths must be bit-identical,
and the lazy-block plan mode (no Python Block materialize) must match
the materialized mode. SURVEY.md §4 config-invariance strategy."""
import hashlib
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.recon import inter_jobs_native

pytestmark = pytest.mark.skipif(not inter_jobs_native._lib,
                                reason="native engine not built")


def _pyr_refidx(fi):
    m = {1: (0,) * 7, 2: (0, 0, 0, 0, 1, 1, 1), 3: (0, 0, 0, 0, 2, 2, 1),
         4: (2, 2, 2, 2, 3, 3, 1), 5: (3, 2, 0, 4, 1, 1, 4)}
    return m[min(fi, 5)]


PYR = dict(order_hints=[0, 8, 4, 2, 6, 5], refidx_fn=_pyr_refidx,
           refresh_fn=lambda fi: 1 << fi)
CONFIGS = [
    dict(name="everything", w=128, h=128, n_frames=6, seed=44,
         gmv_types=lambda fi, rng: [0, 2, 0, 1, 0, 3, 0],
         warped_motion=1, switchable_motion_mode=1, jnt_comp=1,
         inter_intra=1, masked_compound=1, dual_filter=1,
         ref_frame_mvs=1, use_ref_frame_mvs=1, allow_skip_mode=1, **PYR),
    dict(name="sub8x8", w=70, h=50, n_frames=4, seed=8),
    dict(name="multitile", w=128, h=128, n_frames=4, seed=46,
         tile_log2_cols=1, tile_log2_rows=1, ref_frame_mvs=1,
         use_ref_frame_mvs=1, **PYR),
]
IDS = [c["name"] for c in CONFIGS]


def _decode_md5(data):
    dec = ObuStreamDecoder()
    h = hashlib.md5()
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            for pl in pic.planes:
                h.update(pl.tobytes())
    return h.hexdigest()


@pytest.mark.parametrize("cfg", CONFIGS, ids=IDS)
def test_emitter_matches_python_collector(cfg, monkeypatch):
    cfg = dict(cfg)
    cfg.pop("name")
    w, hh = cfg.pop("w"), cfg.pop("h")
    data, _ = generate_stream(w, hh, **cfg)

    monkeypatch.setenv("DAV1D_TPU_INTERJOBS", "python")
    golden = _decode_md5(data)
    monkeypatch.setenv("DAV1D_TPU_INTERJOBS", "native")
    native = _decode_md5(data)
    assert native == golden


def test_lazy_plan_never_materializes(monkeypatch):
    """The lazy fast path must (a) decode bit-exactly and (b) leave
    plan.blocks empty on inter frames with no golden-path leftovers."""
    from dav1d_tpu.utils.muxers import Md5Muxer

    data, _ = generate_stream(96, 96, n_frames=5, seed=24, jnt_comp=1,
                              **PYR)
    monkeypatch.setenv("DAV1D_TPU_INTERJOBS", "native")
    dec = ObuStreamDecoder()
    lazy_seen = 0
    for fr in IvfReader(data):
        for plan, _pic in dec.decode_temporal_unit(fr.data):
            if plan.lazy_blocks and not plan.blocks:
                lazy_seen += 1
    assert lazy_seen >= 1
