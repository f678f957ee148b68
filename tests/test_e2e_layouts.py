"""End-to-end chroma-layout / bitdepth matrix validation vs the
reference: 4:2:2 (profile 2), 4:4:4 (profile 1), monochrome, 12-bit
(profile 2), combined with filters, film grain, screen-content tools,
and super-resolution. 4:2:2 forbids vertical partition shapes
(reference decode.c:2151-2156) — the generator masks them."""
import os
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.streamgen.gen import generate_stream, generate_intra_stream
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.decoder import ObuStreamDecoder
from dav1d_tpu.utils.muxers import Md5Muxer

ORACLE = "/root/repo/oracle-build/dav1d"
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle not built")

FG = dict(seed=77, y_points=[(0, 60), (255, 90)], ar_coeff_lag=2,
          ar_coeffs_y=[3, -2, 5, 1, -4, 2, 0, 6, -1, 2, 4, -3],
          uv_points=[[(0, 32), (255, 80)], [(16, 48), (200, 64)]],
          ar_coeffs_uv=[[1, -1, 2, 0, 3, -2, 1, 0, 2, -1, 0, 1, 5],
                        [0, 2, -3, 1, 0, 4, -1, 2, 0, 1, -2, 3, 7]],
          uv_mult=[20, -10], uv_luma_mult=[60, 80], uv_offset=[30, -40],
          overlap_flag=1)
FILTERS = dict(lf_levels=(20, 18, 12, 10),
               cdef_params=(2, 1, [9, 5], [3, 2]), lr_types=(2, 2, 2))

CONFIGS = [
    # 4:4:4 (profile 1)
    dict(name="i444-intra", w=96, h=96, qidx=120, seed=300, n_frames=2,
         layout=3, intra=True),
    dict(name="i444-inter", w=96, h=96, n_frames=4, seed=301, layout=3,
         intra=False),
    dict(name="i444-filters", w=96, h=96, n_frames=3, seed=302, layout=3,
         intra=False, **FILTERS),
    dict(name="i444-hbd", w=96, h=96, qidx=120, seed=303, n_frames=2,
         layout=3, hbd=1, intra=True),
    dict(name="i444-grain", w=96, h=96, qidx=120, seed=304, n_frames=2,
         layout=3, film_grain=FG, intra=True),
    dict(name="i444-palette", w=96, h=96, qidx=100, seed=305, n_frames=2,
         layout=3, screen_content=1, intra=True),
    dict(name="i444-intrabc", w=96, h=96, qidx=100, seed=306, n_frames=2,
         layout=3, screen_content=1, allow_intrabc=1, intra=True),
    # 4:2:2 (profile 2)
    dict(name="i422-intra", w=96, h=96, qidx=120, seed=310, n_frames=2,
         layout=2, intra=True),
    dict(name="i422-inter", w=96, h=96, n_frames=4, seed=311, layout=2,
         intra=False),
    dict(name="i422-filters", w=96, h=96, n_frames=3, seed=312, layout=2,
         intra=False, **FILTERS),
    dict(name="i422-hbd", w=96, h=96, qidx=120, seed=313, n_frames=2,
         layout=2, hbd=1, intra=True),
    dict(name="i422-grain", w=96, h=96, qidx=120, seed=314, n_frames=2,
         layout=2, film_grain=FG, intra=True),
    dict(name="i422-odd", w=70, h=50, qidx=120, seed=315, n_frames=2,
         layout=2, intra=True),
    # monochrome
    dict(name="mono-intra", w=96, h=96, qidx=120, seed=320, n_frames=2,
         monochrome=1, intra=True),
    dict(name="mono-inter", w=96, h=96, n_frames=4, seed=321,
         monochrome=1, intra=False),
    dict(name="mono-filters", w=96, h=96, n_frames=3, seed=322,
         monochrome=1, intra=False, lf_levels=(20, 18, 0, 0),
         cdef_params=(2, 1, [9, 5], [0, 0]), lr_types=(2, 0, 0)),
    # 12-bit (profile 2)
    dict(name="i420-12b-intra", w=96, h=96, qidx=120, seed=330,
         n_frames=2, hbd=2, intra=True),
    dict(name="i420-12b-inter", w=96, h=96, n_frames=3, seed=331, hbd=2,
         intra=False),
    dict(name="i420-12b-filters", w=96, h=96, n_frames=3, seed=332,
         hbd=2, intra=False, **FILTERS),
    dict(name="i444-12b", w=96, h=96, qidx=120, seed=333, n_frames=2,
         layout=3, hbd=2, intra=True),
    dict(name="i422-12b", w=96, h=96, qidx=120, seed=334, n_frames=2,
         layout=2, hbd=2, intra=True),
    dict(name="i420-12b-grain", w=96, h=96, qidx=120, seed=335,
         n_frames=2, hbd=2, film_grain=FG, intra=True),
    # layout x super-res
    dict(name="i444-superres", w=96, h=96, n_frames=3, seed=340,
         layout=3, superres_denom=12, intra=False),
    dict(name="i422-superres", w=96, h=96, n_frames=3, seed=341,
         layout=2, superres_denom=12, intra=False),
    dict(name="mono-superres", w=96, h=96, n_frames=3, seed=342,
         monochrome=1, superres_denom=12, intra=False),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["name"] for c in CONFIGS])
def test_layouts(cfg, tmp_path):
    cfg = dict(cfg)
    cfg.pop("name")
    intra = cfg.pop("intra")
    w, h = cfg.pop("w"), cfg.pop("h")
    gen = generate_intra_stream if intra else generate_stream
    data, _ = gen(w, h, **cfg)
    path = tmp_path / "t.ivf"
    path.write_bytes(data)
    dec = ObuStreamDecoder()
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        for _plan, pic in dec.decode_temporal_unit(fr.data):
            mux.write_picture(pic)
            n += 1
    assert n == cfg["n_frames"]
    args = [ORACLE, "-q", "-i", str(path), "--muxer", "md5", "-o", "-"]
    if cfg.get("film_grain"):
        args += ["--filmgrain", "1"]
    r = subprocess.run(args, capture_output=True, timeout=300)
    assert r.returncode == 0 and b"Error" not in r.stderr, r.stderr.decode()
    assert str(mux.digest()) == r.stdout.decode().strip()
