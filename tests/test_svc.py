"""Temporal-SVC e2e: operating-point filtering (reference
obu.c:1203-1210) exercised end-to-end against the oracle binary —
VERDICT r1: the operating_point/all_layers paths were never hit e2e."""
import os
import subprocess

import pytest

from dav1d_tpu.api import Decoder, Settings
from dav1d_tpu.bitstream.ivf import IvfReader
from dav1d_tpu.utils.muxers import Md5Muxer
from tools.streamgen.gen import generate_stream

ORACLE = "/root/repo/oracle-build/dav1d"


@pytest.fixture(scope="module")
def svc_stream():
    """6 frames: tid-0 base layer (slots refreshed) interleaved with
    tid-1 non-reference enhancement frames; two operating points —
    op0 = both layers (idc 0x103), op1 = base only (idc 0x101)."""
    n = 6
    tids = [0 if fi % 2 == 0 else 1 for fi in range(n)]
    data, _ = generate_stream(
        160, 96, n_frames=n, seed=17,
        temporal_ids=tids, operating_points=[0x103, 0x101],
        refidx_fn=lambda fi: (1,) * 7,
        refresh_fn=lambda fi: 0x02 if fi % 2 == 0 else 0x00)
    return data


def _decode_md5(data, **kw):
    dec = Decoder(Settings(n_threads=1, **kw))
    mux = Md5Muxer()
    n = 0
    for fr in IvfReader(data):
        dec.send_data(fr.data)
    for pic in dec.pictures():
        mux.write_picture(pic)
        n += 1
    return n, mux._md5.hexdigest()


def _oracle_md5(path, *opts):
    r = subprocess.run([ORACLE, "-q", "-i", str(path), "--muxer", "md5",
                        "-o", "-", *opts], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    return r.stdout.strip().split()[0]


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_svc_all_layers_vs_oracle(svc_stream, tmp_path):
    path = tmp_path / "svc.ivf"
    path.write_bytes(svc_stream)
    n, md5 = _decode_md5(svc_stream)
    assert n == 6
    assert md5 == _oracle_md5(path)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_svc_base_operating_point_vs_oracle(svc_stream, tmp_path):
    path = tmp_path / "svc.ivf"
    path.write_bytes(svc_stream)
    n, md5 = _decode_md5(svc_stream, operating_point=1)
    assert n == 3                      # tid-1 frames filtered out
    assert md5 == _oracle_md5(path, "--oppoint", "1")
    # and differs from the full-layer decode
    assert md5 != _decode_md5(svc_stream)[1]
