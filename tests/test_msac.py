"""msac decoder/encoder tests.

Tier 1 of SURVEY.md §4: randomized sweeps vs the reference implementation
(oracle harness), checkasm-style, plus encoder round-trips.
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from dav1d_tpu.entropy.msac import MsacDecoder, MsacEncoder

HARNESS = "/root/repo/oracle-build/msac_harness"

rng = np.random.default_rng(1234)


def _random_cdf(n_symbols: int) -> np.ndarray:
    """Random strictly-decreasing inverse-CDF in Q15 with slack for the
    EC_MIN_PROB floor, plus a random adaptation count cell."""
    cuts = np.sort(rng.choice(np.arange(64, 32768 - 64, dtype=np.int64),
                              size=n_symbols, replace=False))[::-1]
    cdf = np.zeros(n_symbols + 1, dtype=np.uint16)
    cdf[:n_symbols] = cuts
    cdf[n_symbols] = rng.integers(0, 33)
    return cdf


def _gen_ops(n_ops: int, seed: int):
    r = np.random.default_rng(seed)
    ops = []
    for _ in range(n_ops):
        kind = int(r.integers(0, 6))
        if kind == 0:
            ops.append(("equi",))
        elif kind == 1:
            ops.append(("bool", int(r.integers(64, 32768 - 64))))
        elif kind == 2:
            n = int(r.integers(1, 16))
            ops.append(("symbol", n, _random_cdf(n)))
        elif kind == 3:
            ops.append(("bool_adapt", _random_cdf(1)))
        elif kind == 4:
            ops.append(("hi_tok", _random_cdf(3)))
        else:
            k = int(r.integers(0, 5))
            n = 8 << k
            ops.append(("subexp", int(r.integers(0, n)), n, k))
    return ops


def _run_oracle(stream: bytes, ops, disable_cdf: bool):
    req = struct.pack("<I", len(stream)) + stream + bytes([disable_cdf])
    req += struct.pack("<I", len(ops))
    for op in ops:
        if op[0] == "equi":
            req += b"\x00"
        elif op[0] == "bool":
            req += b"\x01" + struct.pack("<H", op[1])
        elif op[0] == "symbol":
            req += b"\x02" + bytes([op[1]]) + op[2].astype("<u2").tobytes()
        elif op[0] == "bool_adapt":
            req += b"\x03" + op[1].astype("<u2").tobytes()
        elif op[0] == "hi_tok":
            req += b"\x04" + op[1].astype("<u2").tobytes()
        elif op[0] == "subexp":
            req += b"\x05" + struct.pack("<HHB", op[1], op[2], op[3])
    inp, outp = "/tmp/msac_in.bin", "/tmp/msac_out.bin"
    with open(inp, "wb") as f:
        f.write(req)
    subprocess.run([HARNESS, inp, outp], check=True)
    data = open(outp, "rb").read()
    vals, cdfs = [], []
    off = 0
    for op in ops:
        vals.append(struct.unpack_from("<I", data, off)[0])
        off += 4
        if op[0] in ("symbol", "bool_adapt", "hi_tok"):
            n = len(op[-1])
            cdfs.append(np.frombuffer(data, dtype="<u2", count=n, offset=off).copy())
            off += 2 * n
        else:
            cdfs.append(None)
    final = struct.unpack_from("<IQi", data, off)
    return vals, cdfs, final


def _run_mine(stream: bytes, ops, disable_cdf: bool):
    d = MsacDecoder(stream, disable_cdf_update=disable_cdf)
    vals, cdfs = [], []
    for op in ops:
        if op[0] == "equi":
            vals.append(d.decode_bool_equi())
            cdfs.append(None)
        elif op[0] == "bool":
            vals.append(d.decode_bool(op[1]))
            cdfs.append(None)
        elif op[0] == "symbol":
            cdf = op[2].copy()
            vals.append(d.decode_symbol_adapt(cdf, op[1]))
            cdfs.append(cdf)
        elif op[0] == "bool_adapt":
            cdf = op[1].copy()
            vals.append(d.decode_bool_adapt(cdf))
            cdfs.append(cdf)
        elif op[0] == "hi_tok":
            cdf = op[1].copy()
            vals.append(d.decode_hi_tok(cdf))
            cdfs.append(cdf)
        elif op[0] == "subexp":
            vals.append(d.decode_subexp(op[1], op[2], op[3]) & 0xFFFFFFFF)
            cdfs.append(None)
    return vals, cdfs, (d.rng, d.dif, d.cnt)


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="oracle not built")
@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("disable_cdf", [False, True])
def test_decoder_matches_oracle(seed, disable_cdf):
    r = np.random.default_rng(seed)
    stream = r.integers(0, 256, size=int(r.integers(4, 200)),
                        dtype=np.uint8).tobytes()
    ops = _gen_ops(200, seed * 7 + 1)
    ov, ocdf, ofinal = _run_oracle(stream, ops, disable_cdf)
    mv, mcdf, mfinal = _run_mine(stream, ops, disable_cdf)
    assert ov == mv
    for a, b in zip(ocdf, mcdf):
        if a is not None:
            np.testing.assert_array_equal(a, b)
    assert ofinal[0] == mfinal[0]  # rng
    assert ofinal[1] == mfinal[1]  # dif
    assert ofinal[2] == mfinal[2]  # cnt


@pytest.mark.parametrize("seed", range(6))
def test_encoder_roundtrip_python(seed):
    """Encode a random symbol script, decode with our decoder."""
    r = np.random.default_rng(seed + 100)
    enc = MsacEncoder()
    script = []
    cdf_enc, cdf_dec = {}, {}
    for i in range(300):
        kind = int(r.integers(0, 5))
        if kind == 0:
            bit = int(r.integers(0, 2))
            enc.encode_bool_equi(bit)
            script.append(("equi", bit))
        elif kind == 1:
            f = int(r.integers(64, 32700))
            bit = int(r.integers(0, 2))
            enc.encode_bool(bit, f)
            script.append(("bool", f, bit))
        elif kind == 2:
            n = int(r.integers(1, 16))
            key = ("s", n, i % 4)
            if key not in cdf_enc:
                base = _random_cdf(n)
                cdf_enc[key] = base.copy()
                cdf_dec[key] = base.copy()
            val = int(r.integers(0, n + 1))
            enc.encode_symbol(cdf_enc[key], val, n)
            script.append(("symbol", key, n, val))
        elif kind == 3:
            v = int(r.integers(0, 100))
            enc.encode_uniform(v, 101)
            script.append(("uniform", 101, v))
        else:
            nb = int(r.integers(0, 12))
            v = int(r.integers(0, 1 << nb)) if nb else 0
            enc.encode_bools(v, nb)
            script.append(("bools", nb, v))
    stream = enc.finalize()

    d = MsacDecoder(stream)
    for item in script:
        if item[0] == "equi":
            assert d.decode_bool_equi() == item[1]
        elif item[0] == "bool":
            assert d.decode_bool(item[1]) == item[2]
        elif item[0] == "symbol":
            _, key, n, val = item
            assert d.decode_symbol_adapt(cdf_dec[key], n) == val
        elif item[0] == "uniform":
            assert d.decode_uniform(item[1]) == item[2]
        elif item[0] == "bools":
            assert d.decode_bools(item[1]) == item[2]
    # adaptation trajectories must agree once the full script is replayed
    for key in cdf_enc:
        np.testing.assert_array_equal(cdf_dec[key], cdf_enc[key])


@pytest.mark.skipif(not os.path.exists(HARNESS), reason="oracle not built")
def test_encoder_stream_decodes_in_oracle():
    """Encode with our encoder, decode with the reference oracle."""
    r = np.random.default_rng(42)
    enc = MsacEncoder()
    ops, expected = [], []
    cdf_bank = {}
    for i in range(250):
        n = int(r.integers(1, 16))
        key = (n, i % 3)
        if key not in cdf_bank:
            cdf_bank[key] = (_random_cdf(n), )
        val = int(r.integers(0, n + 1))
        # encoder adapts its own copy; oracle adapts its own copy: both
        # start from the same base per op to keep the test scriptable
        base = _random_cdf(n)
        enc_cdf = base.copy()
        enc.encode_symbol(enc_cdf, val, n)
        ops.append(("symbol", n, base))
        expected.append(val)
    stream = enc.finalize()
    ov, _, _ = _run_oracle(stream, ops, False)
    assert ov == expected
