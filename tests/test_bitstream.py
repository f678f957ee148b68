"""Bit reader + container tests (reference getbits.c semantics)."""
import io

import pytest

from dav1d_tpu.bitstream.getbits import GetBits, inv_recenter
from dav1d_tpu.bitstream import ivf


def test_get_bits_msb_first():
    gb = GetBits(bytes([0b10110001, 0b01000000]))
    assert gb.get_bit() == 1
    assert gb.get_bits(3) == 0b011
    assert gb.get_bits(4) == 0b0001
    assert gb.get_bits(2) == 0b01
    assert not gb.error


def test_get_bits_overrun_latches_error():
    gb = GetBits(b"\xff")
    assert gb.get_bits(8) == 0xFF
    gb.get_bits(1)
    assert gb.error


def test_get_sbits_sign_extends():
    # 4-bit value 0b1111 -> -1; 0b0111 -> 7
    gb = GetBits(bytes([0b11110111]))
    assert gb.get_sbits(4) == -1
    assert gb.get_sbits(4) == 7


def test_uleb128():
    gb = GetBits(bytes([0x80, 0x01]))  # 128
    assert gb.get_uleb128() == 128
    gb = GetBits(bytes([0x7F]))
    assert gb.get_uleb128() == 0x7F


def test_uniform_ns_code():
    # ns(mx): for mx=5, l=3, m=3: values 0..2 in 2 bits, 3..4 in 3 bits
    # v=0b00 -> 0
    assert GetBits(bytes([0b00000000])).get_uniform(5) == 0
    # v=0b11 -> (3<<1)-3+bit
    gb = GetBits(bytes([0b11100000]))
    assert gb.get_uniform(5) == (0b11 << 1) - 3 + 1


def test_vlc():
    assert GetBits(bytes([0b10000000])).get_vlc() == 0
    # 0 1 x: n_bits=1, value = 1 + x
    gb = GetBits(bytes([0b01100000]))
    assert gb.get_vlc() == 1 + 1


def test_inv_recenter():
    # even v -> r + v/2, odd v -> r - (v+1)/2, v > 2r -> v
    assert inv_recenter(5, 4) == 7
    assert inv_recenter(5, 3) == 3
    assert inv_recenter(2, 6) == 6


def test_ivf_roundtrip():
    buf = io.BytesIO()
    w = ivf.IvfWriter(buf, 64, 48)
    w.write_frame(b"hello")
    w.write_frame(b"world!")
    w.finalize()
    r = ivf.IvfReader(buf.getvalue())
    frames = list(r)
    assert r.width == 64 and r.height == 48
    assert r.n_frames == 2
    assert [f.data for f in frames] == [b"hello", b"world!"]
    assert [f.timestamp for f in frames] == [0, 1]
