"""MSB-first bit writer — inverse of dav1d_tpu.bitstream.getbits."""
from __future__ import annotations


class PutBits:
    def __init__(self):
        self.bits = []

    def put_bit(self, v: int) -> None:
        self.bits.append(v & 1)

    def put_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put_sbits(self, v: int, n: int) -> None:
        self.put_bits(v & ((1 << n) - 1), n)

    def put_uleb128(self, v: int) -> None:
        while True:
            byte = v & 0x7F
            v >>= 7
            self.put_bits(byte | (0x80 if v else 0), 8)
            if not v:
                break

    def put_uniform(self, v: int, mx: int) -> None:
        """ns(mx) inverse (getbits.get_uniform)."""
        assert mx > 1
        l = mx.bit_length()
        m = (1 << l) - mx
        if v < m:
            self.put_bits(v, l - 1)
        else:
            vv = v + m
            self.put_bits(vv >> 1, l - 1)
            self.put_bit(vv & 1)

    def bytealign(self, fill: int = 0) -> None:
        while len(self.bits) % 8:
            self.bits.append(fill)

    def trailing_bits(self) -> None:
        """OBU trailing: a 1 bit then zero-pad to byte."""
        self.put_bit(1)
        self.bytealign(0)

    def data(self) -> bytes:
        self.bytealign(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def wrap_obu(obu_type: int, payload: bytes, has_extension=False,
             temporal_id=0, spatial_id=0) -> bytes:
    """OBU header + uleb length + payload (reference obu.c:1175-1195)."""
    hdr = PutBits()
    hdr.put_bit(0)                  # forbidden
    hdr.put_bits(obu_type, 4)
    hdr.put_bit(1 if has_extension else 0)
    hdr.put_bit(1)                  # has_length_field
    hdr.put_bit(0)                  # reserved
    if has_extension:
        hdr.put_bits(temporal_id, 3)
        hdr.put_bits(spatial_id, 2)
        hdr.put_bits(0, 3)
    hdr.put_uleb128(len(payload))
    return hdr.data() + payload
