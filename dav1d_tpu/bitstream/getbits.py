"""MSB-first bit reader for AV1 OBU headers.

Behavior matches the reference reader (reference src/getbits.c:36-164):
error latch on overrun, uleb128 / uniform (ns) / vlc / subexp helpers,
byte alignment. get_sbits(n) sign-extends an n-bit read (two's complement),
exactly like the reference's GET_BITS(int, int64_t) instantiation.

This is host-side scalar code on purpose — header parsing is a few hundred
bits per frame and irreducibly sequential; the TPU path starts at the
tensorized symbol-decode output (see dav1d_tpu.entropy).
"""
from __future__ import annotations


def inv_recenter(r: int, v: int) -> int:
    """reference include/common/intops.h:75-82."""
    if v > (r << 1):
        return v
    if (v & 1) == 0:
        return (v >> 1) + r
    return r - ((v + 1) >> 1)


class GetBits:
    __slots__ = ("data", "bitpos", "nbits", "error")

    def __init__(self, data):
        self.data = data
        self.bitpos = 0
        self.nbits = len(data) * 8
        self.error = False

    # -- core -----------------------------------------------------------
    def get_bit(self) -> int:
        return self.get_bits(1)

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bitpos + n > self.nbits:
            # latch error; like the reference, return whatever high bits
            # remain zero-padded (callers must check .error)
            self.error = True
            self.bitpos = self.nbits
            return 0
        pos = self.bitpos
        data = self.data
        end = pos + n
        # gather the bytes covering [pos, end)
        first_byte = pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(data[first_byte:last_byte], "big")
        total_bits = (last_byte - first_byte) * 8
        v = (chunk >> (total_bits - (end - first_byte * 8))) & ((1 << n) - 1)
        self.bitpos = end
        return v

    def get_sbits(self, n: int) -> int:
        """Read n bits, sign-extend (two's complement)."""
        v = self.get_bits(n)
        half = 1 << (n - 1)
        return v - (1 << n) if v >= half else v

    # -- derived codes ---------------------------------------------------
    def get_uleb128(self) -> int:
        val = 0
        i = 0
        while True:
            v = self.get_bits(8)
            more = v & 0x80
            val |= (v & 0x7F) << i
            i += 7
            if not more or i >= 56:
                break
        if val > 0xFFFFFFFF or more:
            self.error = True
            return 0
        return val

    def get_uniform(self, mx: int) -> int:
        """ns(n): output in [0, mx-1]; mx must be > 1
        (reference getbits.c:114-123)."""
        assert mx > 1
        l = mx.bit_length()  # == floor(log2(mx)) + 1
        m = (1 << l) - mx
        v = self.get_bits(l - 1)
        if v < m:
            return v
        return (v << 1) - m + self.get_bit()

    def get_vlc(self) -> int:
        if self.get_bit():
            return 0
        n_bits = 0
        while True:
            n_bits += 1
            if n_bits == 32:
                return 0xFFFFFFFF
            if self.get_bit():
                break
        return ((1 << n_bits) - 1) + self.get_bits(n_bits)

    def _subexp_u(self, ref: int, n: int) -> int:
        """reference getbits.c:137-160."""
        v = 0
        i = 0
        while True:
            b = 3 + i - 1 if i else 3
            if n < v + 3 * (1 << b):
                v += self.get_uniform(n - v + 1)
                break
            if not self.get_bit():
                v += self.get_bits(b)
                break
            v += 1 << b
            i += 1
        return inv_recenter(ref, v) if ref * 2 <= n else n - inv_recenter(n - ref, v)

    def get_bits_subexp(self, ref: int, n: int) -> int:
        return self._subexp_u(ref + (1 << n), 2 << n) - (1 << n)

    # -- alignment / position -------------------------------------------
    def bytealign(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def pos(self) -> int:
        return self.bitpos

    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3

    def has_pending_bits(self) -> bool:
        return self.bitpos < self.nbits
