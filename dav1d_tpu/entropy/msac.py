"""AV1 multi-symbol adaptive arithmetic coder (msac / daala entropy coder).

Decoder semantics are bit-exact with the reference decoder
(reference src/msac.c:41-213): 64-bit window `dif` holding complemented
stream bytes, 16-bit range in [0x8000, 0xFFFF], probabilities in Q15 with
EC_PROB_SHIFT=6 and a 4/64 per-symbol probability floor, CDF adaptation
rate 4 + (count>>4) + (n>2) with the count saturating at 32.

This module also provides MsacEncoder — the inverse coder used by
tools/streamgen to synthesize AV1 test bitstreams (the image has no AV1
encoder; SURVEY.md §4 test strategy). The encoder tracks the interval as
an unbounded Python integer and emits the shortest value inside the final
interval whose trailing bits are zero, matching the decoder's
read-past-end-as-zero convention.

This is the *reference implementation* used by tests; the production
Stage-A path uses the native C library in entropy/native (same
semantics, unit-tested against this one).
"""
from __future__ import annotations

import numpy as np

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
EC_WIN_SIZE = 64
MASK64 = (1 << 64) - 1


def check_trailing_bits(m: "MsacDecoder") -> bool:
    """True iff the symbol coder consumed the payload exactly: a single
    marker 1 bit then zero bits/bytes to the end (reference
    decode.c:2576-2592 check_trailing_bits_after_symbol_coder)."""
    n_bits = -(m.cnt + 14)
    n_bytes = (n_bits + 7) >> 3
    p = m.pos + n_bytes
    pattern = 128 >> ((n_bits - 1) & 7)
    if p < 1 or p > m.end:
        return False
    if (m.buf[p - 1] & (2 * pattern - 1)) != pattern:
        return False
    return not any(m.buf[p:m.end])


class MsacDecoder:
    __slots__ = ("buf", "pos", "end", "dif", "rng", "cnt", "allow_update_cdf")

    def __init__(self, data, disable_cdf_update: bool = False):
        self.buf = data
        self.pos = 0
        self.end = len(data)
        self.dif = 0
        self.rng = 0x8000
        self.cnt = -15
        self.allow_update_cdf = not disable_cdf_update
        self._refill()

    # -- internals ------------------------------------------------------
    def _refill(self) -> None:
        c = EC_WIN_SIZE - self.cnt - 24
        dif = self.dif
        pos, end, buf = self.pos, self.end, self.buf
        while True:
            if pos >= end:
                # past end: remaining window bits read as 1 (complement
                # domain => value bits 0)
                dif |= (1 << (c + 8)) - 1 if c + 8 <= 64 else MASK64
                break
            dif |= (buf[pos] ^ 0xFF) << c
            pos += 1
            c -= 8
            if c < 0:
                break
        self.dif = dif & MASK64
        self.cnt = EC_WIN_SIZE - c - 24
        self.pos = pos

    def _norm(self, dif: int, rng: int) -> None:
        d = 15 - (rng.bit_length() - 1)
        cnt = self.cnt
        self.dif = (dif << d) & MASK64
        self.rng = rng << d
        self.cnt = cnt - d
        # unsigned compare in the reference: no refill once cnt is negative
        if 0 <= cnt < d:
            self._refill()

    # -- primitives -----------------------------------------------------
    def decode_bool_equi(self) -> int:
        r = self.rng
        dif = self.dif
        v = ((r >> 8) << 7) + EC_MIN_PROB
        vw = v << (EC_WIN_SIZE - 16)
        if dif >= vw:
            dif -= vw
            v = r - v
            ret = 0
        else:
            ret = 1
        self._norm(dif, v)
        return ret

    def decode_bool(self, f: int) -> int:
        r = self.rng
        dif = self.dif
        v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB
        vw = v << (EC_WIN_SIZE - 16)
        if dif >= vw:
            dif -= vw
            v = r - v
            ret = 0
        else:
            ret = 1
        self._norm(dif, v)
        return ret

    def decode_symbol_adapt(self, cdf: np.ndarray, n_symbols: int) -> int:
        """cdf has >= n_symbols+1 entries; entry [n_symbols] is the
        adaptation counter. n_symbols = alphabet size - 1."""
        c = self.dif >> (EC_WIN_SIZE - 16)
        r = self.rng >> 8
        u = v = self.rng
        val = -1
        while True:
            val += 1
            u = v
            v = (r * (int(cdf[val]) >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
            v += EC_MIN_PROB * (n_symbols - val)
            if c >= v:
                break
        self._norm(self.dif - (v << (EC_WIN_SIZE - 16)), u - v)
        if self.allow_update_cdf:
            count = int(cdf[n_symbols])
            rate = 4 + (count >> 4) + (n_symbols > 2)
            for i in range(val):
                cdf[i] += (32768 - int(cdf[i])) >> rate
            for i in range(val, n_symbols):
                cdf[i] -= int(cdf[i]) >> rate
            cdf[n_symbols] = count + (count < 32)
        return val

    def decode_bool_adapt(self, cdf: np.ndarray) -> int:
        bit = self.decode_bool(int(cdf[0]))
        if self.allow_update_cdf:
            count = int(cdf[1])
            rate = 4 + (count >> 4)
            if bit:
                cdf[0] += (32768 - int(cdf[0])) >> rate
            else:
                cdf[0] -= int(cdf[0]) >> rate
            cdf[1] = count + (count < 32)
        return bit

    # -- composites -----------------------------------------------------
    def decode_bools(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bool_equi()
        return v

    def decode_uniform(self, n: int) -> int:
        assert n > 0
        l = n.bit_length()
        assert l > 1
        m = (1 << l) - n
        v = self.decode_bools(l - 1)
        return v if v < m else (v << 1) - m + self.decode_bool_equi()

    def decode_subexp(self, ref: int, n: int, k: int) -> int:
        assert n >> k == 8
        a = 0
        if self.decode_bool_equi():
            if self.decode_bool_equi():
                k += self.decode_bool_equi() + 1
            a = 1 << k
        v = self.decode_bools(k) + a
        from ..bitstream.getbits import inv_recenter
        return (inv_recenter(ref, v) if ref * 2 <= n
                else n - 1 - inv_recenter(n - 1 - ref, v))

    def decode_hi_tok(self, cdf: np.ndarray) -> int:
        tok_br = self.decode_symbol_adapt(cdf, 3)
        tok = 3 + tok_br
        if tok_br == 3:
            tok_br = self.decode_symbol_adapt(cdf, 3)
            tok = 6 + tok_br
            if tok_br == 3:
                tok_br = self.decode_symbol_adapt(cdf, 3)
                tok = 9 + tok_br
                if tok_br == 3:
                    tok = 12 + self.decode_symbol_adapt(cdf, 3)
        return tok


class MsacEncoder:
    """Inverse coder producing streams the msac decoder accepts.

    Interval arithmetic mirrors the decoder exactly: for a symbol `val`
    of a CDF the decoder accepts top-window values c in [v(val), u(val)),
    where u = v(val-1) and v(-1) = rng. In encoder (bottom-up) space that
    interval is [rng - u, rng - v), hence low += rng - u, rng' = u - v.

    `low` is kept as an unbounded integer; every renormalization shifts
    it left. finalize() picks the smallest in-interval value with maximal
    trailing zeros, so the stream can be truncated and the decoder's
    "missing bytes read as value-0 bits" convention finishes the job.
    """

    def __init__(self, allow_update_cdf: bool = True):
        self.low = 0
        self.rng = 0x8000
        self.shift = 0  # total renormalization shift
        self.allow_update_cdf = allow_update_cdf

    def _renorm(self) -> None:
        d = 15 - (self.rng.bit_length() - 1)
        if d:
            self.rng <<= d
            self.low <<= d
            self.shift += d

    def _scaled(self, cdf_v: int, r: int, mult: int) -> int:
        return ((r >> 8) * (cdf_v >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB * mult

    def encode_symbol(self, cdf: np.ndarray, val: int, n_symbols: int) -> None:
        r = self.rng
        u = r if val == 0 else self._scaled(int(cdf[val - 1]), r, n_symbols - (val - 1))
        # cdf[val] exists for val < n_symbols; the last symbol's interval
        # bottom is 0 (decoder's loop always terminates at val=n_symbols
        # because v(n_symbols) = 0 <= c).
        v = self._scaled(int(cdf[val]), r, n_symbols - val) if val < n_symbols else 0
        self.low += r - u
        self.rng = u - v
        self._renorm()
        if self.allow_update_cdf:
            count = int(cdf[n_symbols])
            rate = 4 + (count >> 4) + (n_symbols > 2)
            for i in range(val):
                cdf[i] += (32768 - int(cdf[i])) >> rate
            for i in range(val, n_symbols):
                cdf[i] -= int(cdf[i]) >> rate
            cdf[n_symbols] = count + (count < 32)

    def encode_bool(self, bit: int, f: int) -> None:
        r = self.rng
        v = self._scaled(f, r, 1)
        if bit:
            # decoder maps dif < vw -> ret 1, interval [0, v) in top space
            # = [r - v, r) bottom space
            self.low += r - v
            self.rng = v
        else:
            self.rng = r - v
        self._renorm()

    def encode_bool_equi(self, bit: int) -> None:
        r = self.rng
        v = ((r >> 8) << 7) + EC_MIN_PROB
        if bit:
            self.low += r - v
            self.rng = v
        else:
            self.rng = r - v
        self._renorm()

    def encode_bool_adapt(self, bit: int, cdf: np.ndarray) -> None:
        self.encode_bool(bit, int(cdf[0]))
        if self.allow_update_cdf:
            count = int(cdf[1])
            rate = 4 + (count >> 4)
            if bit:
                cdf[0] += (32768 - int(cdf[0])) >> rate
            else:
                cdf[0] -= int(cdf[0]) >> rate
            cdf[1] = count + (count < 32)

    def encode_bools(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bool_equi((v >> i) & 1)

    def encode_uniform(self, v: int, n: int) -> None:
        assert n > 0
        l = n.bit_length()
        m = (1 << l) - n
        if v < m:
            self.encode_bools(v, l - 1)
        else:
            vv = v + m
            self.encode_bools(vv >> 1, l - 1)
            self.encode_bool_equi(vv & 1)

    def encode_hi_tok(self, tok: int, cdf: np.ndarray) -> None:
        assert 3 <= tok <= 15
        rem = tok - 3
        for _ in range(4):
            chunk = min(rem, 3)
            self.encode_symbol(cdf, chunk, 3)
            if chunk < 3:
                break
            rem -= 3

    def finalize(self) -> bytes:
        """Emit the stream: the initial interval [0, 0x8000) spans 15
        fractional bits and every renormalization adds `shift` more;
        terminate by choosing the lattice value with the most trailing
        zeros inside [low, low+rng)."""
        nbits = self.shift + 15
        lo = self.low
        hi = self.low + self.rng  # exclusive
        # AV1 termination marker: round low up to a multiple of 2^14 and
        # set bit 14, yielding a trailing "1 then zeros" pattern the
        # spec's trailing-bits check requires (daala od_ec_enc_done; the
        # reference validates it in decode.c
        # check_trailing_bits_after_symbol_coder:2576-2592). In-interval
        # because rng >= 0x8000 > 0x4000 + 0x3fff.
        val = ((lo + 0x3FFF) & ~0x3FFF) | 0x4000
        assert lo <= val < hi
        nbytes = (nbits + 7) // 8
        total_bits = nbytes * 8
        out = val << (total_bits - nbits)
        return out.to_bytes(nbytes, "big") if nbytes else b"\x00"
