// msac arithmetic decoder primitives, shared by the coefficient core
// (stagea.cpp) and the full tile parser (tileparse.cpp).
//
// Semantics mirror the validated Python reference (entropy/msac.py),
// itself behavior-parity with the reference decoder (reference
// src/msac.c:41-213).
#pragma once
#include <cstdint>

#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4
#define EC_WIN_SIZE 64

struct Msac {
    const uint8_t *buf;
    int64_t pos, end;
    uint64_t dif;
    uint32_t rng;
    int32_t cnt;
    int32_t allow_update;
};

static inline void msac_refill(Msac *s) {
    int c = EC_WIN_SIZE - s->cnt - 24;
    uint64_t dif = s->dif;
    int64_t pos = s->pos;
    for (;;) {
        if (pos >= s->end) {
            // past end: value bits read as zero (complement domain ones)
            dif |= (c + 8 <= 64) ? ((c + 8 == 64) ? ~0ULL
                                                  : ((1ULL << (c + 8)) - 1))
                                 : ~0ULL;
            break;
        }
        dif |= (uint64_t)(s->buf[pos] ^ 0xFF) << c;
        pos++;
        c -= 8;
        if (c < 0) break;
    }
    s->dif = dif;
    s->cnt = EC_WIN_SIZE - c - 24;
    s->pos = pos;
}

static inline int ulog2_16(uint32_t v) {
    int n = 0;
    while (v >> (n + 1)) n++;
    return n;
}

static inline void msac_norm(Msac *s, uint64_t dif, uint32_t rng) {
    const int d = 15 - ulog2_16(rng);
    const int cnt = s->cnt;
    s->dif = dif << d;
    s->rng = rng << d;
    s->cnt = cnt - d;
    if (cnt >= 0 && cnt < d) msac_refill(s);
}

static inline int msac_bool_equi(Msac *s) {
    const uint32_t r = s->rng;
    uint64_t dif = s->dif;
    uint32_t v = ((r >> 8) << 7) + EC_MIN_PROB;
    const uint64_t vw = (uint64_t)v << (EC_WIN_SIZE - 16);
    int ret;
    if (dif >= vw) {
        dif -= vw;
        v = r - v;
        ret = 0;
    } else {
        ret = 1;
    }
    msac_norm(s, dif, v);
    return ret;
}

static inline int msac_bool(Msac *s, uint32_t f) {
    const uint32_t r = s->rng;
    uint64_t dif = s->dif;
    uint32_t v = (((r >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
                 EC_MIN_PROB;
    const uint64_t vw = (uint64_t)v << (EC_WIN_SIZE - 16);
    int ret;
    if (dif >= vw) {
        dif -= vw;
        v = r - v;
        ret = 0;
    } else {
        ret = 1;
    }
    msac_norm(s, dif, v);
    return ret;
}

static inline int msac_bool_adapt(Msac *s, uint16_t *cdf) {
    const int bit = msac_bool(s, cdf[0]);
    if (s->allow_update) {
        const int count = cdf[1];
        const int rate = 4 + (count >> 4);
        if (bit)
            cdf[0] += (32768 - cdf[0]) >> rate;
        else
            cdf[0] -= cdf[0] >> rate;
        cdf[1] = count + (count < 32);
    }
    return bit;
}

static inline int msac_symbol_adapt(Msac *s, uint16_t *cdf, int n_symbols) {
    const uint64_t c = s->dif >> (EC_WIN_SIZE - 16);
    const uint32_t r = s->rng >> 8;
    uint32_t u, v = s->rng;
    int val = -1;
    do {
        val++;
        u = v;
        v = (r * ((uint32_t)cdf[val] >> EC_PROB_SHIFT)) >>
            (7 - EC_PROB_SHIFT);
        v += EC_MIN_PROB * (n_symbols - val);
    } while (c < v);
    msac_norm(s, s->dif - ((uint64_t)v << (EC_WIN_SIZE - 16)), u - v);
    if (s->allow_update) {
        const int count = cdf[n_symbols];
        const int rate = 4 + (count >> 4) + (n_symbols > 2);
        for (int i = 0; i < val; i++)
            cdf[i] += (32768 - cdf[i]) >> rate;
        for (int i = val; i < n_symbols; i++)
            cdf[i] -= cdf[i] >> rate;
        cdf[n_symbols] = count + (count < 32);
    }
    return val;
}

static inline int msac_bools(Msac *s, int n) {
    int v = 0;
    while (n--) v = (v << 1) | msac_bool_equi(s);
    return v;
}

static inline int msac_hi_tok(Msac *s, uint16_t *cdf) {
    int tok_br = msac_symbol_adapt(s, cdf, 3);
    int tok = 3 + tok_br;
    if (tok_br == 3) {
        tok_br = msac_symbol_adapt(s, cdf, 3);
        tok = 6 + tok_br;
        if (tok_br == 3) {
            tok_br = msac_symbol_adapt(s, cdf, 3);
            tok = 9 + tok_br;
            if (tok_br == 3) tok = 12 + msac_symbol_adapt(s, cdf, 3);
        }
    }
    return tok;
}

static inline int read_golomb(Msac *s) {
    int len = 0;
    int64_t val = 1;
    while (!msac_bool_equi(s) && len < 32) len++;
    while (len--) val = (val << 1) + msac_bool_equi(s);
    return (int)(val - 1);
}

// msac.py:161-167
static inline int msac_uniform(Msac *s, int n) {
    int l = 0;
    while ((n >> l)) l++;       // bit_length
    const int m = (1 << l) - n;
    const int v = msac_bools(s, l - 1);
    return v < m ? v : (v << 1) - m + msac_bool_equi(s);
}

// include/common/intops.h:75-82
static inline int inv_recenter(int r, int v) {
    if (v > (r << 1)) return v;
    if ((v & 1) == 0) return (v >> 1) + r;
    return r - ((v + 1) >> 1);
}

// msac.py:169-179
static inline int msac_subexp(Msac *s, int ref, int n, int k) {
    int a = 0;
    if (msac_bool_equi(s)) {
        if (msac_bool_equi(s)) k += msac_bool_equi(s) + 1;
        a = 1 << k;
    }
    const int v = msac_bools(s, k) + a;
    return (ref * 2 <= n) ? inv_recenter(ref, v)
                          : n - 1 - inv_recenter(n - 1 - ref, v);
}
