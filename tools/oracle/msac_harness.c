/* msac oracle harness: replays a scripted op sequence through the
 * reference msac decoder so tests can diff our implementation bit-for-bit.
 *
 * Input (binary, little-endian):
 *   u32 stream_len | stream bytes | u8 disable_cdf_update | u32 n_ops |
 *   per op: u8 kind
 *     0: bool_equi
 *     1: bool        | u16 f
 *     2: symbol      | u8 n_symbols | u16 cdf[n_symbols+1]
 *     3: bool_adapt  | u16 cdf[2]
 *     4: hi_tok      | u16 cdf[4]
 *     5: subexp      | u16 ref | u16 n | u8 k
 * Output: per op u32 value; then u32 final rng, u64 final dif, i32 cnt;
 * and after each adaptive op the updated cdf entries (u16 each).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "src/msac.c"

static uint8_t *rd(FILE *f, size_t n) {
    uint8_t *p = malloc(n ? n : 1);
    if (fread(p, 1, n, f) != n) { fprintf(stderr, "short read\n"); exit(1); }
    return p;
}

int main(int argc, char **argv) {
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    uint32_t stream_len, n_ops;
    fread(&stream_len, 4, 1, in);
    uint8_t *stream = rd(in, stream_len);
    uint8_t disable;
    fread(&disable, 1, 1, in);
    fread(&n_ops, 4, 1, in);

    MsacContext s;
    dav1d_msac_init(&s, stream, stream_len, disable);

    for (uint32_t i = 0; i < n_ops; i++) {
        uint8_t kind;
        fread(&kind, 1, 1, in);
        uint32_t val = 0;
        uint16_t cdf[18];
        switch (kind) {
        case 0: val = dav1d_msac_decode_bool_equi_c(&s); break;
        case 1: {
            uint16_t f; fread(&f, 2, 1, in);
            val = dav1d_msac_decode_bool_c(&s, f);
            break;
        }
        case 2: {
            uint8_t n; fread(&n, 1, 1, in);
            fread(cdf, 2, n + 1, in);
            val = dav1d_msac_decode_symbol_adapt_c(&s, cdf, n);
            fwrite(&val, 4, 1, out);
            fwrite(cdf, 2, n + 1, out);
            continue;
        }
        case 3: {
            fread(cdf, 2, 2, in);
            val = dav1d_msac_decode_bool_adapt_c(&s, cdf);
            fwrite(&val, 4, 1, out);
            fwrite(cdf, 2, 2, out);
            continue;
        }
        case 4: {
            fread(cdf, 2, 4, in);
            val = dav1d_msac_decode_hi_tok_c(&s, cdf);
            fwrite(&val, 4, 1, out);
            fwrite(cdf, 2, 4, out);
            continue;
        }
        case 5: {
            uint16_t ref, n; uint8_t k;
            fread(&ref, 2, 1, in); fread(&n, 2, 1, in); fread(&k, 1, 1, in);
            val = (uint32_t)dav1d_msac_decode_subexp(&s, ref, n, k);
            break;
        }
        default: fprintf(stderr, "bad op\n"); exit(1);
        }
        fwrite(&val, 4, 1, out);
    }
    uint32_t rng = s.rng;
    uint64_t dif = s.dif;
    int32_t cnt = s.cnt;
    fwrite(&rng, 4, 1, out);
    fwrite(&dif, 8, 1, out);
    fwrite(&cnt, 4, 1, out);
    fclose(in); fclose(out);
    free(stream);
    return 0;
}
