/* itx oracle harness: run the reference inverse transforms on provided
 * coefficients so tests can validate our implementation per kernel
 * (checkasm-style, SURVEY.md §4 tier 1).
 *
 * stdin/file input (LE): u8 tx | u8 txtp | i32 eob | u8 bpc |
 *   u16 dst[w*h] | i32 coeff[sw*sh]
 * output: u16 dst[w*h]
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "config.h"
#define BITDEPTH 16
#include "src/levels.h"
#include "src/itx.h"
#include "src/tables.h"

typedef void (*itx8_fn)(uint8_t *dst, ptrdiff_t stride, int16_t *coeff,
                        int eob);

#define decl_init(bpc) void dav1d_itx_dsp_init_##bpc##bpc(Dav1dInvTxfmDSPContext *c, int _bpc);
decl_init(8)
decl_init(16)

int main(int argc, char **argv) {
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    uint8_t tx, txtp, bpc;
    int32_t eob;
    fread(&tx, 1, 1, in);
    fread(&txtp, 1, 1, in);
    fread(&eob, 4, 1, in);
    fread(&bpc, 1, 1, in);

    const TxfmInfo *ti = &dav1d_txfm_dimensions[tx];
    const int w = ti->w * 4, h = ti->h * 4;
    const int sw = w > 32 ? 32 : w, sh = h > 32 ? 32 : h;

    uint16_t *dst16 = calloc(w * h, 2);
    fread(dst16, 2, w * h, in);
    int32_t *coef32 = calloc(sw * sh + 64, 4);
    fread(coef32, 4, sw * sh, in);

    Dav1dInvTxfmDSPContext c;
    if (bpc == 8) {
        dav1d_itx_dsp_init_8bpc(&c, 8);
        uint8_t *dst = malloc((size_t)w * h);
        for (int i = 0; i < w * h; i++) dst[i] = (uint8_t)dst16[i];
        int16_t *cf = calloc(sw * sh + 64, 2);
        for (int i = 0; i < sw * sh; i++) cf[i] = (int16_t)coef32[i];
        ((itx8_fn)c.itxfm_add[tx][txtp])(dst, w, cf, eob);
        for (int i = 0; i < w * h; i++) dst16[i] = dst[i];
    } else {
        dav1d_itx_dsp_init_16bpc(&c, bpc);
        c.itxfm_add[tx][txtp](dst16, w * 2, coef32, eob, (1 << bpc) - 1);
    }
    fwrite(dst16, 2, w * h, out);
    fclose(in); fclose(out);
    return 0;
}
