/* ipred oracle harness (checkasm-style): run a reference intra predictor
 * on a provided edge buffer.
 *
 * input (LE): u8 mode | u8 bpc | i32 w | i32 h | i32 angle |
 *   i32 max_width | i32 max_height | u16 edge[257] (topleft_out[-128..128])
 * output: u16 dst[w*h]
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "config.h"
#define BITDEPTH 16
#include "src/levels.h"
#include "src/ipred.h"

typedef void (*ipred8_fn)(uint8_t *dst, ptrdiff_t stride, const uint8_t *topleft,
                          int width, int height, int angle, int max_width,
                          int max_height);

void dav1d_intra_pred_dsp_init_8bpc(Dav1dIntraPredDSPContext *c);
void dav1d_intra_pred_dsp_init_16bpc(Dav1dIntraPredDSPContext *c);

int main(int argc, char **argv) {
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    uint8_t mode, bpc;
    int32_t w, h, angle, max_w, max_h;
    fread(&mode, 1, 1, in);
    fread(&bpc, 1, 1, in);
    fread(&w, 4, 1, in);
    fread(&h, 4, 1, in);
    fread(&angle, 4, 1, in);
    fread(&max_w, 4, 1, in);
    fread(&max_h, 4, 1, in);
    uint16_t edge16[257];
    fread(edge16, 2, 257, in);

    Dav1dIntraPredDSPContext c;
    uint16_t *dst16 = calloc((size_t)w * h, 2);
    if (bpc == 8) {
        dav1d_intra_pred_dsp_init_8bpc(&c);
        uint8_t edge8[257];
        for (int i = 0; i < 257; i++) edge8[i] = (uint8_t)edge16[i];
        uint8_t *dst = calloc((size_t)w * h, 1);
        ((ipred8_fn)c.intra_pred[mode])(dst, w, &edge8[128], w, h, angle,
                                        max_w, max_h);
        for (int i = 0; i < w * h; i++) dst16[i] = dst[i];
    } else {
        dav1d_intra_pred_dsp_init_16bpc(&c);
        c.intra_pred[mode](dst16, w * 2, &edge16[128], w, h, angle,
                           max_w, max_h, (1 << bpc) - 1);
    }
    fwrite(dst16, 2, w * h, out);
    fclose(in); fclose(out);
    return 0;
}
