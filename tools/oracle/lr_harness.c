/* loop-restoration oracle harness (checkasm-style): run the reference
 * wiener/sgr kernels on controlled inputs.
 *
 * Stream protocol (argv[1] in, argv[2] out), LE:
 *  u8 op (0=wiener 1=sgr_5x5 2=sgr_3x3 3=sgr_mix), u8 bpc, u8 edges,
 *  u16 w, u16 h,
 *  i16 filter[2][8] (wiener) | u16 s0,s1 + i16 w0,w1 (sgr),
 *  u16 dst[(h)*(w+32)] (stride w+32; also the src),
 *  u16 left[h][4], u16 lpf[8*(w+32)] (4 top rows then 4 bottom rows
 *    at lpf+6*stride per dav1d convention: we allocate 8 rows and pass
 *    lpf pointing at row 0; bottom read at rows 6,7)
 * out: u16 dst[h*(w+32)]
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "config.h"
#define BITDEPTH 16
#include "src/levels.h"
#include "src/looprestoration.h"

void dav1d_loop_restoration_dsp_init_8bpc(Dav1dLoopRestorationDSPContext *c, int bpc);
void dav1d_loop_restoration_dsp_init_16bpc(Dav1dLoopRestorationDSPContext *c, int bpc);

typedef void (*lr8_fn)(uint8_t *dst, ptrdiff_t stride,
                       const uint8_t (*left)[4], const uint8_t *lpf,
                       int w, int h, const LooprestorationParams *params,
                       enum LrEdgeFlags edges);

int main(int argc, char **argv) {
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    Dav1dLoopRestorationDSPContext c8, c16;
    dav1d_loop_restoration_dsp_init_8bpc(&c8, 8);
    dav1d_loop_restoration_dsp_init_16bpc(&c16, 10);

    uint8_t op, bpc, edges;
    while (fread(&op, 1, 1, in) == 1) {
        fread(&bpc, 1, 1, in); fread(&edges, 1, 1, in);
        uint16_t w, h;
        fread(&w, 2, 1, in); fread(&h, 2, 1, in);
        int stride = w + 32;
        LooprestorationParams params;
        memset(&params, 0, sizeof(params));
        if (op == 0) {
            fread(params.filter, 2, 16, in);
        } else {
            uint16_t s0, s1; int16_t w0, w1;
            fread(&s0, 2, 1, in); fread(&s1, 2, 1, in);
            fread(&w0, 2, 1, in); fread(&w1, 2, 1, in);
            params.sgr.s0 = s0; params.sgr.s1 = s1;
            params.sgr.w0 = w0; params.sgr.w1 = w1;
        }
        size_t n_dst = (size_t)h * stride;
        uint16_t *d16 = malloc(n_dst * 2);
        fread(d16, 2, n_dst, in);
        uint16_t (*left16)[4] = malloc((size_t)h * 8);
        fread(left16, 2, (size_t)h * 4, in);
        size_t n_lpf = (size_t)8 * stride;
        uint16_t *lpf16 = malloc(n_lpf * 2);
        fread(lpf16, 2, n_lpf, in);

        if (bpc == 8) {
            uint8_t *d8 = malloc(n_dst), *lpf8 = malloc(n_lpf);
            uint8_t (*l8)[4] = malloc((size_t)h * 4);
            for (size_t i = 0; i < n_dst; i++) d8[i] = (uint8_t)d16[i];
            for (size_t i = 0; i < n_lpf; i++) lpf8[i] = (uint8_t)lpf16[i];
            for (size_t i = 0; i < (size_t)h * 4; i++) ((uint8_t*)l8)[i] = (uint8_t)((uint16_t*)left16)[i];
            lr8_fn fn = op == 0 ? (lr8_fn)c8.wiener[0] :
                        op == 1 ? (lr8_fn)c8.sgr[0] :
                        op == 2 ? (lr8_fn)c8.sgr[1] : (lr8_fn)c8.sgr[2];
            fn(d8 + 8, stride, (const uint8_t(*)[4])l8, lpf8 + 8, w, h, &params, edges);
            for (size_t i = 0; i < n_dst; i++) d16[i] = d8[i];
            free(d8); free(lpf8); free(l8);
        } else {
            looprestorationfilter_fn fn = op == 0 ? c16.wiener[0] :
                        op == 1 ? c16.sgr[0] :
                        op == 2 ? c16.sgr[1] : c16.sgr[2];
            fn(d16 + 8, stride * 2, (const void*)left16, lpf16 + 8, w, h,
               &params, edges, (1 << bpc) - 1);
        }
        fwrite(d16, 2, n_dst, out);
        free(d16); free(left16); free(lpf16);
    }
    fclose(in); fclose(out);
    return 0;
}
