/* mc oracle harness: run the reference motion-compensation DSP on
 * provided inputs (checkasm-style, SURVEY.md §4 tier 1).
 *
 * Stream protocol on (argv[1] in, argv[2] out), all LE. Each record:
 *   u8 op, u8 bpc, u16 w, u16 h, then op-specific payload.
 * src buffers for put/prep are (h+7)x(w+7) u16 with the nominal src
 * position at (3,3); warp src is 15x15 u16 at (3,3).
 * ops: 0 put (u8 filter2d,u8 mx,u8 my)  1 prep (same)
 *      4 avg  5 w_avg(u8 weight)  6 mask(u8 m[w*h])
 *      7 blend(m)  8 blend_v  9 blend_h
 *      10/11/12 w_mask 444/422/420 (u8 sign)
 *      13 warp8x8 (i16 abcd[4], i32 mx,my)  14 warp8x8t
 *      15 emu_edge (i32 bw,bh,iw,ih,x,y; u16 ref[ih*iw])
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "config.h"
#define BITDEPTH 16
#include "src/levels.h"
#include "src/mc.h"

void dav1d_mc_dsp_init_8bpc(Dav1dMCDSPContext *c);
void dav1d_mc_dsp_init_16bpc(Dav1dMCDSPContext *c);

typedef void (*mc8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                       const uint8_t *src, ptrdiff_t src_stride,
                       int w, int h, int mx, int my);
typedef void (*mct8_fn)(int16_t *tmp, const uint8_t *src,
                        ptrdiff_t src_stride, int w, int h, int mx, int my);
typedef void (*avg8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                        const int16_t *t1, const int16_t *t2, int w, int h);
typedef void (*wavg8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                         const int16_t *t1, const int16_t *t2, int w, int h,
                         int weight);
typedef void (*mask8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                         const int16_t *t1, const int16_t *t2, int w, int h,
                         const uint8_t *mask);
typedef void (*wmask8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                          const int16_t *t1, const int16_t *t2, int w, int h,
                          uint8_t *mask, int sign);
typedef void (*blend8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                          const uint8_t *tmp, int w, int h,
                          const uint8_t *mask);
typedef void (*blendvh8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                            const uint8_t *tmp, int w, int h);
typedef void (*warp8_fn)(uint8_t *dst, ptrdiff_t dst_stride,
                         const uint8_t *src, ptrdiff_t src_stride,
                         const int16_t *abcd, int mx, int my);
typedef void (*warpt8_fn)(int16_t *tmp, ptrdiff_t tmp_stride,
                          const uint8_t *src, ptrdiff_t src_stride,
                          const int16_t *abcd, int mx, int my);
typedef void (*emu8_fn)(intptr_t bw, intptr_t bh, intptr_t iw, intptr_t ih,
                        intptr_t x, intptr_t y, uint8_t *dst,
                        ptrdiff_t dst_stride, const uint8_t *ref,
                        ptrdiff_t ref_stride);

static uint16_t rd16(FILE *f) { uint16_t v; fread(&v, 2, 1, f); return v; }

int main(int argc, char **argv) {
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    Dav1dMCDSPContext c8, c16;
    dav1d_mc_dsp_init_8bpc(&c8);
    dav1d_mc_dsp_init_16bpc(&c16);

    uint8_t op, bpc;
    while (fread(&op, 1, 1, in) == 1) {
        bpc = 0; fread(&bpc, 1, 1, in);
        int w = rd16(in), h = rd16(in);
        int bdmax = (1 << bpc) - 1;
        if (op <= 1) {
            uint8_t f2d, mx, my;
            fread(&f2d, 1, 1, in); fread(&mx, 1, 1, in); fread(&my, 1, 1, in);
            int sw = w + 7, sh = h + 7;
            uint16_t *s16 = malloc((size_t)sw * sh * 2);
            fread(s16, 2, (size_t)sw * sh, in);
            if (op == 0) {
                if (bpc == 8) {
                    uint8_t *s8 = malloc((size_t)sw * sh), *d8 = malloc((size_t)w * h);
                    for (int i = 0; i < sw * sh; i++) s8[i] = (uint8_t)s16[i];
                    ((mc8_fn)c8.mc[f2d])(d8, w, s8 + 3 * sw + 3, sw, w, h, mx, my);
                    for (int i = 0; i < w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                    free(s8); free(d8);
                } else {
                    uint16_t *d = malloc((size_t)w * h * 2);
                    c16.mc[f2d](d, w * 2, s16 + 3 * sw + 3, sw * 2, w, h, mx, my, bdmax);
                    fwrite(d, 2, (size_t)w * h, out);
                    free(d);
                }
            } else {
                int16_t *t = malloc((size_t)w * h * 2);
                if (bpc == 8) {
                    uint8_t *s8 = malloc((size_t)sw * sh);
                    for (int i = 0; i < sw * sh; i++) s8[i] = (uint8_t)s16[i];
                    ((mct8_fn)c8.mct[f2d])(t, s8 + 3 * sw + 3, sw, w, h, mx, my);
                    free(s8);
                } else {
                    c16.mct[f2d](t, s16 + 3 * sw + 3, sw * 2, w, h, mx, my, bdmax);
                }
                fwrite(t, 2, (size_t)w * h, out);
                free(t);
            }
            free(s16);
        } else if (op >= 4 && op <= 6) {
            int16_t *t1 = malloc((size_t)w * h * 2), *t2 = malloc((size_t)w * h * 2);
            fread(t1, 2, (size_t)w * h, in); fread(t2, 2, (size_t)w * h, in);
            uint8_t weight = 0; uint8_t *m = NULL;
            if (op == 5) fread(&weight, 1, 1, in);
            if (op == 6) { m = malloc((size_t)w * h); fread(m, 1, (size_t)w * h, in); }
            if (bpc == 8) {
                uint8_t *d8 = malloc((size_t)w * h);
                if (op == 4) ((avg8_fn)c8.avg)(d8, w, t1, t2, w, h);
                else if (op == 5) ((wavg8_fn)c8.w_avg)(d8, w, t1, t2, w, h, weight);
                else ((mask8_fn)c8.mask)(d8, w, t1, t2, w, h, m);
                for (int i = 0; i < w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                free(d8);
            } else {
                uint16_t *d = malloc((size_t)w * h * 2);
                if (op == 4) c16.avg(d, w * 2, t1, t2, w, h, bdmax);
                else if (op == 5) c16.w_avg(d, w * 2, t1, t2, w, h, weight, bdmax);
                else c16.mask(d, w * 2, t1, t2, w, h, m, bdmax);
                fwrite(d, 2, (size_t)w * h, out);
                free(d);
            }
            free(t1); free(t2); free(m);
        } else if (op >= 7 && op <= 9) {
            uint16_t *d16 = malloc((size_t)w * h * 2), *t16 = malloc((size_t)w * h * 2);
            fread(d16, 2, (size_t)w * h, in); fread(t16, 2, (size_t)w * h, in);
            uint8_t *m = NULL;
            if (op == 7) { m = malloc((size_t)w * h); fread(m, 1, (size_t)w * h, in); }
            if (bpc == 8) {
                uint8_t *d8 = malloc((size_t)w * h), *t8 = malloc((size_t)w * h);
                for (int i = 0; i < w * h; i++) { d8[i] = (uint8_t)d16[i]; t8[i] = (uint8_t)t16[i]; }
                if (op == 7) ((blend8_fn)c8.blend)(d8, w, t8, w, h, m);
                else if (op == 8) ((blendvh8_fn)c8.blend_v)(d8, w, t8, w, h);
                else ((blendvh8_fn)c8.blend_h)(d8, w, t8, w, h);
                for (int i = 0; i < w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                free(d8); free(t8);
            } else {
                if (op == 7) c16.blend(d16, w * 2, t16, w, h, m);
                else if (op == 8) c16.blend_v(d16, w * 2, t16, w, h);
                else c16.blend_h(d16, w * 2, t16, w, h);
                fwrite(d16, 2, (size_t)w * h, out);
            }
            free(d16); free(t16); free(m);
        } else if (op >= 10 && op <= 12) {
            uint8_t sign; fread(&sign, 1, 1, in);
            int16_t *t1 = malloc((size_t)w * h * 2), *t2 = malloc((size_t)w * h * 2);
            fread(t1, 2, (size_t)w * h, in); fread(t2, 2, (size_t)w * h, in);
            int ss_hor = op >= 11, ss_ver = op == 12;
            int mw = w >> ss_hor, mh = h >> ss_ver;
            uint8_t *m = calloc((size_t)mw * mh, 1);
            if (bpc == 8) {
                uint8_t *d8 = malloc((size_t)w * h);
                ((wmask8_fn)c8.w_mask[op - 10])(d8, w, t1, t2, w, h, m, sign);
                for (int i = 0; i < w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                free(d8);
            } else {
                uint16_t *d = malloc((size_t)w * h * 2);
                c16.w_mask[op - 10](d, w * 2, t1, t2, w, h, m, sign, bdmax);
                fwrite(d, 2, (size_t)w * h, out);
                free(d);
            }
            fwrite(m, 1, (size_t)mw * mh, out);
            free(t1); free(t2); free(m);
        } else if (op == 13 || op == 14) {
            int16_t abcd[4]; int32_t mx, my;
            fread(abcd, 2, 4, in); fread(&mx, 4, 1, in); fread(&my, 4, 1, in);
            uint16_t s16[15 * 15];
            fread(s16, 2, 15 * 15, in);
            if (bpc == 8) {
                uint8_t s8[15 * 15];
                for (int i = 0; i < 15 * 15; i++) s8[i] = (uint8_t)s16[i];
                if (op == 13) {
                    uint8_t d8[64];
                    ((warp8_fn)c8.warp8x8)(d8, 8, s8 + 3 * 15 + 3, 15, abcd, mx, my);
                    for (int i = 0; i < 64; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                } else {
                    int16_t t[64];
                    ((warpt8_fn)c8.warp8x8t)(t, 8, s8 + 3 * 15 + 3, 15, abcd, mx, my);
                    fwrite(t, 2, 64, out);
                }
            } else {
                if (op == 13) {
                    uint16_t d[64];
                    c16.warp8x8(d, 16, s16 + 3 * 15 + 3, 30, abcd, mx, my, bdmax);
                    fwrite(d, 2, 64, out);
                } else {
                    int16_t t[64];
                    c16.warp8x8t(t, 8, s16 + 3 * 15 + 3, 30, abcd, mx, my, bdmax);
                    fwrite(t, 2, 64, out);
                }
            }
        } else if (op == 16 || op == 17) {
            uint8_t f2d;
            int32_t mx, my, dxs, dys;
            uint16_t sw, sh;
            fread(&f2d, 1, 1, in);
            fread(&mx, 4, 1, in); fread(&my, 4, 1, in);
            fread(&dxs, 4, 1, in); fread(&dys, 4, 1, in);
            fread(&sw, 2, 1, in); fread(&sh, 2, 1, in);
            uint16_t *s16 = malloc((size_t)sw * sh * 2);
            fread(s16, 2, (size_t)sw * sh, in);
            if (bpc == 8) {
                uint8_t *s8 = malloc((size_t)sw * sh);
                for (int i = 0; i < sw * sh; i++) s8[i] = (uint8_t)s16[i];
                if (op == 16) {
                    uint8_t *d8 = malloc((size_t)w * h);
                    ((void (*)(uint8_t*,ptrdiff_t,const uint8_t*,ptrdiff_t,int,int,int,int,int,int))
                     c8.mc_scaled[f2d])(d8, w, s8 + 3 * sw + 3, sw, w, h, mx, my, dxs, dys);
                    for (int i = 0; i < w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                    free(d8);
                } else {
                    int16_t *t = malloc((size_t)w * h * 2);
                    ((void (*)(int16_t*,const uint8_t*,ptrdiff_t,int,int,int,int,int,int))
                     c8.mct_scaled[f2d])(t, s8 + 3 * sw + 3, sw, w, h, mx, my, dxs, dys);
                    fwrite(t, 2, (size_t)w * h, out);
                    free(t);
                }
                free(s8);
            } else {
                if (op == 16) {
                    uint16_t *d = malloc((size_t)w * h * 2);
                    c16.mc_scaled[f2d](d, w * 2, s16 + 3 * sw + 3, sw * 2, w, h, mx, my, dxs, dys, bdmax);
                    fwrite(d, 2, (size_t)w * h, out);
                    free(d);
                } else {
                    int16_t *t = malloc((size_t)w * h * 2);
                    c16.mct_scaled[f2d](t, s16 + 3 * sw + 3, sw * 2, w, h, mx, my, dxs, dys, bdmax);
                    fwrite(t, 2, (size_t)w * h, out);
                    free(t);
                }
            }
            free(s16);
        } else if (op == 18) {
            /* resize: i32 dst_w, src_w, dx, mx0; u16 src[h][src_w+?] */
            int32_t dst_w, src_w, rdx, mx0;
            fread(&dst_w, 4, 1, in); fread(&src_w, 4, 1, in);
            fread(&rdx, 4, 1, in); fread(&mx0, 4, 1, in);
            uint16_t *s16 = malloc((size_t)src_w * h * 2);
            fread(s16, 2, (size_t)src_w * h, in);
            if (bpc == 8) {
                uint8_t *s8 = malloc((size_t)src_w * h), *d8 = malloc((size_t)dst_w * h);
                for (int i = 0; i < src_w * h; i++) s8[i] = (uint8_t)s16[i];
                ((void (*)(uint8_t*,ptrdiff_t,const uint8_t*,ptrdiff_t,int,int,int,int,int))
                 c8.resize)(d8, dst_w, s8, src_w, dst_w, h, src_w, rdx, mx0);
                for (int i = 0; i < dst_w * h; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                free(s8); free(d8);
            } else {
                uint16_t *d = malloc((size_t)dst_w * h * 2);
                c16.resize(d, dst_w * 2, s16, src_w * 2, dst_w, h, src_w, rdx, mx0, bdmax);
                fwrite(d, 2, (size_t)dst_w * h, out);
                free(d);
            }
            free(s16);
        } else if (op == 15) {
            int32_t bw, bh, iw, ih, x, y;
            fread(&bw, 4, 1, in); fread(&bh, 4, 1, in); fread(&iw, 4, 1, in);
            fread(&ih, 4, 1, in); fread(&x, 4, 1, in); fread(&y, 4, 1, in);
            uint16_t *r16 = malloc((size_t)iw * ih * 2);
            fread(r16, 2, (size_t)iw * ih, in);
            if (bpc == 8) {
                uint8_t *r8 = malloc((size_t)iw * ih), *d8 = malloc((size_t)bw * bh);
                for (int i = 0; i < iw * ih; i++) r8[i] = (uint8_t)r16[i];
                ((emu8_fn)c8.emu_edge)(bw, bh, iw, ih, x, y, d8, bw, r8, iw);
                for (int i = 0; i < bw * bh; i++) { uint16_t v = d8[i]; fwrite(&v, 2, 1, out); }
                free(r8); free(d8);
            } else {
                uint16_t *d = malloc((size_t)bw * bh * 2);
                c16.emu_edge(bw, bh, iw, ih, x, y, d, bw * 2, r16, iw * 2);
                fwrite(d, 2, (size_t)bw * bh, out);
                free(d);
            }
            free(r16);
        } else {
            fprintf(stderr, "bad op %d\n", op);
            return 1;
        }
    }
    fclose(in); fclose(out);
    return 0;
}
