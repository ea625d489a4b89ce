/* Native hot-pass kernels for the NHW host pipeline.
 *
 * These mirror the verified Python implementations in ops/ (same
 * behavior contracts, cited there against the reference file:line); the
 * raster-carried scans are irreducibly sequential, so the host runtime
 * runs them natively while the plane transforms stay on the TPU.
 */
#include <stdint.h>
#include <string.h>

#define D 256
#define N 512
#define SZ 65536

/* ------------------------------------------------------------------ */
/* Huffman packetizer stages (ops/entropy_enc.py)                      */

void nhw_histogram(const uint8_t *s, long p1, long p2,
                   int64_t *rle_buf, int64_t *rle_128)
{
    long i = p1;
    int e = 1, c = 0;
    while (i < p2 - 1) {
        if (s[i] == 128) {
            while (i < p2 - 1 && s[i + 1] == 128) {
                e += 1;
                c = 1;
                if (e > 255) { rle_128[254] += 1; e = 1; c = 0; continue; }
                i += 1;
            }
        }
        if (c) rle_128[e] += 1; else rle_buf[s[i]] += 1;
        e = 1; c = 0;
        i += 1;
    }
}

/* returns the final word index `a`; in/out: words, pack, sel counters */
long nhw_emit(const uint8_t *s, long p1, long p2, int select, int zone,
              const int32_t *sym_pos, const int32_t *run_pos,
              const uint32_t *codes, const int32_t *lens,
              uint32_t *words, long a_in, int pack_in,
              uint8_t *sel1_bits, long *n_sel1,
              uint8_t *sel2_bits, long *n_sel2,
              int *pack_out)
{
    long i = p1, a = a_in;
    int pack = pack_in, e = 1, tag = 0;
    long c1 = *n_sel1, c2 = *n_sel2;

    while (i < p2 - 1) {
        int pixel = s[i];
        if (pixel == 153) { sel1_bits[c1++] = 0; i++; continue; }
        if (pixel == 155) { sel1_bits[c1++] = 1; i++; continue; }
        if (pixel == 157) { sel2_bits[c2++] = 0; i++; continue; }
        if (pixel == 159) { sel2_bits[c2++] = 1; i++; continue; }

        int pos;
        if (pixel != 128 && pixel > 120 && pixel < 136) {
            pos = sym_pos[pixel];
            if (pixel > 131) i += 4;
        } else {
            if (pixel == 128) {
                int overflow = 0;
                while (i < p2 - 1 && s[i + 1] == 128) {
                    e += 1;
                    if (e > 255) { e = 254; i -= 1; overflow = 1; break; }
                    i += 1;
                }
                if (!overflow && e > 1 && e < select) {
                    i -= e - 1; tag = e; e = 1;
                }
            }
            pos = (e == 1) ? sym_pos[pixel] : run_pos[e];
        }

        for (;;) {
            uint32_t code; int nb;
            if (pos >= 110 && pos < 174 && zone) {
                code = 64u | (uint32_t)(pos - 110); nb = 15;
            } else {
                int p = pos;
                if (p >= 174 && zone) p -= 64;
                code = codes[p]; nb = lens[p];
            }
            pack += nb;
            if (pack <= 32) {
                words[a] |= code << (32 - pack);
            } else {
                int match = pack - 32;
                words[a] |= code >> match;
                a += 1;
                words[a] |= (uint32_t)(code << (32 - match));
                pack = match;
            }
            e = 1;
            if (tag > 0) {
                tag -= 1;
                if (tag > 0) { i += 1; pos = sym_pos[128]; continue; }
            }
            break;
        }
        i += 1;
    }
    *n_sel1 = c1; *n_sel2 = c2; *pack_out = pack;
    return a;
}

/* ------------------------------------------------------------------ */
/* offsetY (ops/quantize.py: the four passes)                          */

static const int EXW1[19] = {10,12,14,18,20,22,26,28,30,34,36,38,42,44,46,
                             50,52,54,58};
static const int EXW2[19] = {60,62,66,68,70,74,76,78,82,84,86,90,92,94,98,
                             100,102,106,108};

void nhw_offset_y(int16_t *pf, int quality, int m1, int low4)
{
    long i;
    /* pass 1: even-pair decrements in the bands */
    for (i = 0; i < 4 * SZ; i++) {
        if (!(i >= 2 * SZ || (i & 511) >= D)) continue;
        if ((i & 511) >= 2 * D - 1) continue;
        int a = pf[i];
        if (a > 7 && pf[i + 1] > 7) {
            if (!(a & 7) && !(pf[i + 1] & 7)) {
                if (a > 15) {
                    if (i > 0) {
                        if (pf[i - 1] <= 0) pf[i] = a - 1;
                        else if (pf[i + 1] > 15) {
                            if ((i & 511) < 2 * D - 2 && pf[i + 2] <= 0)
                                pf[i + 1] -= 1;
                        }
                    }
                } else if (pf[i + 1] > 15) {
                    if ((i & 511) < 2 * D - 2 && pf[i + 2] <= 0)
                        pf[i + 1] -= 1;
                }
            }
        }
    }

    /* passes 2 + 3: pair promotions, q>LOW4 */
    if (!low4) {
        long r, j;
        for (r = 0; r < D; r++) {
            long base = r * N;
            for (j = 1; j < D - 1; j++) {
                long a0 = base + j;
                int v = pf[a0];
                if (v > 3 && v < 8) {
                    if (pf[a0-1] > 3 && pf[a0-1] <= 7) {
                        if (pf[a0+1] > 3 && pf[a0+1] <= 7) {
                            pf[a0] = 12700; pf[a0-1] = 10100; j += 1;
                        } else if (pf[a0+N-1] > 3 && pf[a0+N-1] <= 7
                                   && pf[a0+N] > 3 && pf[a0+N] <= 7) {
                            pf[a0-1] = 12100; pf[a0] = 10100;
                            pf[a0+N-1] = 10100; pf[a0+N] = 10100; j += 1;
                        }
                    }
                } else if (v < -3 && v > -8) {
                    if (pf[a0-1] < -3 && pf[a0-1] >= -7) {
                        if (pf[a0+1] < -3 && pf[a0+1] >= -7) {
                            pf[a0] = 12900; pf[a0-1] = 10100; j += 1;
                        } else if (pf[a0+N-1] < -3 && pf[a0+N-1] >= -7
                                   && pf[a0+N] < -3 && pf[a0+N] >= -7) {
                            pf[a0-1] = 12200; pf[a0] = 10100;
                            pf[a0+N-1] = 10100; pf[a0+N] = 10100; j += 1;
                        }
                    }
                }
            }
        }
        for (r = 0; r < D; r++) {
            long base = r * N;
            for (j = 0; j < D - 1; j++) {
                long a0 = base + j;
                int v = pf[a0], w = pf[a0+1];
                if (v >= 5 && v <= 7 && w >= 5 && w <= 7) {
                    pf[a0] = 10300; j += 1;
                } else if (v <= -5 && v >= -7 && w <= -5 && w >= -7) {
                    pf[a0] = 10204; j += 1;
                }
            }
        }
    }

    /* pass 4: the quantizer */
    {
        int quant = 0, quant6 = 0, quant4 = 0;
        for (i = 0; i < 4 * SZ; i++) {
            if (!(i & 511)) { quant = 0; quant6 = 0; }
            int a = pf[i];
            if (a > 10000) {
                switch (a) {
                case 10100: pf[i] = 128; break;
                case 12700: pf[i] = 127; break;
                case 12900: pf[i] = 129; break;
                case 10204: pf[i] = 125; break;
                case 10300: pf[i] = 126; break;
                case 12100: pf[i] = 121; break;
                case 12200: pf[i] = 122; break;
                }
                continue;
            }
            if (a > 127) {
                int exw = ((a & 0xfff8) - 128) >> 3;
                pf[i] = EXW1[exw > 18 ? 18 : exw];
                continue;
            }
            if (a < -127) {
                int exw = (((-a) & 0xfff8) - 128) >> 3;
                pf[i] = EXW2[exw > 18 ? 18 : exw];
                continue;
            }
            if (a < -12 && (((-a) & 7) == 6)) {
                if ((i & 511) < 2 * D - 1 && pf[i + 1] == -7) pf[i + 1] = -9;
            }
            if (a < 0) {
                if (a == -7 && pf[i + 1] == 8 && (i & 511) < 2 * D - 1) {
                    pf[i] = -8; a = -8;
                }
                a = -a;
                if (a > 14 && (a & 7) == 7 && pf[i+1] > 0 && pf[i+1] < 8)
                    a -= 2;
                if (low4) {
                    if (a == 15) {
                        if (!quant) { a &= 504; quant = 1; }
                        else quant = (quant + 1) % 6;
                    } else if (a > 22 && (a & 7) == 7) {
                        if (!quant6) { a &= 504; quant6 = 1; }
                        else quant6 = (quant6 + 1) % 4;
                    } else a &= 504;
                } else {
                    if ((a & 7) < 7) a &= 504;
                }
                a = -a;
            } else if (a == 8 && pf[i + 1] == -7 && (i & 511) < 2 * D - 1) {
                pf[i + 1] = -8;
            } else if (a > 12 && (a & 7) >= 6) {
                if ((i & 511) < 2 * D - 1 && pf[i + 1] == 7) pf[i + 1] = 9;
            }

            if (a >= 14 && pf[i + 1] >= 14 && low4) {
                if (i >= 2 * SZ || (i & 511) >= D) {
                    int q2 = a & 510, q3 = pf[i + 1] & 510;
                    if ((q2 & 7) == 6 && (q3 & 7) == 6
                        && ((a & 1) == 1 || (pf[i + 1] & 1) == 1)) {
                        int r1 = 0, r2 = 0;
                        if ((i & 511) > 0 && (i & 511) < 2 * D - 2) {
                            int vm = pf[i - 1];
                            if (vm > -8 && vm < -2) r1 = 1;
                            else if (vm < -7) r1 = (((-vm) & 7) < 6) ? 0 : 1;
                            int vp = pf[i + 2];
                            if (vp > -8 && vp < -2) r2 = 1;
                            else if (vp < -7) r2 = (((-vp) & 7) < 6) ? 0 : 1;
                        }
                        if (!quant4) {
                            int b = pf[i + 1];
                            if ((a & 504) == (b & 504)) {
                                if (a >= b) {
                                    if (!r1) { a += 2; pf[i + 1] = b - 2; }
                                } else if (!r2) pf[i + 1] = b + 2;
                            } else if (a <= b) {
                                if (!r1) { a += 2; pf[i + 1] = b - 2; }
                            } else if (!r2) pf[i + 1] = b + 2;
                            quant4 = 1;
                        } else quant4 = (quant4 + 1) % 3;
                    }
                }
            }
            if (a < m1 && a > -m1) { pf[i] = 128; continue; }
            a += 128;
            pf[i] = a & 248;
        }
    }
}

/* ------------------------------------------------------------------ */
/* band snap/dead-zone pass (models/encoder.py _band_snap_pass)        */

void nhw_snap_pass(int16_t *pf, int r0, int r1_, int col0, int col1,
                   int ratio_thr, int y_wavelet, int y_wavelet2,
                   int second_rule, int snap_guard6, int guard_col)
{
    int r, j;
    for (r = r0; r < r1_; r++) {
        long base = (long)r * N;
        for (j = col0; j < col1; j++) {
            long a0 = base + j;
            int v = pf[a0];
            if (v >= ratio_thr || v <= -ratio_thr) {
                int av = v < 0 ? -v : v;
                if (av < y_wavelet2) {
                    int cnt = 0;
                    int t;
                    t = pf[a0-1]; if ((t<0?-t:t) + 2 >= 8) cnt++;
                    t = pf[a0+1]; if ((t<0?-t:t) + 2 >= 8) cnt++;
                    t = pf[a0-N]; if ((t<0?-t:t) + 2 >= 8) cnt++;
                    t = pf[a0+N]; if ((t<0?-t:t) + 2 >= 8) cnt++;
                    if (cnt < 3 && v > -y_wavelet && v < y_wavelet) {
                        if (snap_guard6) {
                            if (v < -6) pf[a0] = -7;
                            else if (v > 6) pf[a0] = 7;
                        } else pf[a0] = v < 0 ? -7 : 7;
                    } else if (second_rule && !cnt && av < y_wavelet2) {
                        pf[a0] = v < 0 ? -7 : 7;
                    }
                }
            } else pf[a0] = 0;

            {
                int e = pf[a0];
                int ae = e < 0 ? -e : e;
                if (ae > 6) {
                    if (e >= 8 && (e & 7) < 2) {
                        if (pf[a0+1] > 7 && pf[a0+1] < 10000) pf[a0+1] -= 1;
                    } else if (e == -7 && pf[a0+1] == 8) {
                        pf[a0] = -8;
                    } else if (e == 8 && pf[a0+1] == -7) {
                        pf[a0+1] = -8;
                    } else if (e < -7 && (((-e) & 7) < 2)) {
                        int n1v = pf[a0+1];
                        if (n1v < -14 && n1v < 10000) {
                            if (((-n1v) & 7) == 7) pf[a0+1] = n1v + 1;
                            else if ((((-n1v) & 7) < 2) && j < guard_col
                                     && pf[a0+2] <= 0)
                                pf[a0+1] = n1v + 1;
                        }
                    }
                }
            }
        }
    }
}

/* ------------------------------------------------------------------ */
/* res256 column ladder + classify (ops/residue.py)                   */

static void band_w1(int16_t *pf, long st)
{
    int v = pf[st];
    if (v == 7) { if (pf[st-1] >= 0 && pf[st-1] < 8) pf[st] = v + 2; }
    else if (v == 8) { if (pf[st-1] >= -2 && pf[st-1] < 8) pf[st] = v + 2; }
}

static void band_w2(int16_t *pf, long st)
{
    int v = pf[st];
    if (v < -14) {
        if ((((-v) & 7) == 0) || (((-v) & 7) == 7)) pf[st] = v + 1;
    } else if (v == 7 || (v & 65534) == 8) {
        if (pf[st-1] >= -2) pf[st] = v + 3;
    }
}

static void band_w3(int16_t *pf, long st)
{
    int v = pf[st];
    if (v < -14) {
        if ((((-v) & 7) == 0) || (((-v) & 7) == 7)) pf[st] = v + 1;
    } else if (v >= 0 && ((v + 2) & 65532) == 8) {
        if (pf[st-1] >= -2) pf[st] = 10;
    } else if (v > 14 && (v & 7) == 7) pf[st] = v + 1;
}

static void lw3(int16_t *pf, int16_t *rf, long cnt, long st, int hi1)
{
    if (hi1) rf[cnt] = 14500;
    else band_w3(pf, st);
}

static void lw5(int16_t *pf, int16_t *rf, long cnt, long st, int res,
                int hi1)
{
    rf[cnt] = 14000;
    if (res == -4) {
        int v = pf[st];
        if (v == -7 || v == -8) {
            if (pf[st-1] > -8 && pf[st-1] < 2) pf[st] = -9;
        }
    } else if (res < -6) {
        if (res < -7 && hi1) rf[cnt] = 14900;
        else {
            int v = pf[st];
            if (v < -14) {
                if ((((-v) & 7) == 0) || (((-v) & 7) == 7)) pf[st] = v + 1;
            } else if (v == 7 || v == 8) {
                if (pf[st-1] >= -1 && pf[st-1] < 8) pf[st] = v + 3;
            }
        }
    }
}

/* rf must be res256 padded with the 1024-short OOB emulation region */
void nhw_column_ladder(int16_t *pf, int16_t *rf, int quality, int low1,
                       int low2, int hi1, int res_setting)
{
    int j, r;
    for (j = 0; j < D; j++) {
        for (r = 0; r < D - 1; r++) {
            long scan = (long)r * N + j;
            long cnt = (long)r * D + j;
            int res = pf[scan] - rf[cnt];
            int a = pf[scan + N] - rf[cnt + D];
            int b2 = pf[scan + 2*N] - rf[cnt + 2*D];
            long st = ((long)j << 9) + r + D;

            if (res == 2 && a == 2 && b2 >= 2) {
                if (b2 < 5 || b2 > 6) {
                    rf[cnt] = 12400; pf[scan+N] -= 2; pf[scan+2*N] -= 2;
                }
            } else if (((res == 2 && a == 3) || (res == 3 && a == 2))
                       && b2 > 1 && b2 < 6) {
                rf[cnt] = 12400; pf[scan+N] -= 2; pf[scan+2*N] -= 2;
            } else if (res == 3 && a == 3) {
                if (b2 > 0 && b2 < 6) {
                    rf[cnt] = 12400; pf[scan+N] -= 2; pf[scan+2*N] -= 2;
                } else if (low1) {
                    rf[cnt] = 12100; pf[scan+N] = rf[cnt+D];
                }
            } else if (a == -4 && (res == 2 || res == 3)
                       && (b2 == 2 || b2 == 3)) {
                if (res == 2 && b2 == 2) pf[scan+N] += 1;
                else {
                    rf[cnt] = 12400; pf[scan+N] -= 2; pf[scan+2*N] -= 2;
                }
            } else if (res == 1 && a == 3 && b2 == 2) {
                if (r > 0 && (pf[scan-N] - rf[cnt-D]) >= 0) {
                    rf[cnt] = 12400; pf[scan+N] -= 2; pf[scan+2*N] -= 2;
                }
            } else if ((res == 3 || res == 4 || res == 5 || res > 6)
                       && (a == 3 || (a & 65534) == 4)) {
                if (res > 6) { rf[cnt] = 12500; pf[scan+N] = rf[cnt+D]; }
                else if (low1) { rf[cnt] = 12100; pf[scan+N] = rf[cnt+D]; }
                else if (low2) {
                    if (res < 5 && a == 5) rf[cnt+D] = 14100;
                    else if (res >= 5) rf[cnt] = 14100;
                    else if (res == 3 && a >= 4) rf[cnt+D] = 14100;
                    pf[scan+N] = rf[cnt+D];
                }
            } else if ((res == 2 || res == 3) && (a == 2 || a == 3)) {
                if (b2 == 0 || b2 == 1) {
                    int d1 = pf[scan+1] - rf[cnt+1];
                    if (d1 == 2 || d1 == 3) {
                        int d2 = pf[scan+N+1] - rf[cnt+D+1];
                        if (d2 == 2 || d2 == 3) {
                            if (pf[scan+2*N+1] - rf[cnt+2*D+1] > 0) {
                                rf[cnt] = 12400;
                                pf[scan+N] -= 2; pf[scan+2*N] -= 2;
                            }
                        }
                    }
                }
            } else if (a == 4 && (res == -2 || res == -3)
                       && (-b2 == 2 || -b2 == 3)) {
                if (res == -2 && b2 == -2) pf[scan+N] -= 1;
                else {
                    rf[cnt] = 12300; pf[scan+N] += 2; pf[scan+2*N] += 2;
                }
            } else if ((res == -3 || res == -4 || res == -5 || res < -7)
                       && (a == -3 || a == -4 || a == -5)) {
                if (res < -7) { rf[cnt] = 12600; pf[scan+N] = rf[cnt+D]; }
                else if (low1) { rf[cnt] = 12200; pf[scan+N] = rf[cnt+D]; }
                else if (low2) {
                    if (res > -5 && a == -5) rf[cnt+D] = 14000;
                    else if (res <= -5) rf[cnt] = 14000;
                    else if (res == -3 && a <= -4) rf[cnt+D] = 14000;
                    pf[scan+N] = rf[cnt+D];
                }
            } else if (a == -2 || a == -3) {
                if (res == -2 || res == -3) {
                    if (-b2 > 0) {
                        rf[cnt] = 12300; pf[scan+N] += 2; pf[scan+2*N] += 2;
                    } else if (res == -3 && hi1) {
                        rf[cnt] = 14500;
                    } else if (-b2 == 0) {
                        int d1 = pf[scan+1] - rf[cnt+1];
                        if (d1 == -2 || d1 == -3) {
                            int d2 = pf[scan+N+1] - rf[cnt+D+1];
                            if (d2 == -2 || d2 == -3) {
                                if (pf[scan+2*N+1] - rf[cnt+2*D+1] < 0) {
                                    rf[cnt] = 12300;
                                    pf[scan+N] += 2; pf[scan+2*N] += 2;
                                }
                            }
                        }
                    } else if (res == -2) band_w2(pf, st);
                    else lw3(pf, rf, cnt, st, hi1);
                } else if (res == -1 && a == -3 && b2 == -2) {
                    if (r > 0 && (pf[scan-N] - rf[cnt-D]) <= 0) {
                        rf[cnt] = 12300; pf[scan+N] += 2; pf[scan+2*N] += 2;
                    }
                } else if (res == -1) {
                    if (-b2 == 3) {
                        rf[cnt] = 12300; pf[scan+N] += 2; pf[scan+2*N] += 2;
                    } else band_w1(pf, st);
                } else if (res == -4) {
                    if (-b2 > 1 && -b2 < 4) {
                        rf[cnt] = 12300; pf[scan+N] += 2; pf[scan+2*N] += 2;
                    } else lw5(pf, rf, cnt, st, res, hi1);
                }
            } else if (res == 0 || res == -1) {
                band_w1(pf, st);
            } else if (res == -2) {
                band_w2(pf, st);
            } else if (res == -3) {
                lw3(pf, rf, cnt, st, hi1);
            } else if (res < -res_setting) {
                lw5(pf, rf, cnt, st, res, hi1);
            }
        }
    }
}

void nhw_classify(int16_t *pf, int16_t *rf, int hi1, int res_setting,
                  long *counts /* n1, n3, n5 */)
{
    long n1 = 0, n3 = 0, n5 = 0;
    int r, j;
    for (r = 0; r < D; r++) {
        for (j = 0; j < D; j++) {
            long scan = (long)r * N + j;
            long cnt = (long)r * D + j;
            int mark = rf[cnt];
            if (mark < 12000) {
                int res = pf[scan] - mark;
                rf[cnt] = 0;
                long st = ((long)j << 9) + r + D;
                if (res == 0 || res == 1) {
                    int v = pf[st];
                    if (v == -7 || v == -8) {
                        if (pf[st-1] > -8 && pf[st-1] < 2) pf[st] = -9;
                    }
                } else if (res == 2) {
                    int v = pf[st];
                    if (v > 15 && !(v & 7)) pf[st] = v - 1;
                    else if (v == -7 || v == -8) {
                        if (pf[st-1] <= 1) pf[st] = -9;
                    } else if (v == -6) {
                        if (pf[st-1] > -8 && pf[st-1] <= -1) pf[st] = -9;
                    }
                } else if (res == 3) {
                    if (hi1) { rf[cnt] = 144; n5++; }
                    else {
                        int v = pf[st];
                        if (v > 15 && !(v & 7)) pf[st] = v - 1;
                        else if (v <= 0 && ((((-v) + 2) & 65532) == 8)) {
                            if (pf[st-1] <= 2) pf[st] = -10;
                        }
                    }
                } else if (res > res_setting) {
                    rf[cnt] = 141; n1++;
                    if (res == 4) {
                        int v = pf[st];
                        if (v == 7 || (v & 65534) == 8) {
                            if (pf[st-1] >= 0 && pf[st-1] < 8)
                                pf[st] = v + 2;
                        }
                    } else if (res > 6) {
                        if (res > 7 && hi1) { rf[cnt] = 148; n5++; n1++; }
                        else {
                            int v = pf[st];
                            if (v > 15 && !(v & 7)) pf[st] = v - 1;
                            else if (v == -6 || v == -7 || v == -8) {
                                if (pf[st-1] > -8 && pf[st-1] < 0)
                                    pf[st] = -9;
                            }
                        }
                    }
                }
            } else {
                int code = 0;
                switch (mark) {
                case 14000: code = 140; n1++; break;
                case 14500: code = 145; n5++; break;
                case 12200: code = 122; n3++; break;
                case 12100: code = 121; n3++; break;
                case 12300: code = 123; n3++; break;
                case 12400: code = 124; n3++; break;
                case 14100: code = 141; n1++; break;
                case 12500: code = 125; n3++; n1++; break;
                case 12600: code = 126; n3++; n1++; break;
                case 14900: code = 149; n5++; n1++; break;
                }
                rf[cnt] = code;
            }
        }
    }
    counts[0] = n1; counts[1] = n3; counts[2] = n5;
}

/* ------------------------------------------------------------------ */
/* requant scan ladder (ops/requant.py requant_scan_ladder); pf is the
 * 512-wide process plane, jf the jpeg plane, rf the 256x256 res256.
 * Both heap shorts just before the C arrays are zero. */

void nhw_scan_ladder(int16_t *jf, int16_t *pf, const int16_t *rf)
{
    long cnt;
    /* baseline: jpeg block = res256 */
    for (cnt = 0; cnt < SZ; cnt++)
        jf[((cnt >> 8) << 9) + (cnt & 255)] = rf[cnt];

    for (cnt = 0; cnt < SZ; cnt++) {
        long e = ((cnt >> 8) << 9) + (cnt & 255);
        int scan = pf[e] - rf[cnt];
        int m;
        if (scan > 11) m = -7;
        else if (scan > 7) m = -4;
        else if (scan > 5) m = -2;
        else if (scan > 4) m = -1;
        else if (scan < -11) m = 7;
        else if (scan < -7) m = 4;
        else if (scan < -5) m = 2;
        else if (scan < -4) m = 1;
        else if (scan > 1 || scan < -1) {
            int a = pf[e + 1] - (cnt + 1 < SZ ? rf[cnt + 1] : 0);
            int left;
            if (a > 4 || a < -4) {
                if (a > 0)
                    a += a > 11 ? -7 : a > 7 ? -4 : a > 5 ? -2 : -1;
                else
                    a += a < -11 ? 7 : a < -7 ? 4 : a < -5 ? 2 : 1;
            }
            left = cnt > 0 ? pf[e - 1] - rf[cnt - 1] : 0;
            a += left;
            if (scan >= 4 && a >= 1) m = -1;
            else if (scan <= -4 && a <= -1) m = 1;
            else if (scan == 3 && a >= 0) m = -1;
            else if (scan == -3 && a <= 0) m = 1;
            else if (a >= 3 || a <= -3) {
                if (scan > 0 && a > 0) m = -1;
                else if (scan < 0 && a < 0) m = 1;
                else if (a >= 5) m = -2;
                else if (a <= -5) m = 2;
                else if (a >= 4) m = -1;
                else if (a <= -4) m = 1;
                else m = 0;
            } else m = 0;
        } else m = 0;

        if (m) {
            jf[e] = (int16_t)(rf[cnt] + m);
            pf[e] = (int16_t)(pf[e] + m);
        }
    }
}

/* ------------------------------------------------------------------ */
/* offsetUV (ops/quantize.py offset_uv); pf padded by 8 shorts         */

void nhw_offset_uv(int16_t *pf, int m2)
{
    long i = 0;
    while (i < SZ) {
        int a = pf[i];
        if (a > 10000) {
            int code = 0;
            switch (a) {
            case 12400: code = 124; break;
            case 12600: code = 126; break;
            case 12900: code = 122; break;
            case 13000: code = 130; break;
            }
            if (code) { pf[i] = code; i++; continue; }
        }
        if (a > 127) {
            int exw = ((a & 0xfff8) - 128) >> 3;
            pf[i] = EXW1[exw > 18 ? 18 : exw];
            i++; continue;
        }
        if (a < -127) {
            int exw = (((-a) & 0xfff8) - 128) >> 3;
            pf[i] = EXW2[exw > 18 ? 18 : exw];
            i++; continue;
        }
        if (a == -7 || a == -8) {
            if ((i & 255) < D - 1 && (pf[i+1] == -7 || pf[i+1] == -8)) {
                pf[i] = 120; pf[i+1] = 120; i += 2; continue;
            }
            a = -a;
            if (pf[i+1] > -8 && pf[i+1] < 0) { if ((a & 7) < 6) a &= 504; }
            else { if ((a & 7) < 7) a &= 504; }
            a = -a;
        } else if (a < 0) {
            a = -a;
            if (pf[i+1] > -8 && pf[i+1] < 0) { if ((a & 7) < 6) a &= 504; }
            else { if ((a & 7) < 7) a &= 504; }
            a = -a;
        } else if (a > 6 && (a & 7) >= 6) {
            if ((i & 255) < D - 1 && pf[i+1] == 7) pf[i+1] = 8;
        }
        if (a < m2 && a > -m2) pf[i] = 128;
        else pf[i] = (a + 128) & 248;
        i++;
    }
}

/* ------------------------------------------------------------------ */
/* select-code promotion + long-run cap (ops/quantize.py)              */

void nhw_select_codes(uint8_t *s, long *sel1_out, long *sel2_out)
{
    long i;
    long sel1 = 0, sel2 = 0;
    for (i = 0; i < 4; i++) s[i] = 128;
    for (i = 4 * SZ - 4; i < 4 * SZ; i++) s[i] = 128;
    for (i = 4; i < 4 * SZ - 4; i++) {
        int v = s[i];
        if (v != 136 && v != 120) continue;
        {
            int nxt = s[i + 1];
            if (s[i+2] == 128 && (nxt == 120 || nxt == 136) && s[i-1] == 128
                && s[i-2] == 128 && s[i-3] == 128 && s[i-4] == 128) {
                s[i+1] = nxt == 120 ? 157 : 159; sel2++;
            } else if (s[i-1] == 128 && (nxt == 120 || nxt == 136)
                       && s[i+2] == 128 && s[i+3] == 128 && s[i+4] == 128
                       && s[i+5] == 128) {
                s[i+1] = nxt == 120 ? 157 : 159; sel2++;
            } else if (s[i-1] == 128 && s[i-2] == 128 && s[i-3] == 128
                       && s[i-4] == 128 && s[i+1] == 128) {
                s[i] = v == 136 ? 153 : 155; sel1++;
            } else if (s[i-1] == 128 && s[i+1] == 128 && s[i+2] == 128
                       && s[i+3] == 128 && s[i+4] == 128) {
                s[i] = v == 136 ? 153 : 155; sel1++;
            }
        }
    }
    *sel1_out = sel1;
    *sel2_out = sel2;
}

static void demote(uint8_t *s, long k)
{
    if (s[k] == 153) s[k] = 124;
    else if (s[k] == 155) s[k] = 123;
}

void nhw_cap_long_runs(uint8_t *s)
{
    long i = 0;
    int count = 0;
    while (i < 4 * SZ) {
        while (s[i] == 128 && s[i + 1] == 128) {
            count += 1;
            if (count > 255) {
                demote(s, i); demote(s, i+1); demote(s, i+2); demote(s, i+3);
                i -= 1; count = 0;
            } else i += 1;
        }
        if (count >= 252) demote(s, i + 1);
        count = 0;
        i += 1;
    }
}

/* ------------------------------------------------------------------ */
/* merge crossing codes (ops/quantize.py merge_crossing_codes)         */

void nhw_merge_crossing(uint8_t *s)
{
    long i = 0;
    long end = 4 * SZ - 4;
    while (i < end) {
        if (s[i] != 128 && s[i+1] == 128) {
            if (s[i+2] == 128) {
                if (s[i+3] == 128) {
                    int v0 = s[i], v4 = s[i+4];
                    if (v0 == 136 && v4 == 136) { s[i]=132; s[i+4]=201; i+=4; }
                    else if (v0 == 136 && v4 == 120) { s[i]=133; s[i+4]=201; i+=4; }
                    else if (v0 == 120 && v4 == 136) { s[i]=134; s[i+4]=201; i+=4; }
                    else if (v0 == 120 && v4 == 120) { s[i]=135; s[i+4]=201; i+=4; }
                    else i += 3;
                } else i += 2;
            } else i += 1;
        }
        i += 1;
    }
}

/* ------------------------------------------------------------------ */
/* Huffman symbol decode (ops/entropy.py)                              */

#define MSW 511
#define ZONE1 110
#define UNZONE1 64
#define WVLT_E 123

static long next_symbol(const uint8_t *bits, long pos, int zone_on,
                        const int32_t *nt1, const int32_t *nt2, int *sym)
{
    int tr, size, dec;
    if (zone_on) {
        int v = 0, k;
        for (k = 0; k < 9; k++) v = (v << 1) | bits[pos + k];
        if (v == 0x1) {
            v = 0;
            for (k = 9; k < 15; k++) v = (v << 1) | bits[pos + k];
            *sym = v + ZONE1;
            return pos + 15;
        }
    }
    tr = 0; size = 0;
    for (;;) {
        tr = (tr << 1) | bits[pos + size];
        size += 1;
        if (tr == 0x1F) {
            int k;
            tr = 0;
            for (k = 0; k < 5; k++) {
                tr = (tr << 1) | bits[pos + size]; size += 1;
            }
            dec = nt2[tr << 4];
            if (dec != 0 && size == (dec >> 9)) break;
            for (;;) {
                tr = (tr << 1) | bits[pos + size]; size += 1;
                if (size == 0xB) {
                    dec = nt2[tr << 3];
                    if (dec != 0 && size == (dec >> 9)) break;
                    if (tr == 0x3) {
                        int v = 0;
                        for (k = 0; k < 6; k++) {
                            v = (v << 1) | bits[pos + size]; size += 1;
                        }
                        dec = v + 110;
                        break;
                    }
                    if (tr == 0x23) {
                        int v = 0;
                        for (k = 0; k < 6; k++) {
                            v = (v << 1) | bits[pos + size]; size += 1;
                        }
                        if (v < 46) { dec = v + 174; break; }
                        v = (v << 1) | bits[pos + size]; size += 1;
                        if (v < 104) {
                            dec = (v >> 1) + ((v >> 1) - 46) + (v & 1) + 174;
                            break;
                        }
                        v = (v << 1) | bits[pos + size]; size += 1;
                        if (v < 246) {
                            dec = 6 + (((v >> 2) - 52) * 3)
                                  + (v >> 2) + (v & 3) + 174;
                            break;
                        }
                        v = (v << 1) | bits[pos + size]; size += 1;
                        dec = v - 492 + 270;
                        break;
                    }
                    continue;
                }
                dec = nt2[tr << (14 - size)];
                if (dec != 0 && size == (dec >> 9)) break;
            }
            break;
        }
        dec = nt1[tr];
        if (dec != 0 && size == (dec >> 9)) break;
    }
    {
        int s2 = dec & MSW;
        if (zone_on && s2 >= ZONE1) s2 += UNZONE1;
        *sym = s2;
    }
    return pos + size;
}

void nhw_decode_y(const uint8_t *bits, const int32_t *nt1,
                  const int32_t *nt2, const int32_t *vals,
                  const int32_t *rles, const uint8_t *sel1,
                  const uint8_t *sel2, int zone_on, const int8_t *extra,
                  int16_t *out, long p1)
{
    long pos = 0, e = 0;
    int mem = 0, mem2 = 0, nhw_ac1 = 0;
    long run_over = -257;
    long t = 0, t2 = 0;

    for (;;) {
        int dec, word, rle;
        pos = next_symbol(bits, pos, zone_on, nt1, nt2, &dec);
        word = vals[dec];
        rle = rles[dec];

        if (word == 0x80) {
            mem += 1;
            if (mem2 == 1) {
                if (e >= 5 && !(out[e-2] || out[e-3] || out[e-4]
                                || out[e-5])) {
                    out[e] = sel2[t2] ? 11 : -11; t2++; e++;
                } else if (rle >= 4 && !out[e-2]) {
                    out[e] = sel2[t2] ? 11 : -11; t2++; e++;
                }
                mem2 = 0;
            } else if (mem == 2 && !nhw_ac1) {
                if (e >= 4 && !(out[e-1] || out[e-2] || out[e-3]
                                || out[e-4])
                    && (e + rle - 257) >= run_over) {
                    out[e] = sel1[t] ? -11 : 11; t++; e++; mem = 1;
                } else if (rle >= 4 && e > 0 && !out[e-1]
                           && (e + rle - 257) >= run_over) {
                    out[e] = sel1[t] ? -11 : 11; t++; e++; mem = 1;
                }
            } else if (rle >= 4 && e > 0 && !out[e-1] && !nhw_ac1
                       && (e + rle - 257) >= run_over) {
                out[e] = sel1[t] ? -11 : 11; t++; e++; mem = 1;
            }
            if (rle == 254) { nhw_ac1 = 1; mem = 0; run_over = e; }
            else nhw_ac1 = 0;
            e += rle;
        } else {
            mem = 0; mem2 = 0; nhw_ac1 = 0;
            switch (word) {
            case 136: out[e] = 11; e++; mem2 = 1; break;
            case 120: out[e] = -11; e++; mem2 = 1; break;
            case 132: out[e] = 11; out[e+4] = 11; e += 5; break;
            case 133: out[e] = 11; out[e+4] = -11; e += 5; break;
            case 134: out[e] = -11; out[e+4] = 11; e += 5; break;
            case 135: out[e] = -11; out[e+4] = -11; e += 5; break;
            case 127: out[e] = 1008; e++; break;
            case 129: out[e] = 1009; e++; break;
            case 125: out[e] = 1006; e++; break;
            case 126: out[e] = 1007; e++; break;
            case 121: out[e] = 1010; e++; break;
            case 122: out[e] = 1011; e++; break;
            case 124: out[e] = 11; e++; break;
            case 123: out[e] = -11; e++; break;
            default:
                if (word < ZONE1 && extra[word]) {
                    int x = extra[word];
                    out[e] = x > 0 ? WVLT_E + (x << 3) : (x << 3) - WVLT_E;
                    e++;
                } else if (word > 0x80) {
                    out[e] = word - 125; e++;
                } else {
                    out[e] = word - 131; e++;
                }
            }
        }
        if (e >= p1 - 1) break;
    }
}

void nhw_decode_uv(const uint8_t *bits, const int32_t *nt1,
                   const int32_t *nt2, const int32_t *vals,
                   const int32_t *rles, const int8_t *extra,
                   int16_t *out, long p1)
{
    long pos = 0, e = 0;
    for (;;) {
        int dec, word;
        pos = next_symbol(bits, pos, 0, nt1, nt2, &dec);
        word = vals[dec];
        if (word == 0x80) {
            e += rles[dec];
        } else if (word < ZONE1) {
            int x = extra[word];
            if (x) out[e] = x > 0 ? WVLT_E + (x << 3) : (x << 3) - WVLT_E;
            else if (word > 0x80) out[e] = word - 125;
            else out[e] = word - 131;
            e++;
        } else if (word == 124) { out[e] = 5005; e++; }
        else if (word == 126) { out[e] = 5006; e++; }
        else if (word == 122) { out[e] = 5003; e++; }
        else if (word == 130) { out[e] = 5004; e++; }
        else if (word > 0x80) { out[e] = word - 125; e++; }
        else { out[e] = word - 131; e++; }
        if (e >= p1 - 1) break;
    }
}

/* ------------------------------------------------------------------ */
/* pre-filter kernel pass + q>LOW4 pair walk (ops/prefilter.py)        */

void nhw_kernel_simple(const int32_t *res, const int32_t *cnt, int32_t *out)
{
    int r, j;
    int res4 = 0;
    for (r = 1; r < 511; r++) {
        long base = (long)r * N;
        for (j = 1; j < 511; j++) {
            long scan = base + j;
            int v = res[scan];
            if (v < 0) {
                res4 = 15 * (-v) + cnt[scan] + ((res4 + 2) >> 2);
                out[scan] = -(res4 >> 4);
                res4 &= 15;
            } else if (v > 0) {
                res4 = 15 * v + cnt[scan] + ((res4 + 2) >> 2);
                out[scan] = res4 >> 4;
                res4 &= 15;
            } else {
                out[scan] = 0;
                res4 = 0;
            }
        }
    }
}

void nhw_pair_walk_simple(int16_t *jf, const int32_t *kf)
{
    int r;
    int a = 0;
    for (r = 1; r < 511; r++) {
        long base = (long)r * N;
        long j = 1;
        while (j < 510) {
            long s0 = base + j, s1 = base + j + 1;
            int res = kf[s0], count = kf[s1];
            int e;

            if (res > 201) { jf[s0] -= 2; e = 4; }
            else if (res < -201) { jf[s0] += 2; e = 3; }
            else if (res > 176) { jf[s0] -= 1; e = 2; }
            else if (res < -176) { jf[s0] += 1; e = 1; }
            else e = 0;
            if (count > 201) {
                if (e == 0 || e == 3) jf[s1] -= 2;
                else if (e != 4) jf[s1] -= 1;
            } else if (count < -201) {
                if (e == 0 || e == 4) jf[s1] += 2;
                else if (e != 3) jf[s1] += 1;
            } else if (count > 176) {
                if (e != 4) jf[s1] -= 1;
            } else if (count < -176) {
                if (e != 3) jf[s1] += 1;
            }

            if (res > 10 && res < 32) {
                if (count >= 23 || count <= -23) {
                    if (res < 16) {
                        if (count > 0 && count < 32 && res > 11) jf[s1] += 1;
                        jf[s0] += 1;
                        a = 0; j += 2; continue;
                    } else {
                        jf[s0] += a ? 1 : 2;
                        a = 0; j += 2; continue;
                    }
                }
            } else if (res > -32 && res < -10) {
                if (count >= 23 || count <= -23) {
                    if (res > -16) {
                        if (count > -32 && count < 0 && res < -11)
                            jf[s1] -= 1;
                        jf[s0] -= 1;
                        a = 0; j += 2; continue;
                    } else {
                        jf[s0] -= a ? 1 : 2;
                        a = 0; j += 2; continue;
                    }
                }
            }
            a = 0;
            if (count > 10 && count < 32) {
                if (res >= 23 || res <= -23) {
                    if (count < 16) {
                        if (res > 0 && res < 32 && count > 11) jf[s0] += 1;
                        jf[s1] += 1;
                    } else { jf[s1] += 2; a = 1; }
                }
            } else if (count > -32 && count < -10) {
                if (res >= 23 || res <= -23) {
                    if (count > -16) {
                        if (res > -32 && res < 0 && count < -11) jf[s0] -= 1;
                        jf[s1] -= 1;
                    } else { jf[s1] -= 2; a = 1; }
                }
            }
            j += 2;
        }
    }
}

/* ------------------------------------------------------------------ */
/* offsetY_recons256 band quantizer (ops/requant.py _quantize_band)    */

void nhw_quantize_band(int16_t *jf, int16_t *pf, int low4, int m1, int part,
                       int r0, int r1_, int c0, int c1)
{
    int r;
    for (r = r0; r < r1_; r++) {
        long base = (long)r * N;
        int quant = 0, quant6 = 0;
        long j = c0;
        while (j < c1) {
            int a = pf[base + j];
            if (a > 15000) {
                switch (a) {
                case 15300: jf[base + j] = 5; j += 3; break;
                case 15400: jf[base + j] = -5; j += 3; break;
                case 15500: jf[base + j] = 5; j += 2; break;
                case 15600: jf[base + j] = -5; j += 2; break;
                case 15700: jf[base + j] = 6; jf[base + j + 1] = 6;
                            j += 2; break;
                case 15800: jf[base + j] = -6; jf[base + j + 1] = -6;
                            j += 2; break;
                default: j += 1;
                }
                continue;
            }
            if (a < -12 && (((-a) & 7) == 6)) {
                if (j < 255 && pf[base + j + 1] == -7) pf[base + j + 1] = -8;
            }
            if (a < 0) {
                if (a == -7 && j < 255 && pf[base + j + 1] == 8) {
                    pf[base + j] = -8; a = -8;
                }
                a = -a;
                if (low4) {
                    if (a == 15) {
                        if (!quant) { a &= 65528; quant = 1; }
                        else quant = (quant + 1) % 6;
                    } else if (a > 22 && (a & 7) == 7) {
                        if (!quant6) { a &= 65528; quant6 = 1; }
                        else quant6 = (quant6 + 1) % 4;
                    } else a &= 65528;
                } else {
                    if ((a & 7) < 7) a &= 65528;
                }
                a = -a;
            } else if (a == 8 && j < 255 && pf[base + j + 1] == -7) {
                pf[base + j + 1] = -8;
            } else if (a > 12 && !part && (a & 7) >= 6) {
                if (j < 255 && pf[base + j + 1] == 7) pf[base + j + 1] = 8;
            }
            if (a < m1 && a > -m1) { jf[base + j] = 0; j += 1; continue; }
            a += 128;
            if (a < 0) a = -((-a) & 65528);
            else a &= 65528;
            jf[base + j] = (int16_t)(a > 128 ? a - 125 : a - 131);
            j += 1;
        }
    }
}
