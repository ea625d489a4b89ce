"""Y pre-processing ("neatness/sharpness" filter).

Reference behavior: pre_processing (encoder/image_processing.c:558-2426).

The filter computes an 8-neighbour gradient kernel with a 4-bit
error-feedback accumulator carried along the raster scan, then walks the
kernel in column pairs nudging pixels.  For q>LOW4 (q>=17) the walk is a
small local automaton (the ``e``/``a`` carries below); for q<=LOW4 the
reference adds ~40 interacting duty-cycle counters (t1..t44) — that path
lands with the low-quality sweep.

The kernel's gradient sums are vectorized; the 4-bit accumulator chain
and the pair walk run as fast host scans over flat lists (the carries are
single-pixel, mapping to a ``lax.scan`` on device).
"""

from __future__ import annotations

import numpy as np

from nhwcodec_tpu import tables as T

N = 512
SZ4 = 4 * 65536


def _gradient_sums(plane: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """res (signed 8-neighbour gradient sum) and count (abs sum) for the
    interior (encoder/image_processing.c:605-618)."""
    p = plane.astype(np.int32)
    res = np.zeros((N, N), np.int32)
    cnt = np.zeros((N, N), np.int32)
    c = p[1:-1, 1:-1]
    ws = [c - p[1:-1, :-2], c - p[1:-1, 2:], c - p[:-2, 1:-1],
          c - p[2:, 1:-1], c - p[:-2, 2:], c - p[:-2, :-2],
          c - p[2:, :-2], c - p[2:, 2:]]
    res[1:-1, 1:-1] = sum(ws)
    cnt[1:-1, 1:-1] = sum(np.abs(w) for w in ws)
    return res, cnt


def _kernel_pass_simple(res: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """nhw_kernel for q>LOW4 (encoder/image_processing.c:601-764 with the
    low-quality gates off): res4 is a 4-bit accumulator carried across the
    whole raster (reset on res==0)."""
    kernel = np.zeros(SZ4, np.int32)
    rf = res.reshape(-1).tolist()
    cf = cnt.reshape(-1).tolist()
    kf = kernel  # numpy for final store; build in list for speed
    out = [0] * SZ4
    res4 = 0
    for r in range(1, 511):
        base = r * N
        for scan in range(base + 1, base + 511):
            v = rf[scan]
            if v < 0:
                res4 = 15 * (-v) + cf[scan] + ((res4 + 2) >> 2)
                out[scan] = -(res4 >> 4)
                res4 &= 15
            elif v > 0:
                res4 = 15 * v + cf[scan] + ((res4 + 2) >> 2)
                out[scan] = res4 >> 4
                res4 &= 15
            else:
                out[scan] = 0
                res4 = 0
    kf[:] = out
    return kernel


def kernel_for(yplane: np.ndarray, quality: int) -> np.ndarray:
    """The nhw_kernel plane (flat int32) — also needed by the encoder to
    reproduce the reference's heap-tail reads past its tree1 buffer."""
    res_a, cnt_a = _gradient_sums(yplane)
    return _kernel_pass_simple(res_a, cnt_a)


def pre_process_y(yplane: np.ndarray, quality: int) -> np.ndarray:
    """(512,512) int16 luma -> pre-filtered luma (new array)."""
    if quality <= T.LOW4:
        raise NotImplementedError(
            "q<=16 pre-processing (t1..t44 automaton) lands with the "
            "low-quality sweep")

    jpeg = yplane.astype(np.int16).copy()
    res_a, cnt_a = _gradient_sums(yplane)
    kernel = _kernel_pass_simple(res_a, cnt_a)

    jf = jpeg.reshape(-1)
    kf = kernel.tolist()
    a = 0
    for r in range(1, 511):
        base = r * N
        j = 1
        while j < 510:
            s0 = base + j       # scan-1 in the C pair walk
            s1 = base + j + 1   # scan
            res = kf[s0]
            count = kf[s1]

            # >176/201 nudges (encoder/image_processing.c:813-837)
            if res > 201:
                jf[s0] -= 2
                e = 4
            elif res < -201:
                jf[s0] += 2
                e = 3
            elif res > 176:
                jf[s0] -= 1
                e = 2
            elif res < -176:
                jf[s0] += 1
                e = 1
            else:
                e = 0
            if count > 201:
                if e == 0 or e == 3:
                    jf[s1] -= 2
                elif e != 4:
                    jf[s1] -= 1
            elif count < -201:
                if e == 0 or e == 4:
                    jf[s1] += 2
                elif e != 3:
                    jf[s1] += 1
            elif count > 176:
                if e != 4:
                    jf[s1] -= 1
            elif count < -176:
                if e != 3:
                    jf[s1] += 1

            # the +-10..32 ladder (encoder/image_processing.c:1927-1990)
            if 10 < res < 32:
                if abs(count) >= 23:
                    if res < 16:
                        if 0 < count < 32 and res > 11:
                            jf[s1] += 1
                        jf[s0] += 1
                        a = 0
                        j += 2
                        continue
                    else:
                        jf[s0] += 2 if not a else 1
                        a = 0
                        j += 2
                        continue
            elif -32 < res < -10:
                if abs(count) >= 23:
                    if res > -16:
                        if -32 < count < 0 and res < -11:
                            jf[s1] -= 1
                        jf[s0] -= 1
                        a = 0
                        j += 2
                        continue
                    else:
                        jf[s0] -= 2 if not a else 1
                        a = 0
                        j += 2
                        continue

            a = 0
            if 10 < count < 32:
                if abs(res) >= 23:
                    if count < 16:
                        if 0 < res < 32 and count > 11:
                            jf[s0] += 1
                        jf[s1] += 1
                    else:
                        jf[s1] += 2
                        a = 1
            elif -32 < count < -10:
                if abs(res) >= 23:
                    if count > -16:
                        if -32 < res < 0 and count < -11:
                            jf[s0] -= 1
                        jf[s1] -= 1
                    else:
                        jf[s1] -= 2
                        a = 1
            j += 2
    return jpeg
