"""Unit tests for the exact fixed-point colorspace primitives.

The fast path (ops.colorspace_device: _rne_u64 / _gain_mul_rne53 /
_chroma_fast / _y_fast) is proven end-to-end over all 2^24 RGB triples
by tools/colorspace_exhaustive.py; these tests pin the primitive-level
edge cases — RNE ties to even, rounding carries across a power of two,
the bit-length estimator at the 2^63/2^64 boundary, and the single
chroma wrap case — so a regression fails fast and locally.
"""

from __future__ import annotations

import numpy as np

from nhwcodec_tpu import tables as T
from nhwcodec_tpu.ops import colorspace as cs
from nhwcodec_tpu.ops import colorspace_device as csd


def _rne_ref(x: int, P: int) -> int:
    """Oracle: python-int RNE of x to a P-bit mantissa."""
    if x == 0:
        return 0
    L = x.bit_length()
    if L <= P:
        return x
    shift = L - P
    keep, rem = divmod(x, 1 << shift)
    half = 1 << (shift - 1)
    if rem > half or (rem == half and (keep & 1)):
        keep += 1
    return keep << shift


def test_rne_u64_matches_python_int_oracle():
    rng = np.random.default_rng(0)
    # top of the occurring domain: values stay >= 2^52 below 2^64
    # except exactly 2^64, which the chroma wrap special case handles
    cases = [0, 1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
             (1 << 60) - 1, (1 << 63) + 12345, (1 << 64) - (1 << 52)]
    # random values across every bit length
    for bits in range(1, 64):
        cases.extend(int(v) for v in
                     rng.integers(1 << (bits - 1), 1 << bits, 4,
                                  dtype=np.uint64))
    for P in (24, 53):
        got = csd._rne_u64(np.array(cases, np.uint64), P, np)
        want = np.array([_rne_ref(c, P) for c in cases], np.uint64)
        bad = np.nonzero(got != want)[0]
        assert bad.size == 0, (P, [hex(cases[i]) for i in bad[:5]])


def test_rne_u64_tie_to_even_both_parities():
    # even keep stays, odd keep rounds up, strictly-above always up
    P = 53
    base_even = 0b10 << 60            # keep ends in 0 after shift
    base_odd = 0b11 << 60             # keep ends in 1
    shift = 62 - P + 1                # L = 62 -> wait: recompute below
    for base in (base_even, base_odd):
        L = int(np.uint64(base)).bit_length()
        shift = L - P
        half = 1 << (shift - 1)
        tie = base + half
        above = base + half + 1
        got_tie = int(csd._rne_u64(np.array([tie], np.uint64), P, np)[0])
        got_above = int(csd._rne_u64(np.array([above], np.uint64),
                                     P, np)[0])
        assert got_tie == _rne_ref(tie, P)
        assert got_above == _rne_ref(above, P)


def test_rne_u64_carry_across_power_of_two():
    # all-ones mantissa + rounding-up crosses to the next power of two
    P = 24
    x = (1 << 40) - 1                 # 40 one-bits -> rounds to 2^40
    got = int(csd._rne_u64(np.array([x], np.uint64), P, np)[0])
    assert got == 1 << 40


def test_gain_mul_matches_float_reference():
    """The limb multiply must equal fl64(gain * v) for chain-realistic
    operands (53-bit-mantissa doubles at scale 2^-56, value >= 2^-4)."""
    rng = np.random.default_rng(1)
    for q, gain in ((T.LOW1, float(np.float32(0.975))),
                    (T.LOW2, float(np.float32(0.93))),
                    (T.LOW3, 0.94)):
        mg = csd._MI_GAIN[q]
        vals = csd._rne_u64(
            rng.integers(1 << 52, 1 << 63, 500, dtype=np.uint64), 53, np)
        got = csd._gain_mul_rne53(vals, mg, np)
        want = np.array(
            [int(np.float64(gain) * (int(v) * 2.0**-56) * 2**56 + 0.5)
             for v in vals], np.uint64)
        # the float reference above is itself exact: gain*v is a single
        # IEEE double multiply and the result ulp is >= 2^-56
        exact = np.array(
            [int.from_bytes(np.float64(np.float64(gain)
                                       * np.float64(int(v) * 2.0**-56))
                            .tobytes(), "little") for v in vals])
        # decode the double back to scale 2^-56 integers
        def f64_to_scaled(bits: int) -> int:
            m = bits & ((1 << 52) - 1)
            e = (bits >> 52) & 0x7FF
            val = (m + (1 << 52)) if e else m
            return val << (e - 1023 - 52 + 56) if e - 1023 - 52 + 56 >= 0 \
                else val >> -(e - 1023 - 52 + 56)
        want2 = np.array([f64_to_scaled(int(x)) for x in exact], np.uint64)
        assert np.array_equal(got, want2)


def test_chroma_wrap_case_reaches_256_then_clips():
    """C32 == +127.5 (R=G=0, B=255 on the U row) sums to exactly 2^64;
    the wrap special case must produce 256, clipped to 255 like the
    reference's (int)(127.5f + 128.5f) = 256."""
    r = np.array([0], np.int32)
    g = np.array([0], np.int32)
    b = np.array([255], np.int32)
    u = csd._chroma_fast(r, g, b, csd._MI_U, (-1, -1, 1), np)
    assert int(u[0]) == 256
    rgb = np.array([[[0, 0, 255]]], np.uint8)
    _, u8, _ = csd._yuv_full(rgb, T.NORM, np)
    y0, u0, v0 = cs.rgb_to_yuv(rgb, T.NORM)
    assert int(u8[0, 0]) == int(u0[0, 0]) == 255


def test_fast_path_matches_host_on_boundary_lattice():
    """The decimal-matrix tie surfaces (X*1000 % 500 == 0 style) are
    where double-rounding collapses would break first."""
    rng = np.random.default_rng(2)
    c = np.arange(256, dtype=np.uint8)
    grid = np.stack(np.meshgrid(c[::3], c[::7], c[::11]),
                    axis=-1).reshape(-1, 3).astype(np.uint8)
    rnd = rng.integers(0, 256, (40000, 3), dtype=np.uint8)
    rgb = np.concatenate([grid, rnd]).reshape(-1, 1, 3)
    for q in (T.NORM, T.LOW1, T.LOW2, T.LOW3):
        y0, u0, v0 = cs.rgb_to_yuv(rgb, q)
        y1, u1, v1 = csd._yuv_full(rgb, q, np)
        assert np.array_equal(y0, y1)
        assert np.array_equal(u0, u1)
        assert np.array_equal(v0, v1)
