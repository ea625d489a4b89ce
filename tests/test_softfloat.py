"""ops.softfloat: exact IEEE emulation over int64 lanes.

Every op is checked against numpy's IEEE-754 arithmetic on random values
spanning the codec's value domain (|v| < 2^10, plus zeros)."""

import numpy as np

from nhwcodec_tpu.ops import softfloat as sf

N = 300000


def _rand(rng, n=N):
    mag = np.exp2(rng.uniform(-14, 9, n))
    v = rng.choice([-1.0, 1.0], n) * mag * (1 + rng.random(n))
    v[rng.random(n) < 0.02] = 0.0
    return v


def _unpack(t, P=53):
    s, m, e = t
    v = m.astype(np.float64) * np.exp2((e - (P - 1)).astype(np.float64))
    return np.where(s == 1, -v, v)


def test_pack_roundtrip():
    v = _rand(np.random.default_rng(0))
    assert np.array_equal(_unpack(sf.pack_f64(v)), v)


def test_add_f64():
    rng = np.random.default_rng(1)
    a, b = _rand(rng), _rand(rng)
    got = _unpack(sf.add(sf.pack_f64(a), sf.pack_f64(b), 53, np))
    assert np.array_equal(got, a + b)


def test_add_f64_near_cancellation():
    rng = np.random.default_rng(2)
    a = _rand(rng)
    b = -a * (1 + np.exp2(rng.uniform(-55, -1, a.size)))
    b = b.astype(np.float64)
    got = _unpack(sf.add(sf.pack_f64(a), sf.pack_f64(b), 53, np))
    assert np.array_equal(got, a + b)
    # exact cancellation -> IEEE +0
    z = sf.add(sf.pack_f64(a), sf.pack_f64(-a), 53, np)
    assert np.array_equal(_unpack(z), np.zeros_like(a))
    assert (z[0] == 0).all()


def test_mul_const():
    rng = np.random.default_rng(3)
    a = _rand(rng)
    for c in (float(np.float32(0.975)), float(np.float32(0.93)), 0.94,
              1.402, -0.34414, 0.0001):
        got = _unpack(sf.mul_const(sf.pack_f64(a), sf.pack_const(c),
                                   53, np))
        assert np.array_equal(got, a * c), c


def test_mul_small_int():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 1024, N).astype(np.int64)
    for c in (0.299, 0.587, 0.114, -0.1687, -0.3313, -0.4187, -0.0813):
        got = _unpack(sf.mul_small_int(sf.pack_const(c), x, np))
        assert np.array_equal(got, c * x.astype(np.float64)), c


def test_narrow_and_f32_ops():
    rng = np.random.default_rng(5)
    a, b = _rand(rng), _rand(rng)
    na = sf.narrow_to_f32(sf.pack_f64(a), np)
    assert np.array_equal(_unpack(na, 24),
                          a.astype(np.float32).astype(np.float64))
    a32, b32 = a.astype(np.float32), b.astype(np.float32)
    pa = sf.narrow_to_f32(sf.pack_f64(a32.astype(np.float64)), np)
    pb = sf.narrow_to_f32(sf.pack_f64(b32.astype(np.float64)), np)
    got = _unpack(sf.add(pa, pb, 24, np), 24)
    assert np.array_equal(got, (a32 + b32).astype(np.float64))


def test_trunc():
    rng = np.random.default_rng(6)
    a = _rand(rng)
    got = sf.trunc_to_int(sf.pack_f64(a), 53, np)
    assert np.array_equal(got, np.trunc(a).astype(np.int64))
    # integer-boundary values
    k = rng.integers(-512, 512, 1000).astype(np.float64)
    assert np.array_equal(sf.trunc_to_int(sf.pack_f64(k), 53, np),
                          k.astype(np.int64))
