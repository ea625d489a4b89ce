"""Decoder robustness: corrupt/truncated streams must fail cleanly.

The reference decoder trusts its input and reads out of bounds on
malformed files; this framework's container parser validates section
bounds and the native automatons carry explicit length guards
(hotpass.c nhw_decode_y/uv, nhw_decode_dc_planes), so every mutation
either decodes to *some* image or raises a normal Python exception —
never a crash or hang.
"""

from __future__ import annotations

import numpy as np
import pytest

import nhwcodec_tpu
from nhwcodec_tpu.utils import fixtures


@pytest.fixture(scope="module")
def valid_streams():
    return {q: nhwcodec_tpu.encode(fixtures.gradient_circles(), q)
            for q in (8, 16, 20, 23)}


def _try_decode(data: bytes) -> str:
    try:
        out = nhwcodec_tpu.decode(data)
        assert out.shape == (512, 512, 3)
        return "ok"
    except Exception:  # noqa: BLE001 — any clean Python exception is fine
        return "rejected"


def test_byte_flip_fuzz(valid_streams):
    rng = np.random.default_rng(0)
    outcomes = {"ok": 0, "rejected": 0}
    for q, data in valid_streams.items():
        buf = bytearray(data)
        for _ in range(100):
            pos = int(rng.integers(0, len(buf)))
            old = buf[pos]
            buf[pos] = int(rng.integers(0, 256))
            outcomes[_try_decode(bytes(buf))] += 1
            buf[pos] = old
    # the suite is about not crashing; both outcomes are legal
    assert sum(outcomes.values()) == 400


def test_truncation_fuzz(valid_streams):
    data = valid_streams[20]
    for frac in (0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        _try_decode(data[: int(len(data) * frac)])


def test_garbage_and_empty():
    rng = np.random.default_rng(1)
    _try_decode(b"")
    _try_decode(b"\x00" * 100)
    for n in (16, 1000, 40000):
        _try_decode(rng.integers(0, 256, n, dtype=np.uint8).tobytes())


def test_header_field_fuzz(valid_streams):
    """Mutate each of the first 48 bytes (the container header region)
    through several values — the parser must bound-check every section
    offset it derives."""
    data = valid_streams[20]
    for pos in range(min(48, len(data))):
        buf = bytearray(data)
        for val in (0, 1, 127, 128, 255):
            buf[pos] = val
            _try_decode(bytes(buf))


def test_encodes_content_that_crashes_the_reference():
    """8x8 random binary block images at q>=17 make the reference
    encoder abort with heap corruption (its own out-of-bounds writes);
    this framework encodes them and roundtrips its own stream."""
    rng = np.random.default_rng(777)
    p = rng.integers(0, 2, (64, 64)) * 255
    p = np.kron(p, np.ones((8, 8))).astype(np.uint8)
    img = np.ascontiguousarray(np.repeat(p[..., None], 3, axis=-1))
    for q in (17, 20, 23):
        data = nhwcodec_tpu.encode(img, q)
        out = nhwcodec_tpu.decode(data)
        assert out.shape == (512, 512, 3)
