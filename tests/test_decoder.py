"""Bit-exactness of the decoder vs the reference nhw-dec (golden oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from nhwcodec_tpu.models import decoder
from nhwcodec_tpu.utils import bmp, fixtures

from conftest import golden, requires_oracle

IMAGES = list(fixtures.GENERATORS)
QUICK_QS = [1, 9, 12, 14, 17, 19, 20, 21, 22, 23]


@requires_oracle
@pytest.mark.parametrize("name", IMAGES)
def test_decode_bit_exact_q20(fixture_dir, name):
    nhw, dec = golden(fixture_dir, name, 20)
    ours = decoder.decode(nhw.read_bytes())
    ref = bmp.read_bmp512(dec)
    assert np.array_equal(ours, ref)


@requires_oracle
@pytest.mark.parametrize("q", QUICK_QS)
def test_decode_bit_exact_quality_sweep(fixture_dir, q):
    for name in IMAGES:
        nhw, dec = golden(fixture_dir, name, q)
        ours = decoder.decode(nhw.read_bytes())
        ref = bmp.read_bmp512(dec)
        assert np.array_equal(ours, ref), f"{name} q{q} mismatch"


@requires_oracle
@pytest.mark.slow
@pytest.mark.parametrize("q", [q for q in range(1, 24) if q not in QUICK_QS])
def test_decode_bit_exact_quality_sweep_full(fixture_dir, q):
    for name in IMAGES:
        nhw, dec = golden(fixture_dir, name, q)
        ours = decoder.decode(nhw.read_bytes())
        ref = bmp.read_bmp512(dec)
        assert np.array_equal(ours, ref), f"{name} q{q} mismatch"


@requires_oracle
def test_decode_to_bmp_byte_identical(fixture_dir, tmp_path):
    nhw, dec = golden(fixture_dir, "gradient", 20)
    out = tmp_path / "out.bmp"
    decoder.decode_to_bmp(nhw, out)
    assert out.read_bytes() == dec.read_bytes()
