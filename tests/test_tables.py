"""Format-constant tables match the published reference headers."""

from __future__ import annotations

import re

import numpy as np
import pytest

from nhwcodec_tpu import tables as T

import oracle


def _parse_c_array(src: str, name: str) -> np.ndarray:
    m = re.search(name + r"\[[^\]]*\]\s*=\s*\{(.*?)\};", src, re.S)
    assert m, name
    return np.array([int(x) for x in re.findall(r"-?\d+", m.group(1))])


@pytest.mark.skipif(not oracle.available(), reason="reference unavailable")
def test_decode_luts_match_reference():
    src = (oracle.REFERENCE / "decoder" / "tables.h").read_text()
    assert np.array_equal(_parse_c_array(src, "nhw_table1"),
                          T.NHW_TABLE1.astype(np.int64))
    assert np.array_equal(_parse_c_array(src, "nhw_table2"),
                          T.NHW_TABLE2.astype(np.int64))
    assert np.array_equal(_parse_c_array(src, "extra_table"), T.EXTRA_TABLE)


def test_lut_shapes():
    assert T.NHW_TABLE1.shape == (512,)
    assert T.NHW_TABLE2.shape == (512,)
    assert T.EXTRA_TABLE.shape == (T.ZONE1 - 1,)
    # every LUT entry encodes (bit_length << 9) | symbol_index
    for lut in (T.NHW_TABLE1, T.NHW_TABLE2):
        nz = lut[lut != 0]
        assert ((nz >> 9) >= 2).all() and ((nz >> 9) <= 14).all()
