"""Codebook (tree1/tree2) serialization edge cases.

Pins the shared-stack-buffer overread emulation: the reference
serializes the Y and UV codebooks through one stack array
(encoder/compress_pixel.c:58 ``codebook[580]``), and its UV RLE loop
(``:446-456``) chases a trailing 128-run past ``tree_end`` with an
unbounded ``goto`` — so a UV codebook that *ends* in a run absorbs
whatever consecutive 128s the Y pass left beyond the UV length.  The
inflated count is value-dead (the decoder stops expanding at
``tree_end``), but it is a live byte in the container, so the encoder
must reproduce it exactly (found in fuzz wave 19; byte-exact vs the
deterministic reference build after the fix).
"""

import numpy as np

from nhwcodec_tpu.ops.entropy_enc import _serialize_tree1, _serialize_tree2


def _uv_entries_trailing_run():
    # literal 5, then a run of length 3 -> raw [5|1, 128, 3],
    # interleaved cb = [5, 3, 128]: ends in a marker run of one.
    return [(1 << 8) | 4, (3 << 8) | 128]


def test_tree2_trailing_run_without_leftovers():
    out, tree_end = _serialize_tree2(_uv_entries_trailing_run(), None)
    assert tree_end == 3
    assert out.tolist() == [5, 3, 128, 1]


def test_tree2_trailing_run_absorbs_y_leftovers():
    # Y pass: eight literal-128 symbols leave cb = [128]*8 in the
    # shared buffer; UV cb is 3 long, so positions 3..7 (five 128s)
    # extend the UV trailing run: count 1 -> 6.
    tree1, y_cb = _serialize_tree1([(1 << 8) | 128] * 8)
    assert y_cb == [128] * 8
    out, tree_end = _serialize_tree2(_uv_entries_trailing_run(), y_cb)
    assert tree_end == 3
    assert out.tolist() == [5, 3, 128, 6]


def test_tree2_trailing_run_stops_at_non_marker():
    # A non-128 Y byte right past the UV length ends the chase at once.
    y_cb = [128, 128, 128, 7, 128, 128]
    out, _ = _serialize_tree2(_uv_entries_trailing_run(), y_cb)
    assert out.tolist() == [5, 3, 128, 1]


def test_tree2_no_trailing_run_ignores_leftovers():
    # cb = [3, 128, 1]? construct: literal 2 -> raw [3]; run 2 ->
    # raw [3, 128, 2]; cb = [3, 2] + [128] ... still trailing.  Use
    # two literals instead: cb ends in a literal, no chase happens.
    entries = [(1 << 8) | 4, (1 << 8) | 8]
    out_none, _ = _serialize_tree2(entries, None)
    out_left, _ = _serialize_tree2(entries, [128] * 16)
    assert out_none.tolist() == out_left.tolist()


def test_tree1_returns_interleaved_codebook():
    # Y: literal 7, run of 2 -> raw [7, 3, 2], cb = [7, 2] + [3].
    tree1, cb = _serialize_tree1([(1 << 8) | 7, (2 << 8)])
    assert cb == [7, 2, 3]
    assert isinstance(tree1, np.ndarray)
