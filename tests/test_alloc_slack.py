"""The reference's res256 slack-placement residual class, pinned.

The reference's UV compare ladder reads one int16 past its res256
chunk (encoder/image_processing.c:3192-3353).  Layout-preserving
malloc traces of the plain deterministic build (VALIDATION.md
"allocator placement: traced root cause") show the slack aliases the
freed downsampled-U byte plane at offset 32768 — unless a 4096-byte
allocation immediately before the chunk splits the freed U-plane slot
(instead of landing on coalesced stream-buffer remnants), which
shifts the chunk one malloc slot and moves the alias to offset 36864.
Which way glibc goes depends on tcache/coalescing over content-sized
stream buffers, i.e. on a full allocator model.

This test pins the class exactly with the committed corpus cases:

- the emulation uses the dominant placement (offset 32768), which is
  byte-exact on 3207/3213 fuzzed combos;
- every v_off-sensitive residual closes with the single alternate
  placement (offset 36864) — proving the mechanism;
- the two remaining residuals (y9 q19, u6 q22 — different
  uninitialized reads on the UV-LL2/highres tail path) diverge only
  in bounded tail regions and still decode to self-consistent streams.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from nhwcodec_tpu.models import decoder, encoder
from nhwcodec_tpu.utils.container import equal_modulo_dead_bits

DATA = Path(__file__).resolve().parent / "data"


@pytest.fixture(scope="module")
def cases():
    imgs = dict(np.load(DATA / "alloc_slack_cases.npz"))
    refs = dict(np.load(DATA / "alloc_slack_refs.npz"))
    return imgs, {k: v.tobytes() for k, v in refs.items()}


@pytest.mark.parametrize("stem,q", [("o8", 19), ("p5", 19), ("p5", 20),
                                    ("p5", 23)])
def test_alternate_placement_closes_v_off_cases(cases, stem, q):
    imgs, refs = cases
    ref = refs[f"{stem}_q{q}"]
    assert not equal_modulo_dead_bits(encoder.encode(imgs[stem], q), ref)
    try:
        encoder._V_OFF_OVERRIDE = 36864
        assert equal_modulo_dead_bits(encoder.encode(imgs[stem], q), ref)
    finally:
        encoder._V_OFF_OVERRIDE = None


@pytest.mark.parametrize("stem,q,max_ndiff", [("y9", 19, 64),
                                              ("u6", 22, 1024)])
def test_remaining_residuals_bounded_and_decodable(cases, stem, q,
                                                   max_ndiff):
    imgs, refs = cases
    ref = refs[f"{stem}_q{q}"]
    mine = encoder.encode(imgs[stem], q)
    assert len(mine) == len(ref)
    a = np.frombuffer(mine, np.uint8)
    b = np.frombuffer(ref, np.uint8)
    assert 0 < int((a != b).sum()) <= max_ndiff
    # the stream stays self-consistent: it decodes to a full image
    assert decoder.decode(mine).shape == (512, 512, 3)


@pytest.mark.parametrize("q", [22, 23])
def test_first_order_plane_placement_closes_w26_cases(cases, q):
    """Third observed placement (wave 26): at q>HIGH1 the V chunk can
    land so its one-past read hits first-order-plane content (small
    positive shorts; the instrumented zmalloc builds dump the read
    region as such).  The ladder decision at the boundary depends only
    on the slack short's rule class, so the canonical positive probe
    closes the case byte-exactly."""
    imgs, refs = cases
    ref = refs[f"w26_7_q{q}"]
    assert not equal_modulo_dead_bits(encoder.encode(imgs["w26_7"], q),
                                      ref)
    try:
        encoder._V_TAIL_OVERRIDE = np.array([129, 0, 0, 0], np.int16)
        assert equal_modulo_dead_bits(encoder.encode(imgs["w26_7"], q),
                                      ref)
    finally:
        encoder._V_TAIL_OVERRIDE = None


def test_fourth_placement_closes_wave49_case(cases):
    """Fourth observed placement (wave 49): the V chunk's one-past read
    aliases the freed U byte plane at offset 37152 — a different split
    of the freed slot than the 32768/36864 seats.  The dV_res256oob
    dump of the instrumented build shows the read region as U-plane
    texture bytes; seating the emulated slack there reproduces the
    plain deterministic reference byte-for-byte at q21/q22/q23 (the
    classifier's windowed probe covers the whole traced window)."""
    imgs, refs = cases
    ref = refs["w49i6_q22"]
    assert not equal_modulo_dead_bits(encoder.encode(imgs["w49i6"], 22),
                                      ref)
    try:
        encoder._V_OFF_OVERRIDE = 37152
        assert equal_modulo_dead_bits(encoder.encode(imgs["w49i6"], 22),
                                      ref)
    finally:
        encoder._V_OFF_OVERRIDE = None
