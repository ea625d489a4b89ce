"""Batch codec API: ordering, failure isolation, resume."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from conftest import requires_oracle  # noqa: E402

from nhwcodec_tpu.parallel import api  # noqa: E402
from nhwcodec_tpu.utils import fixtures  # noqa: E402


def test_encode_decode_batch_roundtrip_ordered():
    imgs = np.stack([fixtures.gradient_circles(), fixtures.near_flat()])
    streams, m = api.encode_batch(imgs, 20, workers=2)
    assert m.failures == 0 and all(s is not None for s in streams)
    assert len(streams[0]) != len(streams[1])  # distinct images
    decoded, md = api.decode_batch(streams, workers=2)
    assert md.failures == 0
    # roundtrip sanity: PSNR above 30 dB for both
    for src, out in zip(imgs, decoded):
        err = (src.astype(np.float64) - out.astype(np.float64)) ** 2
        psnr = 10 * np.log10(255.0 ** 2 / err.mean())
        assert psnr > 30.0


def test_decode_batch_isolates_failures():
    good = api.encode_batch(
        np.stack([fixtures.near_flat()]), 20, workers=0)[0][0]
    streams = [good, b"\x99garbage", good]
    out, m = api.decode_batch(streams, workers=0)
    assert m.failures == 1
    assert out[0] is not None and out[1] is None and out[2] is not None


def test_corpus_resume(tmp_path):
    from nhwcodec_tpu.utils import bmp

    paths = []
    for name in ("a", "b"):
        p = tmp_path / f"{name}.bmp"
        bmp.write_bmp512(p, fixtures.near_flat())
        paths.append(str(p))
    out = tmp_path / "out"
    m1 = api.encode_corpus(paths, out, 20, workers=0)
    assert m1.images == 2
    # resume: nothing left to do
    m2 = api.encode_corpus(paths, out, 20, workers=0)
    assert m2.images == 0
    assert (out / "manifest.jsonl").exists()
    assert m1.as_json()
