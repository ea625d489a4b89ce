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


@requires_tpu
def test_pallas_jp_stage_matches_xla_on_tpu():
    import jax.numpy as jnp

    from nhwcodec_tpu.models import device_stages as ds
    from nhwcodec_tpu.ops import pallas_dwt

    rng = np.random.default_rng(2)
    for n in (512, 256, 128):
        x = rng.integers(-1800, 1800, (2, n, n)).astype(np.int16)
        jw, pw = ds._stage_xla(jnp.asarray(x))
        jg, pg = pallas_dwt.analysis_level_pallas_jp(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(jg), np.asarray(jw))
        np.testing.assert_array_equal(np.asarray(pg), np.asarray(pw))


@requires_tpu
def test_fused_analysis_front_matches_xla_on_tpu():
    from nhwcodec_tpu.models import device_stages as ds

    rng = np.random.default_rng(3)
    y = rng.integers(-40, 296, (2, 512, 512)).astype(np.int16)
    u = rng.integers(0, 256, (2, 256, 256)).astype(np.uint8)
    v = rng.integers(0, 256, (2, 256, 256)).astype(np.uint8)
    for q in (20, 14):
        a = ds.analysis_front_device(y, u, v, q, fused=True)
        b = ds.analysis_front_device(y, u, v, q, fused=False)
        for ta, tb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(ta, tb)


@requires_tpu
def test_fused_x64_front_matches_xla_on_tpu():
    # the q>HIGH1 fused front traces under enable_x64 (softfloat lanes);
    # the Pallas stage must compile and agree there too (weak-typed i64
    # scalars are re-traced x32 inside _stage_pallas)
    from nhwcodec_tpu.models import device_stages as ds

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (2, 512, 512, 3), np.uint8)
    a = ds.encode_front_device(rgb, 23, fused=True)
    b = ds.encode_front_device(rgb, 23, fused=False)
    for ta, tb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(ta, tb)


@requires_tpu
def test_pallas_colorspace_matches_deployed_on_tpu():
    """The Mosaic limb-colorspace kernel == the deployed XLA limb path
    (both bit-exact vs the host oracle path at q >= NORM)."""
    import jax.numpy as jnp

    from nhwcodec_tpu.ops import colorspace_device as csd
    from nhwcodec_tpu.ops.pallas_colorspace import colorspace_down420_pallas

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (2, 512, 512, 3), dtype=np.uint8)
    rgb[0, :8, :8] = [255, 0, 0]
    a = csd.rgb_to_yuv420_device_exact(rgb, 20)
    b = colorspace_down420_pallas(jnp.asarray(rgb))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
