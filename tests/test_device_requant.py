"""models.device_requant: the fused device requant tail equals the host
sequence wavelet_synthesis -> unmark_res256 -> requant_scan_ladder ->
wavelet_analysis on real encode states and adversarial planes."""

import numpy as np
import pytest

from nhwcodec_tpu import tables as T
from nhwcodec_tpu.ops import analysis, colorspace, prefilter, requant
from nhwcodec_tpu.utils import fixtures


def _host_block_inputs(img, q):
    """Run the host pipeline up to the point requant_tail_device takes
    over (post mark + offset part=1) and return copies of the state."""
    y, _, _ = colorspace.downsample_yuv420(img, q)
    if q < T.HIGH2:
        y = prefilter.pre_process_y(y, q)
    jpeg = y.astype(np.int16).copy()
    process = np.zeros((512, 512), np.int16)
    analysis.wavelet_analysis(jpeg, process, 512, 0, 0)
    res256 = jpeg[:256, :256].copy()
    analysis.wavelet_analysis(jpeg, process, 256, 1, 0)
    requant.mark_res256(process, res256)
    requant.offset_y_recons256(jpeg, process, q, 8, part=1)
    return jpeg, process, res256


def _host_tail(jpeg, process, res256):
    analysis.wavelet_synthesis(jpeg, process, 256, 0)
    requant.unmark_res256(process, res256)
    requant.requant_scan_ladder(jpeg, process, res256)
    analysis.wavelet_analysis(jpeg, process, 256, 1, 0)
    return jpeg, process, res256


@pytest.mark.parametrize("q", [20, 23, 16, 9])
def test_requant_tail_matches_host_on_real_states(q):
    from nhwcodec_tpu.models import device_requant as dr

    states = [_host_block_inputs(fixtures.GENERATORS[n](), q)
              for n in ("gradient", "texture")]
    dj, dp, dr256 = (np.asarray(a) for a in dr.requant_tail_device(
        np.stack([s[0] for s in states]),
        np.stack([s[1] for s in states]),
        np.stack([s[2] for s in states])))
    for i, (j, p, r) in enumerate(states):
        hj, hp, hr = _host_tail(j.copy(), p.copy(), r.copy())
        np.testing.assert_array_equal(dr256[i], hr)
        np.testing.assert_array_equal(dp[i], hp)
        np.testing.assert_array_equal(dj[i], hj)


def test_requant_ladder_adversarial_chains():
    """Dense small-delta planes force long left-dependency chains in the
    ladder; the Jacobi fixpoint must still equal the sequential pass."""
    from nhwcodec_tpu.models import device_requant as dr

    rng = np.random.default_rng(7)
    b = 3
    jpeg = rng.integers(-40, 40, (b, 512, 512)).astype(np.int16)
    process = rng.integers(-9, 9, (b, 512, 512)).astype(np.int16)
    res256 = rng.integers(-6, 6, (b, 256, 256)).astype(np.int16)
    # sprinkle sentinels so unmark has work to do
    mask = rng.random((b, 256, 256)) < 0.01
    res256 = np.where(mask, res256 + 16000, res256).astype(np.int16)
    mask2 = rng.random((b, 256, 256)) < 0.01
    res256 = np.where(~mask & mask2, res256 + 12000, res256).astype(np.int16)

    dj, dp, dr256 = (np.asarray(a) for a in dr.requant_tail_device(
        jpeg, process, res256))
    for i in range(b):
        hj, hp, hr = _host_tail(jpeg[i].copy(), process[i].copy(),
                                res256[i].copy())
        np.testing.assert_array_equal(dr256[i], hr)
        np.testing.assert_array_equal(dp[i], hp)
        np.testing.assert_array_equal(dj[i], hj)
