"""Encoder bit-exactness vs the stage-dump instrumented oracle.

The byte-exactness contract: our .nhw equals the reference's output
except in the dead word-plane/select padding bits the reference fills
with uninitialized heap (utils.container.dead_tail_byte_positions).
Functional equality is absolute: the reference decoder produces identical
BMPs from both files.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from conftest import requires_oracle  # noqa: E402

import oracle  # noqa: E402
import oracle_dump  # noqa: E402

from nhwcodec_tpu.models import encoder  # noqa: E402
from nhwcodec_tpu.ops import analysis, colorspace  # noqa: E402
from nhwcodec_tpu.utils import bmp as bmp_io, container  # noqa: E402

NAMES = ("gradient", "texture", "blocks", "flat")


@pytest.fixture(scope="session")
def dumps_q20(fixture_dir):
    out = {}
    for name in NAMES:
        d = oracle.ORACLE_DIR / "dumps" / f"{name}_q20"
        nhw = oracle_dump.run(fixture_dir / f"{name}.bmp", 20, d)
        out[name] = (oracle_dump.load(d), nhw.read_bytes())
    return out


@requires_oracle
@pytest.mark.parametrize("name", NAMES)
def test_colorspace_bit_exact(dumps_q20, fixture_dir, name):
    dd, _ = dumps_q20[name]
    rgb = bmp_io.read_bmp512(fixture_dir / f"{name}.bmp")
    y, u, v = colorspace.downsample_yuv420(rgb, 20)
    np.testing.assert_array_equal(y, dd["d1_y"])
    np.testing.assert_array_equal(u, dd["d1_u"])
    np.testing.assert_array_equal(v, dd["d1_v"])


@requires_oracle
@pytest.mark.parametrize("name", NAMES)
def test_analysis_bit_exact(dumps_q20, name):
    dd, _ = dumps_q20[name]
    jpeg = dd["d2_jpeg"].copy()
    process = np.zeros((512, 512), np.int16)
    analysis.wavelet_analysis(jpeg, process, 512, 0, 0)
    np.testing.assert_array_equal(jpeg, dd["d3_jpeg"])
    np.testing.assert_array_equal(process, dd["d3_process"])
    analysis.wavelet_analysis(jpeg, process, 256, 1, 0)
    np.testing.assert_array_equal(jpeg, dd["d4_jpeg"])
    np.testing.assert_array_equal(process, dd["d4_process"])


@requires_oracle
@pytest.mark.parametrize("name", NAMES)
def test_encode_byte_exact_mod_dead_bits(dumps_q20, name):
    dd, ref = dumps_q20[name]
    mine = encoder.encode_from_planes(dd["d2_jpeg"], dd["d1_u"], dd["d1_v"],
                                      20)
    assert len(mine) == len(ref)
    assert container.equal_modulo_dead_bits(mine, ref)
    # the dead bytes really are few
    ndiff = sum(1 for x, y in zip(mine, ref) if x != y)
    assert ndiff <= 12


@requires_oracle
def test_encode_roundtrips_through_reference_decoder(dumps_q20, tmp_path):
    """our-encode -> reference-decode == reference roundtrip, and our own
    decoder agrees (SURVEY.md 7.2 milestone 3)."""
    import nhwcodec_tpu

    name = "gradient"
    dd, ref = dumps_q20[name]
    mine = encoder.encode_from_planes(dd["d2_jpeg"], dd["d1_u"], dd["d1_v"],
                                      20)
    p_mine = tmp_path / "mine.nhw"
    p_mine.write_bytes(mine)
    p_ref = tmp_path / "ref.nhw"
    p_ref.write_bytes(ref)
    oracle.decode(p_mine, tmp_path / "mine.bmp")
    oracle.decode(p_ref, tmp_path / "ref.bmp")
    assert (tmp_path / "mine.bmp").read_bytes() \
        == (tmp_path / "ref.bmp").read_bytes()
    own = nhwcodec_tpu.decode(mine)
    refpix = np.frombuffer((tmp_path / "ref.bmp").read_bytes()[54:],
                           np.uint8).reshape(512, 512, 3)
    np.testing.assert_array_equal(own, refpix)


@requires_oracle
@pytest.mark.parametrize("q", [1, 3, 5, 8, 11, 13, 16, 18, 20, 22, 23])
def test_encode_quality_sweep(fixture_dir, q):
    """Full pixels->.nhw encode is byte-exact (mod dead bits) vs the
    reference across the simple-prefilter qualities."""
    import nhwcodec_tpu
    from conftest import golden

    for name in ("gradient", "blocks"):
        nhw, _ = golden(fixture_dir, name, q)
        rgb = bmp_io.read_bmp512(fixture_dir / f"{name}.bmp")
        mine = nhwcodec_tpu.encode(rgb, q)
        assert container.equal_modulo_dead_bits(mine, nhw.read_bytes())


@requires_oracle
def test_pure_python_path_matches(fixture_dir):
    """The NHW_NATIVE=0 pure-Python path stays bit-identical (runs a
    subprocess so the env var applies before the native module loads)."""
    import os
    import subprocess

    code = (
        "import sys; sys.path.insert(0,'tools')\n"
        "import pathlib\n"
        "import nhwcodec_tpu\n"
        "from nhwcodec_tpu.utils import bmp, container\n"
        "from nhwcodec_tpu import native\n"
        "assert not native.available()\n"
        "rgb = bmp.read_bmp512('.oracle/fixtures/blocks.bmp')\n"
        "mine = nhwcodec_tpu.encode(rgb, 20)\n"
        "ref = pathlib.Path('.oracle/fixtures/blocks_q20.nhw')"
        ".read_bytes()\n"
        "assert container.equal_modulo_dead_bits(mine, ref)\n"
        "print('OK')\n")
    env = dict(os.environ, NHW_NATIVE="0")
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


@requires_oracle
@pytest.mark.parametrize("name,q", [("gradient", 18), ("texture", 18),
                                    ("texture", 19)])
def test_boundary_escape_dead_bytes(fixture_dir, name, q, tmp_path):
    """q>LOW5 escapes entering the DC automaton at j==16383 carry a
    literal whose decoded value is overwritten (nhw_decoder.c:1876-1880);
    the reference sources it from uninitialized heap.  The zero-filled
    deterministic oracle emits 128 there while we emit the live-heap
    alias value — equal_modulo_dead_bits masks exactly bit 0..6 of those
    positions (container.discarded_escape_positions)."""
    import nhwcodec_tpu

    src = fixture_dir / f"{name}.bmp"
    nhw = tmp_path / "det.nhw"
    oracle.encode_det(src, nhw, q)
    ref = nhw.read_bytes()
    rgb = bmp_io.read_bmp512(src)
    mine = nhwcodec_tpu.encode(rgb, q)
    assert container.equal_modulo_dead_bits(mine, ref)
    # the masked positions decode to identical pixels via the reference
    p_mine = tmp_path / "mine.nhw"
    p_mine.write_bytes(mine)
    oracle.decode(p_mine, tmp_path / "a.bmp")
    oracle.decode(nhw, tmp_path / "b.bmp")
    assert (tmp_path / "a.bmp").read_bytes() == (tmp_path / "b.bmp").read_bytes()


@requires_oracle
@pytest.mark.parametrize("q", [1, 4, 8, 12, 16, 17, 18, 20, 23])
def test_extreme_content_sweep(fixture_dir, q):
    """Adversarial content (checkerboard, full-range noise, saturated
    chroma, black/white, noisy waves) stays byte-exact vs the
    deterministic reference.  These inputs historically exposed the
    heap-slack alias classes (resIII kernel leftovers, the UV compare
    ladder's res256[16384] read, float32 colorspace rounding)."""
    import nhwcodec_tpu
    from nhwcodec_tpu.utils import fixtures

    for name, gen in fixtures.EXTREME_GENERATORS.items():
        img = gen()
        src = fixture_dir / f"x_{name}.bmp"
        if not src.exists():
            bmp_io.write_bmp512(src, img)
        nhw = fixture_dir / f"x_{name}_q{q}.nhw"
        if not nhw.exists():
            oracle.encode_det(src, nhw, q)
        mine = nhwcodec_tpu.encode(img, q)
        assert container.equal_modulo_dead_bits(mine, nhw.read_bytes()), \
            (name, q)
