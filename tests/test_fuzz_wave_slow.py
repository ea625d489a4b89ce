"""Slow CI lane: a committed all-quality encoder-equality wave.

Runs the committed wave runner (tools/fuzz_wave.py) with a fixed seed
against the deterministic reference build across ALL 23 qualities —
the repo-committed evidence that byte-exactness holds for every
quality, not just the fast-lane subsets (VALIDATION.md "Corpora").

Run with:  python -m pytest tests/test_fuzz_wave_slow.py -m slow
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools"))

from conftest import requires_oracle  # noqa: E402


@requires_oracle
@pytest.mark.slow
def test_committed_wave_all_qualities():
    from fuzz_wave import run_wave

    out = pathlib.Path(tempfile.mkdtemp(prefix="fuzz_wave_ci_"))
    tested, fails, residual = run_wave(
        seed=101, n_images=4, out_dir=out, qualities=list(range(1, 24)))
    assert tested >= 80, tested
    assert fails == [], fails
    # the allocator slack-placement class is the only accepted residual
    assert len(residual) <= 2, residual
