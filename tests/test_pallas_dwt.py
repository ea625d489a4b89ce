"""Fused Pallas synthesis kernel equals the XLA slice-algebra path.

Interpret mode on the CPU backend (subprocess) keeps CI fast; the kernel
is verified against the real TPU in bench/verify runs.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CODE = """
import numpy as np, jax.numpy as jnp
from nhwcodec_tpu.ops import pallas_dwt
from nhwcodec_tpu.models.transform import synth_level, _analysis_level
rng = np.random.default_rng(0)
for n in (256, 512):
    blk = rng.integers(-2000, 2000, size=(2, n, n)).astype(np.int16)
    want = np.asarray(synth_level(jnp.asarray(blk)))
    got = np.asarray(pallas_dwt.synth_level_pallas(jnp.asarray(blk),
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)
    blk = rng.integers(-32768, 32768, size=(2, n, n)).astype(np.int16)
    want = np.asarray(_analysis_level(jnp.asarray(blk)))
    got = np.asarray(pallas_dwt.analysis_level_pallas(jnp.asarray(blk),
                                                      interpret=True))
    np.testing.assert_array_equal(got, want)
print("OK")
"""


def test_pallas_synth_level_interpret():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", _CODE], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
