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

# the hybrid encode transform is bit-identical to the XLA composition
# (interpret mode routes the Pallas levels through the reference lowering)
import jax
from nhwcodec_tpu.models import transform as TR
rgb = rng.integers(0, 256, size=(2, 512, 512, 3)).astype(np.uint8)
def hybrid_interp(x):
    y, u, v = TR.rgb_to_yuv420_device(x)
    l1 = pallas_dwt.analysis_level_pallas(y.astype(jnp.int16), interpret=True)
    l2 = pallas_dwt.analysis_level_pallas(l1[..., :256, :256], interpret=True)
    yc = l1.at[..., :256, :256].set(l2)
    def uv_level(p):
        c1 = pallas_dwt.analysis_level_pallas(p.astype(jnp.int16),
                                              interpret=True)
        c2 = TR._analysis_level(c1[..., :128, :128])
        return c1.at[..., :128, :128].set(c2)
    return yc, uv_level(u), uv_level(v)
a = jax.tree_util.tree_map(np.asarray, hybrid_interp(jnp.asarray(rgb)))
b = jax.tree_util.tree_map(np.asarray, TR.encode_transform(jnp.asarray(rgb)))
for x, y2 in zip(a, b):
    np.testing.assert_array_equal(x, y2)

# the two-output (j, p) kernel feeding the exact encode front equals
# device_stages' slice-algebra stage (512 covered on-chip in
# tests/test_pallas_tpu.py; interpret mode is too slow there)
from nhwcodec_tpu.models import device_stages as ds
for n in (128, 256):
    blk = rng.integers(-1800, 1800, size=(1, n, n)).astype(np.int16)
    jw, pw = ds._stage_xla(jnp.asarray(blk))
    jg, pg = pallas_dwt.analysis_level_pallas_jp(jnp.asarray(blk),
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(jg), np.asarray(jw))
    np.testing.assert_array_equal(np.asarray(pg), np.asarray(pw))
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
