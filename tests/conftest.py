"""Test fixtures: golden-oracle binaries + synthetic corpora.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) configured in
``tests/parallel/conftest.py`` only, so TPU tests keep the real device.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def _ensure_live_backend() -> None:
    """A dead axon tunnel makes jax.devices() hang forever; probe it in
    a subprocess and fall back to the CPU backend so the suite still
    runs (the device tests are backend-portable)."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        return  # explicitly pinned off the tunnel (e.g. cpu) — trust it
    if not plat and not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    try:
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=120, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        # for child processes (pool workers, subprocess tests) ...
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        # ... and for THIS process, where the axon sitecustomize already
        # imported jax at startup (the env snapshot is stale)
        import jax

        jax.config.update("jax_platforms", "cpu")


_ensure_live_backend()


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for the suite: the device-path
    programs (chain extraction, chunked fixpoint, device decode) cost
    minutes to compile on XLA:CPU at real shapes; cached they replay in
    milliseconds on every later run."""
    # env form too, so subprocess-based tests inherit the cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(REPO / ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES",
                          "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "1")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_compile_cache()

import oracle  # noqa: E402
from nhwcodec_tpu.utils import bmp, fixtures  # noqa: E402

requires_oracle = pytest.mark.skipif(
    not oracle.available(), reason="reference sources not available"
)


@pytest.fixture(scope="session")
def oracle_bins():
    if not oracle.available():
        pytest.skip("reference sources not available")
    return oracle.build()


@pytest.fixture(scope="session")
def fixture_dir(oracle_bins) -> Path:
    """Build (and cache) the synthetic BMP corpus under .oracle/fixtures."""
    d = oracle.FIXTURES
    d.mkdir(parents=True, exist_ok=True)
    for name, gen in fixtures.GENERATORS.items():
        p = d / f"{name}.bmp"
        if not p.exists():
            bmp.write_bmp512(p, gen())
    return d


def golden(fixture_dir: Path, name: str, q: int) -> tuple[Path, Path]:
    """Return (nhw_path, decoded_bmp_path) for image `name` at quality q,
    encoding/decoding with the oracle on first use (cached on disk)."""
    src = fixture_dir / f"{name}.bmp"
    nhw = fixture_dir / f"{name}_q{q}.nhw"
    dec = fixture_dir / f"{name}_q{q}_dec.bmp"
    if not nhw.exists():
        oracle.encode(src, nhw, q)
    if not dec.exists():
        oracle.decode(nhw, dec)
    return nhw, dec


@pytest.fixture(scope="session")
def golden_q20(fixture_dir):
    return {name: golden(fixture_dir, name, 20) for name in fixtures.GENERATORS}


def load_bmp_bytes(path: Path) -> np.ndarray:
    return np.frombuffer(path.read_bytes(), dtype=np.uint8)
