"""Deterministic synthetic 512x512 test images.

Each generator is seeded and pure-NumPy so the exact same pixel data can be
reproduced anywhere; the test-suite encodes these with the reference C
encoder (the golden oracle) and uses the resulting .nhw files/decodes as
bit-exactness fixtures.
"""

from __future__ import annotations

import numpy as np

N = 512


def _grid() -> tuple[np.ndarray, np.ndarray]:
    y, x = np.mgrid[0:N, 0:N].astype(np.float64)
    return y, x


def gradient_circles() -> np.ndarray:
    """Smooth gradients with soft circles — natural-ish content."""
    y, x = _grid()
    r = (x / 2 + y / 4) % 256
    g = 128 + 90 * np.sin(x / 37.0) * np.cos(y / 53.0)
    cy, cx = 180.0, 300.0
    d = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    b = 255 * np.exp(-d / 150.0)
    img = np.stack([r, g, b], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def texture_noise(seed: int = 7) -> np.ndarray:
    """Band-limited texture plus moderate noise — stresses the entropy coder."""
    rng = np.random.default_rng(seed)
    y, x = _grid()
    base = (
        110
        + 60 * np.sin(x / 11.0 + np.sin(y / 23.0) * 2.0)
        + 40 * np.cos(y / 7.0)
    )
    noise = rng.normal(0, 18, size=(N, N, 3))
    img = base[..., None] + noise
    img[..., 1] += 25 * np.sin(x / 91.0)[..., None][..., 0]
    img[..., 2] -= 25 * np.cos(y / 71.0)
    return np.clip(img, 0, 255).astype(np.uint8)


def sharp_blocks(seed: int = 3) -> np.ndarray:
    """Hard edges, flat blocks, thin lines — stresses pre/post filters."""
    rng = np.random.default_rng(seed)
    img = np.zeros((N, N, 3), dtype=np.float64)
    img[:] = 200
    for _ in range(60):
        y0, x0 = rng.integers(0, N - 64, 2)
        h, w = rng.integers(16, 128, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.integers(0, 256, 3)
    for _ in range(40):
        y0 = int(rng.integers(0, N))
        img[y0, :, :] = rng.integers(0, 256)
    for _ in range(40):
        x0 = int(rng.integers(0, N))
        img[:, x0, :] = rng.integers(0, 256)
    return np.clip(img, 0, 255).astype(np.uint8)


def near_flat(seed: int = 11) -> np.ndarray:
    """Nearly flat with faint noise — stresses run-length paths."""
    rng = np.random.default_rng(seed)
    img = np.full((N, N, 3), 117.0)
    img += rng.normal(0, 1.2, size=(N, N, 3))
    img[100:140, :, 0] += 3
    img[:, 300:310, 2] -= 4
    return np.clip(img, 0, 255).astype(np.uint8)


GENERATORS = {
    "gradient": gradient_circles,
    "texture": texture_noise,
    "blocks": sharp_blocks,
    "flat": near_flat,
}


def checkerboard(cell: int = 1) -> np.ndarray:
    """Worst-case alternating pattern (maximum high-band energy)."""
    x, y = _grid()
    p = ((x // cell + y // cell) % 2 * 255).astype(np.uint8)
    return np.ascontiguousarray(np.repeat(p[..., None], 3, axis=-1))


def max_noise(seed: int = 99) -> np.ndarray:
    """Full-range uniform noise on every channel."""
    rng = np.random.default_rng(seed)
    return np.ascontiguousarray(
        rng.integers(0, 256, (512, 512, 3), dtype=np.uint8))


def saturated_ramp() -> np.ndarray:
    """Channel-saturating chroma extreme with a horizontal ramp."""
    x, _ = _grid()
    return np.ascontiguousarray(np.stack(
        [np.full((512, 512), 255, np.uint8),
         np.zeros((512, 512), np.uint8),
         ((x * 255) // 511).astype(np.uint8)], -1))


def photo_waves(seed: int = 99) -> np.ndarray:
    """Photo-like smooth waves + sensor noise."""
    rng = np.random.default_rng(seed)
    x, y = _grid()
    p = np.clip(128 + 80 * np.sin(x / 17.0) * np.cos(y / 23.0)
                + rng.normal(0, 12, (512, 512)), 0, 255)
    return np.ascontiguousarray(
        np.repeat(p[..., None], 3, axis=-1).astype(np.uint8))


def boundary_noise(seed: int = 314159) -> np.ndarray:
    """Flat field with noise in the last rows/columns: stresses the
    plane-boundary code paths (row-final sentinel placements drive the
    reference's count-register drift, last-row band cleanups)."""
    rng = np.random.default_rng(seed)
    img = np.full((512, 512, 3), 128, np.uint8)
    img[-8:] = rng.integers(0, 256, (8, 512, 3))
    img[:, -8:] = rng.integers(0, 256, (512, 8, 3))
    return img


EXTREME_GENERATORS = {
    "checker": checkerboard,
    "maxnoise": max_noise,
    "allblack": lambda: np.zeros((512, 512, 3), np.uint8),
    "allwhite": lambda: np.full((512, 512, 3), 255, np.uint8),
    "saturated": saturated_ramp,
    "photo2": photo_waves,
    "boundary": boundary_noise,
}


def all_images() -> dict[str, np.ndarray]:
    return {name: gen() for name, gen in GENERATORS.items()}
