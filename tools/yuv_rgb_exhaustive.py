"""Exhaustive decode-colorspace proof: for every quality, sweep ALL
2^24 (y, u, v) triples and compare the fixed-point replay
(ops.colorspace_device.yuv_to_rgb_host_exact — the same code the device
runs) against the deployed host path (models.decoder.yuv_to_rgb, the
golden-BMP-verified native C).

Usage: python tools/yuv_rgb_exhaustive.py [q ...]   (default: 1..23)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from nhwcodec_tpu.models.decoder import yuv_to_rgb          # noqa: E402
from nhwcodec_tpu.ops import colorspace_device as csd       # noqa: E402


def sweep(q: int) -> int:
    """Returns the number of mismatching triples (0 = proven)."""
    yy, uu = np.meshgrid(np.arange(256, dtype=np.uint8),
                         np.arange(256, dtype=np.uint8), indexing="ij")
    y = np.tile(yy, (2, 2))          # (512,512): all (y,u) per quadrant
    u = np.tile(uu, (2, 2))
    bad = 0
    for v0 in range(0, 256, 4):
        # four v slices -> one (512,512) native-shaped tile
        v = np.empty((512, 512), np.uint8)
        v[:256, :256] = v0
        v[:256, 256:] = v0 + 1
        v[256:, :256] = v0 + 2
        v[256:, 256:] = v0 + 3
        want = yuv_to_rgb(y, u, v, q)
        got = csd.yuv_to_rgb_host_exact(y, u, v, q)
        bad += int((want != got).any(axis=-1).sum())
    return bad


def main() -> None:
    qs = [int(a) for a in sys.argv[1:]] or list(range(1, 24))
    total = 0
    for q in qs:
        b = sweep(q)
        total += b
        print(f"q={q}: {'OK' if b == 0 else f'{b} MISMATCHES'}", flush=True)
    print("TOTAL mismatches:", total)


if __name__ == "__main__":
    main()
