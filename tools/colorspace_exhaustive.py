"""Exhaustive 2^24 RGB equality sweep: device colorspace vs host path.

Run on demand (~15 min): every RGB triple through every matrix mode of
ops.colorspace_device._yuv_full (the numpy replay of the device program;
the jax path runs the same integer ops) against ops.colorspace.rgb_to_yuv
(which is oracle-dump-verified).  Exit code 0 iff zero mismatches.

Last full run: see VALIDATION.md (colorspace section).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from nhwcodec_tpu import tables as T  # noqa: E402
from nhwcodec_tpu.ops import colorspace as cs  # noqa: E402
from nhwcodec_tpu.ops import colorspace_device as csd  # noqa: E402


def main() -> int:
    all_idx = np.arange(1 << 24, dtype=np.uint32)
    total_bad = 0
    for q, name in [(T.NORM, "NORM(q>=20)"), (T.LOW1, "LOW1(q19)"),
                    (T.LOW2, "LOW2(q18)"), (T.LOW3, "LOW3(q17)"),
                    (T.LOW4, "LOW4(q<=16,int)")]:
        bad = 0
        for lo in range(0, 1 << 24, 1 << 22):
            idx = all_idx[lo: lo + (1 << 22)]
            rgb = np.stack([(idx >> 16) & 255, (idx >> 8) & 255, idx & 255],
                           axis=-1).astype(np.uint8).reshape(-1, 1, 3)
            y0, u0, v0 = cs.rgb_to_yuv(rgb, q)
            y1, u1, v1 = csd._yuv_full(rgb, q, np)
            bad += int((y0 != y1).sum() + (u0 != u1).sum()
                       + (v0 != v1).sum())
        print(name, "mismatches:", bad, flush=True)
        total_bad += bad
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
