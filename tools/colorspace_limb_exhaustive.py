"""Exhaustive 2^24 proof of the u32-limb colorspace (both directions).

Sweeps every (r, g, b) through ops.colorspace_limb.yuv_norm_limb
against the proven q >= NORM replay (ops.colorspace_device._y_fast /
_chroma_fast), and every (y, u, v) through rgb_mode0_limb against the
proven mode-0 decode chain.  The numpy replay runs the same integer
ops as the jnp device program.  Exit 0 iff zero mismatches.

Last full run: see VALIDATION.md (colorspace section).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nhwcodec_tpu.ops import colorspace_device as csd  # noqa: E402
from nhwcodec_tpu.ops import colorspace_limb as cl     # noqa: E402


def main() -> int:
    bad_enc = bad_dec = 0
    t0 = time.time()
    for lo in range(0, 1 << 24, 1 << 22):
        idx = np.arange(lo, lo + (1 << 22), dtype=np.uint32)
        a = ((idx >> 16) & 255).astype(np.uint8)
        b = ((idx >> 8) & 255).astype(np.uint8)
        c = (idx & 255).astype(np.uint8)

        y0 = csd._y_fast(a.astype(np.uint64), b.astype(np.uint64),
                         c.astype(np.uint64), np)
        u0 = csd._chroma_fast(a, b, c, csd._MI_U, (-1, -1, 1), np)
        v0 = csd._chroma_fast(a, b, c, csd._MI_V, (1, -1, -1), np)
        y1, u1, v1 = cl.yuv_norm_limb(a, b, c, np)
        bad_enc += int((y0 != y1).sum() + (u0 != u1).sum()
                       + (v0 != v1).sum())

        y54 = a.astype(np.int64) << 54
        uf = b.astype(np.int64) - 128
        vf = c.astype(np.int64) - 128
        ir, ig, ib = csd._dec_inner54(y54, uf, vf, np)
        r0 = csd._half_trunc54(ir, np)
        g0 = csd._half_trunc54(ig, np)
        b0 = csd._half_trunc54(ib, np)
        r1, g1, b1 = cl.rgb_mode0_limb(a, b, c, np)
        bad_dec += int((r0 != r1).sum() + (g0 != g1).sum()
                       + (b0 != b1).sum())
    print(f"encode mismatches: {bad_enc}  decode mismatches: {bad_dec}"
          f"  ({time.time() - t0:.0f}s)", flush=True)
    return 1 if (bad_enc or bad_dec) else 0


if __name__ == "__main__":
    sys.exit(main())
