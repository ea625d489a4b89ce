"""Benchmark: batched NHW decode transform throughput on device.

Measures the device compute core of decode (two-level integer lifting
synthesis + chroma upsample + YUV->RGB) over batches of images and prints
one JSON line.  Baseline: the reference single-core C decoder measured at
13.0 MP/s end-to-end (BASELINE.md).

Every call gets a distinct device-resident input batch: the remote
execution path deduplicates repeated launches with identical buffers, so
cycling one input undercounts real work.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from nhwcodec_tpu.models.transform import decode_transform_jit

    rng = np.random.default_rng(0)
    b, iters = 128, 8

    def batch():
        return tuple(
            jax.device_put(rng.integers(-64, 64, size=s, dtype=np.int16))
            for s in ((b, 512, 512), (b, 256, 256), (b, 256, 256))
        )

    ins = [batch() for _ in range(iters)]
    # compile + warm with a throwaway batch, then sync all transfers
    decode_transform_jit(*batch()).block_until_ready()
    for x in ins:
        for a in x:
            a.block_until_ready()

    t0 = time.perf_counter()
    outs = [decode_transform_jit(*x) for x in ins]
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0

    mps = b * 512 * 512 / 1e6 * iters / dt
    baseline = 13.0  # reference C decode MP/s (BASELINE.md)
    print(json.dumps({
        "metric": "decode_transform_mp_s",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
