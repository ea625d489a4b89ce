"""Benchmark: batched NHW codec transform throughput on device.

Measures the device compute core (encode: RGB->YUV420 + 2-level integer
lifting analysis; decode: 2-level synthesis + upsample + YUV->RGB) over
batches of images and prints ONE JSON line with the encode-transform
throughput (the headline metric; decode is reported inside "extra").

Baseline: the reference single-core C encoder measured at 9.1 MP/s
end-to-end at q20 (BASELINE.md).

Every call gets a distinct device-resident input batch: the remote
execution path deduplicates repeated launches with identical buffers.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_calls(fn, inputs):
    # warm-up / compile on a throwaway batch
    out = fn(inputs[0])
    _block(out)
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    for o in outs:
        _block(o)
    return time.perf_counter() - t0, len(inputs) - 1


def _block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()


def main() -> None:
    import jax

    from nhwcodec_tpu.models.transform import (decode_transform_jit,
                                               encode_transform_jit)

    rng = np.random.default_rng(0)
    b, iters = 64, 9

    enc_in = [jax.device_put(rng.integers(0, 256, size=(b, 512, 512, 3),
                                          dtype=np.uint8))
              for _ in range(iters)]
    dt_enc, n_enc = _time_calls(encode_transform_jit, enc_in)
    del enc_in

    dec_in = [tuple(jax.device_put(
        rng.integers(-64, 64, size=s, dtype=np.int16))
        for s in ((b, 512, 512), (b, 256, 256), (b, 256, 256)))
        for _ in range(iters)]
    dt_dec, n_dec = _time_calls(lambda x: decode_transform_jit(*x), dec_in)

    mp = b * 512 * 512 / 1e6
    enc_mps = mp * n_enc / dt_enc
    dec_mps = mp * n_dec / dt_dec

    # full bit-exact host codec throughput (native scans + process pool)
    import os

    from nhwcodec_tpu.parallel import api
    from nhwcodec_tpu.utils import fixtures

    imgs = np.stack([fixtures.gradient_circles(), fixtures.texture_noise(),
                     fixtures.sharp_blocks(), fixtures.near_flat()] * 2)
    api.encode_batch(imgs[:2], 20, workers=2)  # warm the pool/import path
    streams, menc = api.encode_batch(imgs, 20,
                                     workers=os.cpu_count())
    good = [s for s in streams if s is not None]
    _, mdec = api.decode_batch(good, workers=os.cpu_count())

    baseline = 9.1  # reference C encode MP/s at q20 (BASELINE.md)
    print(json.dumps({
        "metric": "encode_transform_mp_s",
        "value": round(enc_mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(enc_mps / baseline, 2),
        "extra": {"decode_transform_mp_s": round(dec_mps, 2),
                  "full_encode_mp_s": round(menc.mp_per_s, 3),
                  "full_decode_mp_s": round(mdec.mp_per_s, 3),
                  "batch": b, "cores": os.cpu_count()},
    }))


if __name__ == "__main__":
    main()
