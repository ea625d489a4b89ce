"""PGO training driver (run as a subprocess by native._load).

Loads the instrumented hotpass extension directly from the build dir,
injects it as THE native module, and runs a small representative
workload (encode+decode across the quality branches) so gcc's
-fprofile-use rebuild sees realistic branch/block counts for the
raster automata.  Must not import jax or touch any accelerator.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def main(so_path: str) -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import nhwcodec_tpu.native as native

    spec = importlib.util.spec_from_file_location(
        "nhwcodec_tpu.native._hotpass_pgogen", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # pre-seed the loaded lib so models/* never trigger a build
    native._lib = mod.lib
    native._ffi = mod.ffi

    from nhwcodec_tpu.models import decoder, encoder
    from nhwcodec_tpu.utils import fixtures

    imgs = [fixtures.gradient_circles(), fixtures.texture_noise(),
            fixtures.sharp_blocks(), fixtures.near_flat()]
    # one quality per distinct branch family: NORM fast path (20), the
    # HQ residue path (23), low-q prefilter ladders (9), the lowest
    # cleanup path (3), the LOW4 integer colorspace (16), LOW1 gain (19)
    for q in (20, 23, 9, 3, 16, 19):
        for im in imgs:
            decoder.decode(encoder.encode(im, q))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
