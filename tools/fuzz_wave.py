"""Encoder-equality fuzz wave runner (the committed form of the wave
scripts used throughout rounds 1-2; VALIDATION.md "Corpora").

Generates a seeded wave of structured images, encodes each with the
deterministic reference build (zero-filled heap, tools/oracle.py
encode_det) across a quality set, and compares our encoder's output
under the dead-bits contract.  Known-residual combos (the allocator
slack-placement class) are reported separately.

Usage:
  python tools/fuzz_wave.py <seed> [n_images] [out_dir]
      [--qualities 1,8,16,...]

Exit code 0 iff every non-residual combo is byte-exact.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def _blur(img: np.ndarray, k: int) -> np.ndarray:
    out = img.astype(np.float32)
    for axis in (0, 1):
        acc = np.zeros_like(out)
        for d in range(-k, k + 1):
            acc += np.roll(out, d, axis=axis)
        out = acc / (2 * k + 1)
    return out


def make_image(rng: np.random.Generator) -> np.ndarray:
    """One structured fuzz image: a random mix of the content families
    the historical waves covered (noise, blocks, stripes, gradients,
    octave noise, chroma extremes, dither stress, photo-like blur)."""
    kind = rng.integers(0, 8)
    if kind == 0:  # scaled uniform noise
        amp = int(rng.integers(8, 256))
        img = rng.integers(0, amp, (512, 512, 3))
    elif kind == 1:  # random blocks
        bs = int(rng.choice([4, 8, 16, 32, 64]))
        base = rng.integers(0, 256, (512 // bs, 512 // bs, 3))
        img = np.kron(base, np.ones((bs, bs, 1), np.int64))
    elif kind == 2:  # stripes
        period = int(rng.integers(2, 33))
        phase = np.arange(512) % period < period // 2
        a, b = rng.integers(0, 256, (2, 3))
        mask = (phase[:, None, None] if rng.integers(2)
                else phase[None, :, None])
        img = np.where(np.broadcast_to(mask, (512, 512, 1)), a, b)
    elif kind == 3:  # smooth gradient + noise
        gx, gy = np.meshgrid(np.linspace(0, 255, 512),
                             np.linspace(0, 255, 512))
        img = np.stack([gx, gy, (gx + gy) / 2], -1)
        img = img + rng.normal(0, rng.integers(1, 30), img.shape)
    elif kind == 4:  # octave noise
        img = np.zeros((512, 512, 3))
        for oct_ in (8, 32, 128, 512):
            coarse = rng.normal(0, 1, (oct_, oct_, 3))
            img += np.kron(coarse, np.ones((512 // oct_, 512 // oct_, 1))
                           ) * (oct_ ** 0.5)
        img = 128 + 40 * img / np.abs(img).max()
    elif kind == 5:  # chroma extremes
        img = np.zeros((512, 512, 3))
        img[..., rng.integers(0, 3)] = rng.integers(200, 256)
        img += rng.integers(0, 40, img.shape)
    elif kind == 6:  # dither/threshold stress
        t = rng.uniform(0.3, 0.7)
        img = (rng.random((512, 512, 1)) < t) * rng.integers(180, 256)
        img = np.repeat(img, 3, axis=2) + rng.integers(0, 16, (512, 512, 3))
    else:  # photo-like: blurred noise
        img = _blur(rng.integers(0, 256, (512, 512, 3)),
                    int(rng.integers(2, 8)))
    return np.clip(img, 0, 255).astype(np.uint8)


def run_wave(seed: int, n_images: int, out_dir: pathlib.Path,
             qualities: list[int]) -> tuple[int, list, list]:
    import oracle

    from nhwcodec_tpu.models import encoder
    from nhwcodec_tpu.utils import bmp
    from nhwcodec_tpu.utils.container import equal_modulo_dead_bits

    rng = np.random.default_rng(seed)
    out_dir.mkdir(parents=True, exist_ok=True)
    fails, residual = [], []
    tested = 0
    for i in range(n_images):
        img = make_image(rng)
        bpath = out_dir / f"w{seed}_{i}.bmp"
        bmp.write_bmp512(bpath, img)
        for q in qualities:
            npath = out_dir / f"w{seed}_{i}_q{q}.nhw"
            try:
                oracle.encode_det(bpath, npath, q)
            except Exception:
                continue  # reference aborts on some content/q (its own
                # heap corruption, VALIDATION.md) — skip those combos
            tested += 1
            if not equal_modulo_dead_bits(encoder.encode(img, q),
                                          npath.read_bytes()):
                # re-check under the alternate slack placements: if any
                # closes the WHOLE file, this is the documented residual
                # class (VALIDATION.md "allocator placement")
                alt = False
                ref = npath.read_bytes()
                try:
                    encoder._V_OFF_OVERRIDE = 36864
                    alt = equal_modulo_dead_bits(encoder.encode(img, q),
                                                 ref)
                    if not alt:
                        encoder._V_OFF_OVERRIDE = None
                        # third placement: the one-past read lands in
                        # first-order-plane content (small positive)
                        encoder._V_TAIL_OVERRIDE = np.array(
                            [129, 0, 0, 0], np.int16)
                        alt = equal_modulo_dead_bits(
                            encoder.encode(img, q), ref)
                    if not alt and q > 21:
                        # third placement, derived tail: the V-chunk
                        # one-past reads alias the live q>HIGH1
                        # first-order plane at a layout-fixed interior
                        # offset (wave 55 traced wfo[32160] via the
                        # dHQ_wfo dump); probe our own wfo there
                        encoder._V_OFF_OVERRIDE = None
                        encoder._CAPTURE_WFO = True
                        try:
                            encoder.encode(img, q)
                            wfo = encoder._LAST_WFO
                        finally:
                            encoder._CAPTURE_WFO = False
                        if wfo is not None:
                            for off in (32160, 32152, 32168):
                                encoder._V_TAIL_OVERRIDE = np.asarray(
                                    wfo, np.int16)[off: off + 4]
                                if equal_modulo_dead_bits(
                                        encoder.encode(img, q), ref):
                                    alt = True
                                    break
                    if not alt:
                        # windowed placement probe: the slack aliases
                        # the freed U byte plane at a 16-aligned offset
                        # in the traced window (placements 32768, 36864
                        # and wave-49's 37152 all sit here); accept only
                        # if some seat reproduces the file byte-for-byte
                        encoder._V_TAIL_OVERRIDE = None
                        for off in range(32768, 40960, 16):
                            encoder._V_OFF_OVERRIDE = off
                            if equal_modulo_dead_bits(
                                    encoder.encode(img, q), ref):
                                alt = True
                                break
                finally:
                    encoder._V_OFF_OVERRIDE = None
                    encoder._V_TAIL_OVERRIDE = None
                (residual if alt else fails).append((seed, i, q))
    return tested, fails, residual


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    out = pathlib.Path(sys.argv[3]) if len(sys.argv) > 3 else \
        pathlib.Path(tempfile.mkdtemp(prefix=f"fuzz_wave{seed}_"))
    qs = list(range(1, 24))
    for a in sys.argv[4:]:
        if a.startswith("--qualities"):
            qs = [int(x) for x in a.split("=", 1)[1].split(",")]
    tested, fails, residual = run_wave(seed, n, out, qs)
    print(f"wave {seed}: {tested} combos, {len(fails)} unexpected fails,"
          f" {len(residual)} slack-class residuals ({out})")
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
