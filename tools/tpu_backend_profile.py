"""Chained-slope phase profile of the exact decode back end and the
requant feedback tail on the real chip (PERFORMANCE.md methodology: N
data-dependent iterations in one jit, slope = true per-iteration device
time; distinct per-iteration state defeats the tunnel's launch dedup).

Phases measured (batch 64, matching the bench rows):
  decode back:  y_stage1 (L2 Pallas synth + scatter), y_stage2 split
                into L1 row synth / hq scatter+transposes / mark scan /
                final row synth+clip, uv_synth x2
  requant tail: the fused requant_tail_device as one unit plus its
                published internal scopes when cheap to isolate
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from nhwcodec_tpu.models import device_decode as dd  # noqa: E402
from nhwcodec_tpu.models import device_requant as drq  # noqa: E402
from nhwcodec_tpu.ops.lifting import synth_norm, synth_unnorm  # noqa: E402

B = 64
N = 512
D = 256
MP = B * 0.262144


def slope_ms(body, x, n1=4, n2=100, reps=9):
    """body: jittable (B,512,512) int16 -> same shape (data-dependent).
    Per-iteration device ms via interleaved A/B chain-length slopes
    (host wall noise is +-40%: only paired differences are usable)."""

    def mk(n):
        @jax.jit
        def f(inp):
            def step(c, _):
                return body(c), None

            out, _ = jax.lax.scan(step, inp, None, length=n)
            # scalar result: the download would otherwise be 33 MB over
            # the tunnel and its +-40% variance swamps the slope
            return out.astype(jnp.int32).sum()

        return f

    fa, fb = mk(n1), mk(n2)
    np.asarray(fa(x)); np.asarray(fb(x))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(fa(x))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(fb(x))
        tb = time.perf_counter() - t0
        diffs.append(tb - ta)
    return float(np.median(diffs)) / (n2 - n1) * 1000


def main() -> None:
    rng = np.random.default_rng(5)
    yc = jnp.asarray(rng.integers(-64, 64, (B, N, N)).astype(np.int16))
    idx = jnp.zeros((B, 8), jnp.int32)
    dl = jnp.zeros((B, 8), jnp.int16)
    recs = jnp.full((B, 8), 257, jnp.int32)
    val = jnp.zeros((B, 8), bool)
    fused = jax.default_backend() != "cpu"
    print("backend:", jax.default_backend(), "fused:", fused, flush=True)

    def perturb(x, out):
        # fold the result back so every chain step has distinct input
        return (x + out.astype(jnp.int16)[..., :1, :1]).astype(jnp.int16)

    rows = {}

    def ph_stage1(x):
        p = dd.y_stage1_device(x, idx, dl, fused=fused)
        return perturb(x, p)

    rows["y_stage1 (L2 synth+scatter)"] = slope_ms(ph_stage1, yc)

    def ph_stage2(x):
        p = (x[:, :D, :D] >> 1).astype(jnp.int16)
        y = dd.y_stage2_device(x, p, idx, dl, recs, val, fused=fused)
        return perturb(x, y)

    rows["y_stage2 (L1 rows+scan+final)"] = slope_ms(ph_stage2, yc)

    # the deployed dense mark-wave form under a heavy (8k-mark) load
    _marks = [[(r << 8) | c for r in range(1, 255)
               for c in range(1 + (i & 1), 255, 8)] for i in range(B)]
    dpl, n_waves, _ok = dd.mark_depth_planes(_marks)
    dpl = jnp.asarray(dpl)

    def ph_stage2_dense(x):
        p = (x[:, :D, :D] >> 1).astype(jnp.int16)
        # hq=None: the deployed one-program no-HQ configuration
        y = dd.y_stage2_dense_device(x, p, None, None, dpl, n_waves,
                                     fused=fused)
        return perturb(x, y)

    rows["y_stage2 dense waves (8k marks)"] = slope_ms(ph_stage2_dense,
                                                       yc)

    def ph_l1row(x):
        t = synth_unnorm(x[..., :D], x[..., D:], xp=jnp).astype(jnp.int16)
        return perturb(x, t)

    rows["  synth_unnorm row pass (XLA)"] = slope_ms(ph_l1row, yc)

    def ph_final(x):
        y = synth_norm(x[..., :D], x[..., D:], xp=jnp)
        return perturb(x, jnp.clip(y, 0, 255).astype(jnp.uint8))

    rows["  synth_norm row pass+clip (XLA)"] = slope_ms(ph_final, yc)

    def ph_transposes(x):
        t = jnp.swapaxes(x, -2, -1)
        f = t.reshape(B, -1).at[jnp.arange(B)[:, None], idx].add(dl)
        return perturb(x, jnp.swapaxes(f.reshape(B, N, N), -2, -1))

    rows["  transposes+hq scatter"] = slope_ms(ph_transposes, yc)

    def ph_scan(x):
        def smooth_one(plane, rr, vv):
            def bd(p, rv):
                rec, v = rv
                scan = ((rec >> 8) << 10) + (rec & 255)
                c = p[scan].astype(jnp.int32)
                new = ((c << 2) + 4) >> 3
                p = p.at[scan].set(jnp.where(v, new.astype(jnp.int16),
                                             p[scan]))
                return p, None

            plane, _ = jax.lax.scan(bd, plane, (rr, vv))
            return plane

        f = jax.vmap(smooth_one)(x.reshape(B, -1), recs, val)
        return perturb(x, f.reshape(B, N, N))

    rows["  mark scan (8 pad recs)"] = slope_ms(ph_scan, yc)

    uc = jnp.asarray(rng.integers(-64, 64, (B, D, D)).astype(np.int16))

    def ph_uv(x):
        p = dd.uv_synth_device(x, fused=fused)
        return (x + p.astype(jnp.int16)[..., :1, :1]).astype(jnp.int16)

    rows["uv_synth (one plane)"] = slope_ms(ph_uv, uc)

    def ph_requant(x):
        proc = (x >> 1).astype(jnp.int16)
        r = (x[:, :D, :D] >> 3).astype(jnp.int16)
        j2, p2, rc = drq.requant_tail_device(x, proc, r, fused=fused)
        return perturb(x, j2)

    rows["requant_tail (full)"] = slope_ms(ph_requant, yc)

    tot_dec = (rows["y_stage1 (L2 synth+scatter)"]
               + rows["y_stage2 dense waves (8k marks)"]
               + 2 * rows["uv_synth (one plane)"])
    for k, v in rows.items():
        print(f"{k:38s} {v:8.3f} ms/batch  "
              f"{MP / (v / 1000):9.0f} MP/s", flush=True)
    print(f"decode back sum: {tot_dec:.3f} ms/batch "
          f"= {MP / (tot_dec / 1000):.0f} MP/s")


if __name__ == "__main__":
    main()
