"""Sweep the chunked-fixpoint K (chunk count) on the real chip to find
the latency-optimal configuration (VERDICT r4 item 1).  Methodology:
direct per-call timing minus measured round-trip (the fixpoint output
stays on device; only a scalar is fetched)."""

from __future__ import annotations

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

from nhwcodec_tpu.models import encoder as enc_mod  # noqa: E402
from nhwcodec_tpu.ops import entropy  # noqa: E402
from nhwcodec_tpu.ops import entropy_decode_device as edd  # noqa: E402
from nhwcodec_tpu.utils import container, fixtures  # noqa: E402
from nhwcodec_tpu import tables as T  # noqa: E402


def main() -> None:
    b = 32
    sa = container.parse_nhw(enc_mod.encode(fixtures.texture_noise(), 20))
    sb = container.parse_nhw(enc_mod.encode(fixtures.gradient_circles(),
                                            20))
    streams = ([sa] * (b // 2) + [sb] * (b // 2))[:b]
    p1 = 4 * T.IM_SIZE
    all_nbits = [s.packet1.size * 32 for s in streams]
    s_max = min(p1, max(64, max(all_nbits) // 2 + 2))
    s_max = 1 << (s_max - 1).bit_length()

    symB_full, countB = edd._chain_batch_scan(streams, s_max)
    books, sels1, sels2, run_refs = [], [], [], []
    for i, s in enumerate(streams):
        book = entropy.build_y_book(s.tree1)
        vd, _ = edd._book_device(book[0], book[1])
        run_refs.append(edd._run_count(symB_full[i], vd, countB[i]))
        books.append(book)
    cr = np.asarray(jnp.stack([countB, jnp.stack(run_refs)]))
    counts, runs = cr[0], cr[1]
    s_trim = min(edd._bucket(int(counts.max()) + 1), s_max)
    r_max = edd._bucket(int(max(runs.max(), 1)))

    def pad_rows(rows, fill=0):
        n = 1 << max(6, (max(len(r) for r in rows) - 1).bit_length())
        out = np.full((len(rows), n), fill, np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r
        return jnp.asarray(out)

    symB = jax.device_put(symB_full[:, :s_trim])
    vB = pad_rows([bk[0] for bk in books])
    rB = pad_rows([bk[1] for bk in books])
    print(f"s_trim={s_trim} r_max={r_max} "
          f"(runs max={int(runs.max())})")

    def t_min(fn, x, reps=3):
        np.asarray(fn(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope(mk, x, n1, n2):
        return (t_min(mk(n2), x) - t_min(mk(n1), x)) / (n2 - n1)

    for k in (16, 32, 64, 128, 256):
        if k > r_max:
            continue
        xs_t, lits = edd._runs_xs_batch(symB, vB, rB, p1, r_max, k)
        rest = tuple(xs_t[1:])

        def mk_fix(n, k=k, rest=rest):
            # chained: each iteration's input depends on the previous
            # result, so nothing overlaps or dedups over the tunnel
            @jax.jit
            def f(x0):
                def body(c, _):
                    ys, _it = edd._runs_fixpoint.__wrapped__(
                        (x0 + c,) + rest, p1, k)
                    return (ys[3][0, 0] & 1).astype(jnp.int32), None
                c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
                return c
            return f

        t0 = time.perf_counter()
        it = slope(mk_fix, xs_t[0], 1, 4)
        print(f"K={k:4d}: fixpoint {it*1000:7.1f} ms/iter "
              f"({it/b*1000:5.2f} ms/img)  [incl compile "
              f"{time.perf_counter()-t0:.0f}s]")


if __name__ == "__main__":
    main()
