"""Phase-level on-chip timing of decode_y_device_batch (VERDICT r2
item 4): chain extraction, host book prep, xs-prep, fixpoint, emit.

Each phase is timed with a scalar fetch to force remote completion
(block_until_ready returns early over the axon tunnel); the constant
~58 ms round-trip is reported alongside so readers can subtract it.
"""

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


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def t_min(fn, reps=3):
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    k_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sa = container.parse_nhw(enc_mod.encode(fixtures.texture_noise(), 20))
    sb = container.parse_nhw(enc_mod.encode(fixtures.gradient_circles(),
                                            20))
    streams = ([sa] * (b // 2) + [sb] * (b // 2))[:b]
    p1 = 4 * T.IM_SIZE

    # round-trip constant
    one = jax.device_put(np.ones((), np.float32))
    rt = t_min(lambda: one + 0)
    print(f"round-trip fetch: {rt*1000:.1f} ms")

    # end to end
    t0 = time.perf_counter()
    edd.decode_y_device_batch(streams, k_chunks=k_chunks)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = edd.decode_y_device_batch(streams, k_chunks=k_chunks)
        ts.append(time.perf_counter() - t0)
    print(f"end-to-end: {min(ts)*1000:.0f} ms/batch "
          f"({min(ts)/b*1000:.1f} ms/img; warm incl prior compile "
          f"{warm:.1f} s)")

    # ---- phases --------------------------------------------------
    all_nbits = [s.packet1.size * 32 for s in streams]
    s_max = min(p1, max(64, max(all_nbits) // 2 + 2))
    s_max = 1 << (s_max - 1).bit_length()
    print(f"s_max={s_max}")

    t = t_min(lambda: edd._chain_batch_scan(streams, s_max))
    print(f"chain extraction: {t*1000:.0f} ms/batch")

    symB_full, countB = edd._chain_batch_scan(streams, s_max)

    t0 = time.perf_counter()
    books, sels1, sels2, run_refs = [], [], [], []
    for i, s in enumerate(streams):
        book = entropy.build_y_book(s.tree1)
        vd, _ = edd._book_device(book[0], book[1])
        run_refs.append(edd._run_count(symB_full[i], vd, countB[i]))
        books.append(book)
        sels1.append(np.unpackbits(np.ascontiguousarray(
            s.select_word1, np.uint8)))
        sels2.append(np.unpackbits(np.ascontiguousarray(
            s.select_word2, np.uint8)))
    cr = np.asarray(jnp.stack([countB, jnp.stack(run_refs)]))
    counts, runs = cr[0], cr[1]
    host_t = time.perf_counter() - t0
    print(f"host books+run_count+sync: {host_t*1000:.0f} ms/batch")

    s_trim = int(min(max(64, counts.max() + 1), s_max))
    s_trim = 1 << (s_trim - 1).bit_length()
    r_max = 1 << max(4, int(max(runs.max(), 1) - 1).bit_length())
    print(f"s_trim={s_trim} r_max={r_max} runs={runs.max()} "
          f"counts={counts.max()}")

    def pad_rows(rows, fill=0):
        n = 1 << max(6, (max(len(r) for r in rows) - 1).bit_length())
        out = np.full((len(rows), n), fill, np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r
        return jnp.asarray(out)

    symB = symB_full[:, :s_trim]
    vB = pad_rows([bk[0] for bk in books])
    rB = pad_rows([bk[1] for bk in books])
    s1B = pad_rows(sels1)
    s2B = pad_rows(sels2)

    k = min(k_chunks, r_max)
    t = t_min(lambda: edd._runs_xs_batch(symB, vB, rB, p1, r_max, k))
    print(f"xs-prep: {t*1000:.0f} ms/batch")
    xs_t, lits = edd._runs_xs_batch(symB, vB, rB, p1, r_max, k)

    t = t_min(lambda: edd._runs_fixpoint(xs_t, p1, k))
    print(f"fixpoint: {t*1000:.0f} ms/batch  (L={r_max//k} steps/sweep)")
    ys, _it = edd._runs_fixpoint(xs_t, p1, k)

    t = t_min(lambda: edd._runs_emit_batch(ys, lits, s1B, s2B, p1, r_max))
    print(f"emit: {t*1000:.0f} ms/batch")

    # final host transfer of the (B, p1) int16 result
    out = edd._runs_emit_batch(ys, lits, s1B, s2B, p1, r_max)
    t0 = time.perf_counter()
    np.asarray(out)
    print(f"result download ({b}x{p1} i16): "
          f"{(time.perf_counter()-t0)*1000:.0f} ms/batch")


if __name__ == "__main__":
    main()
