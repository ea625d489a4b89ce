"""Chained-slope device timings for the three decode_y phases + chain
extraction (PERFORMANCE.md methodology: N data-dependent iterations in
one jit, slope = true per-iteration device time)."""

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
from nhwcodec_tpu.ops import entropy_chain_scan as ecs  # noqa: E402
from nhwcodec_tpu.ops import entropy_decode_device as edd  # noqa: E402
from nhwcodec_tpu.utils import container, fixtures  # noqa: E402
from nhwcodec_tpu import tables as T  # noqa: E402


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


def main() -> None:
    b = 32
    k_chunks = 32
    sa = container.parse_nhw(enc_mod.encode(fixtures.texture_noise(), 20))
    sb = container.parse_nhw(enc_mod.encode(fixtures.gradient_circles(),
                                            20))
    streams = ([sa] * (b // 2) + [sb] * (b // 2))[:b]
    p1 = 4 * T.IM_SIZE
    all_nbits = [s.packet1.size * 32 for s in streams]
    s_max = min(p1, max(64, max(all_nbits) // 2 + 2))
    s_max = 1 << (s_max - 1).bit_length()

    nw = 1 << max(7, int(max(s.packet1.size for s in streams)
                         ).bit_length())
    wordsB = np.zeros((b, nw), np.uint32)
    for i, s in enumerate(streams):
        wordsB[i, :s.packet1.size] = s.packet1
    nbits = jnp.asarray(all_nbits, dtype=jnp.int32)
    zone = jnp.asarray([1 if s.res_high < 4 else 0 for s in streams],
                       jnp.int32)
    wordsD = jax.device_put(wordsB)

    def mk_chain(n):
        @jax.jit
        def f(w):
            def body(c, _):
                syms, counts = ecs.chain_starts_batch.__wrapped__(
                    w ^ c, nbits, zone, s_max)
                return (counts[0] & 1).astype(jnp.uint32), syms
            c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=n)
            return c
        return f

    it = slope(mk_chain, wordsD, 1, 5)
    print(f"chain_starts_batch: {it*1000:.0f} ms/iter "
          f"({it/b*1000:.1f} ms/img)")

    # prep real inputs for the downstream phases
    symB_full, countB = edd._chain_batch_scan(streams, s_max)
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
    s1B = pad_rows(sels1)
    s2B = pad_rows(sels2)
    k = min(k_chunks, r_max)
    print(f"s_trim={s_trim} r_max={r_max}")

    def mk_xs(n):
        @jax.jit
        def f(s):
            def body(c, _):
                xs_t, lits = edd._runs_xs_batch(
                    s + c, vB, rB, p1, r_max, k)
                return (lits[1][0, 0] & 1).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c
        return f

    it = slope(mk_xs, symB, 1, 5)
    print(f"xs-prep: {it*1000:.0f} ms/iter ({it/b*1000:.1f} ms/img)")

    xs_t, lits = edd._runs_xs_batch(symB, vB, rB, p1, r_max, k)

    # round-trip constant for direct (non-chained) timings
    one = jax.device_put(np.ones((), np.float32))

    def rt_fetch(fn, reps=4):
        np.asarray(jax.tree_util.tree_leaves(fn(0))[0]).ravel()[:1]
        ts = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(i))[0]).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rt = rt_fetch(lambda i: one + i)
    print(f"round-trip: {rt*1000:.1f} ms")

    rest = tuple(xs_t[1:])

    def mk_fix(n):
        @jax.jit
        def f(x0):
            def body(c, _):
                ys, _it = edd._runs_fixpoint.__wrapped__(
                    (x0 + c,) + rest, p1, k)
                return (ys[3][0, 0] & 1).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c
        return f

    it = slope(mk_fix, xs_t[0], 1, 4)
    print(f"fixpoint: {it*1000:.0f} ms/iter ({it/b*1000:.1f} ms/img)")

    ys, _it = edd._runs_fixpoint(xs_t, p1, k)
    ys3 = ys[3]
    ys_rest = (ys[0], ys[1], ys[2])

    def mk_emit(n):
        @jax.jit
        def f(y3):
            def body(c, _):
                out = edd._runs_emit_batch.__wrapped__(
                    ys_rest + (y3 + c,), lits, s1B, s2B, p1, r_max)
                return (out[0, 0] & 1).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c
        return f

    it = slope(mk_emit, ys3, 1, 4)
    print(f"emit: {it*1000:.0f} ms/iter ({it/b*1000:.1f} ms/img)")


if __name__ == "__main__":
    main()
