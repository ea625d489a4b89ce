"""Emit-phase scatter experiments (decode_y device path): int16 vs
int32 scatter buffers, and k_chunks sensitivity of the fixpoint."""

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

import functools  # noqa: E402

from nhwcodec_tpu.models import encoder as enc_mod  # noqa: E402
from nhwcodec_tpu.ops import entropy  # noqa: E402
from nhwcodec_tpu.ops import entropy_decode_device as edd  # noqa: E402
from nhwcodec_tpu.utils import container, fixtures  # noqa: E402
from nhwcodec_tpu import tables as T  # noqa: E402


@functools.partial(jax.jit, static_argnames=("p1", "r_max"))
def emit_i32(ys, lits, sel1, sel2, p1: int, r_max: int):
    b = sel1.shape[0]
    ins_seq, ev1, ev2, pos_r = (a.T.reshape(b, r_max) for a in ys)
    is_run, base_e, runs_before, wv1, wv2, whas2 = lits
    s_len = base_e.shape[1]
    rowR = (jnp.arange(b, dtype=jnp.int32) * (r_max + 1))[:, None]

    ins_excl = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.cumsum(ins_seq.astype(jnp.int32), axis=1)], axis=1)
    take = (jnp.minimum(runs_before, r_max) + rowR).reshape(-1)
    e_sym = base_e + ins_excl.reshape(-1)[take].reshape(b, s_len)

    stride = p1 + 512
    total = b * stride
    rowO = (jnp.arange(b, dtype=jnp.int32) * stride)[:, None]
    lit = (~is_run) & (e_sym < p1 - 1)
    out = jnp.zeros(total, jnp.int32)
    idx1 = jnp.where(lit, e_sym + rowO, total).reshape(-1)
    out = out.at[idx1].set(wv1.reshape(-1), mode="drop")
    idx2 = jnp.where(lit & (whas2 == 1), e_sym + 4 + rowO,
                     total).reshape(-1)
    out = out.at[idx2].set(wv2.reshape(-1), mode="drop")

    sl = sel1.shape[1]
    rowS = (jnp.arange(b, dtype=jnp.int32) * sl)[:, None]
    r1 = jnp.cumsum(ev1.astype(jnp.int32), axis=1) - 1
    r2 = jnp.cumsum(ev2.astype(jnp.int32), axis=1) - 1
    g1 = (jnp.clip(r1, 0, sl - 1) + rowS).reshape(-1)
    g2 = (jnp.clip(r2, 0, sl - 1) + rowS).reshape(-1)
    sv1 = jnp.where(sel1.reshape(-1)[g1] == 0, 11, -11).reshape(b, r_max)
    sv2 = jnp.where(sel2.reshape(-1)[g2] == 0, -11, 11).reshape(b, r_max)
    iv = jnp.where(ev2, sv2, sv1)
    idx3 = jnp.where(ins_seq, pos_r + rowO, total).reshape(-1)
    out = out.at[idx3].set(iv.reshape(-1), mode="drop")
    return out.reshape(b, stride)[:, :p1].astype(jnp.int16)


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

    def pad_rows(rows, fill=0):
        n = 1 << max(6, (max(len(r) for r in rows) - 1).bit_length())
        out = np.full((len(rows), n), fill, np.int32)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r
        return jnp.asarray(out)

    books = [entropy.build_y_book(s.tree1) for s in streams]
    vB = pad_rows([bk[0] for bk in books])
    rB = pad_rows([bk[1] for bk in books])
    runsB = edd._run_count_batch(symB_full, vB, countB)
    cr = np.asarray(jnp.stack([countB, runsB]))
    counts, runs = cr[0], cr[1]
    s_trim = 1 << (int(min(max(64, counts.max() + 1), s_max))
                   - 1).bit_length()
    r_max = 1 << max(4, int(max(runs.max(), 1) - 1).bit_length())
    symB = symB_full[:, :s_trim]
    s1B = pad_rows([np.unpackbits(np.ascontiguousarray(
        s.select_word1, np.uint8)) for s in streams])
    s2B = pad_rows([np.unpackbits(np.ascontiguousarray(
        s.select_word2, np.uint8)) for s in streams])

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

    for k_chunks in (32, 128, 256):
        k = min(k_chunks, r_max)
        xs_t, lits = edd._runs_xs_batch(symB, vB, rB, p1, r_max, k)

        def fix_call(i, xs_t=xs_t, k=k):
            xs2 = (xs_t[0] + (i > 100),) + tuple(xs_t[1:])
            return edd._runs_fixpoint(xs2, p1, k)

        it = rt_fetch(fix_call) - rt
        print(f"fixpoint k={k}: {it*1000:.0f} ms/call "
              f"(L={r_max//k} steps/sweep)")

        if k_chunks == 32:
            ys = edd._runs_fixpoint(xs_t, p1, k)

            def emit16(i):
                ys2 = (ys[0], ys[1], ys[2], ys[3] + (i > 100))
                return edd._runs_emit_batch(ys2, lits, s1B, s2B,
                                            p1, r_max)

            def emit32(i):
                ys2 = (ys[0], ys[1], ys[2], ys[3] + (i > 100))
                return emit_i32(ys2, lits, s1B, s2B, p1, r_max)

            a = rt_fetch(emit16) - rt
            bt = rt_fetch(emit32) - rt
            print(f"emit int16: {a*1000:.0f} ms  |  emit int32+cast: "
                  f"{bt*1000:.0f} ms")
            ref = np.asarray(edd._runs_emit_batch(ys, lits, s1B, s2B,
                                                  p1, r_max))
            new = np.asarray(emit_i32(ys, lits, s1B, s2B, p1, r_max))
            print("emit equal:", np.array_equal(ref, new))


if __name__ == "__main__":
    main()
