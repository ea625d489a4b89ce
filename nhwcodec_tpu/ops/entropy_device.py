"""Device-side entropy-coding building blocks (JAX/XLA).

The reference's bit-serial Huffman packer
(encoder/compress_pixel.c:280-361) advances one symbol at a time; on TPU
the same packing is a *parallel prefix* computation (SURVEY.md section 5,
long-context row): a cumulative sum over code lengths yields every
symbol's start bit, and each code then scatters into at most two 32-bit
words.  Bit contributions never overlap, so the scatter-OR is a
scatter-add — one fused XLA program for the whole stream.

The token stream itself (symbol indices after run-length segmentation)
comes from the host tokenizer; this module turns tokens into packed
words at device speed and is the building block for the batched device
entropy stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nhwcodec_tpu import tables as T


def pack_bits_device(codes: jnp.ndarray, lens: jnp.ndarray,
                     n_words: int) -> jnp.ndarray:
    """Pack (code, nbits) pairs MSB-first into 32-bit words.

    codes: (..., S) uint32 right-aligned code values; lens: (..., S) int32
    bit counts (0 allowed: emits nothing).  Returns (..., n_words) uint32.
    Matches the reference packer's layout exactly
    (encoder/compress_pixel.c:345-355).
    """
    codes = jnp.asarray(codes, jnp.uint32)
    lens = jnp.asarray(lens, jnp.int32)
    ends = jnp.cumsum(lens, axis=-1)
    starts = ends - lens

    word_idx = starts >> 5
    shift = starts & 31
    # each code lands in a 64-bit window [word_idx, word_idx+1]; formulated
    # in 32-bit ops (uint64 is unavailable without jax_enable_x64)
    over = shift + lens - 32          # bits spilling into the second word
    hi = jnp.where(over > 0,
                   codes >> jnp.clip(over, 0, 31).astype(jnp.uint32),
                   codes << jnp.clip(-over, 0, 31).astype(jnp.uint32))
    lo = jnp.where(over > 0,
                   codes << jnp.clip(32 - over, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))

    out = jnp.zeros(codes.shape[:-1] + (n_words + 1,), jnp.uint32)
    mask = lens > 0
    out = out.at[..., word_idx].add(jnp.where(mask, hi, 0))
    out = out.at[..., word_idx + 1].add(jnp.where(mask, lo, 0))
    return out[..., :n_words]


pack_bits_device_jit = jax.jit(pack_bits_device, static_argnames=("n_words",))


def tokens_to_words(positions: np.ndarray, zone_mask: np.ndarray,
                    n_words: int) -> np.ndarray:
    """Codebook-position tokens -> packed u32 words on device.

    positions: (S,) int32 codebook indices (post run segmentation);
    zone_mask: (S,) bool — True where the 15-bit zone escape applies
    (decoder/compress_pixel.c:141-187's inverse).  The per-token
    code/length lookup and the packing are one device program.
    """
    pos = jnp.asarray(positions, jnp.int32)
    zone = jnp.asarray(zone_mask, jnp.bool_)
    plain = jnp.where(zone, 0, jnp.where(pos >= 174, pos - 64, pos))
    codes = jnp.where(zone,
                      (1 << 6) | jnp.maximum(pos - 110, 0),
                      jnp.asarray(T.HUFFMAN_CODES, jnp.uint32)[plain])
    lens = jnp.where(zone, 15, jnp.asarray(T.HUFFMAN_LENS, jnp.int32)[plain])
    return np.asarray(pack_bits_device_jit(codes, lens, n_words))
