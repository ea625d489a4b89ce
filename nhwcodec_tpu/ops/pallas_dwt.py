"""Fused Pallas TPU kernels for the 5/3 lifting filterbank.

The XLA path (models.transform) issues one fused elementwise program per
filter pass with HBM round-trips between the row pass, transpose and
column pass.  These kernels keep the whole 512x512 int16 plane (512 KB)
in VMEM and run row-synthesis -> transpose -> column-synthesis in one
`pallas_call`, so each plane moves through HBM exactly twice (in + out)
— the filterbank's speed-of-light.

Grid: one program per batch element.  All arithmetic in int32 with the
reference's int16 wrap semantics (ops.lifting.wrap16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wrap16(x):
    return ((x + 32768) & 65535) - 32768


def _synth_cols_unnorm(x, m):
    """upfilter53I + upfilter53III along the sublane axis of a (2m, W)
    block (decoder/filters.c:143-169); the row interleave is a sublane
    reshape, which Mosaic supports (lane interleaves are not)."""
    L = x[:m, :]
    H = x[m:, :]
    even = jnp.concatenate([L[: m - 1, :] << 3, L[m - 1:, :] << 3], axis=0)
    odd = jnp.concatenate(
        [(L[1:, :] + L[: m - 1, :]) << 2, L[m - 1:, :] << 3], axis=0)
    even = _wrap16(even)
    odd = _wrap16(odd)
    sub_even = jnp.concatenate(
        [H[:1, :] << 2, (H[1:, :] + H[: m - 1, :]) << 1], axis=0)
    add_odd = jnp.concatenate(
        [5 * H[:1, :] - H[1:2, :],
         6 * H[1: m - 1, :] - H[2:, :] - H[: m - 2, :],
         5 * H[m - 1:, :] - H[m - 2: m - 1, :]], axis=0)
    even = _wrap16(even - sub_even)
    odd = _wrap16(odd + add_odd)
    out = jnp.stack([even, odd], axis=1)        # (m, 2, W)
    return out.reshape(2 * m, even.shape[1])


def _synth_cols_norm(x, m):
    """upfilter53I + upfilter53VI (/64, +32 on positives only,
    decoder/filters.c:171-194), sublane axis."""
    t = _synth_cols_unnorm(x, m)
    return _wrap16(jnp.where(t > 0, t + 32, t)) >> 6


def _synth_level_kernel(coeff_ref, out_ref, *, m):
    # norm_rows(unnorm_rows(x).T) == norm_cols(unnorm_cols(x.T).T).T
    x = coeff_ref[0].astype(jnp.int32)
    t1 = x.T
    u = _synth_cols_unnorm(t1, m).astype(jnp.int16).astype(jnp.int32)
    v = _synth_cols_norm(u.T, m)
    out_ref[0] = v.T.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def synth_level_pallas(block: jnp.ndarray, interpret: bool = False
                       ) -> jnp.ndarray:
    """One full 2-D synthesis level, fused in VMEM.

    block: (B, 2M, 2M) int16 coefficient block; returns (B, 2M, 2M) int16
    (equals models.transform.synth_level / the wavelet_synthesis(im, 2M)
    composition, decoder/wavelet_filterbank.c:52-235).
    """
    b, n, _ = block.shape
    m = n // 2
    kernel = functools.partial(_synth_level_kernel, m=m)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.int16),
        interpret=interpret,
    )(block)
