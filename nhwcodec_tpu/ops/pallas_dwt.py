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

D2 = 256


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


# ---------------------------------------------------------------------------
# analysis (encoder) level — the inverse composition of synth_level_pallas
# (encoder/filters.c:55-386 composed per wavelet_filterbank.c:52-302)


def _shift_down(a):
    """a[k-1] along the sublane axis (zero row in front)."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _deinterleave(x, m):
    """(2m, W) -> even rows (m, W), odd rows (m, W): sublane reshape."""
    x2 = x.reshape(m, 2, x.shape[1])
    return x2[:, 0, :], x2[:, 1, :]


def _low_raw_cols(Xe, Xo, m):
    """Un-normalized lowpass moments along the sublane axis
    (encoder/filters.c:367-384)."""
    first = 6 * Xe[:1] + 4 * Xo[:1] - 2 * Xe[1:2]
    mid = (6 * Xe[1:m - 1] + 2 * (Xo[0:m - 2] + Xo[1:m - 1])
           - (Xe[0:m - 2] + Xe[2:m]))
    last = (6 * Xe[m - 1:] + 2 * (Xo[m - 2:m - 1] + Xo[m - 1:])
            - (Xe[m - 2:m - 1] + Xe[m - 1:]))
    return jnp.concatenate([first, mid, last], axis=0)


def _high_adj_cols(Xe, Xo, m):
    """Parity-adjusted highpass moments r[k], k<m-1
    (encoder/filters.c:62-81)."""
    a = Xe[:m - 1] + Xe[1:]
    prev_odd = _shift_down(a & 1)
    k_odd = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) & 1
    adj = a + ((a & 1) & prev_odd & k_odd)
    return Xo[:m - 1] - (adj >> 1)


def _round_pos(r, add, shift):
    return jnp.where(r >= 0, (r + add) >> shift, -((-r + add) >> shift))


def _down_cols_iv(x, m):
    """downfilter53IV (raw moments) along the sublane axis."""
    Xe, Xo = _deinterleave(x, m)
    low = _wrap16(_low_raw_cols(Xe, Xo, m))
    h = 2 * Xo[:m - 1] - (Xe[:m - 1] + Xe[1:])
    hl = (Xo[m - 1:] - Xe[m - 1:]) << 1
    high = _wrap16(jnp.concatenate([h, hl], axis=0))
    return low, high


def _down_cols_53(x, m):
    """Plain downfilter53 (/16 low, /2 high) along the sublane axis."""
    Xe, Xo = _deinterleave(x, m)
    low = _wrap16(_round_pos(_low_raw_cols(Xe, Xo, m), 8, 4))
    rh = _high_adj_cols(Xe, Xo, m)
    h = jnp.where(rh > 0, (rh + 1) >> 1, rh >> 1)
    hl = (Xo[m - 1:] - Xe[m - 1:] + 1) >> 1
    high = _wrap16(jnp.concatenate([h, hl], axis=0))
    return low, high


def _down_cols_vi(x, m):
    """downfilter53VI (/64 low with the error-feedback dither as a
    shifted local term, /8 high) along the sublane axis."""
    Xe, Xo = _deinterleave(x, m)
    r = _low_raw_cols(Xe, Xo, m)
    rm = jnp.abs(r) & 63
    mag = jnp.where(rm < 32, rm >> 2, -((64 - rm) >> 2))
    d = jnp.where(r >= 0, mag, -mag)
    low = _wrap16(_round_pos(_wrap16(r + _shift_down(d)), 32, 6))
    rh = _high_adj_cols(Xe, Xo, m)
    h = _round_pos(rh, 4, 3)
    hl = _wrap16(Xo[m - 1:] - Xe[m - 1:]) >> 3
    high = _wrap16(jnp.concatenate([h, hl], axis=0))
    return low, high


def _analysis_level_kernel(plane_ref, out_ref, *, m):
    h = m  # half size; n = 2m
    x = plane_ref[0].astype(jnp.int32)
    # horizontal raw IV pass, formulated on the transpose so the filtered
    # axis is the sublane axis
    t0 = x.T
    lowT, highT = _down_cols_iv(t0, m)
    t = jnp.concatenate([lowT, highT], axis=0).astype(jnp.int16)
    tt = t.T.astype(jnp.int32)               # == concat([low, high], -1)
    if m >= 128:
        # per-half column passes: VI on the top rows, plain 53 on the
        # bottom; the lane splits are 128-tile-aligned so Mosaic keeps
        # clean layouts
        topT_l, topT_h = _down_cols_vi(tt[:, :h], m)
        botT_l, botT_h = _down_cols_53(tt[:, h:], m)
        outT = jnp.concatenate([
            jnp.concatenate([topT_l, botT_l], axis=1),
            jnp.concatenate([topT_h, botT_h], axis=1)], axis=0)
        out = outT.T
        # LL-quadrant transpose-back (wavelet_filterbank.c:143-151);
        # rebuilt by concatenation — .at[].set() lowers to scatter,
        # which Mosaic does not support
        top = jnp.concatenate([out[:h, :h].T, out[:h, h:]], axis=1)
        out = jnp.concatenate([top, out[h:, :]], axis=0)
    else:
        # m == 64 (the 128-wide UV second level): 64-lane slices carry
        # tile offsets Mosaic cannot concatenate, so run BOTH column
        # filters over the full lane width and select per lane — the
        # lanes are half-idle at 64 wide, so the duplicated filter is
        # free in wall time and every intermediate stays offset-0
        vi_l, vi_h = _down_cols_vi(tt, m)
        p_l, p_h = _down_cols_53(tt, m)
        lane = jax.lax.broadcasted_iota(jnp.int32, vi_l.shape, 1)
        outT = jnp.concatenate([
            jnp.where(lane < h, vi_l, p_l),
            jnp.where(lane < h, vi_h, p_h)], axis=0)
        out = outT.T
        ll = out[:h, :h].T
        ll_wide = jnp.concatenate([ll, ll], axis=1)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (h, 2 * h), 1)
        top = jnp.where(lane2 < h, ll_wide, out[:h, :])
        out = jnp.concatenate([top, out[h:, :]], axis=0)
    out_ref[0] = out.astype(jnp.int16)


def _analysis_level_jp_kernel(plane_ref, j_ref, p_ref, *, m):
    h = m
    x = plane_ref[0].astype(jnp.int32)
    lowT, highT = _down_cols_iv(x.T, m)
    t = jnp.concatenate([lowT, highT], axis=0).astype(jnp.int16)
    j_ref[0] = t
    tt = t.T.astype(jnp.int32)
    if m >= 128:
        topT_l, topT_h = _down_cols_vi(tt[:, :h], m)
        botT_l, botT_h = _down_cols_53(tt[:, h:], m)
        outT = jnp.concatenate([
            jnp.concatenate([topT_l, botT_l], axis=1),
            jnp.concatenate([topT_h, botT_h], axis=1)], axis=0)
    else:
        # m == 64: duplicate-filter + per-lane select (see above)
        vi_l, vi_h = _down_cols_vi(tt, m)
        p_l, p_h = _down_cols_53(tt, m)
        lane = jax.lax.broadcasted_iota(jnp.int32, vi_l.shape, 1)
        outT = jnp.concatenate([
            jnp.where(lane < h, vi_l, p_l),
            jnp.where(lane < h, vi_h, p_h)], axis=0)
    p_ref[0] = outT.T.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def analysis_level_pallas_jp(block: jnp.ndarray, interpret: bool = False
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fused analysis level emitting the host driver's two in-place
    buffers instead of the final combined layout: ``j`` (the transposed
    row-pass plane — models.device_stages._stage's first output) and
    ``p`` (the column-pass plane *before* the LL transpose-back — its
    second output).  Feeds the exact encode front (device_stages)."""
    b, n, _ = block.shape
    m = n // 2
    kernel = functools.partial(_analysis_level_jp_kernel, m=m)
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, n), jnp.int16)] * 2,
        interpret=interpret,
    )(block)


@functools.partial(jax.jit, static_argnames=("interpret",))
def analysis_level_pallas(block: jnp.ndarray, interpret: bool = False
                          ) -> jnp.ndarray:
    """One full 2-D analysis level fused in VMEM: raw horizontal pass,
    transpose, VI/53 column passes, LL transpose-back — the encoder-side
    mirror of synth_level_pallas.  block: (B, 2M, 2M) int16; equals
    models.transform._analysis_level."""
    b, n, _ = block.shape
    m = n // 2
    kernel = functools.partial(_analysis_level_kernel, m=m)
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


# ---------------------------------------------------------------------------
# half-level row passes for the decode Y stage-2 split (the dering mark
# scan sits between the two row passes, so the full-level kernel cannot
# be used there; these keep each pass in VMEM and fuse its transpose)


def _synth_unnorm_rows_t_kernel(coeff_ref, out_ref, *, m):
    # transpose(unnorm_rows(x)) == unnorm_cols(x.T)
    x = coeff_ref[0].astype(jnp.int32)
    out_ref[0] = _synth_cols_unnorm(x.T, m).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def synth_unnorm_rows_t_pallas(block: jnp.ndarray, interpret: bool = False
                               ) -> jnp.ndarray:
    """One un-normalized synthesis ROW pass (upfilter53I+III,
    decoder/filters.c:143-169) with the follow-on transpose fused into
    the write.  block: (B, 2M, 2M) int16; returns (B, 2M, 2M) int16 =
    ``synth_unnorm(rows).T`` per image."""
    b, n, _ = block.shape
    kernel = functools.partial(_synth_unnorm_rows_t_kernel, m=n // 2)
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


def _synth_norm_rows_clip_kernel(coeff_ref, out_ref, *, m):
    x = coeff_ref[0].astype(jnp.int32)
    y = _synth_cols_norm(x.T, m).T
    out_ref[0] = jnp.clip(y, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def synth_norm_rows_clip_pallas(block: jnp.ndarray, interpret: bool = False
                                ) -> jnp.ndarray:
    """The final normalized synthesis ROW pass (upfilter53I+VI,
    decoder/filters.c:171-194) with the 0..255 clip fused.  block:
    (B, 2M, 2M) int16; returns (B, 2M, 2M) uint8."""
    b, n, _ = block.shape
    kernel = functools.partial(_synth_norm_rows_clip_kernel, m=n // 2)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.uint8),
        interpret=interpret,
    )(block)


def _uv_synth_kernel(jpeg_ref, out_ref):
    """The whole chroma synthesis (models.device_decode.uv_synth_device)
    for one plane in VMEM: 64-level, sentinel delta adds + band clears
    (decoder/nhw_decoder.c:991-1069), transpose-back, 128-level."""
    x = jpeg_ref[0].astype(jnp.int32)
    t1 = x[:128, :128].T
    u = _synth_cols_unnorm(t1, 64).astype(jnp.int16).astype(jnp.int32)
    ll1 = _synth_cols_norm(u.T, 64).T            # (128,128)

    def deltas(v):
        pair = jnp.where(v == 5005, -4, jnp.where(v == 5006, 4, 0))
        single = jnp.where(v == 5003, -6, jnp.where(v == 5004, 6, 0))
        return pair + single, pair, (v >= 5003) & (v <= 5006)

    ur, lo_l, lo_r = x[:128, 128:], x[128:, :128], x[128:, 128:]
    d0a, d1a, ca = deltas(ur)
    d0b, d1b, cb = deltas(lo_l)
    d0c, d1c, cc = deltas(lo_r)
    d1 = d1a + d1b + d1c
    # tgt+1 lands one column right; its col-128 spill is outside the
    # re-read LL block in the reference layout
    d1s = jnp.concatenate(
        [jnp.zeros((128, 1), jnp.int32), d1[:, :127]], axis=1)
    proc = _wrap16(ll1 + d0a + d0b + d0c + d1s)

    jp = jnp.concatenate(
        [jnp.concatenate([proc.T, jnp.where(ca, 0, ur)], axis=1),
         jnp.concatenate([jnp.where(cb, 0, lo_l),
                          jnp.where(cc, 0, lo_r)], axis=1)], axis=0)
    u = _synth_cols_unnorm(jp.T, 128).astype(jnp.int16).astype(jnp.int32)
    out_ref[0] = _synth_cols_norm(u.T, 128).T.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def uv_synth_pallas(jpeg: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """(B,256,256) int16 chroma coefficient plane -> (B,256,256) int16
    pre-sharpen plane, the whole uv_synth_device pipeline as ONE VMEM
    program (each plane moves through HBM exactly once each way)."""
    b = jpeg.shape[0]
    return pl.pallas_call(
        _uv_synth_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, D2, D2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, D2, D2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, D2, D2), jnp.int16),
        interpret=interpret,
    )(jpeg)


# ---------------------------------------------------------------------------
# the whole encoder requant feedback tail in VMEM
# (models.device_requant.requant_tail_device: level-2 synthesis, unmark
# delta interleave, compare-ladder fixpoint, jp re-analysis — the host
# sequence encoder/nhw_encoder.c:183-279 + wavelet passes)


def _rt_ladder_decide(scan, aa):
    big = jnp.where(scan > 11, -7, jnp.where(scan > 7, -4, jnp.where(
        scan > 5, -2, jnp.where(scan > 4, -1, jnp.where(
            scan < -11, 7, jnp.where(scan < -7, 4, jnp.where(
                scan < -5, 2, jnp.where(scan < -4, 1, 0))))))))
    inner = jnp.where(
        (scan > 0) & (aa > 0), -1, jnp.where(
            (scan < 0) & (aa < 0), 1, jnp.where(
                aa >= 5, -2, jnp.where(aa <= -5, 2, jnp.where(
                    aa >= 4, -1, jnp.where(aa <= -4, 1, 0))))))
    small = jnp.where(
        (scan >= 4) & (aa >= 1), -1, jnp.where(
            (scan <= -4) & (aa <= -1), 1, jnp.where(
                (scan == 3) & (aa >= 0), -1, jnp.where(
                    (scan == -3) & (aa <= 0), 1, jnp.where(
                        jnp.abs(aa) >= 3, inner, 0)))))
    return jnp.where(big != 0, big,
                     jnp.where(jnp.abs(scan) > 1, small, 0)
                     ).astype(jnp.int32)


def _rt_adjust_a(a):
    pos = jnp.where(a > 11, -7, jnp.where(a > 7, -4,
                                          jnp.where(a > 5, -2, -1)))
    neg = jnp.where(a < -11, 7, jnp.where(a < -7, 4,
                                          jnp.where(a < -5, 2, 1)))
    return jnp.where(jnp.abs(a) > 4, a + jnp.where(a > 0, pos, neg), a)


def _requant_tail_kernel(jpeg_ref, proc_ref, res_ref,
                         jout_ref, pout_ref, rout_ref):
    h = 128
    jp = jpeg_ref[0].astype(jnp.int32)           # (512,512)
    pr = proc_ref[0].astype(jnp.int32)
    v = res_ref[0].astype(jnp.int32)             # (256,256)

    # --- level-2 synthesis of the jpeg LL block ---
    u = _synth_cols_unnorm(jp[:256, :256].T, h
                           ).astype(jnp.int16).astype(jnp.int32)
    syn = _synth_cols_norm(u.T, h).T             # (256,256), int16-range

    # --- unmark: sentinel strip + interleaved +-1 delta ---
    hi = v > 14000
    marked = v > 10000
    res_clean = v - jnp.where(hi, 16000, jnp.where(marked, 12000, 0))
    d = jnp.where(marked, jnp.where(hi, 1, -1), 0)
    # lane interleaves are unsupported in Mosaic: build each column
    # interleave transposed (a sublane reshape), transpose back, then
    # row-interleave (also sublane)
    evenrows = jnp.stack([jnp.zeros((h, h), jnp.int32), d[h:, :h]],
                         axis=1).reshape(256, h).T
    oddrows = jnp.stack([d[:h, h:], d[h:, h:]],
                        axis=1).reshape(256, h).T
    delta = jnp.stack([evenrows, oddrows], axis=1).reshape(256, 256)
    ll = _wrap16(syn + delta)                    # post-unmark LL block

    # --- ladder fixpoint (per image, in VMEM) ---
    # every flat (raster) shift is written as a 2-D slice+concat:
    # Mosaic rejects 2D<->1D shape casts
    scan0 = ll - res_clean
    row_i = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    # flat raster shifts as lane rolls with a masked row-carry fix:
    # single-lane sublane concats at lane offset != 0 are unsupported
    nroll = jnp.concatenate([res_clean[:, 1:], res_clean[:, :1]],
                            axis=1)
    nup = jnp.concatenate([nroll[1:, :],
                           jnp.zeros((1, 256), jnp.int32)], axis=0)
    rflat_next = jnp.where(col_i == 255, nup, nroll)
    a0 = _rt_adjust_a(
        jnp.concatenate([ll[:, 1:], pr[:256, 256:257]], axis=1)
        - rflat_next)
    # flat left neighbour of the full 512-stride plane with the LL in
    full = jnp.concatenate(
        [jnp.concatenate([ll, pr[:256, 256:]], axis=1), pr[256:, :]],
        axis=0)
    froll = jnp.concatenate([full[:, 511:512], full[:, :511]], axis=1)
    fdown = jnp.concatenate([jnp.zeros((1, 512), jnp.int32),
                             froll[:511, :]], axis=0)
    col512 = jax.lax.broadcasted_iota(jnp.int32, (512, 512), 1)
    sh = jnp.where(col512 == 0, fdown, froll)
    rroll = jnp.concatenate([res_clean[:, 255:256], res_clean[:, :255]],
                            axis=1)
    rdown = jnp.concatenate([jnp.zeros((1, 256), jnp.int32),
                             rroll[:255, :]], axis=0)
    rflat_prev = jnp.where(col_i == 0, rdown, rroll)
    base_left = jnp.where((row_i == 0) & (col_i == 0), 0,
                          sh[:256, :256] - rflat_prev)
    m_applies = col_i >= 1

    def left_of(m):
        m_prev = jnp.concatenate(
            [jnp.zeros((256, 1), jnp.int32), m[:, :255]], axis=1)
        return base_left + jnp.where(m_applies, m_prev, 0)

    m0 = _rt_ladder_decide(scan0, a0 + left_of(jnp.zeros_like(scan0)))

    def cond(state):
        return state[1]

    def body(state):
        m, _ = state
        m2 = _rt_ladder_decide(scan0, a0 + left_of(m))
        return m2, jnp.any(m2 != m)

    m, _ = jax.lax.while_loop(cond, body, (m0, jnp.bool_(True)))
    ll_f = _wrap16(ll + m)
    jll = _wrap16(res_clean + m)

    # --- jp re-analysis of the new jpeg LL block ---
    lowT, highT = _down_cols_iv(jll.T, h)
    j = jnp.concatenate([lowT, highT], axis=0)
    tt = _wrap16(j).astype(jnp.int32).T
    topT_l, topT_h = _down_cols_vi(tt[:, :h], h)
    botT_l, botT_h = _down_cols_53(tt[:, h:], h)
    outT = jnp.concatenate([
        jnp.concatenate([topT_l, botT_l], axis=1),
        jnp.concatenate([topT_h, botT_h], axis=1)], axis=0)
    p = outT.T

    jout_ref[0] = jnp.concatenate(
        [jnp.concatenate([j, jp[:256, 256:]], axis=1), jp[256:, :]],
        axis=0).astype(jnp.int16)
    pout_ref[0] = jnp.concatenate(
        [jnp.concatenate([p, pr[:256, 256:]], axis=1), pr[256:, :]],
        axis=0).astype(jnp.int16)
    rout_ref[0] = res_clean.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def requant_tail_pallas(jpeg: jnp.ndarray, process: jnp.ndarray,
                        res256: jnp.ndarray, interpret: bool = False):
    """jpeg/process: (B,512,512) int16, res256: (B,256,256) int16 with
    sentinels.  Returns (jpeg', process', res_clean) ==
    models.device_requant.requant_tail_device, one VMEM program."""
    b = jpeg.shape[0]
    return pl.pallas_call(
        _requant_tail_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 512, 512), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 512, 512), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 256, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 512, 512), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 512, 512), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 256, 256), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, 512, 512), jnp.int16),
                   jax.ShapeDtypeStruct((b, 512, 512), jnp.int16),
                   jax.ShapeDtypeStruct((b, 256, 256), jnp.int16)],
        interpret=interpret,
    )(jpeg, process, res256)


def _synth_norm_rows_clip_waves_kernel(coeff_ref, dp_ref, out_ref, *,
                                       m, n_waves):
    x = coeff_ref[0].astype(jnp.int32)
    dp = dp_ref[0].astype(jnp.int32)

    def wave(r, c):
        le = jnp.concatenate([c[:, -1:], c[:, :-1]], axis=1)
        ri = jnp.concatenate([c[:, 1:], c[:, :1]], axis=1)
        up = jnp.concatenate([c[-1:, :], c[:-1, :]], axis=0)
        dn = jnp.concatenate([c[1:, :], c[:1, :]], axis=0)
        ul = jnp.concatenate([up[:, -1:], up[:, :-1]], axis=1)
        ur = jnp.concatenate([up[:, 1:], up[:, :1]], axis=1)
        dl = jnp.concatenate([dn[:, -1:], dn[:, :-1]], axis=1)
        dr = jnp.concatenate([dn[:, 1:], dn[:, :1]], axis=1)
        res = (c << 3) - le - ri - up - dn - ul - ur - dl - dr
        new = ((c << 2) + le + ri + up + dn + 4) >> 3
        take = (dp == r) & (jnp.abs(res) < 116)
        return jnp.where(take, new, c)

    x = jax.lax.fori_loop(1, n_waves + 1, wave, x)
    y = _synth_cols_norm(x.T, m).T
    out_ref[0] = jnp.clip(y, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_waves", "interpret"))
def synth_norm_rows_clip_waves_pallas(block: jnp.ndarray,
                                      depth_plane: jnp.ndarray,
                                      n_waves: int,
                                      interpret: bool = False
                                      ) -> jnp.ndarray:
    """The dering mark depth waves (models.device_decode
    y_stage2_dense_device semantics) fused with the final normalized
    synthesis row pass + clip, all in VMEM.  block: (B, 2M, 2M) int16
    post-scatter plane; depth_plane: (B, 2M, 2M) uint8 run positions
    (0 = no mark).  Wrapped roll edges only touch border lanes where
    the depth plane is 0 (marks live at rows 2..508, cols 1..254)."""
    b, n, _ = block.shape
    kernel = functools.partial(_synth_norm_rows_clip_waves_kernel,
                               m=n // 2, n_waves=n_waves)
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.uint8),
        interpret=interpret,
    )(block, depth_plane)


def _y_stage2_full_kernel(jp_ref, dp_ref, out_ref, *, m, n_waves):
    x = jp_ref[0].astype(jnp.int32)
    tt = _synth_cols_unnorm(x.T, m).astype(jnp.int16).astype(jnp.int32)
    dp = dp_ref[0].astype(jnp.int32)

    def wave(r, c):
        le = jnp.concatenate([c[:, -1:], c[:, :-1]], axis=1)
        ri = jnp.concatenate([c[:, 1:], c[:, :1]], axis=1)
        up = jnp.concatenate([c[-1:, :], c[:-1, :]], axis=0)
        dn = jnp.concatenate([c[1:, :], c[:1, :]], axis=0)
        ul = jnp.concatenate([up[:, -1:], up[:, :-1]], axis=1)
        ur = jnp.concatenate([up[:, 1:], up[:, :1]], axis=1)
        dl = jnp.concatenate([dn[:, -1:], dn[:, :-1]], axis=1)
        dr = jnp.concatenate([dn[:, 1:], dn[:, :1]], axis=1)
        res = (c << 3) - le - ri - up - dn - ul - ur - dl - dr
        new = ((c << 2) + le + ri + up + dn + 4) >> 3
        take = (dp == r) & (jnp.abs(res) < 116)
        return jnp.where(take, new, c)

    tt = jax.lax.fori_loop(1, n_waves + 1, wave, tt)
    y = _synth_cols_norm(tt.T, m).T
    out_ref[0] = jnp.clip(y, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_waves", "interpret"))
def y_stage2_full_pallas(jp: jnp.ndarray, depth_plane: jnp.ndarray,
                         n_waves: int, interpret: bool = False
                         ) -> jnp.ndarray:
    """The whole decode Y stage 2 WITHOUT an HQ scatter (q <= HIGH1
    streams, the common case) as ONE VMEM program: un-normalized L1 row
    pass, transpose, dering depth waves, final normalized row pass,
    clip.  jp: (B, 2M, 2M) int16 coefficient plane with the post-dering
    LL1 transposed back in; depth_plane: (B, 2M, 2M) uint8."""
    b, n, _ = jp.shape
    kernel = functools.partial(_y_stage2_full_kernel, m=n // 2,
                               n_waves=n_waves)
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.uint8),
        interpret=interpret,
    )(jp, depth_plane)
