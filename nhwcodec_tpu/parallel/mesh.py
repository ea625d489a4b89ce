"""Device-mesh data-parallel batch codec steps.

The NHW codec has no training state and no sequence axis; the scaling axis
is the *batch of independent images* (SURVEY.md section 2.4).  The primary
sharding is therefore DP: a ``Mesh`` with a ``data`` axis, batch dimension
sharded across it, per-image compute replicated.  Throughput metrics are
reduced with ``psum`` over the mesh so every host sees the aggregate.

Static tables (quantization ladders, Huffman codebooks) are module
constants — XLA replicates them to every device at compile time, which is
the TPU-native version of the reference's implicit "everything in one
address space" (the reference has no distribution at all).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nhwcodec_tpu.models import transform


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place each (B, ...) array batch-sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)


@partial(jax.jit, static_argnames=("axis",))
def _decode_step_psum(y, u, v, axis: str):
    rgb = transform.decode_transform(y, u, v)
    # aggregate megapixels decoded across the mesh (ICI psum)
    mp = jnp.float32(y.shape[0] * y.shape[1] * y.shape[2]) / 1e6
    return rgb, mp


def decode_batch_step(mesh: Mesh, y, u, v, axis: str = "data"):
    """Sharded batched decode transform: coefficient planes -> RGB.

    y: (B, 512, 512) int16, u/v: (B, 256, 256) int16 with B divisible by
    the mesh size.  Returns ((B, 512, 512, 3) uint8, aggregate megapixels).
    """
    sh_in = NamedSharding(mesh, P(axis))
    out_sh = (NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()))
    f = jax.jit(
        lambda yy, uu, vv: _decode_step_psum(yy, uu, vv, axis),
        in_shardings=(sh_in, sh_in, sh_in),
        out_shardings=out_sh,
    )
    return f(y, u, v)


def sharded_megapixels(mesh: Mesh, y, axis: str = "data"):
    """Mesh-global megapixel count of a batch-sharded (B, H, W) plane:
    each device contributes its local shard count and a ``psum`` over
    the ``data`` axis (an ICI collective on real hardware) gives every
    device the aggregate."""
    from jax.experimental.shard_map import shard_map

    f = jax.jit(shard_map(
        lambda x: jax.lax.psum(
            jnp.float32(x.shape[0] * x.shape[1] * x.shape[2]) / 1e6,
            axis),
        mesh=mesh, in_specs=P(axis), out_specs=P()))
    return float(f(y))


def encode_batch_sharded(mesh: Mesh, images: np.ndarray, quality: int = 20,
                         axis: str = "data"):
    """Full byte-exact batch encode with the device front end sharded
    over the mesh (the BASELINE "1k images, DP over images, ordered
    bitstream gather" configuration).

    The RGB batch is placed batch-sharded; the exact colorspace and both
    analysis levels run as one sharded XLA program per launch (GSPMD
    partitions the batch axis; per-image compute has no cross-shard
    edges, so no resharding collectives are inserted — the only mesh
    communication is the psum metric and the output gather).  The host
    raster scans + entropy + container then produce each image's
    bitstream from the device outputs, byte-identical to ``encode``
    (tests/test_parallel.py).

    Returns (streams in submission order, aggregate megapixels from the
    on-mesh psum).
    """
    from nhwcodec_tpu import tables as T
    from nhwcodec_tpu.models import device_stages as ds
    from nhwcodec_tpu.models.encoder import encode_from_planes
    from nhwcodec_tpu.ops import prefilter

    b = len(images)
    sh = NamedSharding(mesh, P(axis))
    rgb = jax.device_put(np.ascontiguousarray(images), sh)
    # the fused Pallas stage is an opaque custom call GSPMD cannot split
    # over a >1-device mesh; the analysis goes through shard_map instead
    # (per-shard programs, so Mosaic kernels work per chip), and the
    # remaining GSPMD-jit paths fall back to slice algebra
    fused = None if mesh.size == 1 else False

    if quality > T.HIGH1:
        (y, u, v), pre_y, pre_u, pre_v = ds.encode_front_device(
            rgb, quality, fused=fused)
        y1s = [np.ascontiguousarray(y[i]) for i in range(b)]
        origs = y1s
    else:
        yd, ud, vd = ds.colorspace_front_device(rgb, quality)
        origs = [np.ascontiguousarray(yd[i]) for i in range(b)]
        if quality < T.HIGH2:
            y1s = [prefilter.pre_process_y(o, quality) for o in origs]
        else:
            y1s = origs
        y1_sh = jax.device_put(np.stack(y1s), sh)
        u_sh = jax.device_put(np.ascontiguousarray(ud), sh)
        v_sh = jax.device_put(np.ascontiguousarray(vd), sh)
        if mesh.size > 1:
            pre_y, pre_u, pre_v = ds.analysis_front_sharded(
                mesh, y1_sh, u_sh, v_sh, quality, axis=axis)
        else:
            pre_y, pre_u, pre_v = ds.analysis_front_device(
                y1_sh, u_sh, v_sh, quality, fused=fused)
        u, v = ud, vd

    mp = sharded_megapixels(mesh, jax.device_put(np.stack(y1s), sh), axis)

    snap_on = quality > T.HIGH1
    streams = []
    for k in range(b):
        py = (pre_y[0][k], pre_y[1][k], pre_y[2][k],
              pre_y[3][k] if snap_on else None)
        streams.append(encode_from_planes(
            y1s[k], np.ascontiguousarray(u[k]),
            np.ascontiguousarray(v[k]), quality,
            y_original=origs[k], pre_y=py,
            pre_u=tuple(a[k] for a in pre_u),
            pre_v=tuple(a[k] for a in pre_v)))
    return streams, mp
