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
