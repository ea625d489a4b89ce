"""NHW encode pipeline (under construction).

The encoder mirrors encoder/nhw_encoder.c:103-2878: colorspace + 4:2:0
downsample, pre-filters, 2-level lifting analysis, reconstruction-aware
requantization, residue side-stream construction, serpentine interleave and
static-Huffman packetization.
"""

from __future__ import annotations

import numpy as np


def encode(pixels: np.ndarray, quality: int = 20) -> bytes:
    """Encode a (512,512,3) uint8 pixel array to .nhw bytes."""
    raise NotImplementedError("encoder lands after the decoder milestone")


def encode_bmp(bmp_path, nhw_path, quality: int = 20) -> None:
    from pathlib import Path

    from nhwcodec_tpu.utils import bmp as bmp_io

    data = encode(bmp_io.read_bmp512(bmp_path), quality)
    Path(nhw_path).write_bytes(data)
