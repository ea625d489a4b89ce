""".nhw container layout (parse + serialize).

Field order is the format contract (reference: encoder/nhw_encoder.c:3114-3218
== decoder/nhw_decoder.c:1494-1661):

    u8  RES_HIGH+wavelet_type   bits0-1: LL2 RLE mode; +4: zone coding OFF
    u8  quality                 1..23
    u16 size_tree1, u16 size_tree2, i32 size_data1, i32 size_data2
    u16 tree_end, u16 exw_Y_end
    [q>12]  u16 res1_len
    [q>=19] u16 res3_len, u16 res3_bit_len
    [q>17]  u16 res4_len
    [q>12]  u16 res1_bit_len
    [q>=21] u16 res5_len, u16 res5_bit_len
    [q>21]  u32 res6_len, u16 res6_bit_len, u16 char_res1_len
    [q>22]  u16 qsetting3_len
    u16 select1, u16 select2
    [q>15]  u16 highres_comp_len
    u16 end_ch_res
    ... section bytes in the order of parse_file (see fields below)
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from nhwcodec_tpu import tables as T


@dataclasses.dataclass
class NHWStreams:
    """All sections of one .nhw file, as numpy arrays (host-side)."""

    res_high: int          # byte 0: (RES_LOW mode & 3) + (4 if zone coding off)
    quality: int           # byte 1

    tree1: np.ndarray      # u8[size_tree1]   Y codebook, RLE+interleaved
    tree2: np.ndarray      # u8[size_tree2]   UV codebook
    tree_end: int
    exw_Y: np.ndarray      # u8[exw_Y_end]    out-of-range escapes (Y,U,V)

    res1: np.ndarray       # u8[]  (q>12)
    res1_bit: np.ndarray
    res1_word: np.ndarray
    res3: np.ndarray       # u8[]  (q>=19)
    res3_bit: np.ndarray
    res3_word: np.ndarray  # length 2*res3_bit_len
    res4: np.ndarray       # u8[]  (q>17)
    res5: np.ndarray       # u8[]  (q>=21)
    res5_bit: np.ndarray
    res5_word: np.ndarray
    res6: np.ndarray       # u8[]  (q>21)
    res6_bit: np.ndarray
    res6_word: np.ndarray
    char_res1: np.ndarray  # u16[] (q>21)
    qsetting3: np.ndarray  # u32[] (q>22)

    select_word1: np.ndarray  # u8[select1]
    select_word2: np.ndarray  # u8[select2]

    res_U_64: np.ndarray   # u8[512] (q>15)
    res_V_64: np.ndarray   # u8[512] (q>15)
    highres_comp: np.ndarray  # u8[] (q>15)

    res_ch: np.ndarray     # u8[end_ch_res]  LL2 RLE stream
    packet1: np.ndarray    # u32[size_data1]             Y Huffman words
    packet2: np.ndarray    # u32[size_data2-size_data1]  UV Huffman words


_EMPTY_U8 = np.zeros(0, dtype=np.uint8)


def parse_nhw(data: bytes) -> NHWStreams:
    """Parse a .nhw byte string (decoder/nhw_decoder.c:1494-1661)."""
    pos = 0

    def u8() -> int:
        nonlocal pos
        v = data[pos]
        pos += 1
        return v

    def u16() -> int:
        nonlocal pos
        v = struct.unpack_from("<H", data, pos)[0]
        pos += 2
        return v

    def i32() -> int:
        nonlocal pos
        v = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        return v

    def u32() -> int:
        nonlocal pos
        v = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        return v

    def bytes_(n: int) -> np.ndarray:
        nonlocal pos
        v = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos).copy()
        pos += n
        return v

    res_high = u8()
    quality = u8()
    if res_high > 6:
        raise ValueError("not an .nhw file (bad mode byte)")
    if not 1 <= quality <= 23:
        raise ValueError(f"invalid quality byte {quality}")

    size_tree1 = u16()
    size_tree2 = u16()
    size_data1 = i32()
    size_data2 = i32()
    tree_end = u16()
    exw_Y_end = u16()

    res1_len = res1_bit_len = 0
    res3_len = res3_bit_len = 0
    res4_len = 0
    res5_len = res5_bit_len = 0
    res6_len = res6_bit_len = char_res1_len = 0
    qsetting3_len = 0
    highres_comp_len = 0

    if quality > T.LOW8:
        res1_len = u16()
    if quality >= T.LOW1:
        res3_len = u16()
        res3_bit_len = u16()
    if quality > T.LOW3:
        res4_len = u16()
    if quality > T.LOW8:
        res1_bit_len = u16()
    if quality >= T.HIGH1:
        res5_len = u16()
        res5_bit_len = u16()
    if quality > T.HIGH1:
        res6_len = u32()
        res6_bit_len = u16()
        char_res1_len = u16()
        if quality > T.HIGH2:
            qsetting3_len = u16()
    select1 = u16()
    select2 = u16()
    if quality > T.LOW5:
        highres_comp_len = u16()
    end_ch_res = u16()

    tree1 = bytes_(size_tree1)
    tree2 = bytes_(size_tree2)
    exw_Y = bytes_(exw_Y_end)

    res1 = res1_bit = res1_word = _EMPTY_U8
    if quality > T.LOW8:
        res1 = bytes_(res1_len)
        res1_bit = bytes_(res1_bit_len)
        res1_word = bytes_(res1_bit_len)
    res4 = _EMPTY_U8
    if quality > T.LOW3:
        res4 = bytes_(res4_len)
    res3 = res3_bit = res3_word = _EMPTY_U8
    if quality >= T.LOW1:
        res3 = bytes_(res3_len)
        res3_bit = bytes_(res3_bit_len)
        res3_word = bytes_(2 * res3_bit_len)
    res5 = res5_bit = res5_word = _EMPTY_U8
    if quality >= T.HIGH1:
        res5 = bytes_(res5_len)
        res5_bit = bytes_(res5_bit_len)
        res5_word = bytes_(res5_bit_len)
    res6 = res6_bit = res6_word = _EMPTY_U8
    char_res1 = np.zeros(0, dtype=np.uint16)
    qsetting3 = np.zeros(0, dtype=np.uint32)
    if quality > T.HIGH1:
        res6 = bytes_(res6_len)
        res6_bit = bytes_(res6_bit_len)
        res6_word = bytes_(res6_bit_len)
        char_res1 = bytes_(2 * char_res1_len).view(np.uint16).copy()
        if quality > T.HIGH2:
            qsetting3 = bytes_(4 * qsetting3_len).view(np.uint32).copy()

    select_word1 = bytes_(select1)
    select_word2 = bytes_(select2)

    res_U_64 = res_V_64 = highres_comp = _EMPTY_U8
    if quality > T.LOW5:
        res_U_64 = bytes_(2 * T.IM_DIM)
        res_V_64 = bytes_(2 * T.IM_DIM)
        highres_comp = bytes_(highres_comp_len)

    res_ch = bytes_(end_ch_res)
    packet1 = bytes_(4 * size_data1).view(np.uint32).copy()
    packet2 = bytes_(4 * (size_data2 - size_data1)).view(np.uint32).copy()

    return NHWStreams(
        res_high=res_high, quality=quality,
        tree1=tree1, tree2=tree2, tree_end=tree_end, exw_Y=exw_Y,
        res1=res1, res1_bit=res1_bit, res1_word=res1_word,
        res3=res3, res3_bit=res3_bit, res3_word=res3_word,
        res4=res4,
        res5=res5, res5_bit=res5_bit, res5_word=res5_word,
        res6=res6, res6_bit=res6_bit, res6_word=res6_word,
        char_res1=char_res1, qsetting3=qsetting3,
        select_word1=select_word1, select_word2=select_word2,
        res_U_64=res_U_64, res_V_64=res_V_64, highres_comp=highres_comp,
        res_ch=res_ch, packet1=packet1, packet2=packet2,
    )


def serialize_nhw(s: NHWStreams) -> bytes:
    """Write the container (encoder/nhw_encoder.c:3100-3277)."""
    q = s.quality
    out = bytearray()
    out.append(s.res_high)
    out.append(q)
    out += struct.pack("<HH", len(s.tree1), len(s.tree2))
    n_p1, n_p2 = len(s.packet1), len(s.packet2)
    out += struct.pack("<ii", n_p1, n_p1 + n_p2)
    out += struct.pack("<HH", s.tree_end, len(s.exw_Y))
    if q > T.LOW8:
        out += struct.pack("<H", len(s.res1))
    if q >= T.LOW1:
        out += struct.pack("<HH", len(s.res3), len(s.res3_bit))
    if q > T.LOW3:
        out += struct.pack("<H", len(s.res4))
    if q > T.LOW8:
        out += struct.pack("<H", len(s.res1_bit))
    if q >= T.HIGH1:
        out += struct.pack("<HH", len(s.res5), len(s.res5_bit))
    if q > T.HIGH1:
        out += struct.pack("<IHH", len(s.res6), len(s.res6_bit),
                           len(s.char_res1))
        if q > T.HIGH2:
            out += struct.pack("<H", len(s.qsetting3))
    out += struct.pack("<HH", len(s.select_word1), len(s.select_word2))
    if q > T.LOW5:
        out += struct.pack("<H", len(s.highres_comp))
    out += struct.pack("<H", len(s.res_ch))

    out += s.tree1.tobytes()
    out += s.tree2.tobytes()
    out += s.exw_Y.tobytes()
    if q > T.LOW8:
        out += s.res1.tobytes() + s.res1_bit.tobytes() + s.res1_word.tobytes()
    if q > T.LOW3:
        out += s.res4.tobytes()
    if q >= T.LOW1:
        out += s.res3.tobytes() + s.res3_bit.tobytes() + s.res3_word.tobytes()
    if q >= T.HIGH1:
        out += s.res5.tobytes() + s.res5_bit.tobytes() + s.res5_word.tobytes()
    if q > T.HIGH1:
        out += s.res6.tobytes() + s.res6_bit.tobytes() + s.res6_word.tobytes()
        out += s.char_res1.tobytes()
        if q > T.HIGH2:
            out += s.qsetting3.tobytes()
    out += s.select_word1.tobytes()
    out += s.select_word2.tobytes()
    if q > T.LOW5:
        out += s.res_U_64.tobytes() + s.res_V_64.tobytes()
        out += s.highres_comp.tobytes()
    out += s.res_ch.tobytes()
    out += s.packet1.tobytes()
    out += s.packet2.tobytes()
    return bytes(out)
