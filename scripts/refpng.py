"""Minimal pure-python PNG reader for the reference's golden images.

Used ONLY by the offline fixture-transcription tooling
(scripts/transcribe_reference.py) to read /root/reference/src/tests
src_imgs/ref_imgs PNGs (8-bit RGB, non-interlaced — verified for every file
we consume).  No third-party imaging library exists in this container, and
the runtime engine never touches this module.

PNG spec is public (RFC 2083); this implements IHDR/IDAT/IEND parsing,
zlib inflate, and the five scanline filters (None/Sub/Up/Average/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def read_png_rgb(path: str) -> np.ndarray:
    """Decode an 8-bit RGB (color type 2) non-interlaced PNG.

    Returns a uint8 array of shape (height, width, 3).
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"not a PNG: {path}")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 2 or inter != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={inter}): {path}"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = 3
    off = 0
    for y in range(height):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        off += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype} in {path}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, 3)
