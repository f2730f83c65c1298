"""Dependency-free PNG codec: stdlib ``zlib`` + ``struct`` only.

Gives the image pipeline a REAL decode path in codec-less containers,
mirroring what the audio path gets from stdlib ``wave``: 8-bit
grayscale / RGB / RGBA, non-interlaced PNGs (the overwhelming majority of
real corpora and everything Pillow writes by default) decode to raw RGB
with full scanline-filter reconstruction (types 0-4 per the PNG spec,
RFC 2083 §6). Anything else raises ``ValueError`` so callers can degrade
per-row instead of failing the batch.

Reference parity: the reference platform treats media as opaque blobs at
the dataflow layer (binary columns + metadata); decode lives in plugins.
This module is that plugin for PNG, with zero dependencies.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (len == width*height*3) as a minimal valid PNG
    (8-bit truecolor, filter 0 scanlines, one IDAT)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    stride = width * 3
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        raw += rgb[y * stride : (y + 1) * stride]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def png_decode(raw: bytes) -> tuple[int, int, bytearray]:
    """Decode a PNG to ``(width, height, rgb)`` where ``rgb`` is
    ``width*height*3`` bytes (RGBA alpha dropped, grayscale replicated).

    Handles all five scanline filter types. Raises ``ValueError`` for
    non-PNG input, truncation, or unsupported shapes (bit depth != 8,
    palette images, interlacing)."""
    if raw is None:
        raise ValueError("no content")
    raw = bytes(raw)
    if len(raw) < 8 or raw[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = colortype = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            w, h, depth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or colortype not in _CHANNELS or interlace:
                raise ValueError("unsupported PNG shape")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e

    ch = _CHANNELS[colortype]
    stride = w * ch
    if len(plain) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(h):
        ftype = plain[pos]
        line = bytearray(plain[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        prev = line
        if ch == 3:
            out += line
        elif ch == 4:
            for i in range(0, stride, 4):
                out += line[i : i + 3]
        else:  # grayscale → replicate
            for v in line:
                out += bytes((v, v, v))
    return w, h, out


def rgb_resize_nearest(
    w: int, h: int, rgb: bytes, new_w: int, new_h: int
) -> bytearray:
    """Nearest-neighbor resize of raw RGB bytes — the dependency-free
    resample behind ``decode_resize`` when Pillow is absent."""
    out = bytearray()
    for y in range(new_h):
        sy = (y * h) // new_h
        row = rgb[sy * w * 3 : (sy + 1) * w * 3]
        for x in range(new_w):
            sx = (x * w) // new_w
            out += row[sx * 3 : sx * 3 + 3]
    return out
