"""Real PNG codec for the multimodal decode seam (VERDICT r7 #4).

The mm_* operators run their kernels through pluggable hooks
(``decoder=`` / ``resizer=`` on the df-level functions in
llm/multimodal.py). The hash-derived STUB stays the default so the
driver oracle remains SQL-checkable, but the seam itself must be proven
against real codec behavior — variable dimensions, multi-channel
layouts, corrupt bytes raising — which this pure-stdlib (zlib + struct)
PNG implementation provides without adding a dependency the container
lacks.

Supported: 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
RGBA), all five scanline filters, non-interlaced. Anything else raises
``ValueError`` — the quarantine path.

Scale note: the per-byte unfilter loop is pure Python and therefore
10-100× slower than PIL/libpng; at 100 TB you plug PIL into the SAME
hook (``image_meta_df(df, decoder=lambda b: PIL_decode(b))``). This
module's job is proving the hook's contract, not winning the kernel
benchmark — and because the hook is closure-captured into mapInPandas,
a driver-registered real decoder serializes to executors with the plan,
no executor-side module state required.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_pixels(data: bytes) -> tuple[int, int, int, bytearray]:
    """Full decode: (width, height, n_channels, unfiltered pixel bytes in
    row-major scanline order). Raises ValueError on anything that is not
    a well-formed 8-bit non-interlaced PNG."""
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    width = height = nch = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", bytes(data[pos : pos + 8]))
        pos += 8
        chunk = bytes(data[pos : pos + length])
        if len(chunk) != length:
            raise ValueError("truncated chunk body")
        pos += length + 4  # body + CRC (CRC not verified: tolerant reader)
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            nch = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("pixel payload size mismatch")
    out = bytearray()
    prev = bytes(stride)
    i = 0
    for _row in range(height):
        ft = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                c = prev[x - nch] if x >= nch else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out += line
        prev = bytes(line)
    return width, height, nch, out


def decode_png(data: bytes) -> tuple[int, int, float]:
    """Decoder-hook form: (width, height, mean_luma in [0,1], 6 dp).
    Luma is Rec.601 for color images, the gray channel otherwise; alpha
    is ignored. Drop-in for llm.multimodal.decode_image."""
    width, height, nch, px = decode_png_pixels(data)
    total = 0.0
    n = width * height
    if nch >= 3:
        for i in range(0, len(px), nch):
            total += 0.299 * px[i] + 0.587 * px[i + 1] + 0.114 * px[i + 2]
    else:
        for i in range(0, len(px), nch):
            total += px[i]
    return width, height, round(total / n / 255.0, 6)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, n_channels: int, pixels: bytes) -> bytes:
    """Minimal encoder (filter 0 rows, one IDAT). Inverse of
    decode_png_pixels for the supported subset."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[n_channels]
    stride = width * n_channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for row in range(height):
        raw.append(0)
        raw += pixels[row * stride : (row + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def resize_png(data: bytes, dst_width: int, dst_height: int) -> bytes:
    """Resizer-hook form: nearest-neighbor resample, re-encoded as PNG.
    Drop-in for the ``resizer=`` seam of llm.multimodal.image_resize_df."""
    src_w, src_h, nch, px = decode_png_pixels(data)
    out = bytearray(dst_width * dst_height * nch)
    for y in range(dst_height):
        sy = y * src_h // dst_height
        for x in range(dst_width):
            sx = x * src_w // dst_width
            src_off = (sy * src_w + sx) * nch
            dst_off = (y * dst_width + x) * nch
            out[dst_off : dst_off + nch] = px[src_off : src_off + nch]
    return encode_png(dst_width, dst_height, nch, bytes(out))
