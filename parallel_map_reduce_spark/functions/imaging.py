"""Stdlib-only image byte handling: a real PNG encoder and a real
multi-format header decoder.

No PIL/opencv exists in this container, but image *container formats*
are just bytes: PNG/JPEG/GIF/BMP all carry their dimensions in fixed
header structures that ~40 lines of struct parsing read. That lets the
multimodal pipeline run a REAL decode stage end to end — encode actual
PNG payloads, ship them through binary columns, and parse dimensions
back out of the bytes — with only full pixel-raster decode left stubbed
(that genuinely needs an image library).

Format references are the public specs: PNG (RFC 2083 / ISO 15948),
JFIF/JPEG (ITU T.81 SOF markers), GIF87a/89a, BMP (BITMAPINFOHEADER).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode_gray(width: int, height: int, pixels: bytes) -> bytes:
    """A real, spec-valid 8-bit grayscale PNG from raw pixel bytes
    (len == width*height, row-major). Any PNG reader decodes it."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# JPEG "start of frame" markers that carry dimensions: SOF0-15 minus
# DHT(C4)/JPG(C8)/DAC(CC), per ITU T.81 table B.1.
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) parsed from real image bytes, or None if
    the payload is not a recognized image container."""
    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None  # broken marker stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seglen
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down rows
    return None
