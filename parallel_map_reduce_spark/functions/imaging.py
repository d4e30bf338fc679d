"""Stdlib-only image byte handling: a real PNG encoder, a real PNG
raster decoder, and a multi-format header decoder.

No PIL/opencv exists in this container, but image *container formats*
are just bytes: PNG/JPEG/GIF/BMP all carry their dimensions in fixed
header structures that ~40 lines of struct parsing read, and PNG's
raster is zlib + five per-row filters — decodable with nothing beyond
the stdlib. That lets the multimodal pipeline run a REAL decode stage
end to end: encode actual PNG payloads, ship them through binary
columns, and recover both dimensions AND pixel values from the bytes.
Raster decode of JPEG/GIF (entropy coding) and audio/video codecs
genuinely needs external libraries and stays out of scope.

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


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ft: int, cur: bytes, prev: bytes) -> bytes:
    """Apply PNG filter `ft` to a raw row (bpp=1, grayscale)."""
    if ft == 0:
        return cur
    out = bytearray(len(cur))
    for x in range(len(cur)):
        left = cur[x - 1] if x else 0
        up = prev[x]
        ul = prev[x - 1] if x else 0
        if ft == 1:  # Sub
            pred = left
        elif ft == 2:  # Up
            pred = up
        elif ft == 3:  # Average
            pred = (left + up) // 2
        elif ft == 4:  # Paeth
            pred = _paeth(left, up, ul)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[x] = (cur[x] - pred) & 0xFF
    return bytes(out)


def png_encode_gray(
    width: int, height: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """A real, spec-valid 8-bit grayscale PNG from raw pixel bytes
    (len == width*height, row-major). Any PNG reader decodes it.
    `filter_type` selects the per-row pre-compression filter (0-4, PNG
    spec §6) — any choice is spec-valid; 0 is the fastest to encode."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = []
    prev = bytes(width)
    for y in range(height):
        cur = pixels[y * width : (y + 1) * width]
        rows.append(bytes([filter_type]) + _filter_row(filter_type, cur, prev))
        prev = cur
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode_gray(payload: bytes) -> tuple[int, int, bytes]:
    """FULL raster decode of an 8-bit non-interlaced grayscale PNG —
    stdlib only: chunk walk with CRC verification, zlib inflate of the
    concatenated IDAT stream, then per-row unfiltering for all five
    filter types (None/Sub/Up/Average/Paeth, PNG spec §6). Returns
    (width, height, pixels) with len(pixels) == width*height, row-major
    — the inverse of png_encode_gray for ANY filter_type, and of any
    conforming encoder's grayscale output."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    width = height = None
    idat: list[bytes] = []
    i = 8
    while i + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", payload[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError(
                    "only 8-bit non-interlaced grayscale PNG supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("PNG raster size mismatch")
    out = bytearray()
    prev = bytearray(width)
    for y in range(height):
        start = y * (width + 1)
        ft = raw[start]
        row = bytearray(raw[start + 1 : start + 1 + width])
        if ft == 1:  # Sub
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ft == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(width):
                left = row[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return width, height, bytes(out)


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
