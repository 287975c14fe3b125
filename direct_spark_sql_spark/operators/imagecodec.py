"""Pure-stdlib image codecs (PPM / BMP / PNG; JPEG via jpegcodec) for the
multimodal pipeline.

This container has no image libraries, but these three formats need none:
PPM is a trivial header + raw RGB, BMP is fixed little-endian headers +
padded BGR rows, and PNG is zlib (stdlib) + per-scanline unfiltering.
``decode_image`` sniffs the format from magic bytes and returns dimensions
plus the raw RGB pixel buffer, so downstream feature extraction is
codec-independent.

Reference parity note: the reference engine has no media surface at all —
this module backs the repo's north-star multimodal operators
(SURVEY.md §7.2 item 6), replacing the round-1 NotImplementedError stub
with a real decode path.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# encoders (8-bit RGB in, format bytes out)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), maxval 255."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP: BGR pixel order, rows padded to 4 bytes,
    stored bottom-up (positive height)."""
    row_size = (3 * width + 3) // 4 * 4
    pixel_data = bytearray()
    for y in range(height - 1, -1, -1):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[3 * x : 3 * x + 3]
            pixel_data += bytes((b, g, r))
        pixel_data += b"\x00" * (row_size - 3 * width)
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(pixel_data), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return header + info + bytes(pixel_data)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """8-bit truecolor PNG, filter type 0 on every scanline."""
    raw = b"".join(
        b"\x00" + rgb[y * 3 * width : (y + 1) * 3 * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    # P6, then 3 whitespace-separated ints (comments '#...' allowed), then
    # a single whitespace byte, then raw RGB.
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = vals
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    rgb = payload[pos : pos + 3 * width * height]
    if len(rgb) != 3 * width * height:
        raise ValueError("PPM payload truncated")
    return width, height, rgb


def _decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    if len(payload) < 54:
        raise ValueError("BMP payload truncated")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    (header_size,) = struct.unpack_from("<I", payload, 14)
    if header_size < 40:
        raise ValueError(f"BMP core-header size {header_size} unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    top_down = height < 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    out = bytearray(3 * width * height)
    for row in range(height):
        y = row if top_down else height - 1 - row
        base = pixel_offset + row * row_size
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            i = 3 * (y * width + x)
            out[i : i + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos, width, height, channels = 8, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise ValueError(f"PNG depth={depth} interlace={interlace} unsupported")
            channels = {0: 1, 2: 3, 6: 4}.get(color_type, 0)
            if not channels:
                raise ValueError(f"PNG color type {color_type} unsupported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = channels * width
    recon = bytearray(stride * height)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        for i, v in enumerate(line):
            a = recon[off + i - channels] if i >= channels else 0
            b = recon[off - stride + i] if y > 0 else 0
            if ftype == 0:
                pass
            elif ftype == 1:
                v = (v + a) & 0xFF
            elif ftype == 2:
                v = (v + b) & 0xFF
            elif ftype == 3:
                v = (v + (a + b) // 2) & 0xFF
            elif ftype == 4:
                c = recon[off - stride + i - channels] if (y > 0 and i >= channels) else 0
                v = (v + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"PNG filter type {ftype} invalid")
            recon[off + i] = v
    if channels == 3:
        return width, height, bytes(recon)
    out = bytearray(3 * width * height)
    for px in range(width * height):
        if channels == 1:
            out[3 * px : 3 * px + 3] = bytes((recon[px],) * 3)
        else:  # RGBA → drop alpha
            out[3 * px : 3 * px + 3] = recon[4 * px : 4 * px + 3]
    return width, height, bytes(out)


def decode_image(payload: bytes) -> tuple[str, int, int, bytes]:
    """Sniff the format from magic bytes and decode to raw 8-bit RGB.

    Returns ``(fmt, width, height, rgb)`` with ``fmt`` in
    {"ppm", "bmp", "png", "gif", "jpeg"}; raises ValueError on
    unrecognized payloads."""
    if payload[:2] == b"P6":
        return ("ppm", *_decode_ppm(payload))
    if payload[:2] == b"BM":
        return ("bmp", *_decode_bmp(payload))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return ("png", *_decode_png(payload))
    if payload[:4] == b"GIF8":
        from direct_spark_sql_spark.operators.gifcodec import decode_gif

        return ("gif", *decode_gif(payload))
    if payload[:2] == b"\xff\xd8":
        from direct_spark_sql_spark.operators.jpegcodec import decode_jpeg

        return ("jpeg", *decode_jpeg(payload))
    raise ValueError("unrecognized image payload (PPM/BMP/PNG/GIF/JPEG supported)")
