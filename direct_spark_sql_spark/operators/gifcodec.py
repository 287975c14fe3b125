"""Pure-stdlib GIF87a codec (palette + LZW) for the multimodal pipeline.

GIF is lossless, so unlike JPEG it joins the exact-pixel-oracle path:
decode output is byte-identical to the source raster.  Scope: GIF87a/89a
single-image streams, global or local color table, no interlace (rejected
with a reason), extensions skipped.  LZW is the GIF variant: variable
code width starting at min_code_size+1, LSB-first bit packing inside
255-byte sub-blocks, clear/end codes, dictionary capped at 4096.

Reference parity note: the reference engine has no media surface
(SURVEY.md §2.1) — this extends the repo's north-star multimodal family
(PPM/BMP/PNG/JPEG images, WAV audio, Y4M video) with the other container
format web corpora actually carry.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    """LSB-first bit packer (GIF's bit order, opposite of JPEG's)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> None:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    w = _LsbBitWriter()
    w.write(clear, width)
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        w.write(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF widens AFTER assigning the first code of the new width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = bytes([byte])
    if seq:
        w.write(table[seq], width)
    w.write(end, width)
    w.flush()
    return bytes(w.out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no end code)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table size {len(table)}")
        out += entry
        # widen when the NEXT assignable code would not fit (0xFFF cap)
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """GIF87a encode of an 8-bit RGB buffer with <= 256 unique colors
    (raises ValueError otherwise — GIF is palette-indexed)."""
    if len(rgb) != 3 * width * height or width <= 0 or height <= 0:
        raise ValueError("rgb buffer does not match width*height*3")
    pixels = [rgb[3 * i : 3 * i + 3] for i in range(width * height)]
    palette = sorted(set(pixels))
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} unique colors exceed GIF's 256-entry palette")
    index = {c: i for i, c in enumerate(palette)}
    indexed = bytes(index[p] for p in pixels)

    out = bytearray(b"GIF87a")
    # logical screen: global color table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    table = bytearray()
    for c in palette:
        table += c
    table += b"\x00" * (3 * 256 - len(table))
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)  # image descriptor
    out.append(8)  # LZW min code size (256-entry palette)
    compressed = _lzw_encode(indexed, 8)
    for off in range(0, len(compressed), 255):
        block = compressed[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a single-image stream to ``(width, height, rgb)``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, width, height, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = payload[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code_size = payload[pos]
            pos += 1
            compressed = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                compressed += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indexed = _lzw_decode(bytes(compressed), min_code_size)
            if len(indexed) != width * height:
                raise ValueError(
                    f"GIF pixel count {len(indexed)} != {width}x{height}"
                )
            out = bytearray(3 * width * height)
            for i, idx in enumerate(indexed):
                if 3 * idx + 3 > len(ct):
                    raise ValueError(f"GIF index {idx} outside color table")
                out[3 * i : 3 * i + 3] = ct[3 * idx : 3 * idx + 3]
            return width, height, bytes(out)
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("no image data in GIF stream")
