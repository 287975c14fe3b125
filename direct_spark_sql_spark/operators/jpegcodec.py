"""Pure-stdlib+numpy baseline JPEG codec (JFIF) for the multimodal pipeline.

The container has no image libraries; this module implements the subset of
ITU-T T.81 that real corpora overwhelmingly contain: baseline sequential
DCT, 8-bit, Huffman-coded, YCbCr, 4:4:4 or 4:2:0 chroma subsampling, with
optional restart intervals.  Progressive/arithmetic/12-bit streams raise
``ValueError`` with a precise reason rather than mis-decoding.

Encoder notes (used for test fixtures and executor-side synthesis):
  - Annex K example quantization tables, scaled by the IJG quality curve.
  - Annex K "typical" Huffman tables, emitted via DHT (the decoder builds
    its tables from the stream, never from these constants — so the
    hand-written-bitstream test in ``tests/test_jpegcodec.py`` provides an
    independent check of the entropy-coding semantics).
  - 2x2 box-filter chroma subsampling for 4:2:0.

Reference parity note: the reference engine has no media surface at all
(SURVEY.md §2.1) — this backs the repo's north-star multimodal operators,
extending the PPM/BMP/PNG path to the format real image corpora contain.

All DCT math is float64 numpy; entropy coding is pure-Python bit IO.  The
hot path runs inside Arrow-batched ``mapInPandas`` on executors.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal DCT-II basis: block = _DCT_T.T @ coeffs @ _DCT_T inverts
# coeffs = _DCT_T @ block @ _DCT_T.T exactly (float64).
_u = np.arange(8).reshape(8, 1).astype(np.float64)
_x = np.arange(8).reshape(1, 8).astype(np.float64)
_DCT_T = np.cos((2 * _x + 1) * _u * np.pi / 16) * np.where(_u == 0, np.sqrt(1 / 8), 0.5)
del _u, _x


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 1..100 -> scaled Annex K table, clamped to [1,255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 §B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            self.write(0x7F, 8 - self._nbits)  # pad with 1-bits


class _BitReader:
    """MSB-first reader over an entropy-coded segment; un-stuffs 0xFF00 and
    stops (raises _MarkerHit) at any real marker so the caller can handle
    RST/EOI."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise _MarkerHit(nxt)
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_marker(self) -> None:
        """After _MarkerHit: consume the 2-byte marker and reset bit state."""
        self.pos += 1  # the 0xFF was already consumed; skip the marker byte
        self._nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int | None) -> None:
        super().__init__(f"marker 0x{marker:02x}" if marker is not None else "EOF")
        self.marker = marker


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical T.81 code assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffDecoder:
    """Canonical Huffman decode via per-length (min, max, value-offset)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, nbits: int) -> int:
    """T.81 F.2.2.1 sign extension of an nbits-wide magnitude."""
    if nbits == 0:
        return 0
    return value if value >= (1 << (nbits - 1)) else value - (1 << nbits) + 1


def _magnitude(value: int) -> tuple[int, int]:
    """value -> (nbits, raw bit pattern) per T.81 F.1.2.1.2/F.1.4.1."""
    if value == 0:
        return 0, 0
    nbits = abs(value).bit_length()
    return nbits, value if value >= 0 else value + (1 << nbits) - 1


# ---------------------------------------------------------------------------
# color transforms (BT.601 full-range, integer-rounded like libjpeg)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF encode of an 8-bit RGB buffer.

    ``subsampling`` is ``"444"`` (no chroma subsampling; MCU = one 8x8
    block per component) or ``"420"`` (2x2 box-filtered chroma; MCU =
    16x16 luma)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} unsupported (444/420)")
    if len(rgb) != 3 * width * height or width <= 0 or height <= 0:
        raise ValueError("rgb buffer does not match width*height*3")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    ycc = _rgb_to_ycbcr(img)

    qluma = _quality_scaled(_QUANT_LUMA, quality)
    qchroma = _quality_scaled(_QUANT_CHROMA, quality)

    h1, v1 = (2, 2) if subsampling == "420" else (1, 1)
    # component planes, chroma box-filtered for 4:2:0
    yplane = ycc[..., 0]
    if subsampling == "420":
        ph, pw = (height + 1) // 2 * 2, (width + 1) // 2 * 2
        pad = np.pad(ycc, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge")
        cb = pad[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = pad[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]

    enc_dc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]

    def block_at(plane: np.ndarray, bx: int, by: int) -> np.ndarray:
        # replicate-pad edge blocks (including blocks fully past the edge,
        # which occur for 4:2:0 luma on images narrower than one MCU)
        h, w = plane.shape
        ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, h - 1)
        xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, w - 1)
        return plane[np.ix_(ys, xs)]

    def quantized(blk: np.ndarray, qtab: np.ndarray) -> np.ndarray:
        coeffs = _DCT_T @ (blk - 128.0) @ _DCT_T.T
        return np.round(coeffs.reshape(64)[ZIGZAG] / qtab[ZIGZAG]).astype(np.int64)

    writer = _BitWriter()
    prev_dc = [0, 0, 0]

    def emit_block(zz: np.ndarray, comp: int) -> None:
        kind = 0 if comp == 0 else 1
        diff = int(zz[0]) - prev_dc[comp]
        prev_dc[comp] = int(zz[0])
        nbits, pattern = _magnitude(diff)
        code, length = enc_dc[kind][nbits]
        writer.write(code, length)
        if nbits:
            writer.write(pattern, nbits)
        run = 0
        last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, length = enc_ac[kind][0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            nbits, pattern = _magnitude(int(zz[k]))
            code, length = enc_ac[kind][(run << 4) | nbits]
            writer.write(code, length)
            writer.write(pattern, nbits)
            run = 0
        if last_nz < 63:
            code, length = enc_ac[kind][0x00]  # EOB
            writer.write(code, length)

    mcu_w, mcu_h = 8 * h1, 8 * v1
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(v1):
                for bx in range(h1):
                    emit_block(quantized(block_at(yplane, mx * h1 + bx, my * v1 + by), qluma), 0)
            emit_block(quantized(block_at(cb, mx, my), qchroma), 1)
            emit_block(quantized(block_at(cr, mx, my), qchroma), 2)
    writer.flush()

    # --- assemble the stream -------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, b"\x00" + bytes(qluma[ZIGZAG].astype(np.uint8)))  # DQT 0
    out += seg(0xDB, b"\x01" + bytes(qchroma[ZIGZAG].astype(np.uint8)))  # DQT 1
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes((1, (h1 << 4) | v1, 0))  # Y
    sof += bytes((2, 0x11, 1))  # Cb
    sof += bytes((3, 0x11, 1))  # Cr
    out += seg(0xC0, sof)  # SOF0 baseline
    for tclass_tid, (bits, values) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA), (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)
    ):
        out += seg(0xC4, bytes([tclass_tid]) + bytes(bits) + bytes(values))
    sos = bytes((3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JFIF/JPEG stream to ``(width, height, rgb)``.

    Supports: SOF0 (baseline sequential), 8-bit, 1 or 3 components,
    per-component sampling factors in {1, 2}, restart intervals (DRI/RSTn).
    Raises ValueError on progressive (SOF2), arithmetic coding, or other
    unsupported shapes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (width, height, [(cid, h, v, tq)])

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        while payload[pos + 1] == 0xFF:  # legal fill bytes (T.81 B.1.1.2)
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("JPEG stream ends in fill bytes")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any SOS — standalone, no length
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0x0F
                off += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.float64)
                tab[ZIGZAG] = np.frombuffer(data[off : off + 64], dtype=np.uint8)
                qtables[tq] = tab
                off += 64
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(data):
                tc, th = data[off] >> 4, data[off] & 0x0F
                bits = list(data[off + 1 : off + 17])
                n = sum(bits)
                values = list(data[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, values)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both sequential DCT)
            precision, height, width, ncomp = struct.unpack_from(">BHHB", data, 0)
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError(f"sampling factor {h}x{v} unsupported")
                comps.append((cid, h, v, tq))
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x}) unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            if ns != len(frame[2]):
                raise ValueError(
                    "multi-scan baseline JPEG unsupported (scan covers "
                    f"{ns} of {len(frame[2])} components)"
                )
            scan_tables = {}
            for c in range(ns):
                cs, tdta = data[1 + 2 * c : 3 + 2 * c]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            for cid, _h, _v, tq in frame[2]:
                td, ta = scan_tables.get(cid, (None, None))
                if td not in huff_dc or ta not in huff_ac:
                    raise ValueError(f"scan references undefined Huffman table "
                                     f"(component {cid}: DC {td}, AC {ta})")
                if tq not in qtables:
                    raise ValueError(f"component {cid} references undefined "
                                     f"quant table {tq}")
            return _decode_scan(
                payload, pos, frame, scan_tables, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn/COM/others: skip
    raise ValueError("no SOS marker found in JPEG stream")


def _decode_scan(
    payload: bytes,
    pos: int,
    frame: tuple,
    scan_tables: dict[int, tuple[int, int]],
    qtables: dict[int, np.ndarray],
    huff_dc: dict[int, _HuffDecoder],
    huff_ac: dict[int, _HuffDecoder],
    restart_interval: int,
) -> tuple[int, int, bytes]:
    width, height, comps = frame
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one 8x8
        # data unit per MCU, sampling factors ignored.  Rewrite the frame
        # as 1x1 so the interleaved walk below degenerates correctly
        # (covers grayscale files that keep e.g. 2x2 luma factors).
        cid, _h, _v, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    planes = []
    for _cid, h, v, _tq in comps:
        planes.append(np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64))

    reader = _BitReader(payload, pos)
    prev_dc = [0] * len(comps)
    mcu_index = 0

    def decode_block(ci: int) -> np.ndarray:
        cid, _h, _v, tq = comps[ci]
        td, ta = scan_tables[cid]
        zz = np.zeros(64, dtype=np.float64)
        s = huff_dc[td].decode(reader)
        diff = _extend(reader.read_bits(s), s)
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            rs = huff_ac[ta].decode(reader)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        coeffs = np.zeros(64, dtype=np.float64)
        coeffs[ZIGZAG] = zz * qtables[tq][ZIGZAG]
        return _DCT_T.T @ coeffs.reshape(8, 8) @ _DCT_T + 128.0

    total_mcus = mcus_x * mcus_y
    while mcu_index < total_mcus:
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            # expect an RSTn marker; bit reader raises _MarkerHit on it
            try:
                while True:
                    reader.read_bit()
            except _MarkerHit as hit:
                if hit.marker is None or not 0xD0 <= hit.marker <= 0xD7:
                    raise ValueError("expected RST marker at restart interval") from hit
                reader.align_past_marker()
                prev_dc[:] = [0] * len(comps)
        my, mx = divmod(mcu_index, mcus_x)
        try:
            for ci, (_cid, h, v, _tq) in enumerate(comps):
                for by in range(v):
                    for bx in range(h):
                        blk = decode_block(ci)
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
        except _MarkerHit as hit:
            raise ValueError(
                f"JPEG entropy data ended early at MCU {mcu_index} "
                f"(marker {hit.marker})"
            ) from hit
        mcu_index += 1

    # upsample chroma to full resolution and crop to the real geometry
    full = []
    for ci, (_cid, h, v, _tq) in enumerate(comps):
        plane = planes[ci]
        if h != hmax:
            plane = np.repeat(plane, hmax // h, axis=1)
        if v != vmax:
            plane = np.repeat(plane, vmax // v, axis=0)
        full.append(plane[:height, :width])

    if len(comps) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        rgb = np.repeat(y[..., None], 3, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return width, height, rgb.tobytes()
