"""Baseline JPEG codec tests.

Round-trip tests alone can't prove spec conformance (a shared bug would
cancel out), so this file also decodes a *hand-assembled* bitstream whose
bytes were derived directly from ITU-T T.81 (marker layout, canonical
Huffman code assignment, DC magnitude coding, orthonormal-DCT DC math) —
if the decoder's entropy/DCT semantics drifted from the spec, that test
fails even though encoder round-trips still pass.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from direct_spark_sql_spark.operators.imagecodec import decode_image
from direct_spark_sql_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def _smooth(w: int, h: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [60 + x * 3 + y * 2, 40 + x * 2 + y * 3, 80 + x + y], axis=-1
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    wh=st.sampled_from([(1, 1), (5, 3), (8, 8), (13, 7), (16, 16), (17, 9), (32, 24)]),
    quality=st.sampled_from([75, 90, 95]),
    subsampling=st.sampled_from(["444", "420"]),
)
def test_smooth_roundtrip_bounded_error(wh, quality, subsampling):
    w, h = wh
    img = _smooth(w, h)
    data = encode_jpeg(w, h, img.tobytes(), quality=quality, subsampling=subsampling)
    gw, gh, rgb = decode_jpeg(data)
    assert (gw, gh) == (w, h)
    got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    # linear gradients have almost no high-frequency energy: at q>=75 the
    # reconstruction stays within a tight per-pixel band (420 adds chroma
    # box-filter error on the color channels)
    bound = 8 if subsampling == "420" else 5
    assert np.abs(got - img.astype(int)).max() <= bound


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_solid_color_is_exact(subsampling):
    img = np.full((24, 16, 3), (120, 64, 200), np.uint8)
    data = encode_jpeg(16, 24, img.tobytes(), quality=90, subsampling=subsampling)
    w, h, rgb = decode_jpeg(data)
    got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert (w, h) == (16, 24)
    # solid colors are DC-only; DC survives quantization of this magnitude
    # and YCbCr<->RGB rounding is exact for this triple
    assert np.array_equal(got, img)


@settings(max_examples=80, deadline=None)
@given(
    color=st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
    wh=st.sampled_from([(8, 8), (16, 8), (11, 13)]),
    subsampling=st.sampled_from(["444", "420"]),
)
def test_solid_color_property_bounded(color, wh, subsampling):
    # Solid blocks are DC-only: quantization error is <= q[0]/2 per DCT
    # coefficient = <= 1 count per YCbCr channel at quality 90, so the RGB
    # round-trip error is bounded by the color-transform condition number
    # (~3 counts), for EVERY color and geometry.
    w, h = wh
    img = np.full((h, w, 3), color, np.uint8)
    data = encode_jpeg(w, h, img.tobytes(), quality=90, subsampling=subsampling)
    gw, gh, rgb = decode_jpeg(data)
    assert (gw, gh) == (w, h)
    got = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 3


def test_noise_q95_mean_error_small():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    data = encode_jpeg(40, 40, img.tobytes(), quality=95)
    _w, _h, rgb = decode_jpeg(data)
    got = np.frombuffer(rgb, np.uint8).reshape(40, 40, 3).astype(int)
    assert np.abs(got - img.astype(int)).mean() < 6.0


def test_decode_image_sniffs_jpeg():
    img = _smooth(12, 10)
    fmt, w, h, rgb = decode_image(encode_jpeg(12, 10, img.tobytes(), quality=95))
    assert (fmt, w, h) == ("jpeg", 12, 10)
    assert len(rgb) == 12 * 10 * 3


# ---------------------------------------------------------------------------
# hand-assembled bitstream (spec-derived, encoder not involved)
# ---------------------------------------------------------------------------

# Annex K typical DC/AC luminance tables, inlined literally so this test
# shares no constants with the codec module.
_DC_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_VALS = bytes(range(12))
_AC_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_VALS = bytes(
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
    ]
)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _gray_headers(width: int, height: int, dri: int = 0) -> bytes:
    """SOI + DQT(all-16s) + SOF0(1 component, 1x1) + DHT(Annex K luma) +
    optional DRI, ready for a hand-written SOS."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([16] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0)))
    out += _seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _seg(0xC4, b"\x10" + _AC_BITS + _AC_VALS)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    return bytes(out)


def test_hand_assembled_dc_only_block():
    # Solid gray 160: level shift 32, orthonormal DC = 8*32 = 256,
    # quant 16 -> quantized DC 16 (category 5).
    # Annex K DC luma canonical codes: len2: sym0=00; len3: syms1..5 =
    # 010,011,100,101,110.  So category 5 -> '110', then 5 magnitude bits
    # '10000'.  AC canonical: len2: 0x01=00, 0x02=01; len3: 0x03=100;
    # len4: 0x00(EOB)=1010.  Bits: 110 10000 1010 + 1-padding to 16
    # = 11010000 10101111 = 0xD0 0xAF.
    stream = (
        _gray_headers(8, 8)
        + _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
        + b"\xd0\xaf"
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(stream)
    assert (w, h) == (8, 8)
    assert rgb == bytes([160]) * (8 * 8 * 3)


def test_hand_assembled_restart_interval_resets_dc_prediction():
    # Two 8x8 MCUs (16x8 image), DRI=1: each MCU followed by byte-aligned
    # RST, DC predictor reset between them.  Both MCUs encode quantized
    # DC diff 16 ('110'+'10000') + EOB ('1010') = 0xD0 0xAF; if the
    # decoder failed to reset the predictor, MCU1 would decode as gray 192
    # (160 + 32) instead of 160.
    stream = (
        _gray_headers(16, 8, dri=1)
        + _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
        + b"\xd0\xaf"
        + b"\xff\xd0"  # RST0
        + b"\xd0\xaf"
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(stream)
    assert (w, h) == (16, 8)
    assert rgb == bytes([160]) * (16 * 8 * 3)


def test_progressive_rejected_with_reason():
    stream = (
        b"\xff\xd8"
        + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    )
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(stream)


def test_fill_bytes_before_marker_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    img = _smooth(8, 8)
    data = encode_jpeg(8, 8, img.tobytes(), quality=95)
    assert data[:2] == b"\xff\xd8"
    padded = data[:2] + b"\xff\xff" + data[2:]
    w, h, _rgb = decode_jpeg(padded)
    assert (w, h) == (8, 8)


def test_single_component_scan_is_noninterleaved():
    # Grayscale frame that KEEPS 2x2 sampling factors (as jpegtran
    # -grayscale does): per T.81 A.2.2 a one-component scan is
    # non-interleaved — one 8x8 block per MCU, factors ignored.
    stream = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([16] * 64))
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x22, 0)))
        + _seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
        + _seg(0xC4, b"\x10" + _AC_BITS + _AC_VALS)
        + _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
        + b"\xd0\xaf"  # one DC-only block: solid gray 160
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg(stream)
    assert (w, h) == (8, 8)
    assert rgb == bytes([160]) * (8 * 8 * 3)


def test_undefined_tables_raise_valueerror_not_keyerror():
    # SOS referencing AC table 1 that no DHT defined -> ValueError (the
    # decode_image contract), never a bare KeyError.
    stream = (
        _gray_headers(8, 8)
        + _seg(0xDA, bytes((1, 1, 0x01, 0, 63, 0)))  # AC table id 1 undefined
        + b"\xd0\xaf"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="undefined Huffman"):
        decode_jpeg(stream)


def test_partial_multiscan_rejected_with_reason():
    # A scan covering 1 of 3 frame components (multi-scan baseline) is
    # detected and rejected rather than returning a partial image.
    stream = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([16] * 64))
        + _seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes((1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)),
        )
        + _seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
        + _seg(0xC4, b"\x10" + _AC_BITS + _AC_VALS)
        + _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
        + b"\xd0\xaf"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(stream)


def test_truncated_entropy_rejected():
    stream = _gray_headers(8, 8) + _seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0))) + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(stream)
