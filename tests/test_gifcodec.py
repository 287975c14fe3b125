"""GIF87a codec tests.

The LZW round-trips cross every code-width boundary (512/1024/2048) and
the 4096-entry dictionary reset — encoder and decoder track table growth
with independent bookkeeping (next_code vs len(table)), so a
width-synchronization off-by-one fails loudly here rather than
cancelling out.  A hand-assembled literal-only stream (bytes derived
from the spec's LSB-first packing, no encoder involved) pins the base
protocol independently.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from direct_spark_sql_spark.operators.gifcodec import decode_gif, encode_gif
from direct_spark_sql_spark.operators.imagecodec import decode_image


@settings(max_examples=40, deadline=None)
@given(
    wh=st.sampled_from([(1, 1), (3, 2), (20, 15), (60, 40), (31, 17)]),
    ncolors=st.sampled_from([1, 2, 16, 200, 256]),
    seed=st.integers(min_value=0, max_value=999),
)
def test_roundtrip_any_geometry_and_palette(wh, ncolors, seed):
    w, h = wh
    rng = np.random.default_rng(seed)
    g = rng.integers(0, ncolors, (h, w), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    gw, gh, rgb = decode_gif(encode_gif(w, h, img.tobytes()))
    assert (gw, gh) == (w, h)
    assert rgb == img.tobytes()


def test_roundtrip_crosses_width_boundaries_and_reset():
    # 200x180 with 200 colors: the LZW table passes 512, 1024, 2048 and
    # hits the 4096 reset several times
    rng = np.random.default_rng(42)
    g = rng.integers(0, 200, (180, 200), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    _w, _h, rgb = decode_gif(encode_gif(200, 180, img.tobytes()))
    assert rgb == img.tobytes()


def test_true_color_rgb_palette():
    # distinct non-gray colors: palette maps back exactly
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    w, h, rgb = decode_gif(encode_gif(2, 2, img.tobytes()))
    assert (w, h) == (2, 2)
    assert rgb == img.tobytes()


def test_too_many_colors_rejected():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)  # ~400 unique colors
    with pytest.raises(ValueError, match="palette"):
        encode_gif(20, 20, img.tobytes())


def test_decode_image_sniffs_gif():
    img = np.full((5, 4, 3), 77, np.uint8)
    fmt, w, h, rgb = decode_image(encode_gif(4, 5, img.tobytes()))
    assert (fmt, w, h) == ("gif", 4, 5)
    assert rgb == img.tobytes()


def test_hand_assembled_literal_only_stream():
    # 2x1 image, 4-entry palette, min code size 2 (clear=4, end=5).
    # Literal-only LZW: [clear, 1, 3, end] at width 3, LSB-first:
    #   bits 100 001 011 101 -> bytes 0xCC 0x0A (derived by hand from the
    #   GIF89a spec's Appendix F bit-packing rules).
    palette = b"\x00\x00\x00\x10\x20\x30\x40\x50\x60\x70\x80\x90"
    stream = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0)  # GCT present, 4 entries
        + palette
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes([2])          # LZW min code size
        + bytes([2, 0xCC, 0x0A])  # one 2-byte sub-block
        + b"\x00\x3b"
    )
    w, h, rgb = decode_gif(stream)
    assert (w, h) == (2, 1)
    assert rgb == b"\x10\x20\x30" + b"\x70\x80\x90"  # palette[1], palette[3]


def test_interlaced_rejected_with_reason():
    stream = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0)
        + b"\x00" * 12
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0x40)  # interlace flag
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(stream)


def test_gif89a_extensions_skipped():
    # GIF89a with a graphic-control extension before the image
    img = np.full((3, 3, 3), 5, np.uint8)
    data = bytearray(encode_gif(3, 3, img.tobytes()))
    data[:6] = b"GIF89a"
    # splice a GCE (0x21 0xF9, one 4-byte sub-block, terminator) before 0x2C
    idx = bytes(data).index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(data[:idx]) + gce + bytes(data[idx:])
    w, h, rgb = decode_gif(spliced)
    assert (w, h) == (3, 3)
    assert rgb == img.tobytes()
