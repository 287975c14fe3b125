"""Y4M codec unit tests: round-trips, header token handling, malformed input."""

from __future__ import annotations

import pytest

from direct_spark_sql_spark.operators.videocodec import decode_y4m, encode_y4m


def _frames(w, h, n):
    c = (w // 2) * (h // 2)
    return [
        (bytes((f + i) % 256 for i in range(w * h)), bytes([f]) * c, bytes([255 - f]) * c)
        for f in range(n)
    ]


def test_roundtrip():
    fr = _frames(4, 6, 3)
    w, h, got = decode_y4m(encode_y4m(4, 6, fr))
    assert (w, h) == (4, 6)
    assert got == fr


def test_decoder_skips_unknown_header_tokens():
    payload = encode_y4m(4, 4, _frames(4, 4, 1))
    # splice an X-extension token into the stream header, as encoders do
    head, rest = payload.split(b"\n", 1)
    patched = head + b" Xcolorrange=FULL\n" + rest
    assert decode_y4m(patched)[0:2] == (4, 4)


def test_decoder_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a video")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\n")  # unsupported chroma
    truncated = encode_y4m(4, 4, _frames(4, 4, 2))[:-5]
    with pytest.raises(ValueError):
        decode_y4m(truncated)


def test_encode_validates_geometry():
    with pytest.raises(ValueError):
        encode_y4m(5, 4, [])  # odd width under C420
    with pytest.raises(ValueError):
        encode_y4m(4, 4, [(b"\0" * 15, b"\0" * 4, b"\0" * 4)])  # bad plane size
