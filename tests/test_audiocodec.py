"""WAV codec unit tests: round-trips, chunk walking, malformed input."""

from __future__ import annotations

import struct

import pytest

from direct_spark_sql_spark.operators.audiocodec import decode_wav, encode_wav


def test_roundtrip_mono():
    samples = [0, 100, -100, 32767, -32768]
    rate, ch, got = decode_wav(encode_wav(8000, 1, samples))
    assert (rate, ch, got) == (8000, 1, samples)


def test_roundtrip_stereo_interleaved():
    samples = [1, -1, 2, -2, 3, -3]  # 3 frames x 2 channels
    rate, ch, got = decode_wav(encode_wav(44100, 2, samples))
    assert (rate, ch, got) == (44100, 2, samples)


def test_decoder_skips_unknown_chunks():
    wav = encode_wav(16000, 1, [7, 8, 9])
    # splice a LIST chunk (odd size → word-aligned with a pad byte)
    # between fmt and data, as real encoders emit
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (16000, 1, [7, 8, 9])


def test_decoder_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00JUNK")


def test_decoder_rejects_non_pcm():
    wav = bytearray(encode_wav(8000, 1, [1, 2]))
    wav[20] = 3  # audio format: IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))


def test_encode_validates_interleave():
    with pytest.raises(ValueError):
        encode_wav(8000, 2, [1, 2, 3])  # not a multiple of channels
