"""Pure-stdlib WAV (RIFF / PCM16) codec — the audio analogue of
:mod:`direct_spark_sql_spark.operators.imagecodec`.

A real container parser, not a stub: the decoder walks RIFF chunks (so
files with extra LIST/fact/cue chunks decode correctly), validates the
fmt chunk (PCM, 16-bit), and returns interleaved signed samples.  This is
the decode seam a 100 TB audio pipeline runs inside ``mapInPandas``;
compressed codecs (mp3/flac/opus) would slot in behind the same signature
but need libraries this container doesn't ship.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """PCM16 little-endian WAV.  ``samples`` is interleaved
    (frame-major: [f0c0, f0c1, f1c0, ...]); length must divide channels."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE container → (sample_rate, channels, samples).

    Walks the chunk list (chunks are [4-byte id][4-byte size][payload],
    word-aligned), so unknown chunks between fmt and data are skipped —
    the shape real encoders produce.  Raises ValueError on non-WAV bytes,
    non-PCM encodings, or bit depths other than 16.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = None
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported (non-PCM) audio format {audio_fmt}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("truncated data chunk")
            samples = list(struct.unpack(f"<{size // 2}h", body[: size // 2 * 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, channels, samples
