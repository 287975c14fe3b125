"""Pure-stdlib Y4M (YUV4MPEG2) codec — the video analogue of
:mod:`imagecodec` / :mod:`audiocodec`.

YUV4MPEG2 is a real interchange format (the uncompressed stream format
ffmpeg/mjpegtools pipelines speak): a text stream header carrying
geometry tokens, then one ``FRAME\\n`` marker + raw planar YUV per frame.
A real parser, not a stub: header tokens are parsed positionally
(unknown tokens skipped), frame headers may carry their own parameters,
and truncated payloads are rejected.  Compressed codecs (H.264, VP9, …)
would slot in behind the same signatures but need libraries this
container doesn't ship.

Only C420 (4:2:0 chroma subsampling, the default) is supported: each
frame is w*h luma bytes + two (w/2)*(h/2) chroma planes.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    width: int,
    height: int,
    frames: list[tuple[bytes, bytes, bytes]],
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Encode planar (Y, U, V) frames as a YUV4MPEG2 stream (C420)."""
    if width % 2 or height % 2:
        raise ValueError("C420 requires even dimensions")
    y_len, c_len = width * height, (width // 2) * (height // 2)
    out = [
        _MAGIC
        + f" W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420".encode()
        + b"\n"
    ]
    for y, u, v in frames:
        if len(y) != y_len or len(u) != c_len or len(v) != c_len:
            raise ValueError("plane size mismatch")
        out.append(b"FRAME\n" + y + u + v)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, list[tuple[bytes, bytes, bytes]]]:
    """Parse a YUV4MPEG2 stream → (width, height, [(Y, U, V) planes]).

    Raises ValueError on a bad magic, missing geometry, non-C420 chroma,
    or a truncated frame."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated stream header")
    width = height = None
    chroma = "420"
    for tok in payload[len(_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            chroma = t[1:]
        # F/I/A/X tokens don't affect plane geometry — skipped
    if width is None or height is None:
        raise ValueError("missing geometry in stream header")
    if not chroma.startswith("420"):
        raise ValueError(f"unsupported chroma mode C{chroma}")
    y_len, c_len = width * height, (width // 2) * (height // 2)
    frames: list[tuple[bytes, bytes, bytes]] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = payload.find(b"\n", pos)  # frame headers may carry params
        if fnl < 0:
            raise ValueError("unterminated frame header")
        start = fnl + 1
        end = start + y_len + 2 * c_len
        if end > len(payload):
            raise ValueError("truncated frame payload")
        frames.append(
            (
                payload[start : start + y_len],
                payload[start + y_len : start + y_len + c_len],
                payload[start + y_len + c_len : end],
            )
        )
        pos = end
    return width, height, frames
