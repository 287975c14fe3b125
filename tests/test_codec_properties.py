"""Property-based tests (hypothesis) for the pure-Python codec/layout
primitives: WAV round-trips over arbitrary PCM content and Morton-code
interleave/deinterleave inversibility.  These run without a SparkSession —
the same functions execute inside mapInPandas / JVM expressions, so
pinning them cheap and wide here covers the executor-side behavior."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from direct_spark_sql_spark.operators.audiocodec import decode_wav, encode_wav

_sample = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=200, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    channels=st.integers(min_value=1, max_value=4),
    frames=st.lists(st.tuples(_sample, _sample, _sample, _sample), max_size=50),
)
def test_wav_roundtrip_any_pcm(rate, channels, frames):
    samples = [f[c] for f in frames for c in range(channels)]
    got = decode_wav(encode_wav(rate, channels, samples))
    assert got == (rate, channels, samples)


def _deinterleave(code: int) -> tuple[int, int]:
    a = b = 0
    for i in range(16):
        a |= ((code >> (2 * i)) & 1) << i
        b |= ((code >> (2 * i + 1)) & 1) << i
    return a, b


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=(1 << 16) - 1),
    b=st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_morton_spread_sql_is_exact_interleave(a, b):
    # evaluate the engine-portable SQL text in DuckDB (no Spark needed;
    # the same text is what the Spark side's column expression compiles to)
    import duckdb

    from direct_spark_sql_spark.operators.layout import morton_code_sql

    (code,) = duckdb.sql(f"SELECT {morton_code_sql(str(a), str(b))}").fetchone()
    assert _deinterleave(int(code)) == (a, b)


@settings(max_examples=100, deadline=None)
@given(
    wh=st.sampled_from([(2, 2), (4, 6), (8, 4), (12, 10)]),
    n_frames=st.integers(min_value=0, max_value=5),
    seed=st.integers(min_value=0, max_value=255),
)
def test_y4m_roundtrip_any_geometry(wh, n_frames, seed):
    from direct_spark_sql_spark.operators.videocodec import decode_y4m, encode_y4m

    w, h = wh
    c = (w // 2) * (h // 2)
    frames = [
        (
            bytes((seed + f + i) % 256 for i in range(w * h)),
            bytes((seed ^ f) % 256 for _ in range(c)),
            bytes((255 - seed + f) % 256 for _ in range(c)),
        )
        for f in range(n_frames)
    ]
    assert decode_y4m(encode_y4m(w, h, frames)) == (w, h, frames)
