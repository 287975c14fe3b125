"""Registered UDF surface — the user-extension point.

The reference registers Hive UDF/UDAF/UDTFs into its session catalog so
SQL text can call them (DirectSessionCatalog.scala:62-112, tested at
DirectExecSuite.scala:159-178).  The PySpark-native equivalents:

- scalar **pandas UDFs** (Arrow-batched, ~10-100× faster than row-at-a-time
  Python UDFs) registered with ``spark.udf.register`` → callable from SQL;
- **grouped-agg pandas UDFs** — the UDAF analogue;
- array-returning UDFs consumed by ``explode`` — the UDTF analogue.

Every function here duplicates a native column function (functions/columns)
or a simple SQL expression so tests can difference the UDF path against the
JVM path; real pipelines should prefer the native versions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F, types as T

from direct_spark_sql_spark.hashing import _HEX_CHARS

#: registered names, all prefixed to avoid builtin collisions
UDF_PREFIX = "dss_"


@F.pandas_udf(T.LongType())
def _h64_udf(s: pd.Series) -> pd.Series:
    """Vectorized twin of hashing.h64 (md5-derived 60-bit int)."""
    return s.astype(str).map(
        lambda x: int(hashlib.md5(x.encode()).hexdigest()[:_HEX_CHARS], 16)
    )


@F.pandas_udf(T.LongType())
def _token_count_udf(s: pd.Series) -> pd.Series:
    return s.str.split(" ").map(lambda ts: sum(1 for t in ts if t))


@F.pandas_udf(T.DoubleType())
def _cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """float64 cosine of two array columns (approximate — the exact-decimal
    path is operators.similarity.cosine_dec)."""
    out = np.empty(len(a))
    for i, (x, y) in enumerate(zip(a, b)):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        denom = np.sqrt(x @ x) * np.sqrt(y @ y)
        out[i] = (x @ y) / denom if denom else float("nan")
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def _median_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF analogue): exact median."""
    return float(v.median())


@F.pandas_udf(T.ArrayType(T.StringType()))
def _char_ngrams_udf(s: pd.Series) -> pd.Series:
    """Array-returning UDF (UDTF analogue once exploded): character
    3-grams of the input string."""
    return s.map(lambda x: [x[i : i + 3] for i in range(max(len(x) - 2, 1))])


def _make_tag3_arrow_udf():
    """Arrow-optimized *regular* Python UDF (Spark 4 ``useArrow=True``):
    row-at-a-time author ergonomics, Arrow-batched transfer — the
    migration path for legacy row UDFs that can't be vectorized.  Mirrors
    ``UPPER(SUBSTR(x, 1, 3))`` so tests difference it against the JVM
    expression."""
    return F.udf(
        lambda s: s[:3].upper() if s is not None else None,
        T.StringType(),
        useArrow=True,
    )


def _make_quality_iter_udf():
    """Iterator-form pandas UDF (``Iterator[pd.Series] -> Iterator[pd.Series]``):
    the shape for *expensive per-executor init* — load a model/tokenizer
    ONCE, then stream Arrow batches through it.  That amortization is the
    difference between feasible and not at 100 TB (a per-batch model load
    would dominate).  Here the "model" is a deterministic stopword table;
    the score is the stopword ratio in per-mille, exactly mirroring
    operators/text.py quality scoring so tests difference the two paths.
    """
    @F.pandas_udf(T.LongType())
    def _quality_iter_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        stop = {"the", "a", "of", "and", "to", "in", "is", "it"}  # init once

        def score(text: str) -> int:
            toks = [t for t in text.split(" ") if t]
            if not toks:
                return 0
            return (1000 * sum(1 for t in toks if t in stop)) // len(toks)

        for s in batches:
            yield s.map(score)

    return _quality_iter_udf


class _SplitWordsUDTF:
    """Native Python UDTF (Spark 4): one input row → N output rows with a
    declared table schema — the true analogue of the reference's Hive
    GenericUDTF surface (registered by DirectSessionCatalog, exercised via
    LATERAL in its SQL).  Tokenizes on single spaces, skipping empties, so
    the DuckDB twin is ``list_filter(string_split(text,' '), …)``.

    This is the *extension* surface, not the hot path: each row crosses
    into Python.  Pipelines tokenizing at scale should use the JVM
    explode/split path (operators/text.py) — the conformance test proves
    both produce identical rows."""

    def eval(self, text: str):
        if text is None:
            return
        i = 0
        for w in text.split(" "):
            if w:
                yield w, i, len(w)
                i += 1


def register_udtfs(spark: SparkSession) -> dict[str, str]:
    """Register native Python UDTFs (SQL-callable via LATERAL)."""
    from pyspark.sql.functions import udtf

    cls = udtf(_SplitWordsUDTF, returnType="word string, idx int, n_chars int")
    name = f"{UDF_PREFIX}split_words"
    spark.udtf.register(name, cls)
    return {name: "python udtf"}


def register_udfs(spark: SparkSession) -> dict[str, str]:
    """Register the UDF surface into the session; returns {name: kind}.

    SQL can then call e.g. ``SELECT dss_h64(name) FROM t`` or
    ``SELECT dss_median(value) FROM t GROUP BY k``."""
    reg = {
        "h64": (_h64_udf, "scalar pandas_udf"),
        "token_count": (_token_count_udf, "scalar pandas_udf"),
        "cosine": (_cosine_udf, "scalar pandas_udf"),
        "median": (_median_udaf, "grouped-agg pandas_udf"),
        "char_ngrams": (_char_ngrams_udf, "array-returning pandas_udf"),
        "quality_iter": (_make_quality_iter_udf(), "iterator pandas_udf"),
        "tag3": (_make_tag3_arrow_udf(), "arrow-optimized python udf"),
    }
    out: dict[str, str] = {}
    for name, (fn, kind) in reg.items():
        full = f"{UDF_PREFIX}{name}"
        spark.udf.register(full, fn)
        out[full] = kind
    return out
