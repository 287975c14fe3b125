"""Custom Python data source (Spark 4 DataSource API): a deterministic,
partitioned synthetic-corpus generator.

Why this exists: load-testing and CI for a 100 TB pipeline need a source
that (a) generates data *inside the executors* — no driver materialization,
no files to stage — and (b) is a pure function of the row index, so any
slice of it can be regenerated bit-identically anywhere (including by the
DuckDB oracle, which replays the same MD5 formulas over
``generate_series``).  The Spark 4 ``pyspark.sql.datasource`` API makes
this a first-class scan: ``partitions()`` exposes the split plan (one
``InputPartition`` per index range, so parallelism scales with the
requested size), and each executor materializes only its range.

Reference parity: the reference engine's only source is the in-memory
temp view (SURVEY.md §1.1); this extends the rebuild's superset source
layer with the programmatic-generator shape (cf. Spark's built-in
``rate`` / ``range`` sources, but schema-rich and engine-portable).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: formula constants, shared with the oracle SQL below.
_TAG_CHARS = 8
_SCORE_CHARS = 4


def _row(i: int) -> tuple:
    """The deterministic row formula — MD5-family like hashing.py, so
    DuckDB replays it exactly (see synth_corpus_oracle_sql)."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    return (i, h[:_TAG_CHARS], int(h[:_SCORE_CHARS], 16))


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))

    def partitions(self):
        if self.n <= 0:  # empty source: one no-op split (range step 0 guard)
            return [InputPartition((0, 0))]
        per = -(-self.n // self.parts)  # ceil: parts of equal index range
        return [
            InputPartition((lo, min(lo + per, self.n)))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _row(i)


class SynthCorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch face of the same generator: the offset is just the next
    row index, so batches are deterministic, replayable slices —
    ``readBetweenOffsets`` regenerates any committed batch bit-identically,
    which is exactly the contract exactly-once recovery needs."""

    def __init__(self, options):
        self.batch = int(options.get("batch", 100))
        self.max_rows = int(options.get("n", 1000))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        hi = min(i + self.batch, self.max_rows)
        return iter([_row(j) for j in range(i, hi)]), {"i": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(j) for j in range(start["i"], end["i"])])


class SynthCorpusSource(DataSource):
    """``spark.read.format("synthcorpus").option("n", N).load()`` — batch;
    ``spark.readStream.format("synthcorpus")`` — micro-batch stream."""

    @classmethod
    def name(cls):
        return "synthcorpus"

    def schema(self):
        return "doc_id bigint, tag string, score int"

    def reader(self, schema):
        return SynthCorpusReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthCorpusStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SynthCorpusSource)


def synth_corpus_oracle_sql(n: int) -> str:
    """DuckDB SQL regenerating the identical table from generate_series."""
    return f"""
SELECT CAST(i AS BIGINT) AS doc_id,
       SUBSTR(MD5(CAST(i AS VARCHAR)), 1, {_TAG_CHARS}) AS tag,
       CAST(CAST('0x' || SUBSTR(MD5(CAST(i AS VARCHAR)), 1, {_SCORE_CHARS}) AS BIGINT) AS INT) AS score
FROM generate_series(0, {n - 1}) AS t(i)
"""
