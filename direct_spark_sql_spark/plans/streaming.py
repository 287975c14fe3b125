"""Streaming conformance queries.

Each entry runs a Structured Streaming pipeline to completion over the
closed parquet input (Trigger.AvailableNow → memory sink) and returns the
result table, so the driver can diff it against a DuckDB oracle exactly
like a batch query.  This checks the strongest property streaming can
offer on a finite input: **stream/batch equivalence** — the streaming plan
over the whole input equals the batch answer.

The reference has no streaming (SURVEY.md §2.11); these are north-star
extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.plans.conformance import EVENTS_TUMBLING_ORACLE
from direct_spark_sql_spark.plans.conformance_ext import _SLIDING_ORACLE
from direct_spark_sql_spark.streaming import (
    read_events_stream,
    run_available_now,
    run_foreach_batch_upsert,
    stream_click_purchase_join,
    stream_dedup_hourly,
    stream_session_windows,
    stream_sliding_totals,
    stream_static_enrich,
    stream_tumbling_totals,
    stream_user_counts_stateful,
)


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch events_tumbling_window query — same
    oracle, proving stream/batch equivalence on the closed input."""
    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        stream_tumbling_totals(events), "stream_tumbling", "complete"
    )
    return result.orderBy("window_start", "event_type")


def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        stream_session_windows(events, gap="30 minutes"), "stream_sessions", "complete"
    )
    return result.orderBy("user_id", "session_start")


# session_window semantics: an event at ts extends its session to ts+gap,
# sessions merge on overlap (strict <), so the batch-SQL island boundary is
# ``diff >= gap``; session_end = last event + gap.  Diffs compared in exact
# integer microseconds (epoch_us) — double seconds would round off the µs.
SESSION_WINDOW_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, seq
ORDER BY user_id, session_start
"""


def streaming_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState).  Update mode
    emits one snapshot per user per micro-batch; n_events is strictly
    increasing per user, so the lexicographic max struct is the final
    state."""
    events = read_events_stream(spark, sf_dir)
    snapshots = run_available_now(
        stream_user_counts_stateful(events), "stream_user_counts", "update"
    )
    final = snapshots.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return final.select(
        "user_id", F.col("s.n_events").alias("n_events"),
        F.col("s.total_value").alias("total_value"),
    ).orderBy("user_id")


USER_COUNTS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       SUM(ROUND(value * 100)) / 100.0 AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch events_sliding_window query — same
    oracle (each event expands into 2 overlapping 1h/30min windows)."""
    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        stream_sliding_totals(events), "stream_sliding", "complete"
    )
    return result.orderBy("win_start", "event_type")


def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream self-join (click → purchase attribution
    within 1 hour).  Inner join in append mode emits every match on a
    closed input, so the result equals the batch time-range join."""
    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        stream_click_purchase_join(events, horizon="1 hour"),
        "stream_attribution", "append",
    )
    return result.orderBy("click_id", "purchase_id")


STREAM_JOIN_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, c.ts AS click_ts, p.ts AS purchase_ts, p.value AS amount
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY click_id, purchase_id
"""


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over (user, event_type, hour): with a
    test watermark spanning the whole closed input, first-sighting dedup
    equals batch DISTINCT on the key columns."""
    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        stream_dedup_hourly(events), "stream_dedup", "append"
    )
    return result.orderBy("user_id", "event_type", "hour_ts")


STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hour_ts
FROM events ORDER BY user_id, event_type, hour_ts
"""


def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE via foreachBatch: each micro-batch latest-wins
    upserts (user_id -> value, ts) into an accumulated state table — the
    lakehouse streaming-ingest pattern.  On the closed input the final
    state must equal the batch latest-event-per-user answer (the oracle),
    whatever the batch boundaries were."""
    events = read_events_stream(spark, sf_dir)
    seq = F.expr(
        "(unix_micros(ts) - 1704067200000000) * 1024 + pmod(event_id, 1024)"
    )
    state = run_foreach_batch_upsert(
        events, ["user_id"], seq, ["value", "ts"], name="stream_upsert"
    )
    return state.select("user_id", "value", "ts").orderBy("user_id")


FOREACH_BATCH_UPSERT_ORACLE = """
SELECT user_id,
       arg_max(value,
               (epoch_us(ts) - 1704067200000000) * 1024 + event_id % 1024)
         AS value,
       max(ts) AS ts
FROM events GROUP BY user_id ORDER BY user_id
"""


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched per micro-batch with
    the static (batch) customer dimension, broadcast map-side, then
    aggregated per market segment.  On the closed input the result equals
    the batch join+agg (the oracle)."""
    from direct_spark_sql_spark.sources.registry import load_table

    events = read_events_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    # state_partitions=8: the rollup key (c_mktsegment) has 5 values, so
    # the state-store count tracks the bounded key domain instead of the
    # core count (see run_available_now — scale-independent sizing).
    result = run_available_now(
        stream_static_enrich(events, customer),
        "stream_static_enrich",
        "complete",
        state_partitions=8,
    )
    return result.orderBy("c_mktsegment")


STREAM_STATIC_ENRICH_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE)
         AS total_value
FROM events JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup ingest: the documents table split into 3 chunk
    files, streamed with maxFilesPerTrigger=1 so every chunk is its own
    micro-batch, each folded into accumulated per-fingerprint state by
    ``run_foreach_batch_dedup``.  The state merge is commutative (min
    keep-id / sum counts), so the final duplicate groups are arrival-order
    independent and must equal the batch content-fingerprint dedup over
    the whole table — the oracle."""
    from pyspark.sql import types as T

    from direct_spark_sql_spark.hashing import h64
    from direct_spark_sql_spark.operators.text import tokens
    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_foreach_batch_dedup

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = warehouse_path("stream_dedup", dataset_tag(sf_dir))
    hi = d.agg(F.max("doc_id")).collect()[0][0] or 0
    bounds = [0, hi // 3 + 1, 2 * (hi // 3) + 1, hi + 1]
    for i in range(3):
        d.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/chunk{i}")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/chunk*")
    )
    fp = h64(F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " "))
    state = run_foreach_batch_dedup(stream, fp, "doc_id")
    return (
        state.filter(F.col("group_size") > 1)
        .select(
            "dup_key",
            F.col("group_size").cast("long").alias("group_size"),
            F.col("keep_id").cast("long").alias("keep_id"),
        )
        .orderBy("dup_key")
    )


STREAM_INCR_DEDUP_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         CAST('0x' || SUBSTR(MD5(array_to_string(list_sort(list_distinct(
           list_filter(string_split(text, ' '), t -> length(t) > 0))), ' ')), 1, 15)
           AS BIGINT) AS dup_key
  FROM documents
)
SELECT dup_key,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM fp GROUP BY dup_key HAVING COUNT(*) > 1
ORDER BY dup_key
"""


def streaming_lsh_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH index maintenance: documents arrive in 3
    id-ranged micro-batches; each batch's band rows append to the
    accumulated (band_idx, band_hash) index AFTER the batch's near-dup
    candidates are found with one equi-join against that index plus the
    batch-internal self-join (streaming/pipelines.py:
    run_foreach_batch_lsh_ingest) — the materialized incremental band
    table ``incremental_dedup``'s docstring promises, actually
    maintained.  Because batches partition the corpus, every pair is
    discovered exactly once with arrival-independent est values, so the
    accumulated pair set must equal the batch operator's uncapped pairs
    over the whole table — the oracle replays that batch pipeline."""
    from pyspark.sql import types as T

    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_foreach_batch_lsh_ingest

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = warehouse_path("stream_lsh", dataset_tag(sf_dir))
    hi = d.agg(F.max("doc_id")).collect()[0][0] or 0
    bounds = [0, hi // 3 + 1, 2 * (hi // 3) + 1, hi + 1]
    for i in range(3):
        d.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/chunk{i}")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/chunk*")
    )
    pairs = run_foreach_batch_lsh_ingest(stream, "doc_id", min_est_jaccard=0.5)
    return pairs.orderBy("id_a", "id_b")


def _stream_lsh_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _minhash_pairs_ctes

    return f"""
WITH {_minhash_pairs_ctes(cap=None)}
SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b
"""


def _doc_chunk_stream(spark: SparkSession, corpus: DataFrame, root: str) -> DataFrame:
    """Shared scaffolding for the decontam gates: split the (doc_id,
    text) corpus into 3 id-ranged chunk files under ``root`` and return
    a one-file-per-trigger readStream over them — one copy of the
    bounds/write/schema logic for both operating points (review r10)."""
    from pyspark.sql import types as T

    hi = corpus.agg(F.max("doc_id")).collect()[0][0] or 0
    bounds = [0, hi // 3 + 1, 2 * (hi // 3) + 1, hi + 1]
    for i in range(3):
        corpus.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/chunk{i}")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/chunk*")
    )


def streaming_decontam_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming benchmark-decontamination admission gate: the non-bench
    corpus arrives in 3 id-ranged micro-batches; each is contamination-
    scored against the static benchmark slice (the same top-2% h64 slice
    and threshold as dedup_benchmark_decontam) via
    streaming/pipelines.py:run_stream_decontam_gate.  Contamination is a
    per-document property, so the accumulated flagged set must be
    chunking-independent and equal the batch operator — the oracle IS the
    batch decontam SQL."""
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )
    from direct_spark_sql_spark.plans.pipeline import _DECONTAM_THRESHOLD
    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_stream_decontam_gate

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench, corpus = d.filter(is_bench), d.filter(~is_bench)
    root = warehouse_path("stream_decontam", dataset_tag(sf_dir))
    stream = _doc_chunk_stream(spark, corpus, root)
    flagged = run_stream_decontam_gate(
        stream, bench, threshold=_DECONTAM_THRESHOLD
    )
    return flagged.select(
        "doc_id", "n_shingles", "n_hit", "contamination"
    ).orderBy("doc_id")


def _stream_decontam_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _BENCH_DECONTAM_ORACLE

    return _BENCH_DECONTAM_ORACLE


def streaming_decontam_gate_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming admission gate at the PRODUCTION operating point:
    GPT-3-style normalization (lowercase + punctuation-strip) applied to
    both the arriving micro-batches and the static benchmark slice, then
    8-gram any-collision scoring (threshold 0.0) — the online form of
    dedup_benchmark_decontam_8gram_norm, so cased/re-punctuated eval
    copies are caught as crawl shards land.  Normalization is a pure
    map-side column on each side; the cached gram set and per-batch
    broadcast semi-join are unchanged (run_stream_decontam_gate with
    n=DECONTAM_PROD_N).  Accumulated flags must equal the batch
    operator — the oracle IS the batch normalized-decontam SQL."""
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )
    from direct_spark_sql_spark.operators.text import normalize_for_matching
    from direct_spark_sql_spark.plans.pipeline import DECONTAM_PROD_N
    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_stream_decontam_gate

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench).select(
        "doc_id", normalize_for_matching("text").alias("text")
    )
    corpus = d.filter(~is_bench)
    root = warehouse_path("stream_decontam_norm", dataset_tag(sf_dir))
    stream = _doc_chunk_stream(spark, corpus, root).select(
        "doc_id", normalize_for_matching("text").alias("text")
    )
    flagged = run_stream_decontam_gate(
        stream, bench, threshold=0.0, n=DECONTAM_PROD_N
    )
    return flagged.select(
        "doc_id", "n_shingles", "n_hit", "contamination"
    ).orderBy("doc_id")


def _stream_decontam_norm_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import (
        _BENCH_DECONTAM_8GRAM_NORM_ORACLE,
    )

    return _BENCH_DECONTAM_8GRAM_NORM_ORACLE


def streaming_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR admission scoring (Xie et al. 2023, deployed the
    way the paper deploys it): the importance model — the ≤1024-row
    λ(bucket) log-ratio table — is fit OFFLINE once from the corpus and
    the src0 target slice (operators/sampling.py:dsir_lambda_table);
    the corpus then arrives in 3 id-ranged micro-batches and each is
    scored with the cached broadcast λ (streaming/pipelines.py:
    run_stream_dsir_gate).  A document's weight depends only on its own
    features and the fixed λ, so the accumulated scores are chunking-
    independent and must equal the batch operator — the oracle IS the
    batch DSIR per-document SQL."""
    from direct_spark_sql_spark.operators.sampling import dsir_lambda_table
    from direct_spark_sql_spark.plans.analytics import (
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCE,
    )
    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_stream_dsir_gate

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    lam = dsir_lambda_table(
        d.select("doc_id", "text"),
        d.filter(F.col("source") == DSIR_TARGET_SOURCE).select("doc_id", "text"),
        n_buckets=DSIR_BUCKETS,
    )
    root = warehouse_path("stream_dsir", dataset_tag(sf_dir))
    stream = _doc_chunk_stream(spark, d.select("doc_id", "text"), root)
    return run_stream_dsir_gate(stream, lam, n_buckets=DSIR_BUCKETS).orderBy(
        "doc_id"
    )


def _stream_dsir_oracle() -> str:
    from direct_spark_sql_spark.plans.analytics import _dsir_ctes

    return _dsir_ctes() + """
SELECT doc_id, n_feats, logw_units,
       CAST(logw_units AS DOUBLE) / 100000000.0 AS log_weight
FROM w ORDER BY doc_id
"""



def streaming_zonemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest with live data-skipping-index maintenance: events
    split into 3 chunk files arrive as separate micro-batches; each lands
    as its own ts-clustered file while appending exactly its zone-map rows
    to the index (streaming/pipelines.py:run_foreach_batch_zonemap_ingest).
    The final range scan plans off the incrementally-built index
    (sources/zonemap.py:pruned_scan) and must equal the plain batch filter
    over the source — proving the index stayed correct under ingest.
    Ingest is idempotent (marker-guarded) so warm re-runs re-query only."""
    import os

    from direct_spark_sql_spark.sources import zonemap as zm
    from direct_spark_sql_spark.sources.registry import (
        dataset_tag,
        load_table,
        warehouse_path,
    )
    from direct_spark_sql_spark.streaming import run_foreach_batch_zonemap_ingest

    root = warehouse_path("stream_zonemap", dataset_tag(sf_dir))
    table_root = os.path.join(root, "table")
    index_path = os.path.join(root, "index")
    marker = os.path.join(root, "_INGEST_OK")
    if not os.path.exists(marker):
        e = load_table(spark, sf_dir, "events")
        hi = e.agg(F.max("event_id")).collect()[0][0] or 0
        bounds = [0, hi // 3 + 1, 2 * (hi // 3) + 1, hi + 1]
        for i in range(3):
            e.filter(
                (F.col("event_id") >= bounds[i]) & (F.col("event_id") < bounds[i + 1])
            ).coalesce(1).write.mode("overwrite").parquet(f"{root}/chunk{i}")
        stream = (
            spark.readStream.schema(load_table(spark, sf_dir, "events").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/chunk*")
        )
        run_foreach_batch_zonemap_ingest(stream, table_root, index_path, "ts")
        with open(marker, "w") as f:
            f.write("ok\n")

    from direct_spark_sql_spark.plans.scaleops import _ZM_HI_US, _ZM_LO_US

    lo = F.timestamp_micros(F.lit(_ZM_LO_US))
    hi_b = F.timestamp_micros(F.lit(_ZM_HI_US))
    scan = zm.pruned_scan(spark, table_root, index_path, "ts", lo, hi_b)
    return (
        scan.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("user_id").cast("long").alias("sum_users"),
        )
        .orderBy("event_type")
    )


def _stream_zonemap_oracle() -> str:
    from direct_spark_sql_spark.plans.scaleops import _ZM_HI_US, _ZM_LO_US

    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
WHERE epoch_us(ts) >= {_ZM_LO_US} AND epoch_us(ts) <= {_ZM_HI_US}
GROUP BY event_type ORDER BY event_type
"""


def streaming_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-in-stream serving: arriving vectors are IVF-cell-assigned by
    the map-only broadcast-centroid argmax (operators/similarity.py:
    ivf_assign — the same operator the batch path uses, unchanged), then
    counted per cell.  The centroid set is the static 'model' side; the
    stream sees each vector once, no shuffle before the windowless
    aggregation.  Oracle = the batch assignment over the same closed
    input — stream/batch equivalence for the serving path."""
    from pyspark.sql import types as T

    from direct_spark_sql_spark.operators import similarity as sim
    from direct_spark_sql_spark.plans.pipeline import IVF_K
    from direct_spark_sql_spark.sources.registry import load_table

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    emb_path = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    from direct_spark_sql_spark.streaming.pipelines import _hadoop_isdir

    if _hadoop_isdir(spark, emb_path):
        stream = spark.readStream.schema(schema).parquet(emb_path)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(sf_dir)
        )
    centroids = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_K)
    )
    assigned = sim.ivf_assign(stream, centroids)
    agg = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
    )
    result = run_available_now(agg, "stream_ivf_assign", "complete")
    return result.orderBy("cell_id")


def _stream_ivf_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import IVF_K

    return f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS a
  FROM embeddings
),
nrm AS (
  SELECT vec_id, CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nn
  FROM ex GROUP BY vec_id
),
cc AS (
  SELECT x.vec_id, c.vec_id AS cell_id,
         CAST(CAST(ROUND(SUM(x.a * c.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x
  JOIN ex c ON c.i = x.i AND c.vec_id BETWEEN 1 AND {IVF_K}
  GROUP BY x.vec_id, c.vec_id
),
cosc AS (
  SELECT cc.vec_id, cc.cell_id, cc.dot / (sqrt(nx.nn) * sqrt(nc.nn)) AS cos
  FROM cc
  JOIN nrm nx ON nx.vec_id = cc.vec_id
  JOIN nrm nc ON nc.vec_id = cc.cell_id
),
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell_id) AS rn
    FROM cosc
  ) WHERE rn = 1
)
SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
FROM assigned GROUP BY cell_id ORDER BY cell_id
"""


_PYSRC_N = 2000


def streaming_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch read from the custom Python data source
    (sources/pysource.py SimpleDataSourceStreamReader): the offset is the
    row index, so the closed 2000-row range arrives as one deterministic
    batch and the windowed aggregate must equal the batch oracle
    regenerating the same MD5 formula (stream/batch equivalence for a
    programmatic source; offset-resume is pinned in tests/test_sources.py)."""
    from direct_spark_sql_spark.sources import pysource

    pysource.register(spark)
    stream = (
        spark.readStream.format("synthcorpus")
        .option("n", str(_PYSRC_N))
        .option("batch", str(_PYSRC_N))
        .load()
    )
    agg = stream.groupBy((F.col("score") % 8).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )
    result = run_available_now(agg, "stream_pysource", "complete")
    return result.orderBy("bucket")


def _pysrc_oracle() -> str:
    from direct_spark_sql_spark.sources.pysource import synth_corpus_oracle_sql

    return f"""
WITH synth AS ({synth_corpus_oracle_sql(_PYSRC_N)})
SELECT CAST(score % 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM synth GROUP BY bucket ORDER BY bucket
"""


QUERIES = [
    Query("streaming_python_source", streaming_python_source, _pysrc_oracle(),
          ("streaming", "source"),
          doc="micro-batch read from the Spark 4 Python data source "
              "(index offsets, replayable batches), stream==batch oracle"),
    Query("streaming_zonemap_ingest", streaming_zonemap_ingest,
          _stream_zonemap_oracle(), ("streaming", "layout", "scale"),
          doc="foreachBatch ingest appending per-file zone-map rows; "
              "pruned range scan off the live index equals batch filter"),
    Query("streaming_ivf_assign", streaming_ivf_assign, _stream_ivf_oracle(),
          ("streaming", "similarity"),
          doc="model-in-stream serving: broadcast-centroid IVF assignment "
              "on arriving vectors, per-cell counts equal the batch path"),
    Query("streaming_tumbling_window", streaming_tumbling_window,
          EVENTS_TUMBLING_ORACLE, ("streaming", "window"),
          doc="watermarked tumbling agg, stream==batch on closed input"),
    Query("streaming_session_window", streaming_session_window,
          SESSION_WINDOW_ORACLE, ("streaming", "window"),
          doc="built-in session_window with watermark"),
    Query("streaming_user_counts", streaming_user_counts,
          USER_COUNTS_ORACLE, ("streaming", "stateful"),
          doc="applyInPandasWithState running per-user totals"),
    Query("streaming_sliding_window", streaming_sliding_window,
          _SLIDING_ORACLE, ("streaming", "window"),
          doc="watermarked sliding-window agg, stream==batch"),
    Query("streaming_stream_stream_join", streaming_stream_stream_join,
          STREAM_JOIN_ORACLE, ("streaming", "join"),
          doc="watermarked stream-stream time-range join (attribution)"),
    Query("streaming_dedup_watermark", streaming_dedup_watermark,
          STREAM_DEDUP_ORACLE, ("streaming", "dedup"),
          doc="dropDuplicatesWithinWatermark first-sighting dedup"),
    Query("streaming_foreachbatch_upsert", streaming_foreachbatch_upsert,
          FOREACH_BATCH_UPSERT_ORACLE, ("streaming", "merge"),
          doc="foreachBatch latest-wins MERGE into accumulated state"),
    Query("streaming_static_enrich", streaming_static_enrich,
          STREAM_STATIC_ENRICH_ORACLE, ("streaming", "join"), bench=True,
          doc="stream-static broadcast join (dimension enrichment) + agg, "
              "stream==batch on closed input"),
    Query("streaming_incremental_dedup", streaming_incremental_dedup,
          STREAM_INCR_DEDUP_ORACLE, ("streaming", "dedup"),
          doc="foreachBatch dedup ingest: per-batch fingerprint fold into "
              "accumulated state, order-independent, equals batch dedup"),
    Query("streaming_lsh_index_ingest", streaming_lsh_index_ingest,
          _stream_lsh_oracle(), ("streaming", "dedup"),
          doc="foreachBatch MinHash-LSH index maintenance: per-batch band "
              "rows join the accumulated index for cross-batch candidates "
              "then append to it; accumulated pairs equal the batch "
              "operator's uncapped pairs (oracle replay)"),
    Query("streaming_decontam_gate", streaming_decontam_gate,
          _stream_decontam_oracle(), ("streaming", "dedup", "sampling"),
          doc="streaming admission gate: micro-batches contamination-scored "
              "against a static cached benchmark gram set (broadcast "
              "semi-join per batch, no cross-batch state); accumulated "
              "flags equal the batch decontam operator"),
    Query("streaming_decontam_gate_norm", streaming_decontam_gate_norm,
          _stream_decontam_norm_oracle(), ("streaming", "dedup", "sampling"),
          doc="streaming gate at the production operating point: normalized "
              "(lowercase+punct-strip) 8-gram any-collision scoring of each "
              "arriving micro-batch; accumulated flags equal the batch "
              "normalized-decontam operator"),
    Query("streaming_dsir_gate", streaming_dsir_gate,
          _stream_dsir_oracle(), ("streaming", "sampling", "text"),
          doc="streaming DSIR scoring gate: λ table fit offline (pilot "
              "corpus + src0 target), each arriving micro-batch scored via "
              "the cached broadcast λ; accumulated exact-unit weights equal "
              "the batch DSIR operator"),
]
