"""Scale-up dataset synthesis for the bench's scale-probe tier.

``ensure_scaled_dataset`` materializes an N× copy of a driver testdata
directory (TESTDATA.md star schema) by unioning ``factor`` key-shifted
copies of each table — the standard way to turn a correctness-scale
corpus into a throughput-scale one without changing per-row statistics:

- **Key shifts preserve join cardinalities.**  Every copy shifts each
  table's primary key by ``i * (max_key + 1)`` and applies the *same*
  shift to every foreign key referencing it, so copy i's orders join
  copy i's customers and the join fan-outs per key are identical to the
  source.  Dimension tables at fixed TPC-H size (region, nation) are
  copied once, unshifted — exactly how TPC-H itself scales.
- **Document text is perturbed per copy** (every 2nd word gets a
  ``~i`` suffix, copy 0 untouched): byte-identical or near-identical
  cross-copy documents would turn duplicate clusters into
  ``factor``-times-larger cliques and make pair-emitting dedup queries
  scale *quadratically* by construction — which would measure the
  synthetic corpus, not the engine.  Suffixing every 2nd word changes
  every k≥2-word shingle, so cross-copy Jaccard ≈ 0 and candidate pairs
  scale linearly, like a real corpus.
- **Generation is cached**: a ``_SCALED_OK`` marker records (source,
  factor); re-runs are no-ops.

This supports the round-3 verdict's scale-probe: run the headline bench
at 10× rows next to the base tier and assert per-query scaling stays
linear-or-better (plan shapes don't degrade with data size).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.sources.registry import TABLES, load_table

#: table -> (primary key, {fk table: fk column}) — shift plan.
_PK: dict[str, str] = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "",  # no surrogate pk; all shifts are FKs
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

#: fixed-size dimensions: copied once, never shifted (TPC-H scaling rule).
_STATIC = ("region", "nation")


def _max_plus_one(df: DataFrame, col: str) -> int:
    row = df.agg(F.max(F.col(col)).alias("m")).collect()[0]
    return int(row["m"] or 0) + 1


def ensure_scaled_dataset(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> str:
    """Materialize ``factor``× key-shifted copies of ``src_dir`` into
    ``dst_dir`` (idempotent via marker file); returns ``dst_dir``."""
    marker = os.path.join(dst_dir, "_SCALED_OK")
    want = f"{os.path.abspath(src_dir)}\n{factor}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == want:
                return dst_dir
    os.makedirs(dst_dir, exist_ok=True)

    src = {t: load_table(spark, src_dir, t) for t in TABLES}
    step = {
        "cust": _max_plus_one(src["customer"], "c_custkey"),
        "supp": _max_plus_one(src["supplier"], "s_suppkey"),
        "part": _max_plus_one(src["part"], "p_partkey"),
        "ord": _max_plus_one(src["orders"], "o_orderkey"),
        "event": _max_plus_one(src["events"], "event_id"),
        "user": _max_plus_one(src["events"], "user_id"),
        "doc": _max_plus_one(src["documents"], "doc_id"),
        "vec": _max_plus_one(src["embeddings"], "vec_id"),
    }

    shifts: dict[str, dict[str, str]] = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
        "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
        "events": {"event_id": "event", "user_id": "user"},
        "documents": {"doc_id": "doc"},
        "embeddings": {"vec_id": "vec"},
    }

    def copy_of(t: str, i: int) -> DataFrame:
        df = src[t]
        for col, key in shifts.get(t, {}).items():
            df = df.withColumn(col, (F.col(col) + F.lit(i * step[key])).cast("long"))
        if t == "documents" and i > 0:
            # suffix every 2nd word -> every multi-word shingle differs
            # across copies; cross-copy near-dup candidates vanish.
            words = F.split(F.col("text"), " ")
            perturbed = F.array_join(
                F.transform(
                    words,
                    lambda w, j: F.when(
                        (j % 2 == 1) & (F.length(w) > 0),
                        F.concat(w, F.lit(f"~{i}")),
                    ).otherwise(w),
                ),
                " ",
            )
            df = df.withColumn("text", perturbed).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        return df

    for t in TABLES:
        out = os.path.join(dst_dir, f"{t}.parquet")
        if t in _STATIC:
            src[t].write.mode("overwrite").parquet(out)
            continue
        copies = [copy_of(t, i) for i in range(factor)]
        reduce(DataFrame.unionByName, copies).write.mode("overwrite").parquet(out)

    with open(marker, "w") as f:
        f.write(want)
    return dst_dir


#: Boilerplate prefix shared by the hot documents in the skewed variant —
#: long enough that every one of its w-gram shingles is shared by ~10% of
#: the corpus, the "web boilerplate" pathology MinHash-LSH's stop-shingle
#: document-frequency cap exists to absorb.
_BOILERPLATE = (
    "terms of service privacy policy cookie notice all rights reserved "
    "subscribe to our newsletter follow us on social media copyright "
    "disclaimer the information provided on this site is for general "
    "purposes only and does not constitute professional advice"
)

#: Mass-duplicate body shared VERBATIM by ~10% of documents in the skewed
#: variant — unlike the boilerplate *prefix* above (texts still differ),
#: these documents are byte-identical, so one content fingerprint / one
#: MinHash signature / one exact-dup group carries 10% of the corpus: the
#: hot key the keep-min-id / group-size / banded-LSH plans must absorb
#: (VERDICT r7 #1 — every real pretraining corpus has this shape).
_MASS_DUP = (
    "error 404 page not found the page you are looking for might have "
    "been removed had its name changed or is temporarily unavailable "
    "please return to the home page or use the search box below"
)


def ensure_skewed_dataset(
    spark: SparkSession, src_dir: str, dst_dir: str, hot_frac_mod: int = 10
) -> str:
    """Materialize a zipf-hot variant of ``src_dir`` into ``dst_dir``
    (idempotent via marker): same row counts, three engineered hot keys —

    - ``events``: ~1/``hot_frac_mod`` of rows collapse onto one hot
      ``user_id`` (one user ≈ 10% of traffic — the per-key window/groupBy
      straggler shape);
    - ``lineitem``: ~1/``hot_frac_mod`` of rows collapse onto one hot
      ``l_orderkey`` (a single join key carrying 10% of the fact side —
      the AQE-skew-join / salted-join stress);
    - ``documents``: ~1/``hot_frac_mod`` of docs gain a shared
      boilerplate prefix (ubiquitous shingles — the MinHash stop-shingle
      df-cap stress), and a DISJOINT ~1/``hot_frac_mod`` slice becomes
      byte-identical mass duplicates (one hot ``fp_content`` carrying 10%
      of the corpus — the keep-min-id / group-size / band-bucket stress,
      VERDICT r7 #1).

    All other tables are copied unchanged so every registry query runs
    against the directory.  The bench's skew-probe tier runs the
    skew-sensitive queries here and reports wall ratios vs the unskewed
    base tier.
    """
    marker = os.path.join(dst_dir, "_SKEWED_OK")
    # v2: mass-duplicate slice added — the version token forces stale
    # pre-mass-dup datasets to regenerate
    want = f"{os.path.abspath(src_dir)}\n{hot_frac_mod}\nv2-massdup\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == want:
                return dst_dir
    os.makedirs(dst_dir, exist_ok=True)

    for t in TABLES:
        df = load_table(spark, src_dir, t)
        if t == "events":
            hot = df.agg(F.min("user_id")).collect()[0][0]
            df = df.withColumn(
                "user_id",
                F.when(
                    F.pmod("event_id", F.lit(hot_frac_mod)) == 0, F.lit(hot)
                ).otherwise(F.col("user_id")).cast("long"),
            )
        elif t == "lineitem":
            hot = df.agg(F.min("l_orderkey")).collect()[0][0]
            df = df.withColumn(
                "l_orderkey",
                F.when(
                    F.pmod("l_partkey", F.lit(hot_frac_mod)) == 0, F.lit(hot)
                ).otherwise(F.col("l_orderkey")).cast("long"),
            )
        elif t == "documents":
            df = df.withColumn(
                "text",
                F.when(
                    F.pmod("doc_id", F.lit(hot_frac_mod)) == 0,
                    F.concat(F.lit(_BOILERPLATE + " "), F.col("text")),
                )
                .when(
                    F.pmod("doc_id", F.lit(hot_frac_mod)) == 1,
                    F.lit(_MASS_DUP),
                )
                .otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        df.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{t}.parquet"))

    with open(marker, "w") as f:
        f.write(want)
    return dst_dir
