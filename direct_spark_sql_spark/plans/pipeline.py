"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal — the north-star operator surface (SURVEY.md §7.2 item 6),
each bound to the driver's `documents` / `embeddings` tables with a DuckDB
oracle that replays the *identical* deterministic pipeline (same MD5-family
hashes, same decimal arithmetic), so even the probabilistic operators
(MinHash-LSH, SimHash, SRP-LSH) are checked bit-exactly.

The oracle SQL strings are generated from the same constants the Spark
operators use (hash coefficients, band layout, Rademacher planes) — one
source of truth in hashing.py / the operator modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.hashing import MERSENNE_P, h64, h64_sql
from direct_spark_sql_spark.operators import dedup as dd
from direct_spark_sql_spark.operators import multimodal as mm
from direct_spark_sql_spark.operators import similarity as sim
from direct_spark_sql_spark.operators import text as tx
from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Shared DuckDB fragments (twins of operators/text.py tokenization)
# ---------------------------------------------------------------------------

TOKS_SQL = "list_filter(string_split(text, ' '), t -> length(t) > 0)"


def _shingles_sql(n: int) -> str:
    """DuckDB twin of operators/dedup.py:shingles at width ``n``: distinct
    word n-grams; documents shorter than n tokens contribute their full
    token span as a single shingle (the slice clamps, and
    ``greatest(..., 1)`` keeps one window)."""
    return (
        "list_distinct(list_transform("
        f"generate_series(1, greatest(len(toks) - {n - 1}, 1)), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' ')))"
    )


#: the default SHINGLE_N = 3 width used by the dedup family
SHINGLES_SQL = _shingles_sql(3)

#: DuckDB twin of operators/text.py:normalize_for_matching — ASCII
#: case-fold by translate (codepoint-exact in both engines, unlike
#: lower()'s locale-dependent Unicode special cases) and every codepoint
#: outside [a-z0-9 ] replaced by a space ('g' = all occurrences, matching
#: Spark's replace-all default).
def _norm_sql(col: str) -> str:
    """DuckDB twin of operators/text.py:normalize_for_matching applied to
    an arbitrary column expression (see NORM_TEXT_SQL's rationale)."""
    return (
        f"regexp_replace(translate({col}, "
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
        "'[^a-z0-9 ]', ' ', 'g')"
    )


NORM_TEXT_SQL = _norm_sql("text")

P = MERSENNE_P


def _lexicon_sql(words: tuple[str, ...]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = tx.tokens("text")
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        tx.regex_token_count("text").alias("n_regex_tokens"),
    ).orderBy("doc_id")


TEXT_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
         AS n_regex_tokens
FROM (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents)
WHERE doc_id < 100 ORDER BY doc_id
"""


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    return tx.quality_features(d).drop("text").orderBy("doc_id")


_STOP_SQL = _lexicon_sql(tx.STOPWORDS)
TEXT_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents WHERE doc_id < 200),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_len,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS BIGINT) AS n_stop
  FROM t
)
SELECT doc_id, n_tokens, n_unique_tokens,
       CAST(n_unique_tokens AS DOUBLE) / n_tokens AS type_token_ratio,
       CAST(total_len AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       (CAST(n_unique_tokens AS DOUBLE) / n_tokens) * 0.5
         + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.2
         + LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
FROM f ORDER BY doc_id
"""


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.predicted_language("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def _lang_id_oracle() -> str:
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({_lexicon_sql(lex)}, t))) AS BIGINT) AS hit_{lang}"
        for lang, lex in tx.LANG_LEXICONS.items()
    )
    langs_sorted = sorted(tx.LANG_LEXICONS)
    best = "GREATEST(" + ", ".join(f"hit_{lang}" for lang in langs_sorted) + ")"
    case = " ".join(f"WHEN hit_{lang} = best THEN '{lang}'" for lang in langs_sorted)
    return f"""
WITH t AS (SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents),
h AS (SELECT doc_id, lang,
         {hit_cols}
      FROM t),
p AS (SELECT lang, {best} AS best,
             CASE WHEN {best} = 0 THEN 'und' {case} END AS predicted_lang
      FROM h)
SELECT lang, CASE WHEN best = 0 THEN 'und' ELSE predicted_lang END AS predicted_lang,
       COUNT(*) AS n_docs
FROM p GROUP BY 1, 2 ORDER BY lang, predicted_lang
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    return tx.fingerprint(d).drop("text").orderBy("doc_id")


TEXT_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents WHERE doc_id < 100)
SELECT doc_id,
       md5(text) AS fp_md5,
       {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fp_content,
       CAST((SELECT COALESCE(SUM({h64_sql('u.tok')} % {P}), 0) % {P}
        FROM unnest(toks) AS u(tok)) AS BIGINT) AS fp_rolling
FROM t ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the order/multiplicity-insensitive content fingerprint
    (catches token-reshuffled copies, which the driver corpus contains)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = tx.fingerprint(d)
    return dd.exact_duplicate_groups(fp, "fp_content", "doc_id").orderBy("dup_key")


DEDUP_EXACT_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
fp AS (SELECT doc_id,
        {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fp_content
       FROM t)
SELECT fp_content AS dup_key,
       COUNT(*) AS group_size,
       MIN(doc_id) AS keep_id,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS member_ids
FROM fp GROUP BY fp_content HAVING COUNT(*) > 1
ORDER BY dup_key
"""


def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-overlap matrix on the content fingerprint:
    which source pairs share identical (token-reshuffled-insensitive)
    documents, and how many docs each side contributes — the crawl-
    provenance readout for deciding which ingest mirrors which
    (operators/dedup.py:cross_source_duplication; fan-out bounded at S²
    per fingerprint, never by group size)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    fp = tx.fingerprint(d)
    return dd.cross_source_duplication(fp, "fp_content", "source", "doc_id")


_CROSS_SOURCE_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
fp AS (SELECT doc_id, source,
        {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fp_content
       FROM t),
ps AS (SELECT fp_content AS dup_key, source AS src,
              CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM fp GROUP BY 1, 2)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_groups,
       CAST(SUM(a.n_docs) AS BIGINT) AS n_docs_a,
       CAST(SUM(b.n_docs) AS BIGINT) AS n_docs_b
FROM ps a JOIN ps b ON a.dup_key = b.dup_key AND a.src < b.src
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.ngram_jaccard_pairs(d, threshold=0.3, max_shingle_df=1000).orderBy(
        "id_a", "id_b"
    )


#: Shared CTE block (t→sh→sizes→freq→blocked→inter) for set-overlap
#: dedup oracles — the SQL twin of operators/dedup.py:
#: _blocked_shingle_overlap, used by the Jaccard and containment oracles.
# Every multiply-referenced CTE is MATERIALIZED (r13): DuckDB 1.x inlines
# plain CTEs once PER REFERENCE, so `sh` (the full shingle unnest) was
# recomputed ~5x — and `blocked` self-joined — with all copies' hash
# tables in flight at once; at the x10 tier that spilled tens of GB of
# temp before the sweep's resource fence killed it.  Purely physical:
# results are identical, the pipeline just runs each stage once.
SHINGLE_OVERLAP_CTES = f"""
WITH t AS MATERIALIZED (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS s FROM t),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
freq AS MATERIALIZED (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
blocked AS MATERIALIZED (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s) WHERE df <= 1000),
inter AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM blocked a JOIN blocked b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

def _ngram_pairs_sql(threshold: float, with_jaccard: bool = True) -> str:
    """Jaccard-thresholded pair SELECT over SHINGLE_OVERLAP_CTES — one
    source of truth for the pairs oracle and the minhash-quality ground
    truth (a formula fix must not have to chase copies)."""
    jac = "CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common)"
    cols = f",\n       {jac} AS jaccard" if with_jaccard else ""
    return f"""{SHINGLE_OVERLAP_CTES}
SELECT id_a, id_b{cols}
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE {jac} >= {threshold}
ORDER BY id_a, id_b
"""


DEDUP_NGRAM_ORACLE = _ngram_pairs_sql(0.3)


def dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split-leakage audit: the hash split is leak-proof at the
    ROW level by construction, but near-duplicate *pairs* can still
    straddle the boundary — the contamination that inflates eval scores.
    Composes the exact n-gram Jaccard pairs (>= 0.3, stop-shingle-capped)
    with the standard 10% hash split and reports pair counts + worst
    similarity per (split_a, split_b) cell; the cross cells ARE the leak.

    100 TB shape: identical to dedup_ngram_jaccard (blocked equi-join) —
    the split label is a pure per-row hash expression, no extra join."""
    from direct_spark_sql_spark.operators.sampling import sample_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.ngram_jaccard_pairs(d, threshold=0.3, max_shingle_df=1000)

    def split(col: str):
        return F.when(sample_bucket(F.col(col)) < 1000, "eval").otherwise("train")

    return (
        pairs.withColumn("split_a", split("id_a"))
        .withColumn("split_b", split("id_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("split_a", "split_b")
    )


def _split_case_sql(col: str) -> str:
    return (
        f"CASE WHEN {h64_sql(col)} % 10000 < 1000 THEN 'eval' ELSE 'train' END"
    )


#: nested-CTE reuse of the exact pairs oracle — one source of truth
SPLIT_LEAKAGE_ORACLE = f"""
WITH pairs AS ({_ngram_pairs_sql(0.3)})
SELECT {_split_case_sql('id_a')} AS split_a,
       {_split_case_sql('id_b')} AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MAX(jaccard) AS max_jaccard
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.minhash_near_duplicates(d, min_est_jaccard=0.5).orderBy("id_a", "id_b")


def corpus_dup_aware_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-count-aware downsampling — the pretraining-corpus policy
    of keeping duplicated content at roughly UNIT total weight instead of
    either hard-dropping copies (corpus_curation's keep-min-id) or
    letting a 10,000-copy boilerplate dominate the token budget: each
    document is kept with probability ~1/group_size via its
    deterministic hash bucket (``h64(doc_id) % 10000 < 10000 //
    group_size``), so every member of a duplicate group has the same
    survival chance, the expected surviving copies per group is ~1, and
    membership is replayable in any engine and stable under
    repartitioning (no rng).  Groups come from the
    order/multiplicity-insensitive content fingerprint (the corpus'
    duplicates are token-reshuffled copies).  Shape: one fingerprint
    projection, a groupBy count over the fp key joined back, one filter —
    no collect.  The count is a groupBy + join-back rather than a window
    count over fp_content: partial aggregation collapses a mass-duplicate
    hot fingerprint map-side, and AQE's skew-join split can spread the
    hot probe key of the join-back, where a window would serialize the
    whole hot key into one task (VERDICT r7 #1)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = tx.fingerprint(d).select("doc_id", "fp_content")
    sizes = fp.groupBy("fp_content").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    ).select(F.col("fp_content").alias("__k"), "group_size")
    g = fp.join(sizes, F.col("fp_content").eqNullSafe(F.col("__k"))).drop("__k")
    from direct_spark_sql_spark.operators.sampling import (
        SAMPLE_BUCKETS,
        sample_bucket,
    )

    keep = sample_bucket(F.col("doc_id")) < (
        F.lit(SAMPLE_BUCKETS) / F.col("group_size")
    ).cast("long")
    return g.filter(keep).select("doc_id", "group_size").orderBy("doc_id")


_DUP_AWARE_SAMPLE_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
fp AS (SELECT doc_id,
       {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fpc
       FROM t),
g AS (SELECT doc_id, CAST(COUNT(*) OVER (PARTITION BY fpc) AS BIGINT) AS group_size
      FROM fp)
SELECT doc_id, group_size FROM g
WHERE {h64_sql('doc_id')} % 10000 < 10000 // group_size
ORDER BY doc_id
"""


def dedup_banding_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding trade measured on live data: precision/recall of
    BOTH banding configurations — precision-tuned b=4/r=4 (s-curve
    midpoint ~0.71) and recall-tuned b=8/r=2 (~0.35) — against the same
    exact n-gram-Jaccard ground truth at the same 0.5 threshold.  The
    two rows quantify exactly what the NUM_PERM configuration note in
    operators/dedup.py promises: re-banding the SAME 16 permutations
    buys recall at the cost of gray-zone candidates.  One checkpointed
    shingle table feeds all three pair sets (the explode+distinct is the
    dominant scan); the oracle recomputes every set and the confusion
    counts."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = dd.shingle_table(d).localCheckpoint()
    truth = dd.ngram_jaccard_pairs(
        d, threshold=0.5, max_shingle_df=1000, shingles_df=sh
    ).select("id_a", "id_b", F.lit(True).alias("in_truth")).localCheckpoint()
    outs = []
    for name, (b, r) in (("b4r4", (4, 4)), ("b8r2", (8, 2))):
        pred = dd.minhash_near_duplicates(
            d, min_est_jaccard=0.5, shingles_df=sh, bands=b, rows=r
        ).select("id_a", "id_b", F.lit(True).alias("in_pred"))
        merged = pred.join(truth, ["id_a", "id_b"], "full_outer").select(
            F.coalesce("in_pred", F.lit(False)).alias("in_pred"),
            F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
        )
        n_pred = F.sum(F.when(F.col("in_pred"), 1).otherwise(0)).cast("long")
        n_truth = F.sum(F.when(F.col("in_truth"), 1).otherwise(0)).cast("long")
        tp = F.sum(
            F.when(F.col("in_pred") & F.col("in_truth"), 1).otherwise(0)
        ).cast("long")
        outs.append(
            merged.agg(
                n_pred.alias("n_pred"), n_truth.alias("n_truth"), tp.alias("tp")
            ).select(
                F.lit(name).alias("banding"),
                "n_pred",
                "n_truth",
                "tp",
                F.when(
                    F.col("n_pred") > 0,
                    F.col("tp").cast("double") / F.col("n_pred"),
                ).alias("precision"),
                F.when(
                    F.col("n_truth") > 0,
                    F.col("tp").cast("double") / F.col("n_truth"),
                ).alias("recall"),
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("banding")


def _banding_tradeoff_oracle() -> str:
    truth_sql = _ngram_pairs_sql(0.5, with_jaccard=False)
    rows = []
    for name, (b, r) in (("b4r4", (4, 4)), ("b8r2", (8, 2))):
        pred_sql = (
            f"WITH {_minhash_pairs_ctes(bands=b, rows=r)} "
            "SELECT id_a, id_b FROM pairs"
        )
        rows.append(f"""
SELECT '{name}' AS banding,
  CAST(SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
  CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
  CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CASE WHEN SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) > 0
       THEN CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT)
       END AS precision,
  CASE WHEN SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) > 0
       THEN CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT)
       END AS recall
FROM (
  SELECT (p.id_a IS NOT NULL) AS in_pred, (t.id_a IS NOT NULL) AS in_truth
  FROM ({pred_sql}) p
  FULL JOIN ({truth_sql}) t ON p.id_a = t.id_a AND p.id_b = t.id_b
)""")
    return " UNION ALL ".join(rows) + " ORDER BY banding"


def dedup_band_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the MAX_BAND_BUCKET skew guard: how much of the
    corpus' band table the cap actually routes out of the pair join —
    the number a dedup deployment alarms on (a sudden jump means a new
    boilerplate flood upstream).  One band-table scan + one bounded agg;
    the docs-affected count joins the over-cap bucket list back (tiny,
    broadcastable by construction).  Zero capped buckets on a healthy
    corpus; the bench's zipf-skewed variant exercises the nonzero path."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.band_cap_audit(d)


def _band_cap_audit_oracle() -> str:
    return f"""
WITH {_minhash_pairs_ctes(cap=None)},
bs AS (SELECT band_idx, band_hash, CAST(COUNT(*) AS BIGINT) AS n
       FROM bands GROUP BY band_idx, band_hash),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(CASE WHEN n > {dd.MAX_BAND_BUCKET} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_buckets_capped,
         CAST(SUM(CASE WHEN n > {dd.MAX_BAND_BUCKET} THEN n ELSE 0 END) AS BIGINT)
           AS n_band_rows_dropped,
         CAST(MAX(n) AS BIGINT) AS max_bucket_size
  FROM bs
),
aff AS (
  SELECT CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_docs_affected
  FROM bands b
  JOIN bs ON bs.band_idx = b.band_idx AND bs.band_hash = b.band_hash
  WHERE bs.n > {dd.MAX_BAND_BUCKET}
)
SELECT n_buckets, n_buckets_capped, n_band_rows_dropped, max_bucket_size,
       n_docs_affected
FROM stats, aff
"""


def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-tuned LSH banding: the SAME 16 permutations re-banded as
    b=8 / r=2 (s-curve midpoint ~0.35 instead of ~0.71 — the
    configuration the NUM_PERM note in operators/dedup.py documents for
    serving a 0.5 threshold with high recall).  Candidate generation
    costs a 2x band table and more gray-zone candidates to verify; the
    est_jaccard filter and the MAX_BAND_BUCKET skew cap are identical,
    so diffing this result against dedup_minhash_lsh measures exactly
    the banding trade on live data."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.minhash_near_duplicates(
        d, min_est_jaccard=0.5, bands=8, rows=2
    ).orderBy("id_a", "id_b")


def _minhash_recall_oracle() -> str:
    return f"""
WITH {_minhash_pairs_ctes(bands=8, rows=2)}
SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b
"""


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot dedup: documents with doc_id % 4 == 0 play the
    NEW batch, the rest the accumulated corpus; each new doc is classified
    exact_corpus / exact_batch / near_corpus / kept.  The corpus never
    self-joins — the recurring-ingest shape at scale.  The exact stage
    uses the order/multiplicity-insensitive content fingerprint (the
    driver corpus's duplicates are token-reshuffled copies, not
    byte-identical ones)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new_df = d.filter(F.col("doc_id") % 4 == 0)
    corpus_df = d.filter(F.col("doc_id") % 4 != 0)
    content_fp = dd.h64(
        F.array_join(F.array_sort(F.array_distinct(tx.tokens("text"))), " ")
    )
    return dd.incremental_dedup(
        new_df, corpus_df, min_est_jaccard=0.5, fingerprint=content_fp
    ).orderBy("doc_id")


def _incremental_dedup_oracle() -> str:
    sig_cols = ",\n        ".join(
        f"MIN(({a} * h + {b}) % {P}) AS m{i}" for i, (a, b) in enumerate(dd.COEFFS)
    )
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band_idx, {h} AS band_hash FROM sig".format(
            b=b,
            h=h64_sql(
                "concat_ws(',', "
                + ", ".join(f"m{b * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS))
                + ")"
            ),
        )
        for b in range(dd.LSH_BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(dd.NUM_PERM)
    )
    return f"""
WITH fpt AS (
  SELECT doc_id,
         {h64_sql("array_to_string(list_sort(list_distinct(" + TOKS_SQL + ")), ' ')")} AS fp
  FROM documents
),
fpn AS (SELECT doc_id, fp FROM fpt WHERE doc_id % 4 = 0),
fpc AS (SELECT DISTINCT fp FROM fpt WHERE doc_id % 4 <> 0),
exact_corpus AS (
  SELECT doc_id FROM fpn WHERE fp IN (SELECT fp FROM fpc)
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM fpn WHERE fp NOT IN (SELECT fp FROM fpc)
),
exact_batch AS (SELECT doc_id FROM ranked WHERE rn > 1),
surv AS (SELECT doc_id FROM ranked WHERE rn = 1),
t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS s FROM t),
h AS (SELECT doc_id, {h64_sql('s')} % {P} AS h FROM sh),
sig AS (SELECT doc_id,
        {sig_cols}
        FROM h GROUP BY doc_id),
bands AS ({band_selects}),
near AS (
  SELECT DISTINCT a.doc_id
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  JOIN sig sa ON sa.doc_id = a.doc_id
  JOIN sig sb ON sb.doc_id = b.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM surv)
    AND b.doc_id % 4 <> 0
    AND CAST({agree} AS DOUBLE) / {float(dd.NUM_PERM)} >= 0.5
),
labeled AS (
  SELECT doc_id, 'exact_corpus' AS status FROM exact_corpus
  UNION ALL
  SELECT doc_id, 'exact_batch' AS status FROM exact_batch
  UNION ALL
  SELECT doc_id, 'near_corpus' AS status FROM near
  UNION ALL
  SELECT doc_id, 'kept' AS status FROM surv
  WHERE doc_id NOT IN (SELECT doc_id FROM near)
)
SELECT doc_id, status FROM labeled ORDER BY doc_id
"""


def dedup_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall audit of MinHash-LSH against exact n-gram Jaccard
    ground truth at the same 0.5 threshold — the approximation-quality
    measurement a dedup deployment monitors (the sibling of
    embedding_ivf_recall for the text side).  Both pair sets come from the
    engine's own operators, fed from ONE checkpointed shingle table (the
    explode+distinct is the dominant scan; per-method recomputation would
    double the audit's cost); the oracle recomputes both and the confusion
    counts, so the precision/recall numbers are differential-checked."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = dd.shingle_table(d).localCheckpoint()
    pred = dd.minhash_near_duplicates(
        d, min_est_jaccard=0.5, shingles_df=sh
    ).select("id_a", "id_b", F.lit(True).alias("in_pred"))
    truth = dd.ngram_jaccard_pairs(
        d, threshold=0.5, max_shingle_df=1000, shingles_df=sh
    ).select("id_a", "id_b", F.lit(True).alias("in_truth"))
    merged = pred.join(truth, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("in_pred", F.lit(False)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
    )
    n_pred = F.sum(F.when(F.col("in_pred"), 1).otherwise(0)).cast("long")
    n_truth = F.sum(F.when(F.col("in_truth"), 1).otherwise(0)).cast("long")
    tp = F.sum(F.when(F.col("in_pred") & F.col("in_truth"), 1).otherwise(0)).cast("long")
    return merged.agg(
        n_pred.alias("n_pred"), n_truth.alias("n_truth"), tp.alias("tp")
    ).select(
        "n_pred", "n_truth", "tp",
        F.when(F.col("n_pred") > 0,
               F.col("tp").cast("double") / F.col("n_pred")).alias("precision"),
        F.when(F.col("n_truth") > 0,
               F.col("tp").cast("double") / F.col("n_truth")).alias("recall"),
    )


def _minhash_quality_oracle() -> str:
    truth_sql = _ngram_pairs_sql(0.5, with_jaccard=False)
    return f"""
WITH merged AS (
  SELECT (p.id_a IS NOT NULL) AS in_pred, (t.id_a IS NOT NULL) AS in_truth
  FROM (SELECT id_a, id_b FROM ({_minhash_oracle()}) x) p
  FULL JOIN (SELECT id_a, id_b FROM ({truth_sql}) y) t
    ON p.id_a = t.id_a AND p.id_b = t.id_b
)
SELECT
  CAST(SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
  CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
  CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CASE WHEN SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) > 0
       THEN CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT)
       END AS precision,
  CASE WHEN SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) > 0
       THEN CAST(SUM(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT)
       END AS recall
FROM merged
"""


def _minhash_pairs_ctes(
    bands: int = dd.LSH_BANDS,
    rows: int = dd.LSH_ROWS,
    min_est: float = 0.5,
    cap: int | None = dd.MAX_BAND_BUCKET,
) -> str:
    """CTE block ending in ``pairs`` = the minhash near-dup pairs at
    est_jaccard >= ``min_est`` under a b=``bands`` / r=``rows`` banding
    of the same NUM_PERM permutations (shared by the pairs oracle, the
    duplicate-cluster oracle, and the recall-banding variant).  Mirrors
    the engine's MAX_BAND_BUCKET skew guard (operators/dedup.py):
    over-cap band buckets are excluded from candidate generation in BOTH
    engines, one interpolated constant.  ``cap=None`` replays the
    uncapped pipeline (the streaming ingest contract — see
    run_foreach_batch_lsh_ingest)."""
    sig_cols = ",\n        ".join(
        f"MIN(({a} * h + {b}) % {P}) AS m{i}" for i, (a, b) in enumerate(dd.COEFFS)
    )
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band_idx, {h} AS band_hash FROM sig".format(
            b=b,
            h=h64_sql(
                "concat_ws(',', "
                + ", ".join(f"m{b * rows + r}" for r in range(rows))
                + ")"
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(dd.NUM_PERM)
    )
    # MATERIALIZED throughout (r13): `sig` alone is referenced ~18x once
    # DuckDB inlines the band/cand/pairs chain (4 band branches, the cap
    # join, the self-join, two pairs joins), and each inlined copy reruns
    # the full shingle unnest + 16-way MIN aggregation — at the x10 tier
    # those concurrent hash tables spilled past a 40 GB temp fence.
    # Physical-only change: each stage now runs exactly once.
    return f"""t AS MATERIALIZED (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS s FROM t),
h AS MATERIALIZED (SELECT doc_id, {h64_sql('s')} % {P} AS h FROM sh),
sig AS MATERIALIZED (SELECT doc_id,
        {sig_cols}
        FROM h GROUP BY doc_id),
bands0 AS MATERIALIZED ({band_selects}),
bok AS MATERIALIZED (SELECT band_idx, band_hash FROM bands0
        GROUP BY band_idx, band_hash
        HAVING COUNT(*) <= {cap if cap is not None else "COUNT(*)"}),
bands AS MATERIALIZED (SELECT b.* FROM bands0 b JOIN bok USING (band_idx, band_hash)),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b, CAST({agree} AS DOUBLE) / {float(dd.NUM_PERM)} AS est_jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b
  WHERE CAST({agree} AS DOUBLE) / {float(dd.NUM_PERM)} >= {float(min_est)}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_pairs_ctes()}
SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.simhash_near_duplicates(d, max_hamming=3).orderBy("id_a", "id_b")


def _simhash_oracle() -> str:
    bit_sums = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN w ELSE -w END) AS s{j}"
        for j in range(dd.SIMHASH_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(dd.SIMHASH_BITS)
    )
    mask = (1 << dd.SIMHASH_BAND_BITS) - 1
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, "
        f"(simhash >> {b * dd.SIMHASH_BAND_BITS}) & {mask} AS band_val FROM sig"
        for b in range(dd.SIMHASH_BANDS)
    )
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
wt AS (SELECT doc_id, tok, COUNT(*) AS w FROM tok GROUP BY doc_id, tok),
hh AS (SELECT doc_id, w, {h64_sql('tok')} AS h FROM wt),
sums AS (SELECT doc_id,
        {bit_sums}
        FROM hh GROUP BY doc_id),
sig AS (SELECT doc_id, ({fingerprint}) AS simhash FROM sums),
bt AS ({band_selects})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM bt a JOIN bt b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def dedup_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate *clusters*: connected components over the MinHash-LSH
    pair graph (min-label propagation, operators/graph.py), one row per
    duplicate group with its canonical min id."""
    from direct_spark_sql_spark.operators.graph import duplicate_groups

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d, min_est_jaccard=0.5)
    return duplicate_groups(pairs).orderBy("component")


def _cc_min_label_ctes(levels: int = 16) -> str:
    """Connected components as a FIXED-DEPTH hash-to-min ladder over an
    in-scope ``edges(s, d)`` CTE (both directions) — the scale-capable
    oracle twin of operators/graph.py:connected_components, yielding
    ``comp(node, component)`` with component = min node id.

    Replaces the old ``reach`` transitive-closure CTE (r13): reach
    materializes Σ|C|² rows — every node × everything it can reach — and
    at the x10 tier the duplicate cliques made DuckDB spill ~60 GB of
    temp before the resource fence killed it.  Each ladder level here is
    one |V|+|E| pass: a node's next label is the min of its own label,
    its label's label (pointer shortcutting) and its neighbors' labels
    (propagation) — Hash-to-Min (Rastogi et al., ICDE 2013) converges in
    O(log |C|) rounds with shortcutting, so 16 levels cover any component
    a real pair graph produces.  Every level is MATERIALIZED: DuckDB 1.x
    inlines plain CTEs per reference, and three references per level
    would re-expand the plan 3^levels times.  If the ladder has NOT
    converged (some edge still joins two labels), ``comp`` emits a
    sentinel (-1, -1) row — a LOUD differential mismatch instead of
    silently wrong labels."""
    parts = [
        "m0 AS MATERIALIZED (SELECT s AS node, LEAST(s, MIN(d)) AS label"
        " FROM edges GROUP BY s)"
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"m{k} AS MATERIALIZED (\n"
            f"  SELECT a.node, MIN(LEAST(a.label, COALESCE(p.label, a.label),\n"
            f"                           COALESCE(nb.label, a.label))) AS label\n"
            f"  FROM m{k - 1} a\n"
            f"  LEFT JOIN m{k - 1} p ON a.label = p.node\n"
            f"  LEFT JOIN edges e ON a.node = e.s\n"
            f"  LEFT JOIN m{k - 1} nb ON e.d = nb.node\n"
            f"  GROUP BY a.node)"
        )
    parts.append(
        f"comp AS (\n"
        f"  SELECT node, label AS component FROM m{levels}\n"
        f"  UNION ALL\n"
        f"  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) WHERE EXISTS (\n"
        f"    SELECT 1 FROM edges e\n"
        f"    JOIN m{levels} x ON x.node = e.s\n"
        f"    JOIN m{levels} y ON y.node = e.d\n"
        f"    WHERE x.label <> y.label))"
    )
    return ",\n".join(parts)


def _dup_groups_oracle() -> str:
    """Min-label connected components over the same minhash pairs."""
    return f"""
WITH {_minhash_pairs_ctes()},
edges AS MATERIALIZED (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
{_cc_min_label_ctes()}
SELECT component, COUNT(*) AS group_size,
       string_agg(CAST(node AS VARCHAR), ',' ORDER BY CAST(node AS VARCHAR)) AS member_ids
FROM comp GROUP BY component ORDER BY component
"""


def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate-safe train/val/test assignment (90/5/5): every
    document's split is drawn from its MinHash-LSH duplicate CLUSTER's
    canonical id, so near-copies never straddle an eval boundary — the
    prevention counterpart of dedup_split_leakage's measurement.  See
    operators/graph.py:cluster_safe_split for the 100 TB shape (sparse
    pair graph -> bounded min-label CC -> one id equi-join + map-side
    hash; the corpus text never shuffles)."""
    from direct_spark_sql_spark.operators.graph import cluster_safe_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d, min_est_jaccard=0.5)
    return cluster_safe_split(
        d.select("doc_id"), pairs, train_pct=90, val_pct=5
    ).orderBy("doc_id")


def split_cluster_safe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split's acceptance report: per-split document and cluster
    counts PLUS the leakage proof — the number of near-dup pairs whose
    endpoints land in different splits, zero by construction (each pair
    shares a component, components draw one split).  A per-document hash
    split fails exactly this column."""
    from direct_spark_sql_spark.operators.graph import cluster_safe_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d, min_est_jaccard=0.5)
    asg = cluster_safe_split(d.select("doc_id"), pairs, train_pct=90, val_pct=5)
    a = asg.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = asg.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    leaks = (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_pairs_total"))
    )
    return (
        asg.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_components"),
        )
        .crossJoin(F.broadcast(leaks))
        .orderBy("split")
    )


def _split_cluster_ctes() -> str:
    """Min-label connected components over the minhash pairs (the
    dup-groups oracle's hash-to-min ladder) + the component-hash split
    draw."""
    comp_expr = "CAST(COALESCE(c.component, d.doc_id) AS BIGINT)"
    bucket = f"{h64_sql(comp_expr)} % 100"
    return f"""WITH {_minhash_pairs_ctes()},
edges AS MATERIALIZED (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
{_cc_min_label_ctes()},
asg AS (
  SELECT d.doc_id,
         {comp_expr} AS component,
         CASE WHEN {bucket} < 90 THEN 'train'
              WHEN {bucket} < 95 THEN 'validation'
              ELSE 'test' END AS split
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)"""


SPLIT_CLUSTER_SAFE_ORACLE = _split_cluster_ctes() + """
SELECT doc_id, component, split FROM asg ORDER BY doc_id
"""

SPLIT_CLUSTER_AUDIT_ORACLE = _split_cluster_ctes() + """,
leaks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS leaked_pairs_total
  FROM pairs p
  JOIN asg a ON p.id_a = a.doc_id
  JOIN asg b ON p.id_b = b.doc_id
  WHERE a.split <> b.split
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
       leaked_pairs_total
FROM asg CROSS JOIN leaks
GROUP BY split, leaked_pairs_total
ORDER BY split
"""


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch of lineitem part keys — engine-portable
    (deterministic hash) unlike HLL, so the *estimate itself* is oracle-
    checked, not just the row count."""
    from direct_spark_sql_spark.operators.sketches import kmv_distinct_estimate

    l = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct_estimate(l, "l_partkey", k=256)


def _kmv_oracle() -> str:
    from direct_spark_sql_spark.operators.sketches import kmv_estimate_sql

    return kmv_estimate_sql("lineitem", "l_partkey", k=256)


def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable KMV sketches: union /
    intersection / Jaccard of click-users vs purchase-users computed on
    O(k) synopses (Beyer et al. SIGMOD'07), never a re-scan — the
    cross-segment overlap story at 100 TB."""
    from direct_spark_sql_spark.operators.sketches import kmv_set_estimates

    # Two high-cardinality, partially-overlapping event-id sets so the
    # true (k-1)/U(k) estimator branch runs at driver scale (at sf0.001
    # the sets are < k and the exact-count degradation branch runs — both
    # paths get differential coverage across scales).
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("event_id")
    b = e.filter(F.col("user_id") % 3 == 0).select("event_id")
    return kmv_set_estimates(a, b, "event_id", k=128)


def _kmv_set_ops_oracle() -> str:
    from direct_spark_sql_spark.operators.sketches import kmv_set_estimates_sql

    return kmv_set_estimates_sql(
        "(SELECT event_id FROM events WHERE event_type = 'click')",
        "(SELECT event_id FROM events WHERE user_id % 3 = 0)",
        "event_id",
        k=128,
    )


_TEMP_ALPHA = 0.7
_TEMP_TARGET = 200


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus rebalancing (p_d ∝ n_d^0.7, the
    multilingual-sampling rule): weights are computed from the corpus
    itself in one count agg and applied as a deterministic hash filter.
    Output = kept rows per lang with the applied rate, so both the rate
    computation and the membership draw are oracle-checked."""
    from direct_spark_sql_spark.operators.sampling import temperature_weighted_sample

    d = load_table(spark, sf_dir, "documents")
    kept = temperature_weighted_sample(
        d, "doc_id", "lang", alpha=_TEMP_ALPHA, target_rows=_TEMP_TARGET
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("__rate_buckets").cast("long").alias("rate_buckets"),
        )
        .orderBy("lang")
    )


def _temperature_mix_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql

    a, t = _TEMP_ALPHA, float(_TEMP_TARGET)
    pow_units = f"CAST(FLOOR(pow(CAST(__n AS DOUBLE), {a}) * 1000000.0 + 0.5) AS BIGINT)"
    key_expr = "lang || ':' || CAST(doc_id AS VARCHAR)"
    bucket = f"{h64_sql(key_expr)} % 10000"
    return f"""
WITH counts AS (SELECT lang AS __d, CAST(COUNT(*) AS BIGINT) AS __n
                FROM documents GROUP BY lang),
z AS (SELECT CAST(SUM({pow_units}) AS BIGINT) AS __z_units FROM counts),
rates AS (
  SELECT __d,
         LEAST(CAST(10000 AS BIGINT),
               CAST(FLOOR(CAST({pow_units} AS DOUBLE)
                          / CAST(__z_units AS DOUBLE)
                          * {t}
                          / CAST(__n AS DOUBLE)
                          * 10000.0) AS BIGINT)) AS __rate_buckets
  FROM counts, z
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(r.__rate_buckets) AS BIGINT) AS rate_buckets
FROM documents d JOIN rates r ON d.lang = r.__d
WHERE {bucket} < r.__rate_buckets
GROUP BY d.lang ORDER BY d.lang
"""


def sketch_kmv_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cardinality profiling on O(groups × k) state: distinct
    event_ids per event_type estimated from per-group k-min synopses
    (k=64 — small enough that the estimator branch runs at every test
    scale)."""
    from direct_spark_sql_spark.operators.sketches import kmv_distinct_per_group

    e = load_table(spark, sf_dir, "events")
    return kmv_distinct_per_group(e, "event_type", "event_id", k=64).orderBy(
        "event_type"
    )


def _kmv_per_group_oracle() -> str:
    from direct_spark_sql_spark.operators.sketches import kmv_per_group_sql

    return kmv_per_group_sql("events", "event_type", "event_id", k=64)


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document tokens, point-queried for every
    vocabulary word alongside its exact count — d×w fixed memory with the
    deterministic MD5 hash family, so the estimates (collisions included)
    hash-match the DuckDB replay.  w=64 < vocabulary spread forces real
    collisions: the CMS ≥ exact guarantee is visibly exercised."""
    from direct_spark_sql_spark.operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"))
        .filter(F.col("token") != "")
    )
    sketch = cms_build(toks, "token", d=4, w=64)
    est = cms_estimate(sketch, toks.distinct(), "token", d=4, w=64)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    return (
        est.join(exact, "token")
        .select("token", "cms_est", "exact_cnt")
        .orderBy(F.desc("cms_est"), "token")
    )


def _cms_oracle() -> str:
    from direct_spark_sql_spark.operators.sketches import cms_sql

    inner = cms_sql("tok", "token", "SELECT DISTINCT token FROM tok", "token", d=4, w=64)
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token FROM documents
), tok AS (SELECT token FROM toks WHERE token <> ''),
est AS (SELECT * FROM ({inner}) x),
exact AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token)
SELECT est.token, est.cms_est, exact.exact_cnt
FROM est JOIN exact USING (token)
ORDER BY est.cms_est DESC, est.token
"""


# ---------------------------------------------------------------------------
# Deterministic sampling / vocabulary / end-to-end curation
# ---------------------------------------------------------------------------

_BUCKET_SQL = f"{h64_sql('doc_id')} % {10_000}"


def sample_hash_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% hash sample — replayable in any engine, stable
    under re-partitioning (unlike rng sampling)."""
    from direct_spark_sql_spark.operators.sampling import hash_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_sample(d, "doc_id", 0.2).orderBy("doc_id")


SAMPLE_UNIFORM_ORACLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_BUCKET_SQL} < 2000 ORDER BY doc_id
"""


def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof train/eval split: membership is a pure function of the
    key, so the split survives reruns and incremental loads."""
    from direct_spark_sql_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        hash_split(d, "doc_id", eval_rate=0.1)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


SAMPLE_SPLIT_ORACLE = f"""
SELECT CASE WHEN {_BUCKET_SQL} < 1000 THEN 'eval' ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY split ORDER BY split
"""


ES_SAMPLE_K = 25


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-25 length-weighted document sample without replacement
    (Efraimidis-Spirakis top-k keys) — the deterministic distributed twin
    of weighted reservoir sampling: longer docs proportionally likelier,
    no doc twice, replayable in any engine."""
    from direct_spark_sql_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_without_replacement(
        d, "doc_id", "n_chars", k=ES_SAMPLE_K
    )


SAMPLE_WEIGHTED_ORACLE = f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST(FLOOR(LN((CAST({h64_sql('doc_id')} AS DOUBLE) + 1.0) / {float(1 << 60)})
                  / CAST(n_chars AS DOUBLE) * 100000000.0 + 0.5) AS BIGINT)
         AS es_key_units
FROM documents
WHERE n_chars > 0
ORDER BY es_key_units DESC, doc_id LIMIT {ES_SAMPLE_K}
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling (the rebalance step of corpus curation):
    keep 50% of dominant 'en', all of 'fr'/'de', drop the rest."""
    from direct_spark_sql_spark.operators.sampling import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sampled = stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.5, "fr": 1.0, "de": 1.0}
    )
    return (
        sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")).orderBy("lang")
    )


SAMPLE_STRATIFIED_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs
FROM documents
WHERE {_BUCKET_SQL} < (CASE lang WHEN 'en' THEN 5000
                                 WHEN 'fr' THEN 10000
                                 WHEN 'de' THEN 10000 ELSE 0 END)
GROUP BY lang ORDER BY lang
"""


def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary with total and document frequency, min_df-pruned — the
    first pass of tokenizer/vocab construction."""
    from direct_spark_sql_spark.operators.sampling import vocabulary

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        vocabulary(d, min_df=5)
        .orderBy(F.desc("tf"), "token")
        .limit(200)
    )


VOCABULARY_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
tok AS (SELECT unnest(toks) AS token FROM t),
tf AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
dtok AS (SELECT DISTINCT doc_id, unnest(list_distinct(toks)) AS token FROM t),
df AS (SELECT token, COUNT(*) AS df FROM dtok GROUP BY token)
SELECT token, tf.tf, df.df FROM tf JOIN df USING (token)
WHERE df.df >= 5
ORDER BY tf.tf DESC, token LIMIT 200
"""


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: keep documents that (1) classify as English,
    (2) clear a quality bar, (3) are the canonical (min-id) copy within
    their exact-content duplicate group.  The composed form of the text /
    dedup operators — one pipeline, no collect.

    Canonical selection is min-id-per-fingerprint via groupBy + a
    (fp_content, doc_id) semi-join instead of a min window over
    fp_content: map-side combine collapses a mass-duplicate hot
    fingerprint before the shuffle, and the join-back keys on the
    unique (fp, id) pair so no hot key reaches the join either
    (VERDICT r7 #1).

    r14: the three text operators share ONE hoisted token array
    (``__toks``) — before, quality features, language id and the
    fingerprints each hoisted their own tokenize, so the interpreted
    split+filter walk ran 3× per row across the composed pipeline.
    Identical arithmetic over the identical array — bit-exact output."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tx.tokens("text").alias("__toks")
    )
    feats = tx.quality_features(d, toks=F.col("__toks"))
    scored = feats.select(
        "doc_id", "text", "n_tokens", "quality_score",
        tx.predicted_language("text", toks=F.col("__toks")).alias("plang"),
        "__toks",
    )
    fp = tx.fingerprint(scored, toks=F.col("__toks")).select(
        "fp_content", "doc_id", "n_tokens", "quality_score", "plang"
    )
    return (
        dd.canonical_min_rows(fp, "fp_content", "doc_id")
        .filter((F.col("plang") == "en") & (F.col("quality_score") >= 0.5))
        .select("doc_id", "n_tokens", "quality_score")
        .orderBy("doc_id")
    )


def curation_canon_cte(extra: str = "") -> str:
    """The t→f→scored→fp→canon CTE chain shared by corpus_curation and
    composed end-to-end pipelines.  ``extra`` is a ', col'-style suffix of
    additional document columns to carry through every stage."""
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({_lexicon_sql(lex)}, t))) AS BIGINT) AS hit_{lang}"
        for lang, lex in tx.LANG_LEXICONS.items()
    )
    langs_sorted = sorted(tx.LANG_LEXICONS)
    best = "GREATEST(" + ", ".join(f"hit_{lang}" for lang in langs_sorted) + ")"
    case = " ".join(f"WHEN hit_{lang} = {best} THEN '{lang}'" for lang in langs_sorted)
    return f"""
WITH t AS (SELECT doc_id{extra}, text, {TOKS_SQL} AS toks FROM documents),
f AS (
  SELECT doc_id{extra}, text, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_len,
         CAST(len(list_filter(toks, t2 -> list_contains({_lexicon_sql(tx.STOPWORDS)}, t2))) AS BIGINT) AS n_stop,
         {hit_cols}
  FROM t
),
scored AS (
  SELECT doc_id{extra}, toks, n_tokens,
         (CAST(n_uniq AS DOUBLE) / n_tokens) * 0.5
           + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.2
           + LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score,
         CASE WHEN {best} = 0 THEN 'und' {case} END AS plang
  FROM f
),
fp AS (
  SELECT doc_id{extra}, n_tokens, quality_score, plang,
         {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fp_content
  FROM scored
),
canon AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY fp_content) AS keep_id FROM fp
)"""


def _curation_oracle() -> str:
    return f"""{curation_canon_cte()}
SELECT doc_id, n_tokens, quality_score
FROM canon
WHERE plang = 'en' AND quality_score >= 0.5 AND doc_id = keep_id
ORDER BY doc_id
"""


def pipeline_stage_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stage-yield funnel for the curation pipeline — the
    "where did my data go" report: docs and tokens surviving each stage
    (raw → language → quality bar → canonical dedup) computed in ONE scan
    via conditional aggregation.  No multi-pass, no self-union: each
    stage is a cumulative boolean over the same row, so the whole funnel
    costs exactly what corpus_curation costs (one fingerprint groupBy +
    join-back + one groupBy).  keep_id attaches via groupBy(fp).min +
    join-back on fp_content, not a min window: the groupBy collapses a
    mass-duplicate hot fingerprint map-side, and the join-back's hot
    probe key is splittable by AQE's skew join, where a window partition
    is not (VERDICT r7 #1).

    r14: one shared hoisted token array across the three text operators
    (the corpus_curation pattern) — tokenize once per row, not 3×."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", tx.tokens("text").alias("__toks")
    )
    feats = tx.quality_features(d, toks=F.col("__toks"))
    scored = feats.select(
        "doc_id", "source", "text", "n_tokens", "quality_score",
        tx.predicted_language("text", toks=F.col("__toks")).alias("plang"),
        "__toks",
    )
    fp = tx.fingerprint(scored, toks=F.col("__toks")).drop("__toks")
    mins = fp.groupBy("fp_content").agg(F.min("doc_id").alias("keep_id")).select(
        F.col("fp_content").alias("__k"), "keep_id"
    )
    canon = fp.join(
        mins, F.col("fp_content").eqNullSafe(F.col("__k"))
    ).drop("__k")
    lang_ok = F.col("plang") == "en"
    qual_ok = lang_ok & (F.col("quality_score") >= 0.5)
    canon_ok = qual_ok & (F.col("doc_id") == F.col("keep_id"))

    def docs(cond) -> F.Column:
        return F.sum(cond.cast("long")).cast("long")

    def toks(cond) -> F.Column:
        return F.sum(F.when(cond, F.col("n_tokens")).otherwise(F.lit(0))).cast(
            "long"
        )

    return (
        canon.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_raw"),
            docs(lang_ok).alias("docs_lang"),
            docs(qual_ok).alias("docs_quality"),
            docs(canon_ok).alias("docs_canonical"),
            F.sum("n_tokens").cast("long").alias("toks_raw"),
            toks(lang_ok).alias("toks_lang"),
            toks(qual_ok).alias("toks_quality"),
            toks(canon_ok).alias("toks_canonical"),
        )
        .orderBy("source")
    )


def _stage_yield_oracle() -> str:
    lang = "plang = 'en'"
    qual = f"{lang} AND quality_score >= 0.5"
    canon = f"{qual} AND doc_id = keep_id"

    def docs(cond: str, name: str) -> str:
        return f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"

    def toks(cond: str, name: str) -> str:
        return (
            f"CAST(SUM(CASE WHEN {cond} THEN n_tokens ELSE 0 END) AS BIGINT)"
            f" AS {name}"
        )

    return f"""{curation_canon_cte(extra=", source")}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs_raw,
       {docs(lang, "docs_lang")},
       {docs(qual, "docs_quality")},
       {docs(canon, "docs_canonical")},
       CAST(SUM(n_tokens) AS BIGINT) AS toks_raw,
       {toks(lang, "toks_lang")},
       {toks(qual, "toks_quality")},
       {toks(canon, "toks_canonical")}
FROM canon GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_EX_SQL = """
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS a
  FROM embeddings
)"""


def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    query = e.filter(F.col("vec_id") == 0)
    return sim.cosine_topk(e.filter(F.col("vec_id") != 0), query, k=10)


EMBEDDING_TOPK_ORACLE = f"""
WITH {_EX_SQL.strip()},
q AS (SELECT i, a AS b FROM ex WHERE vec_id = 0),
d AS (
  SELECT ex.vec_id,
         CAST(CAST(ROUND(SUM(ex.a * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot,
         CAST(CAST(ROUND(SUM(ex.a * ex.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS na,
         CAST(CAST(ROUND(SUM(q.b * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nb
  FROM ex JOIN q ON ex.i = q.i
  WHERE ex.vec_id <> 0
  GROUP BY ex.vec_id
)
SELECT vec_id, CASE WHEN na > 0 AND nb > 0
                    THEN dot / (sqrt(na) * sqrt(nb)) ELSE -2.0 END AS cosine
FROM d ORDER BY cosine DESC, vec_id LIMIT 10
"""


IVF_K = 8
IVF_NPROBE = 2


def _ivf_index_path(sf_dir: str) -> str:
    """Deterministic per-dataset location for the materialized IVF index
    (build/probe split).  Lives under the repo's gitignored warehouse dir."""
    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    return warehouse_path("ivf_index", dataset_tag(sf_dir))


def embedding_ivf_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF-bucketed ANN: vec 0 is the query, vecs 1..IVF_K double as the
    (deterministic, zero-iteration) centroids, search probes IVF_NPROBE
    cells.  The oracle replays the identical assignment and probe, so the
    approximation itself is checked bit-exactly.

    Build/probe split (service shape): the cell assignment is materialized
    once per dataset, partitioned by cell_id; each query reads only the
    IVF_NPROBE probed partitions.  The query vector is fetched coordinator-
    side (a serving request arrives as a vector, not a distributed scan), so
    the per-request work is a single partition-pruned Spark job."""
    import os

    import duckdb

    def centroids() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        return e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_K))

    index_path = _ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(index_path, "_SUCCESS")):
        e = load_table(spark, sf_dir, "embeddings")
        sim.ivf_build(e.filter(F.col("vec_id") != 0), centroids(), index_path)
    # the "request payload": 1 row read driver-side (milliseconds, no job).
    # the table may be a single driver-written file or a Spark-written
    # directory of part files (e.g. the bench's scale-probe tier).
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb_path):
        emb_path = os.path.join(emb_path, "*.parquet")
    qvec = duckdb.sql(
        "SELECT embedding FROM read_parquet(?) WHERE vec_id = 0",
        params=[emb_path],
    ).fetchone()[0]
    # centroids passed lazily: steady-state requests (metadata cached)
    # skip even the load_table/DataFrame construction driver work.
    return sim.ivf_topk_vec(
        spark, qvec, index_path, centroids=centroids, k=10, nprobe=nprobe
    )


def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 audit of the IVF index against exact brute-force search —
    the approximation-quality measurement an ANN deployment monitors
    (separate from embedding_ivf_topk's check that the IVF *algorithm*
    itself replays bit-exactly).  Both result sets come from the engine's
    own operators; the oracle recomputes both searches and the overlap in
    SQL, so the recall number itself is differential-checked."""
    ivf = embedding_ivf_topk(spark, sf_dir).select("vec_id")
    e = load_table(spark, sf_dir, "embeddings")
    exact = sim.cosine_topk(
        e.filter(F.col("vec_id") != 0), e.filter(F.col("vec_id") == 0), k=10
    ).select("vec_id")
    return (
        ivf.join(exact, "vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(10.0)).alias("recall_at_k"),
        )
    )


def _ivf_recall_oracle() -> str:
    return f"""
SELECT CAST(10 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_k
FROM ({_IVF_ORACLE}) ivf
JOIN ({EMBEDDING_TOPK_ORACLE}) exact ON ivf.vec_id = exact.vec_id
"""


def embedding_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 as a function of probe width (nprobe = 1, 2, 4) — the
    effort/recall tuning curve an ANN deployment reads before picking
    its operating point: each row is one partition-pruned probe of the
    SAME materialized index joined against the exact brute-force top-10.
    Monotone non-decreasing by construction (wider probes scan a
    superset of cells); the oracle recomputes every probe and overlap,
    so the whole curve is differential-checked."""
    e = load_table(spark, sf_dir, "embeddings")
    exact = sim.cosine_topk(
        e.filter(F.col("vec_id") != 0), e.filter(F.col("vec_id") == 0), k=10
    ).select("vec_id")
    curves = []
    for nprobe in (1, 2, 4):
        ivf = embedding_ivf_topk(spark, sf_dir, nprobe=nprobe).select("vec_id")
        curves.append(
            ivf.join(exact, "vec_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                F.lit(10).cast("long").alias("k"),
                "n_hits",
                (F.col("n_hits").cast("double") / F.lit(10.0)).alias("recall_at_k"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out.orderBy("nprobe")


def _ivf_recall_curve_oracle() -> str:
    rows = []
    for nprobe in (1, 2, 4):
        rows.append(f"""
SELECT CAST({nprobe} AS BIGINT) AS nprobe, CAST(10 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_k
FROM ({_ivf_oracle_sql(nprobe)}) ivf
JOIN ({EMBEDDING_TOPK_ORACLE}) exact ON ivf.vec_id = exact.vec_id""")
    return " UNION ALL ".join(rows) + " ORDER BY nprobe"


def embedding_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One spherical-k-means refinement of the IVF seed centroids over the
    full embedding table — the centroid-training loop body an IVF index
    build runs at scale.  Per-dimension means aggregate in exact decimal,
    so the refined centroids hash-match the DuckDB replay of the same
    E/M step."""
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_K))
    return sim.kmeans_refine_step(e, centroids)


_KMEANS_ORACLE = f"""
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
  SELECT x.vec_id, c.vec_id AS cluster_id,
         CAST(CAST(ROUND(SUM(x.a * c.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x
  JOIN ex c ON c.i = x.i AND c.vec_id BETWEEN 1 AND {IVF_K}
  GROUP BY x.vec_id, c.vec_id
),
cosc AS (
  SELECT cc.vec_id, cc.cluster_id, cc.dot / (sqrt(nx.nn) * sqrt(nc.nn)) AS cos
  FROM cc
  JOIN nrm nx ON nx.vec_id = cc.vec_id
  JOIN nrm nc ON nc.vec_id = cc.cluster_id
),
assign AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster_id) AS rn
    FROM cosc
  ) WHERE rn = 1
)
SELECT s.cluster_id, ex.i AS dim_i,
       CAST(CAST(ROUND(SUM(ex.a), 6) AS DECIMAL(24,6)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM assign s JOIN ex ON ex.vec_id = s.vec_id
GROUP BY s.cluster_id, ex.i
ORDER BY s.cluster_id, dim_i
"""


def _ivf_oracle_sql(nprobe: int = IVF_NPROBE) -> str:
    """The IVF top-k oracle, parameterized by probe width (shared by the
    fixed-nprobe query and the recall-vs-nprobe curve)."""
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
  WHERE x.vec_id >= 1
  GROUP BY x.vec_id, c.vec_id
),
cosc AS (
  SELECT cc.vec_id, cc.cell_id, cc.dot / (sqrt(nx.nn) * sqrt(nc.nn)) AS cos
  FROM cc
  JOIN nrm nx ON nx.vec_id = cc.vec_id
  JOIN nrm nc ON nc.vec_id = cc.cell_id
),
assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell_id) AS rn
    FROM cosc
  ) WHERE rn = 1
),
qd AS (
  SELECT c.vec_id AS cell_id,
         CAST(CAST(ROUND(SUM(q.a * c.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex q
  JOIN ex c ON c.i = q.i AND c.vec_id BETWEEN 1 AND {IVF_K}
  WHERE q.vec_id = 0
  GROUP BY c.vec_id
),
probe AS (
  SELECT cell_id FROM (
    SELECT qd.cell_id, CASE WHEN nq.nn > 0 AND nc.nn > 0
           THEN qd.dot / (sqrt(nq.nn) * sqrt(nc.nn)) ELSE -2.0 END AS cos
    FROM qd
    JOIN nrm nq ON nq.vec_id = 0
    JOIN nrm nc ON nc.vec_id = qd.cell_id
    ORDER BY cos DESC, qd.cell_id LIMIT {nprobe}
  )
),
bd AS (
  SELECT x.vec_id,
         CAST(CAST(ROUND(SUM(x.a * q.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x
  JOIN ex q ON q.i = x.i AND q.vec_id = 0
  WHERE x.vec_id IN (SELECT a2.vec_id FROM assign a2 JOIN probe USING (cell_id))
  GROUP BY x.vec_id
)
SELECT bd.vec_id, CASE WHEN nx.nn > 0 AND nq.nn > 0
       THEN bd.dot / (sqrt(nx.nn) * sqrt(nq.nn)) ELSE -2.0 END AS cosine
FROM bd
JOIN nrm nx ON nx.vec_id = bd.vec_id
JOIN nrm nq ON nq.vec_id = 0
ORDER BY cosine DESC, bd.vec_id LIMIT 10
"""


_IVF_ORACLE = _ivf_oracle_sql()


def embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.srp_near_duplicates(e, dims=64, threshold=0.35).orderBy("id_a", "id_b")


def _srp_oracle() -> str:
    planes = sim.rademacher_planes(sim.SRP_BANDS * sim.SRP_BITS_PER_BAND, 64)
    proj_cols = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(str(s) for s in plane) + "]"
        proj_cols.append(f"SUM(a * (({lit})[s_i])) AS proj{p}")
    projections = ",\n         ".join(proj_cols)
    band_selects = []
    for b in range(sim.SRP_BANDS):
        bits = " + ".join(
            f"(CASE WHEN proj{b * sim.SRP_BITS_PER_BAND + r} > 0 "
            f"THEN CAST({1 << r} AS BIGINT) ELSE 0 END)"
            for r in range(sim.SRP_BITS_PER_BAND)
        )
        band_selects.append(
            f"SELECT vec_id, {b} AS band_idx, ({bits}) AS band_val FROM proj"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    # proj keeps the exploded form (one pass, 16 projections share it);
    # the pairwise dots use the correlated list-dot funnel — the
    # exploded cand-join form materialized |cand|x64 rows (the r13 x10
    # sweep's slowest survivor at 407 s / heavy spill).
    return f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS s_i,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS a
  FROM embeddings
),
proj AS MATERIALIZED (SELECT vec_id,
         {projections}
         FROM ex GROUP BY vec_id),
bt AS MATERIALIZED ({bands_sql}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bt a JOIN bt b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.vec_id < b.vec_id
),
norms AS MATERIALIZED (SELECT vec_id, CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nn
          FROM ex GROUP BY vec_id),
dots AS (
  SELECT c.id_a, c.id_b, {_dec_dot_sql("ea.embedding", "eb.embedding")} AS dot
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT d.id_a, d.id_b, CASE WHEN na.nn > 0 AND nb.nn > 0
       THEN d.dot / (sqrt(na.nn) * sqrt(nb.nn)) ELSE -2.0 END AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE CASE WHEN na.nn > 0 AND nb.nn > 0
      THEN d.dot / (sqrt(na.nn) * sqrt(nb.nn)) ELSE -2.0 END >= 0.35
ORDER BY id_a, id_b
"""


#: SemDeDup centroid-count rule: K = max(IVF_K, ceil(N / BUDGET)) keeps
#: the MEAN cluster size bounded by BUDGET, so the within-cluster pair
#: join is O(N x BUDGET) — linear in the corpus — instead of O(N^2/K)
#: with a fixed K (the r13 x10 sweep blew a 16 GB DuckDB temp fence on
#: exactly that: 20k vectors over 8 clusters is 25M pairs x 64 dims).
#: This is the paper's own production shape (Abbas et al. scale cluster
#: COUNT with corpus size, holding cluster size near-constant).  At the
#: driver gate (N = 500) the rule yields exactly IVF_K = 8, so sf0.01
#: results are bit-identical to the fixed-K fixture.
SEMDEDUP_CLUSTER_BUDGET = 64

_SEMDEDUP_K_SQL = (
    f"GREATEST({IVF_K}, CAST(CEIL("
    f"(SELECT COUNT(*) FROM embeddings) / {SEMDEDUP_CLUSTER_BUDGET}.0"
    f") AS BIGINT))"
)


def _semdedup_centroids(e: DataFrame) -> DataFrame:
    """First-K-vectors centroid fixture at the self-scaling K above —
    one metadata-cheap count() to size K, identical to the oracle's
    scalar subquery."""
    import math

    k = max(IVF_K, math.ceil(e.count() / SEMDEDUP_CLUSTER_BUDGET))
    return e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= k))


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: IVF-cluster the embedding space,
    then prune each vector whose cosine to a lower-id member of its own
    cluster reaches the threshold.  Candidate generation is confined to
    clusters (equi-join on cluster_id — never all-pairs), and the
    cluster COUNT scales with the corpus (SEMDEDUP_CLUSTER_BUDGET) so
    the pair join stays linear; pair cosines are exact-decimal so the
    prune decisions hash-match the DuckDB replay."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        e, _semdedup_centroids(e), threshold=0.35
    ).orderBy("vec_id")


#: Shared CTE prefix (ex→nrm→cc→cosc→assign→pair→dots→cosp→agg) — the
#: DuckDB twin of operators/similarity.py:semantic_dedup's per-vector
#: max-cosine-to-a-lower-cluster-member state; reused by the SemDeDup
#: query and its threshold curve so a formula fix never chases copies.
# Exact-decimal dot of two FLOAT[] columns via a correlated lock-step
# UNNEST — the identical cast/round funnel the old exploded-join form
# used (DOUBLE → DECIMAL(12,9) per element, SUM, ROUND 6, DECIMAL(24,6),
# DOUBLE), so results are bit-identical.  The r13 x10 sweep retired the
# join form: ex-join-ex on the dimension index materialized N×K×64 rows
# (~400M at x10) and spilled past an 18 GB temp fence; this form's
# biggest relation is the N×K cross join itself (6.3M rows at x10), the
# per-row dot never leaves its row.
def _dec_dot_sql(a: str, b: str) -> str:
    return (
        "(SELECT CAST(CAST(ROUND(SUM("
        "CAST(CAST(x AS DOUBLE) AS DECIMAL(12,9))"
        " * CAST(CAST(y AS DOUBLE) AS DECIMAL(12,9))), 6) AS DECIMAL(24,6))"
        f" AS DOUBLE) FROM (SELECT UNNEST({a}) AS x, UNNEST({b}) AS y))"
    )


_SEMANTIC_CTES = f"""
WITH nrm AS MATERIALIZED (
  SELECT vec_id, {_dec_dot_sql("embedding", "embedding")} AS nn
  FROM embeddings
),
cents AS MATERIALIZED (
  SELECT vec_id AS cluster_id, embedding AS cemb
  FROM embeddings WHERE vec_id BETWEEN 1 AND {_SEMDEDUP_K_SQL}
),
cc AS (
  SELECT e.vec_id, c.cluster_id,
         {_dec_dot_sql("e.embedding", "c.cemb")} AS dot
  FROM embeddings e CROSS JOIN cents c
),
cosc AS (
  SELECT cc.vec_id, cc.cluster_id, cc.dot / (sqrt(nx.nn) * sqrt(nc.nn)) AS cos
  FROM cc
  JOIN nrm nx ON nx.vec_id = cc.vec_id
  JOIN nrm nc ON nc.vec_id = cc.cluster_id
),
assign AS MATERIALIZED (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster_id) AS rn
    FROM cosc
  ) WHERE rn = 1
),
pair AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON b.cluster_id = a.cluster_id AND b.vec_id < a.vec_id
),
dots AS MATERIALIZED (
  SELECT p.id_a, p.id_b,
         {_dec_dot_sql("ea.embedding", "eb.embedding")} AS dot
  FROM pair p
  JOIN embeddings ea ON ea.vec_id = p.id_a
  JOIN embeddings eb ON eb.vec_id = p.id_b
),
cosp AS (
  SELECT d.id_a, CASE WHEN na.nn > 0 AND nb.nn > 0
         THEN d.dot / (sqrt(na.nn) * sqrt(nb.nn)) ELSE -2.0 END AS cos
  FROM dots d
  JOIN nrm na ON na.vec_id = d.id_a
  JOIN nrm nb ON nb.vec_id = d.id_b
),
agg AS (
  SELECT id_a, CAST(COUNT(*) AS BIGINT) AS n_lower_members,
         MAX(cos) AS max_cos_lower
  FROM cosp GROUP BY id_a
)"""

_SEMANTIC_DEDUP_ORACLE = (
    _SEMANTIC_CTES
    + """
SELECT s.vec_id,
       CAST(s.cluster_id AS BIGINT) AS cluster_id,
       CAST(COALESCE(g.n_lower_members, 0) AS BIGINT) AS n_lower_members,
       g.max_cos_lower,
       CAST(COALESCE(g.max_cos_lower >= 0.35, FALSE) AS INT) AS pruned
FROM assign s
LEFT JOIN agg g ON g.id_a = s.vec_id
ORDER BY vec_id
"""
)


#: Cosine thresholds swept by the SemDeDup tuning curve: around the
#: registered operating point (0.35) where this corpus' pair-cosine mass
#: lives, plus 0.5 as the conservative upper bound (prunes nothing here).
SEMDEDUP_CURVE_THRESHOLDS = (0.25, 0.3, 0.35, 0.5)


def dedup_semantic_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup threshold tuning curve: vectors pruned and corpus
    retention at each cosine threshold in SEMDEDUP_CURVE_THRESHOLDS —
    the measured data behind choosing the registered 0.35 operating
    point (Abbas et al. sweep retention against downstream quality the
    same way).  The expensive state (per-vector max cosine to a
    lower-id member of its own IVF cluster) is computed ONCE by
    operators/similarity.py:semantic_dedup; the curve is one global
    aggregation of literal-threshold conditional sums stacked to long
    format — map-only after the pair join, no per-threshold rescan.

    Bit-exactness: pair cosines are exact-decimal doubles compared
    against identical literals in both engines (the decontam width
    curve / DP release argument); counts and the retention division are
    integer-derived."""
    e = load_table(spark, sf_dir, "embeddings")
    sd = sim.semantic_dedup(
        e, _semdedup_centroids(e), threshold=0.35
    ).select("max_cos_lower")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_vectors")]
    for i, t in enumerate(SEMDEDUP_CURVE_THRESHOLDS):
        aggs.append(
            F.sum(F.when(F.col("max_cos_lower") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"__p{i}")
        )
    one = sd.agg(*aggs)
    stack = (
        f"stack({len(SEMDEDUP_CURVE_THRESHOLDS)}, "
        + ", ".join(
            f"CAST({t} AS DOUBLE), __p{i}"
            for i, t in enumerate(SEMDEDUP_CURVE_THRESHOLDS)
        )
        + ") AS (threshold, n_pruned)"
    )
    return (
        one.select(F.expr(stack), "n_vectors")
        .select(
            "threshold",
            "n_vectors",
            "n_pruned",
            (
                (F.col("n_vectors") - F.col("n_pruned")).cast("double")
                / F.col("n_vectors").cast("double")
            ).alias("retention"),
        )
        .orderBy("threshold")
    )


_SEMDEDUP_CURVE_ORACLE = (
    _SEMANTIC_CTES
    + f""",
per AS (
  SELECT s.vec_id, g.max_cos_lower
  FROM assign s LEFT JOIN agg g ON g.id_a = s.vec_id
)
SELECT t.threshold,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN max_cos_lower >= t.threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pruned,
       CAST(COUNT(*) - SUM(CASE WHEN max_cos_lower >= t.threshold
                           THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS retention
FROM per, (VALUES {", ".join(f"(CAST({t} AS DOUBLE))" for t in SEMDEDUP_CURVE_THRESHOLDS)}) t(threshold)
GROUP BY t.threshold
ORDER BY threshold
"""
)


# ---------------------------------------------------------------------------
# Multimodal — REAL decode (pure-stdlib PPM/BMP/PNG codecs); the oracle
# recomputes the expected dimensions and pixel statistics arithmetically,
# so the encode→decode round-trip is hash-checked end to end.
# ---------------------------------------------------------------------------

def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode deterministic real-format images (ppm/bmp/png/gif cycling by
    doc_id) executor-side, then DECODE them with the real stdlib codecs and
    emit true dimensions + pixel stats.  Both halves run as Arrow-batched
    mapInPandas; the oracle recomputes every value from the pixel formula,
    so a decoder bug (dimensions, row padding, filter math, channel order)
    breaks the hash match."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    imgs = mm.synthesize_images(d)
    return mm.extract_image_features(imgs).orderBy("doc_id")


_MULTIMODAL_FEATURES_ORACLE = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
  FROM documents WHERE doc_id < 100
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (x.x * 7 + y.y * 13 + d.doc_id * 31) % 256 AS v
  FROM d
  JOIN generate_series(0, 16) x(x) ON x.x < d.w
  JOIN generate_series(0, 13) y(y) ON y.y < d.h
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                       WHEN 2 THEN 'png' ELSE 'gif' END AS fmt,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(3 * SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS INT) AS px_min,
       CAST(MAX(v) AS INT) AS px_max
FROM px
GROUP BY doc_id, w, h
ORDER BY doc_id
"""


def multimodal_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode deterministic real-format images, DECODE them with the real
    codecs, and 2× box-filter downscale (area average, floor dims) —
    the thumbnail / training-resolution step the brief's multimodal
    family calls for (operators/multimodal.py:resize_images_box2).  The
    oracle recomputes every resized pixel from the source formula, so a
    resize bug (block offsets, rounding, channel order, odd-edge
    handling) breaks the hash match."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    imgs = mm.synthesize_images(d)
    return mm.resize_images_box2(imgs).orderBy("doc_id")


# resized pixel (X, Y) = floor(mean of the 2x2 source block); channels are
# identical (grayscale formula), so r_sum = 3 * grayscale sum.
_MULTIMODAL_RESIZE_ORACLE = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
  FROM documents WHERE doc_id < 100
),
r AS (SELECT doc_id, w, h, w // 2 AS rw, h // 2 AS rh FROM d),
px AS (
  SELECT r.doc_id, r.w, r.h, r.rw, r.rh,
         (  ((2 * X.x) * 7     + (2 * Y.y) * 13     + r.doc_id * 31) % 256
          + ((2 * X.x + 1) * 7 + (2 * Y.y) * 13     + r.doc_id * 31) % 256
          + ((2 * X.x) * 7     + (2 * Y.y + 1) * 13 + r.doc_id * 31) % 256
          + ((2 * X.x + 1) * 7 + (2 * Y.y + 1) * 13 + r.doc_id * 31) % 256
         ) // 4 AS v
  FROM r
  JOIN generate_series(0, 7) X(x) ON X.x < r.rw
  JOIN generate_series(0, 6) Y(y) ON Y.y < r.rh
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                       WHEN 2 THEN 'png' ELSE 'gif' END AS fmt,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(rw AS INT) AS r_width,
       CAST(rh AS INT) AS r_height,
       CAST(3 * SUM(v) AS BIGINT) AS r_sum,
       CAST(MIN(v) AS INT) AS r_min,
       CAST(MAX(v) AS INT) AS r_max
FROM px
GROUP BY doc_id, w, h, rw, rh
ORDER BY doc_id
"""


def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup by average hash: encode real-format images,
    REAL-decode them, fingerprint each with the all-integer 4×3 aHash
    (operators/multimodal.py:image_ahash), and report every image with
    its hash and duplicate-bucket size — equal hashes are the perceptual
    near-dup buckets (brightness-shift tolerant), found by equi-groupBy
    with no pairwise compare, the image analogue of a MinHash band
    bucket.  The oracle recomputes every hash from the source pixel
    formula, so a decode, bucketing, thresholding or bit-order bug
    breaks the match.

    Bucket sizes come from groupBy(ahash).count + join-back, not a count
    window over ahash: a boilerplate corpus makes one perceptual hash
    hot, and the groupBy collapses it map-side while a window partition
    would serialize it (VERDICT r7 #1)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    hashes = mm.image_ahash(mm.synthesize_images(d))
    sizes = hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return (
        hashes.join(sizes, "ahash")
        .select("doc_id", "fmt", "width", "height", "ahash", "group_size")
        .orderBy("doc_id")
    )


_IMAGE_DEDUP_ORACLE = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
  FROM documents WHERE doc_id < 100
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (X.x * 7 + Y.y * 13 + d.doc_id * 31) % 256 AS g,
         (X.x * 4) // d.w AS bx,
         (Y.y * 3) // d.h AS by
  FROM d
  JOIN generate_series(0, 15) X(x) ON X.x < d.w
  JOIN generate_series(0, 12) Y(y) ON Y.y < d.h
),
cells AS (
  SELECT doc_id, w, h, by, bx, SUM(g) // COUNT(*) AS m
  FROM px GROUP BY doc_id, w, h, by, bx
),
thr AS (SELECT doc_id, SUM(m) // 12 AS t FROM cells GROUP BY doc_id),
hashes AS (
  SELECT c.doc_id, c.w, c.h,
         CAST(SUM(CASE WHEN c.m > thr.t
                       THEN (1 << (c.by * 4 + c.bx)) ELSE 0 END) AS BIGINT)
           AS ahash
  FROM cells c JOIN thr USING (doc_id)
  GROUP BY c.doc_id, c.w, c.h
)
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                       WHEN 2 THEN 'png' ELSE 'gif' END AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height, ahash,
       CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS group_size
FROM hashes ORDER BY doc_id
"""


def multimodal_image_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNBOUNDED perceptual image-dedup pipeline (VERDICT r9 #3):
    identical to multimodal_image_dedup but over EVERY document — the
    form whose 100× scale evidence lives in baselines/scale100_probe.json
    (4.4× wall at 100× data), now with its own oracle row instead of
    probe-only status.  The bounded variant existed because the oracle
    recomputes every pixel; the synthesized dimensions are globally
    bounded (w = 4 + id % 13 <= 16, h = 3 + id % 11 <= 13), so the
    oracle's pixel grid is <= 208 rows per document at ANY corpus size
    and the closed-form replay stays tractable unbounded (500 docs ->
    ~100k pixel rows at sf0.01).

    Plan shape is the bounded variant's: map-only encode+decode+hash
    (Arrow-batched mapInPandas), groupBy(ahash).count + join-back for
    bucket sizes (no count window — a boilerplate corpus makes one
    perceptual hash hot; the groupBy collapses it map-side)."""
    d = load_table(spark, sf_dir, "documents")
    hashes = mm.image_ahash(mm.synthesize_images(d))
    sizes = hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return (
        hashes.join(sizes, "ahash")
        .select("doc_id", "fmt", "width", "height", "ahash", "group_size")
        .orderBy("doc_id")
    )


_IMAGE_DEDUP_FULL_ORACLE = _IMAGE_DEDUP_ORACLE.replace(
    "FROM documents WHERE doc_id < 100", "FROM documents"
)


def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG encode -> sniff-decode -> tolerance audit, executor-side.

    JPEG is lossy, so the ppm/bmp/png exact-pixel-sum oracle shape doesn't
    apply; instead each row's decoded image is compared against the
    regenerated source formula inside the same mapInPandas pass and only
    rows within the tolerance bound survive.  The oracle recomputes the
    expected (doc_id, fmt, width, height) arithmetically — a broken
    encoder/decoder (wrong dimensions, entropy drift, channel swap,
    subsampling bugs) drops rows or changes dims and breaks the match.
    Even ids exercise 4:4:4, odd ids 4:2:0."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    audit = mm.jpeg_encode_decode_verify(d, quality=90)
    return (
        audit.filter(F.col("max_abs_err") <= 8)
        .select("doc_id", "fmt", "width", "height")
        .orderBy("doc_id")
    )


_MULTIMODAL_JPEG_ORACLE = """
SELECT doc_id,
       'jpeg' AS fmt,
       CAST(8 + doc_id % 17 AS INT) AS width,
       CAST(6 + doc_id % 13 AS INT) AS height
FROM documents WHERE doc_id < 60
ORDER BY doc_id
"""


def binary_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob sharding through the flatMap-shaped mapInPandas plumbing,
    oracle-checked: each payload is split into 4 contiguous byte chunks
    and the chunk boundaries + content are pinned by length and MD5 — a
    chunking bug (off-by-one step, tail handling, short payloads) breaks
    the hash match.  (Real video keyframe sampling is the separate
    ``multimodal_video_frames`` query over decoded Y4M.)"""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    media = mm.attach_binary(d, "text", "application/octet-stream", "source")
    chunks = mm.chunk_binary(media, n_chunks=4)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.length("chunk_bytes").cast("long").alias("chunk_len"),
        F.md5("chunk_bytes").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# documents.text is ASCII in this corpus (asserted by the octet_length ==
# length check in MULTIMODAL_META_ORACLE passing), so VARCHAR substring
# replicates the executor's byte slicing exactly.
_BINARY_CHUNKING_ORACLE = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         GREATEST(length(text) // 4, 1) AS step
  FROM documents WHERE doc_id < 20 AND length(text) > 0
),
f AS (
  SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
         substring(text, i.i * step + 1, step) AS chunk
  FROM d JOIN generate_series(0, 3) i(i) ON i.i < LEAST(4, n)
)
SELECT doc_id, chunk_idx,
       CAST(length(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM f ORDER BY doc_id, chunk_idx
"""


def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy pairs over part names, blocked on the second
    name token (the noun survives small edits to the adjective) — an
    equi-join candidate structure, never all-pairs."""
    p = load_table(spark, sf_dir, "part").select("p_name")
    return dd.edit_distance_pairs(
        p, "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        max_distance=3,
    ).orderBy("text_a", "text_b")


DEDUP_LEVENSHTEIN_ORACLE = """
WITH p AS (SELECT DISTINCT p_name FROM part),
pairs AS (
  SELECT a.p_name AS text_a, b.p_name AS text_b,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
  FROM p a JOIN p b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
)
SELECT text_a, text_b, dist FROM pairs WHERE dist <= 3 ORDER BY text_a, text_b
"""


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode-independent half of the multimodal plumbing, oracle-
    checked: binary payload attachment, typed metadata struct, byte length
    (UTF-8 octets, not characters) and a payload MD5 — all JVM-side."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    media = mm.attach_binary(d, "text", "text/plain", "lang")
    return media.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("media").alias("payload_md5"),
    ).orderBy("doc_id")


MULTIMODAL_META_ORACLE = """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents ORDER BY doc_id
"""


def embedding_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors for each of 5 query vectors in ONE job (broadcast
    query batch + window rank) — the ANN-service request shape."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    base = e.filter(F.col("vec_id") > 4)
    return sim.cosine_topk_batch(base, queries, k=3).orderBy("q_id", "rk")


EMBEDDING_BATCH_TOPK_ORACLE = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS a
  FROM embeddings
),
nrm AS (
  SELECT vec_id, sqrt(CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE)) AS nn
  FROM ex GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS q_id, x.vec_id,
         CAST(CAST(ROUND(SUM(x.a * q.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x JOIN ex q ON q.i = x.i AND q.vec_id <= 4
  WHERE x.vec_id > 4
  GROUP BY 1, 2
),
scored AS (
  SELECT d.q_id, d.vec_id,
         CASE WHEN nx.nn > 0 AND nq.nn > 0
              THEN d.dot / (nx.nn * nq.nn) ELSE -2.0 END AS cosine
  FROM dots d JOIN nrm nx ON nx.vec_id = d.vec_id JOIN nrm nq ON nq.vec_id = d.q_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
)
SELECT q_id, vec_id, cosine, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3 ORDER BY q_id, rk
"""


# ---------------------------------------------------------------------------
# PII scan / repetition quality / train-eval decontamination
# ---------------------------------------------------------------------------

def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents with deterministic planted
    PII (both engines construct the identical augmented text, so the
    pattern counts and the redacted-text MD5 are hash-checked exactly)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"),
                         F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(F.lit(" from 10.0."), (did % 200).cast("string"),
                         F.lit(".15")),
            ).otherwise(F.lit("")),
            F.when(
                did % 13 == 0,
                F.concat(F.lit(" call 555-867-"),
                         F.lpad((did % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
        ).alias("text2"),
    )
    return (
        tx.pii_scan(aug, "text2")
        .select(
            "doc_id", "n_emails", "n_phones", "n_ipv4", "has_pii",
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || (doc_id % 200) || '.15' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{tx.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text2, '{tx.PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text2, '{tx.PII_IPV4_RE}')) AS BIGINT) AS n_ipv4,
       (len(regexp_extract_all(text2, '{tx.PII_EMAIL_RE}'))
        + len(regexp_extract_all(text2, '{tx.PII_PHONE_RE}'))
        + len(regexp_extract_all(text2, '{tx.PII_IPV4_RE}'))) > 0 AS has_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(
           text2, '{tx.PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{tx.PII_PHONE_RE}', '<PHONE>', 'g'),
           '{tx.PII_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM aug ORDER BY doc_id
"""


#: ALL 3-grams (multiplicity preserved), short docs → whole-span gram —
#: the non-distinct twin of SHINGLES_SQL.
_NGRAMS3_SQL = (
    "list_transform(generate_series(1, greatest(len(toks) - 2, 1)), "
    "i -> array_to_string(toks[i:i+2], ' '))"
)


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tx.repetition_features(d).drop("text").orderBy("doc_id")


_REPETITION_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, {_NGRAMS3_SQL} AS grams FROM t),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
cnt AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM cnt GROUP BY 1)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks)
         AS dup_token_frac,
       CAST(len(g.grams) - len(list_distinct(g.grams)) AS DOUBLE) / len(g.grams)
         AS dup_3gram_frac,
       CAST(top.mx AS DOUBLE) / top.tot AS top_token_frac
FROM t JOIN g USING (doc_id) JOIN top USING (doc_id)
ORDER BY t.doc_id
"""


def text_boilerplate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate profile (CCNet/RefinedWeb curation stage):
    2-grams occurring in >= 4 distinct docs of the same source are
    boilerplate; report per source how many grams were flagged, how many
    docs carry any, and the corpus-level flagged-gram ratio."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    per_doc, boiler = tx.boilerplate_ngrams(d, n=2, min_df=4)
    bcnt = boiler.groupBy("source").agg(F.count("*").alias("__nb"))
    return (
        per_doc.join(bcnt, "source", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.max("__nb"), F.lit(0)).cast("long").alias("n_boiler_grams"),
            F.sum(F.when(F.col("n_boiler") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_affected"),
            F.round(
                F.sum("n_boiler").cast("double") / F.sum("n_grams"), 6
            ).alias("boiler_ratio"),
        )
        .orderBy("source")
    )


#: Distinct 2-grams, short docs → whole-span gram — the n=2 twin of
#: SHINGLES_SQL, mirroring word_ngrams(col, 2) + array_distinct.
_NGRAMS2_DISTINCT_SQL = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 1, 1)), "
    "i -> array_to_string(toks[i:i+1], ' ')))"
)

_BOILERPLATE_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, source, unnest({_NGRAMS2_DISTINCT_SQL}) AS gram FROM t),
bc AS (SELECT source, gram FROM g GROUP BY source, gram HAVING COUNT(*) >= 4),
pd AS (SELECT g.doc_id, g.source, COUNT(*) AS n_grams, COUNT(bc.gram) AS n_boiler
       FROM g LEFT JOIN bc USING (source, gram) GROUP BY g.doc_id, g.source),
bn AS (SELECT source, COUNT(*) AS nb FROM bc GROUP BY source)
SELECT pd.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(MAX(bn.nb), 0) AS BIGINT) AS n_boiler_grams,
       CAST(SUM(CASE WHEN pd.n_boiler > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       ROUND(CAST(SUM(pd.n_boiler) AS DOUBLE) / SUM(pd.n_grams), 6)
         AS boiler_ratio
FROM pd LEFT JOIN bn USING (source)
GROUP BY pd.source ORDER BY pd.source
"""


def decontamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: eval slice = doc_id % 10 == 0, find train
    docs sharing any distinct 5-gram (boilerplate grams df-capped)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 10 != 0)
    eval_df = d.filter(F.col("doc_id") % 10 == 0)
    return tx.contamination_pairs(
        train, eval_df, n=5, min_shared=1, max_gram_df=100
    ).orderBy("train_id", "eval_id")


_NGRAMS5_SQL = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 4, 1)), "
    "i -> array_to_string(toks[i:i+4], ' ')))"
)

_DECONTAMINATION_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_NGRAMS5_SQL}) AS g FROM t),
tg AS (SELECT doc_id AS train_id, g FROM g WHERE doc_id % 10 <> 0),
eg AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 10 = 0),
rare AS (SELECT g FROM tg GROUP BY g HAVING COUNT(*) <= 100)
SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tg JOIN rare USING (g) JOIN eg USING (g)
GROUP BY train_id, eval_id
HAVING COUNT(*) >= 1
ORDER BY train_id, eval_id
"""


#: Contamination-score cutoff shared by the Spark plans and the DuckDB
#: oracles below (interpolated into the SQL so the engines can't drift):
#: common-trigram background measures ~0.025 median / 0.054 p90 on the
#: corpus, genuine cross-slice copies ~0.97 — 0.08 sits in the gap.
_DECONTAM_THRESHOLD = 0.08

from direct_spark_sql_spark.operators.sampling import BENCH_SLICE_START as _BSS  # noqa: E402


def dedup_benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination against an EXTERNAL eval-set
    table: per-document contamination score = fraction of the document's
    distinct 3-gram shingles appearing anywhere in the benchmark, docs at
    >= _DECONTAM_THRESHOLD flagged.  Completes decontamination_ngrams (pairwise overlap
    within one corpus' split) and dedup_split_leakage (near-dup pairs
    straddling a split): here the benchmark is a separate registered
    table — the top-2% h64 slice of documents stands in for it — and the
    output is the per-document score a curation pipeline filters on.
    Threshold _DECONTAM_THRESHOLD separates genuine copies (the corpus'
    planted duplicates score ~0.97) from the ~0.025 background of common
    trigrams measured at sf0.01.

    OPERATING POINTS: this 3-gram/0.08 form fits the short-fixture
    regime (10-99-token docs); the production GPT-3-style operating
    point — 8-gram, any collision flags — is registered as
    dedup_benchmark_decontam_8gram (see DECONTAM_PROD_N).

    100 TB shape: the benchmark gram set broadcasts (eval sets are tiny);
    the corpus is scanned once and never shuffled on text — see
    operators/dedup.py:benchmark_contamination."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    return (
        dd.benchmark_contamination(corpus, bench, threshold=_DECONTAM_THRESHOLD)
        .select("doc_id", "n_shingles", "n_hit", "contamination")
        .orderBy("doc_id")
    )


_BENCH_DECONTAM_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
corpus AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM sh
           WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
hits AS (SELECT c.doc_id, c.n_shingles, COUNT(*) AS n_hit
         FROM corpus c JOIN bench USING (s) GROUP BY 1, 2)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_hit AS DOUBLE) / n_shingles AS contamination
FROM hits
WHERE CAST(n_hit AS DOUBLE) / n_shingles >= {_DECONTAM_THRESHOLD}
ORDER BY doc_id
"""


#: Production decontamination width (VERDICT r8 #1).  Two operating
#: points, both registered: SHINGLE_N = 3 with threshold 0.08 fits the
#: short-fixture regime (docs are 10-99 tokens; trigram background
#: measures ~0.025 median, planted copies ~0.97, so 0.08 sits in the
#: gap), while real pretraining decontamination (GPT-3 appendix C /
#: PaLM / Llama) uses 8-13-gram COLLISION — on real corpora trigram
#: overlap flags half the internet, but an 8-gram shared with an eval
#: item is essentially never coincidence, so ANY collision flags the
#: document (no ratio threshold).  Measured on this corpus: at n=8 the
#: common-n-gram background vanishes entirely (zero coincidental hits
#: at sf0.01; the only flagged doc is the planted genuine copy at
#: contamination 0.97).
DECONTAM_PROD_N = 8


def dedup_benchmark_decontam_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-width benchmark decontamination: same broadcast-semi-
    join shape as dedup_benchmark_decontam (the corpus is scanned once,
    the eval-set gram set broadcasts, the groupBy keys on doc id) at the
    GPT-3-style operating point — DECONTAM_PROD_N(8)-gram shingles, ANY
    collision flags (threshold 0: every doc surviving the semi-join has
    n_hit >= 1).  See DECONTAM_PROD_N for why both operating points are
    registered.

    100 TB shape: identical to the 3-gram variant — the n=8 gram set is
    a few times larger per eval item but eval sets are tiny, so it still
    broadcasts; mass duplication creates no hot key because the groupBy
    key is the document id."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    return (
        dd.benchmark_contamination(
            corpus, bench, n=DECONTAM_PROD_N, threshold=0.0
        )
        .select("doc_id", "n_shingles", "n_hit", "contamination")
        .orderBy("doc_id")
    )


_PROD_SHINGLES_SQL = _shingles_sql(DECONTAM_PROD_N)

_BENCH_DECONTAM_8GRAM_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, {_PROD_SHINGLES_SQL} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
corpus AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM sh
           WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
hits AS (SELECT c.doc_id, c.n_shingles, COUNT(*) AS n_hit
         FROM corpus c JOIN bench USING (s) GROUP BY 1, 2)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_hit AS DOUBLE) / n_shingles AS contamination
FROM hits
ORDER BY doc_id
"""


def dedup_benchmark_decontam_8gram_norm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Normalized production-width benchmark decontamination: the
    dedup_benchmark_decontam_8gram operating point (8-gram, ANY
    collision flags) over text normalized with operators/text.py:
    normalize_for_matching — ASCII lowercase + every non-[a-z0-9 ]
    codepoint replaced by a space — applied identically to the corpus
    and the benchmark side BEFORE shingling.  GPT-3 appendix C (and
    PaLM / Llama after it) normalize before building collision grams:
    a cased or re-punctuated copy of an eval item ("The Answer." vs
    "the answer") shares zero raw 8-grams with it and evades the raw
    operating point entirely; after normalization both sides produce
    identical token streams and the collision fires (the planted
    case-variant test in tests/test_pipeline_ops.py pins exactly this
    miss/catch pair).

    100 TB shape: identical to the raw variant — normalization is one
    map-side translate + regexp_replace inside the same scan (no extra
    pass, no shuffle), the normalized eval gram set broadcasts, and the
    per-doc groupBy keys on the id."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.normalize_for_matching("text").alias("text")
    )
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    return (
        dd.benchmark_contamination(
            corpus, bench, n=DECONTAM_PROD_N, threshold=0.0
        )
        .select("doc_id", "n_shingles", "n_hit", "contamination")
        .orderBy("doc_id")
    )


_BENCH_DECONTAM_8GRAM_NORM_ORACLE = f"""
WITH nd AS (SELECT doc_id, {NORM_TEXT_SQL} AS text FROM documents),
t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM nd),
sh AS (SELECT doc_id, {_PROD_SHINGLES_SQL} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
corpus AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM sh
           WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
hits AS (SELECT c.doc_id, c.n_shingles, COUNT(*) AS n_hit
         FROM corpus c JOIN bench USING (s) GROUP BY 1, 2)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_hit AS DOUBLE) / n_shingles AS contamination
FROM hits
ORDER BY doc_id
"""


def decontam_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level contamination report at the production operating point
    (DECONTAM_PROD_N-gram, any collision): for each corpus document the
    maximal token-offset spans covered by 8-gram collisions with the
    benchmark slice — the surgical-removal form (PaLM-style) that excises
    the leaked eval item and keeps the rest of the document, instead of
    the whole-doc drop dedup_benchmark_decontam_8gram implies.  A doc
    with one contaminated paragraph yields one span covering exactly
    that paragraph's token range (pinned by the planted-paragraph test).

    Offsets are into the RAW whitespace token stream (the same stream a
    downstream excision slices); the normalized operating point needs a
    normalized-to-raw offset map, since normalization can split or
    delete tokens — decontam_span_report_norm provides exactly that
    (per-raw-token provenance through the normalization).

    100 TB shape: see operators/dedup.py:contamination_spans — the same
    broadcast-semi-join as the flag-level queries plus an islands window
    partitioned on the doc id (per-partition rows = that doc's hit
    offsets only)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    return dd.contamination_spans(corpus, bench, n=DECONTAM_PROD_N).orderBy(
        "doc_id", "span_start"
    )


def decontam_span_report_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level contamination at the NORMALIZED production operating
    point with spans mapped back to RAW token offsets — closing
    decontam_span_report's documented limitation: the normalized match
    catches cased/re-punctuated eval copies, but excision slices the raw
    stream, and normalization can split or delete raw tokens.  Each
    normalized token carries the index of the raw token it came from
    (normalizing the whole text equals normalizing per raw token and
    concatenating — space maps to space and nothing merges across one),
    so every 8-gram collision yields a raw-offset interval and
    overlapping intervals merge via a running-max pass.

    100 TB shape: operators/dedup.py:contamination_spans_normalized —
    broadcast eval gram set, per-doc provenance/lead/merge windows (all
    partitioned on the doc id, bounded by document length)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    return dd.contamination_spans_normalized(
        d.filter(~is_bench), d.filter(is_bench), n=DECONTAM_PROD_N
    ).orderBy("doc_id", "span_start")


def _span_norm_ctes() -> str:
    """Shared CTE prefix ending in ``spans`` (doc_id, span_start,
    span_end, n_hits in RAW token offsets) — the DuckDB twin of
    contamination_spans_normalized at the production width; reused by
    decontam_span_report_norm and the normalized excision economics."""
    n = DECONTAM_PROD_N
    norm_tok_list = (
        f"list_filter(string_split({_norm_sql('tok')}, ' '), t2 -> length(t2) > 0)"
    )
    lead_cols = ", ".join(f"lead(ntok, {i}) OVER w8" for i in range(1, n))
    return f"""
WITH nd AS (SELECT doc_id, {NORM_TEXT_SQL} AS text FROM documents),
bt AS (SELECT doc_id, {TOKS_SQL} AS toks FROM nd),
bsh AS (SELECT doc_id, {_PROD_SHINGLES_SQL} AS sh FROM bt),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM bsh
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
c AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
      WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
rt AS (SELECT doc_id, i - 1 AS p, toks[i] AS tok
       FROM c, unnest(generate_series(1, len(toks))) AS u(i)),
nt AS (SELECT doc_id, p, {norm_tok_list} AS ntoks FROM rt),
ns AS (SELECT doc_id, p, j, ntoks[j] AS ntok
       FROM nt, unnest(generate_series(1, len(ntoks))) AS v(j)),
g AS (SELECT doc_id, p, concat_ws(' ', ntok, {lead_cols}) AS s,
             lead(p, {n - 1}) OVER w8 AS pe,
             lead(ntok, {n - 1}) OVER w8 AS l8
      FROM ns WINDOW w8 AS (PARTITION BY doc_id ORDER BY p, j)),
cand AS (SELECT doc_id, CAST(p AS BIGINT) AS raw_start,
                CAST(pe AS BIGINT) AS raw_end, s
         FROM g WHERE l8 IS NOT NULL),
hits AS (SELECT c2.doc_id, c2.raw_start, c2.raw_end
         FROM cand c2 JOIN bench USING (s)),
m AS (SELECT doc_id, raw_start, raw_end,
             MAX(raw_end) OVER (PARTITION BY doc_id
                                ORDER BY raw_start, raw_end
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pmax
      FROM hits),
w AS (SELECT doc_id, raw_start, raw_end,
             CASE WHEN pmax IS NULL OR raw_start > pmax + 1
                  THEN 1 ELSE 0 END AS brk
      FROM m),
isl AS (SELECT doc_id, raw_start, raw_end,
               SUM(brk) OVER (PARTITION BY doc_id
                              ORDER BY raw_start, raw_end
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM w),
spans AS (SELECT doc_id, MIN(raw_start) AS span_start,
                 MAX(raw_end) AS span_end,
                 CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM isl GROUP BY doc_id, island)"""


def _decontam_span_norm_oracle() -> str:
    return (
        _span_norm_ctes()
        + """
SELECT doc_id, span_start, span_end, n_hits
FROM spans
ORDER BY doc_id, span_start
"""
    )


def _span_ctes() -> str:
    """Shared CTE prefix ending in ``spans`` (doc_id, span_start,
    span_end, n_hits) — the DuckDB twin of contamination_spans at the
    production width; reused by decontam_span_report and the excision
    economics oracle."""
    n = DECONTAM_PROD_N
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
bench AS (SELECT DISTINCT unnest(sh) AS s
          FROM (SELECT doc_id, {_PROD_SHINGLES_SQL} AS sh FROM t)
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
c AS (SELECT doc_id, toks FROM t
      WHERE {h64_sql('doc_id')} % 10000 < {_BSS} AND len(toks) >= {n}),
g AS (SELECT doc_id, i - 1 AS p, array_to_string(toks[i:i+{n - 1}], ' ') AS s
      FROM c, unnest(generate_series(1, len(toks) - {n - 1})) AS u(i)),
hits AS (SELECT g.doc_id, g.p FROM g JOIN bench USING (s)),
w AS (SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                       <= {n} THEN 0 ELSE 1 END AS brk
      FROM hits),
isl AS (SELECT doc_id, p,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM w),
spans AS (SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
                 CAST(MAX(p) + {n - 1} AS BIGINT) AS span_end,
                 CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM isl GROUP BY doc_id, island)"""


def _decontam_span_oracle() -> str:
    return (
        _span_ctes()
        + """
SELECT doc_id, span_start, span_end, n_hits
FROM spans
ORDER BY doc_id, span_start
"""
    )


def decontam_excision_economics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number that motivates span-level decontamination at 100 TB:
    per source, how many tokens whole-document drops would discard vs
    how many the span policy actually excises — the difference is clean
    training data RECOVERED by surgical removal.  Covers exactly the
    documents decontam_span_report spans (>= DECONTAM_PROD_N tokens;
    shorter docs are whole-doc decisions by construction, flagged by
    dedup_benchmark_decontam_8gram).

    Output per source: n_flagged_docs, tokens_whole_doc_drop (the
    whole-doc policy's loss), tokens_span_excised (the span policy's
    loss), tokens_recovered (their difference).  All-integer arithmetic.

    100 TB shape: contamination_spans' broadcast-semi-join + tiny
    islands window, then an UNHINTED equi-join on doc_id between the
    per-doc rollup and the (doc_id, source, n_tokens) projection
    (ADVICE r10): the rollup is small only while few corpus docs
    collide with the eval set — a heavily contaminated crawl shard
    breaks that assumption, and a hard broadcast hint would remove
    Spark's shuffle-join fallback exactly when it's needed.  AQE
    broadcasts it when it measures small.  The corpus text is never
    shuffled; the final groupBy is on the bounded source key."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    spans = dd.contamination_spans(corpus, bench, n=DECONTAM_PROD_N)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("excised")
    )
    docs = corpus.select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    )
    return (
        docs.join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_whole_doc_drop"),
            F.sum("excised").cast("long").alias("tokens_span_excised"),
            F.sum(F.col("n_tokens") - F.col("excised"))
            .cast("long")
            .alias("tokens_recovered"),
        )
        .orderBy("source")
    )


def _decontam_excision_oracle() -> str:
    return (
        _span_ctes()
        + f""",
per_doc AS (SELECT doc_id, SUM(span_end - span_start + 1) AS excised
            FROM spans GROUP BY doc_id),
docs AS (SELECT d.doc_id, d.source, len({TOKS_SQL}) AS n_tokens
         FROM documents d)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_flagged_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_whole_doc_drop,
       CAST(SUM(excised) AS BIGINT) AS tokens_span_excised,
       CAST(SUM(n_tokens - excised) AS BIGINT) AS tokens_recovered
FROM docs JOIN per_doc USING (doc_id)
GROUP BY source
ORDER BY source
"""
    )


def decontam_excision_economics_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-excision economics at the NORMALIZED operating point — the
    production-operative number, since the normalized match is the one
    real pipelines run and it catches the cased/re-punctuated copies the
    raw grams miss: per source, tokens a whole-document drop policy
    would discard vs tokens the normalized-span policy excises (raw
    token units on both sides — spans are already mapped to raw
    offsets), tokens_recovered their difference.

    100 TB shape: contamination_spans_normalized's broadcast-semi-join +
    per-doc windows, then an unhinted equi-join of the per-doc rollup
    onto the (doc_id, source, n_tokens) projection — identical to the
    raw-point economics, including the ADVICE-r10 no-forced-broadcast
    rule (AQE decides from the rollup's measured size)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    spans = dd.contamination_spans_normalized(corpus, bench, n=DECONTAM_PROD_N)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("excised")
    )
    docs = corpus.select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    )
    return (
        docs.join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_whole_doc_drop"),
            F.sum("excised").cast("long").alias("tokens_span_excised"),
            F.sum(F.col("n_tokens") - F.col("excised"))
            .cast("long")
            .alias("tokens_recovered"),
        )
        .orderBy("source")
    )


def _decontam_excision_norm_oracle() -> str:
    return (
        _span_norm_ctes()
        + f""",
per_doc AS (SELECT doc_id, SUM(span_end - span_start + 1) AS excised
            FROM spans GROUP BY doc_id),
docs AS (SELECT d.doc_id, d.source, len({TOKS_SQL}) AS n_tokens
         FROM documents d)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_flagged_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_whole_doc_drop,
       CAST(SUM(excised) AS BIGINT) AS tokens_span_excised,
       CAST(SUM(n_tokens - excised) AS BIGINT) AS tokens_recovered
FROM docs JOIN per_doc USING (doc_id)
GROUP BY source
ORDER BY source
"""
    )


#: Widths swept by the decontamination width curve: the fixture point
#: (3), an intermediate (5), and the production point (8).
DECONTAM_CURVE_WIDTHS = (3, 5, DECONTAM_PROD_N)


def decontam_width_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram-width tuning curve for benchmark decontamination: per
    width in DECONTAM_CURVE_WIDTHS, how many corpus documents share ANY
    n-gram with the eval set — the number that justifies the two
    registered operating points with data instead of citation.  Measured
    on this corpus at sf0.01: width 3 "flags" 51% of all documents (the
    miniature of trigram overlap flagging half the internet), widths 5
    and 8 flag exactly the planted genuine copy.  The dedup_banding_
    tradeoff precedent: a parameter-sweep observability query.

    100 TB shape: one broadcast-semi-join pass per width — each pass is
    exactly dedup_benchmark_decontam's shape (eval gram set broadcasts,
    corpus scanned once per width, per-doc groupBy on the id).  A
    production run sweeps only the widths it is choosing between, and
    each extra width costs one more map-side pass, never a shuffle of
    the corpus.  The final rate join is a 3-row × 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    total = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    parts = []
    for n in DECONTAM_CURVE_WIDTHS:
        flagged = dd.benchmark_contamination(corpus, bench, n=n, threshold=0.0)
        parts.append(
            flagged.agg(F.count(F.lit(1)).cast("long").alias("n_flagged"))
            .select(F.lit(n).cast("long").alias("n"), "n_flagged")
        )
    curve = parts[0]
    for p in parts[1:]:
        curve = curve.unionAll(p)
    return (
        curve.crossJoin(F.broadcast(total))
        .select(
            "n",
            "n_flagged",
            "n_corpus",
            (F.col("n_flagged").cast("double") / F.col("n_corpus")).alias(
                "collision_rate"
            ),
        )
        .orderBy("n")
    )


def _decontam_width_curve_oracle() -> str:
    blocks = []
    for n in DECONTAM_CURVE_WIDTHS:
        sh_n = _shingles_sql(n)
        blocks.append(f"""
SELECT CAST({n} AS BIGINT) AS n,
       CAST((SELECT COUNT(DISTINCT c.doc_id)
             FROM (SELECT doc_id, unnest(sh) AS g
                   FROM (SELECT doc_id, {sh_n} AS sh FROM t)
                   WHERE {h64_sql('doc_id')} % 10000 < {_BSS}) c
             JOIN (SELECT DISTINCT unnest(sh) AS g
                   FROM (SELECT doc_id, {sh_n} AS sh FROM t)
                   WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}) b
               ON b.g = c.g) AS BIGINT) AS n_flagged""")
    body = " UNION ALL ".join(blocks)
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents
        WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
curve AS ({body})
SELECT n, n_flagged, tot.n_corpus,
       CAST(n_flagged AS DOUBLE) / tot.n_corpus AS collision_rate
FROM curve CROSS JOIN tot
ORDER BY n
"""


def decontam_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination observability: per-source corpus contamination
    rate against the external benchmark — (docs, contaminated docs at
    >= _DECONTAM_THRESHOLD, rate, worst score).  The number a pipeline owner watches to
    decide whether a source's crawl overlaps the eval suite.  Same
    broadcast-semi-join shape as dedup_benchmark_decontam with the
    per-doc scores folded straight into one groupBy(source) — corpus
    rows at zero hits are counted via a left join against the flagged
    set sized by source (no second text scan)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    bench = d.filter(is_bench)
    corpus = d.filter(~is_bench)
    scored = dd.benchmark_contamination(
        corpus.select("doc_id", "text"), bench, threshold=_DECONTAM_THRESHOLD
    ).select("doc_id", "contamination")
    per_doc = corpus.select("doc_id", "source").join(scored, "doc_id", "left")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("contamination").cast("long").alias("n_contaminated"),
            (
                F.count("contamination").cast("double") / F.count(F.lit(1))
            ).alias("contamination_rate"),
            F.max("contamination").alias("worst_score"),
        )
        .orderBy("source")
    )


_DECONTAM_BY_SOURCE_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, source, {SHINGLES_SQL} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
corpus AS (SELECT doc_id, source, len(sh) AS n_shingles, unnest(sh) AS s
           FROM sh WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
hits AS (SELECT c.doc_id, CAST(COUNT(*) AS DOUBLE) / c.n_shingles AS score
         FROM corpus c JOIN bench USING (s)
         GROUP BY c.doc_id, c.n_shingles
         HAVING CAST(COUNT(*) AS DOUBLE) / c.n_shingles >= {_DECONTAM_THRESHOLD}),
-- docs comes straight from documents, NOT from the unnested corpus CTE:
-- unnest drops docs whose shingle list is NULL/empty (NULL or <n-token
-- text), while the Spark side counts every corpus doc in n_docs
-- (ADVICE r8 engine-divergence guard)
docs AS (SELECT doc_id, source FROM documents
         WHERE {h64_sql('doc_id')} % 10000 < {_BSS})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(score) AS BIGINT) AS n_contaminated,
       CAST(COUNT(score) AS DOUBLE) / COUNT(*) AS contamination_rate,
       MAX(score) AS worst_score
FROM docs LEFT JOIN hits USING (doc_id)
GROUP BY source ORDER BY source
"""


def _training_ready_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-ready document set (doc_id, source, text, n_tokens):
    language filter + quality bar + Gopher repetition gate + canonical
    exact-dedup + benchmark decontamination + benchmark-row exclusion —
    the shared core of corpus_training_ready (which rolls it up) and
    corpus_assembly_tokens (which boilerplate-strips it)."""
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # r14: one shared hoisted token array across the three text operators
    # (the corpus_curation pattern) — tokenize once per row, not 3×.
    dt = d.select("*", tx.tokens("text").alias("__toks"))
    feats = tx.quality_features(dt, toks=F.col("__toks"))
    scored = feats.select(
        "doc_id", "source", "text", "n_tokens", "quality_score",
        tx.predicted_language("text", toks=F.col("__toks")).alias("plang"),
        "__toks",
    )
    fp = tx.fingerprint(scored, toks=F.col("__toks")).drop("__toks")
    curated = dd.keep_min_id(fp, "fp_content", "doc_id").filter(
        (F.col("plang") == "en")
        & (F.col("quality_score") >= 0.5)
        & (tx.dup_ngram_frac("text") < tx.REP_DUP3_GATE)
    )
    is_bench = sample_bucket(F.col("doc_id")) >= BENCH_SLICE_START
    flagged = dd.benchmark_contamination(
        d.filter(~is_bench).select("doc_id", "text"),
        d.filter(is_bench),
        threshold=_DECONTAM_THRESHOLD,
    ).select("doc_id")
    return curated.filter(~is_bench).join(flagged, "doc_id", "anti")


def corpus_training_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full assembly answer — "what actually goes into the training
    run": language filter + quality bar + Gopher-style intra-document
    repetition removal (dup-3-gram fraction < REP_DUP3_GATE, a MAP-ONLY
    column so the gate adds zero shuffle; see operators/text.py for the
    fixture-vs-production operating points) + canonical exact-dedup
    (corpus_curation's de-skewed groupBy+semi-join form) COMPOSED with
    benchmark decontamination (dedup_benchmark_decontam's broadcast
    semi-join) and benchmark-row exclusion, reported as per-source
    (docs, tokens).  One lazy DAG across four operator families —
    Catalyst fuses the shared documents scan; nothing materializes
    between stages.  Canonical ids are chosen over the FULL corpus
    (same as corpus_curation) before the benchmark slice is excluded."""
    ready = _training_ready_docs(spark, sf_dir)
    return (
        ready.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )


def _training_ready_ctes() -> str:
    """Shared CTE prefix ending in ``ready`` (doc_id, source, n_tokens) —
    the DuckDB twin of _training_ready_docs; reused by the training-ready
    rollup and the assembly-tokens boilerplate strip."""
    return f"""{curation_canon_cte(", source")},
-- Gopher-style intra-document repetition gate (map-only on the Spark
-- side): dup-3-gram instance fraction, dropped at >= REP_DUP3_GATE
rep AS (SELECT doc_id,
               CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / len(grams) AS dup3
        FROM (SELECT doc_id, {_NGRAMS3_SQL} AS grams FROM t)),
sh2 AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh2
          WHERE {h64_sql('doc_id')} % 10000 >= {_BSS}),
corpus AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM sh2
           WHERE {h64_sql('doc_id')} % 10000 < {_BSS}),
flagged AS (SELECT c.doc_id
            FROM corpus c JOIN bench USING (s)
            GROUP BY c.doc_id, c.n_shingles
            HAVING CAST(COUNT(*) AS DOUBLE) / c.n_shingles
                     >= {_DECONTAM_THRESHOLD}),
ready AS (SELECT doc_id, source, n_tokens
          FROM canon
          WHERE plang = 'en' AND quality_score >= 0.5 AND doc_id = keep_id
            AND doc_id IN (SELECT doc_id FROM rep WHERE dup3 < {tx.REP_DUP3_GATE})
            AND {h64_sql('doc_id')} % 10000 < {_BSS}
            AND doc_id NOT IN (SELECT doc_id FROM flagged))"""


def _training_ready_oracle() -> str:
    return (
        _training_ready_ctes()
        + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM ready
GROUP BY source ORDER BY source
"""
    )


def corpus_assembly_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST stage of corpus assembly: take the training-ready set
    (language + quality + repetition + canonical dedup + decontam +
    bench exclusion — _training_ready_docs) and apply the C4-style
    boilerplate strip to it, with chunk frequency computed over the
    READY corpus — exact dedup has already collapsed whole-document
    copies, so any full-width chunk still shared by >= CHUNK_DUP_DOCS
    surviving documents is genuine cross-document boilerplate.  Reports
    per source what a training run actually ingests: ready docs, docs
    surviving the strip (a fully-boilerplate doc drops), ready tokens,
    final tokens, and the tokens the strip removed.  All integers.

    100 TB shape: the ready set is one lazy DAG (corpus_training_ready's
    plan), the strip is chunk_excise's chunk-keyed agg + anti-join, and
    the attribution join back to (doc_id, source) is an equi-join on the
    unique doc id — no new skew surface beyond the probed pieces."""
    ready = _training_ready_docs(spark, sf_dir).select(
        "doc_id", "source", "text", "n_tokens"
    )
    ex = dd.chunk_excise(ready.select("doc_id", "text")).select(
        "doc_id", "n_tokens_clean"
    )
    j = ready.select("doc_id", "source", "n_tokens").join(ex, "doc_id", "left")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_tokens_clean").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_final"),
            F.sum("n_tokens").cast("long").alias("tokens_ready"),
            F.sum(F.coalesce(F.col("n_tokens_clean"), F.lit(0)))
            .cast("long")
            .alias("tokens_final"),
        )
        .withColumn(
            "boiler_tokens_removed",
            (F.col("tokens_ready") - F.col("tokens_final")).cast("long"),
        )
        .orderBy("source")
    )


def _assembly_tokens_oracle() -> str:
    return (
        _training_ready_ctes()
        + f""",
rt AS (SELECT r.doc_id, r.source, r.n_tokens, t.toks
       FROM ready r JOIN t USING (doc_id)),
rch AS (SELECT doc_id,
               array_to_string(toks[(i - 1) * {_W} + 1:i * {_W}], ' ') AS chunk,
               len(toks[(i - 1) * {_W} + 1:i * {_W}]) AS chunk_toks
        FROM rt, unnest(generate_series(1, (len(toks) + {_W - 1}) // {_W})) AS u(i)
        WHERE len(toks) > 0),
rdfr AS (SELECT chunk, COUNT(DISTINCT doc_id) AS dfreq, MAX(chunk_toks) AS ct
         FROM rch GROUP BY chunk),
rbad AS (SELECT chunk FROM rdfr WHERE dfreq >= {_K} AND ct = {_W}),
rkept AS (SELECT c.* FROM rch c WHERE NOT EXISTS
          (SELECT 1 FROM rbad b WHERE b.chunk = c.chunk)),
rclean AS (SELECT doc_id, SUM(chunk_toks) AS ctoks FROM rkept GROUP BY doc_id)
SELECT r.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c.ctoks IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_final,
       CAST(SUM(r.n_tokens) AS BIGINT) AS tokens_ready,
       CAST(SUM(COALESCE(c.ctoks, 0)) AS BIGINT) AS tokens_final,
       CAST(SUM(r.n_tokens) - SUM(COALESCE(c.ctoks, 0)) AS BIGINT)
         AS boiler_tokens_removed
FROM ready r LEFT JOIN rclean c USING (doc_id)
GROUP BY r.source ORDER BY r.source
"""
    )


def embedding_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination review queue: the 25 corpus vectors most
    similar (exact decimal cosine) to ANY benchmark vector, each with its
    best-matching benchmark id — the embedding-space complement of
    dedup_benchmark_decontam that catches *paraphrased* eval leakage
    n-gram overlap can't see.  Ranked output (not a fixed threshold) so
    the screen yields a review queue at any corpus scale; the same top-2%
    h64 slice stands in for the external benchmark table.

    100 TB shape: the benchmark embeddings broadcast (eval sets are
    tiny); every partition scores map-side against all of them; ONE
    groupBy(vec_id) max(struct) picks each vector's best match
    (partial-combinable — no per-corpus-row window), and the final
    top-25 is a bounded TakeOrderedAndProject."""
    from direct_spark_sql_spark.operators import similarity as sim
    from direct_spark_sql_spark.operators.sampling import (
        BENCH_SLICE_START,
        sample_bucket,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_bench = sample_bucket(F.col("vec_id")) >= BENCH_SLICE_START
    bench = e.filter(is_bench).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("__q")
    )
    corpus = e.filter(~is_bench)
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "q_id",
        sim.cosine_dec(sim._dec_vec("embedding"), sim._dec_vec("__q")).alias(
            "cosine"
        ),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cosine"), (-F.col("q_id")).alias("nq"))).alias("b")
    )
    return (
        best.select(
            "vec_id",
            (-F.col("b.nq")).cast("long").alias("bench_id"),
            F.col("b.cosine").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(25)
    )


_SEMANTIC_DECONTAM_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS a
  FROM embeddings
),
nrm AS (
  SELECT vec_id, sqrt(CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE)) AS nn
  FROM ex GROUP BY vec_id
),
dots AS (
  SELECT x.vec_id, q.vec_id AS q_id,
         CAST(CAST(ROUND(SUM(x.a * q.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x JOIN ex q ON q.i = x.i
  WHERE {h64_sql('x.vec_id')} % 10000 < {_BSS}
    AND {h64_sql('q.vec_id')} % 10000 >= {_BSS}
  GROUP BY 1, 2
),
scored AS (
  SELECT d.vec_id, d.q_id,
         CASE WHEN nx.nn > 0 AND nq.nn > 0
              THEN d.dot / (nx.nn * nq.nn) ELSE -2.0 END AS cosine
  FROM dots d JOIN nrm nx ON nx.vec_id = d.vec_id
              JOIN nrm nq ON nq.vec_id = d.q_id
),
best AS (
  SELECT vec_id, q_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, q_id) AS rk
  FROM scored
)
SELECT vec_id, CAST(q_id AS BIGINT) AS bench_id, cosine
FROM best WHERE rk = 1
ORDER BY cosine DESC, vec_id LIMIT 25
"""


def dedup_chunk_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style SUB-document frequency dedup report: every document
    is cut into fixed CHUNK_W-token non-overlapping chunks (the honest
    analogue of C4's line dedup for this unpunctuated corpus), corpus-wide
    distinct-document frequency is counted per chunk, and chunks present
    in >= CHUNK_DUP_DOCS documents — boilerplate: banners, footers,
    templated spans — are costed as removed (all occurrences).  Per
    source: docs, chunks, duplicate chunks, total vs removed tokens, and
    the removal rate.  Self-frequency dedup, distinct from eval-set
    decontamination (external gram set) and whole-document dedup.

    100 TB shape: operators/dedup.py:chunk_frequency_report — one chunk
    explode (map-side, 1 row per CHUNK_W tokens), hash aggs and an
    equi-join back all keyed on the chunk, final rollup on the bounded
    source key.  No broadcast assumption: web-scale boilerplate sets
    are themselves large."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dd.chunk_frequency_report(d).orderBy("source")


_W, _K = dd.CHUNK_W, dd.CHUNK_DUP_DOCS
_CHUNK_FREQ_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
nz AS (SELECT * FROM t WHERE len(toks) > 0),
ch AS (SELECT doc_id, source,
              array_to_string(toks[(i - 1) * {_W} + 1:i * {_W}], ' ') AS chunk,
              len(toks[(i - 1) * {_W} + 1:i * {_W}]) AS chunk_toks
       FROM nz, unnest(generate_series(1, (len(toks) + {_W - 1}) // {_W})) AS u(i)),
dfr AS (SELECT chunk, COUNT(DISTINCT doc_id) AS dfreq FROM ch GROUP BY chunk)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND chunk_toks = {_W} THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(chunk_toks) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND chunk_toks = {_W} THEN chunk_toks ELSE 0 END) AS BIGINT)
         AS tokens_removed,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND chunk_toks = {_W} THEN chunk_toks ELSE 0 END) AS DOUBLE)
         / CAST(SUM(chunk_toks) AS DOUBLE) AS removal_rate
FROM ch JOIN dfr USING (chunk)
GROUP BY source
ORDER BY source
"""


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty profile: micro-averaged fraction of each
    source's distinct NOVELTY_N-grams that appear in no other document
    (corpus df == 1), plus the min/max per-document fraction — the "how
    much genuinely new text does this source add" curation statistic,
    the inverse of the duplication family.

    100 TB shape: operators/dedup.py:ngram_novelty_by_source — gram
    frequency hash agg (map-side combinable) and an equi-join back,
    both keyed on the gram, per-doc rollup on the id, final rollup on
    the bounded source key."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dd.ngram_novelty_by_source(d).orderBy("source")


_NOV_N = dd.NOVELTY_N
_NGRAM_NOVELTY_ORACLE = f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents
           WHERE len({TOKS_SQL}) >= {_NOV_N}),
sh AS (SELECT doc_id, source, unnest({_shingles_sql(_NOV_N)}) AS s FROM t),
dfr AS (SELECT s, COUNT(*) AS dfreq FROM sh GROUP BY s),
per_doc AS (
  SELECT doc_id, source,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) AS n_novel,
         CAST(SUM(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS doc_novelty
  FROM sh JOIN dfr USING (s)
  GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       MIN(doc_novelty) AS min_doc_novelty,
       MAX(doc_novelty) AS max_doc_novelty,
       CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_grams) AS DOUBLE) AS novelty_micro
FROM per_doc
GROUP BY source
ORDER BY source
"""


def dedup_chunk_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The executable boilerplate strip: reconstruct every document with
    its duplicated full-width chunks excised (kept chunks re-joined in
    original order) — the transform dedup_chunk_frequency only costs.
    Documents reduced to nothing disappear, matching a drop.

    100 TB shape: operators/dedup.py:chunk_excise — boilerplate set from
    the same chunk-keyed hash agg, occurrences dropped via a LEFT ANTI
    equi-join on the chunk, reconstruction one groupBy on the doc id
    (per-group state = that doc's own chunks)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.chunk_excise(d).orderBy("doc_id")


#: Shared CTE prefix (t→nz→ch→dfr→bad) for the chunk-excise oracles —
#: the DuckDB twin of chunk_table + the boilerplate-set agg.
_CHUNK_EXCISE_CTES = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
nz AS (SELECT * FROM t WHERE len(toks) > 0),
ch AS (SELECT doc_id, i - 1 AS chunk_idx,
              array_to_string(toks[(i - 1) * {_W} + 1:i * {_W}], ' ') AS chunk,
              len(toks[(i - 1) * {_W} + 1:i * {_W}]) AS chunk_toks
       FROM nz, unnest(generate_series(1, (len(toks) + {_W - 1}) // {_W})) AS u(i)),
dfr AS (SELECT chunk, COUNT(DISTINCT doc_id) AS dfreq, MAX(chunk_toks) AS ct
        FROM ch GROUP BY chunk),
bad AS (SELECT chunk FROM dfr WHERE dfreq >= {_K} AND ct = {_W})"""

#: shared reconstruction tail over a ``kept`` CTE
_CHUNK_EXCISE_TAIL = """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks_kept,
       CAST(SUM(chunk_toks) AS BIGINT) AS n_tokens_clean,
       string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""

_CHUNK_EXCISE_ORACLE = (
    _CHUNK_EXCISE_CTES
    + """,
kept AS (SELECT c.* FROM ch c WHERE NOT EXISTS
         (SELECT 1 FROM bad b WHERE b.chunk = c.chunk))"""
    + _CHUNK_EXCISE_TAIL
)


def dedup_chunk_excise_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-proper boilerplate strip: exactly ONE occurrence of each
    boilerplate chunk survives corpus-wide — the lexicographically first
    (min doc id, then min chunk offset) — and every other occurrence is
    excised; "discard all but one" from the C4 paper made deterministic.
    Compare dedup_chunk_excise (CCNet-style remove-all).

    100 TB shape: operators/dedup.py:chunk_excise(keep_first=True) — the
    keeper is one extra min(struct) column on the same chunk-keyed hash
    agg; the drop is a keeper-compare LEFT equi-join on the chunk."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd.chunk_excise(d, keep_first=True).orderBy("doc_id")


_CHUNK_EXCISE_KEEP_FIRST_ORACLE = (
    _CHUNK_EXCISE_CTES
    + """,
kd AS (SELECT c.chunk, MIN(c.doc_id) AS kd
       FROM ch c JOIN bad USING (chunk) GROUP BY c.chunk),
ki AS (SELECT c.chunk, k.kd, MIN(c.chunk_idx) AS ki
       FROM ch c JOIN kd k ON c.chunk = k.chunk AND c.doc_id = k.kd
       GROUP BY c.chunk, k.kd),
kept AS (SELECT c.* FROM ch c LEFT JOIN ki ON c.chunk = ki.chunk
         WHERE ki.chunk IS NULL OR (c.doc_id = ki.kd AND c.chunk_idx = ki.ki))"""
    + _CHUNK_EXCISE_TAIL
)


#: Widths swept by the chunk-dedup width curve: half, the registered
#: CHUNK_W operating point, and double.
CHUNK_CURVE_WIDTHS = (5, 10, 20)


def dedup_chunk_width_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk-width tuning curve for sub-document frequency dedup:
    corpus-wide chunks / duplicate chunks / tokens removed at each width
    in CHUNK_CURVE_WIDTHS — the measured data behind the CHUNK_W = 10
    operating point, the same justification pattern as
    decontam_width_curve and dedup_semantic_threshold_curve.  Narrow
    chunks over-trigger (short spans repeat by chance in a small
    vocabulary); wide chunks under-trigger (boilerplate shorter than the
    window never fills a full-width chunk).  One corpus pass per width,
    each a single chunk-grain hash agg with NO join
    (operators/dedup.py:chunk_frequency_totals), unioned by name."""
    from functools import reduce

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = [
        dd.chunk_frequency_totals(d, w=w) for w in CHUNK_CURVE_WIDTHS
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("width")


def _chunk_width_curve_oracle() -> str:
    blocks = []
    for w in CHUNK_CURVE_WIDTHS:
        blocks.append(f"""
SELECT CAST({w} AS BIGINT) AS width,
       CAST(SUM(n_occ) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND ct = {w} THEN n_occ ELSE 0 END)
            AS BIGINT) AS n_dup_chunks,
       CAST(SUM(toks) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND ct = {w} THEN toks ELSE 0 END)
            AS BIGINT) AS tokens_removed,
       CAST(SUM(CASE WHEN dfreq >= {_K} AND ct = {w} THEN toks ELSE 0 END)
            AS DOUBLE) / CAST(SUM(toks) AS DOUBLE) AS removal_rate
FROM (
  SELECT chunk, COUNT(*) AS n_occ, SUM(chunk_toks) AS toks,
         COUNT(DISTINCT doc_id) AS dfreq, MAX(chunk_toks) AS ct
  FROM (
    SELECT doc_id,
           array_to_string(toks[(i - 1) * {w} + 1:i * {w}], ' ') AS chunk,
           len(toks[(i - 1) * {w} + 1:i * {w}]) AS chunk_toks
    FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
         unnest(generate_series(1, (len(toks) + {w - 1}) // {w})) AS u(i)
    WHERE len(toks) > 0
  ) GROUP BY chunk
)""")
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY width\n"


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus DATASHEET — the one-page summary a data
    card / "datasheets for datasets" release ships: volume (docs,
    tokens, chars), lexical breadth (vocabulary), exact duplication
    (docs in a content-fingerprint group of size > 1), boilerplate
    exposure (tokens the chunk-frequency strip would remove), and
    phrasal novelty (5-gram micro-average).  Every rate is an IEEE
    division of integer-derived values, so the sheet is bit-replayable.

    100 TB shape: five independent bounded per-source aggregates —
    token/char sums (one scan), vocabulary (distinct-token agg),
    fingerprint group sizes (hash agg + join-back, the
    corpus_dup_aware_sample shape the skew probe covers), the chunk
    report, and the novelty rollup — joined on the ~|sources|-row
    source key (broadcast-sized by construction)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    toks = tx.tokens("text")
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    vocab = (
        d.select("source", F.explode(F.array_distinct(toks)).alias("tok"))
        .groupBy("source")
        .agg(F.count_distinct("tok").cast("long").alias("vocab"))
    )
    fp = d.select("source", tx.content_fingerprint("text").alias("fp_content"))
    gs = fp.groupBy("fp_content").agg(F.count(F.lit(1)).alias("gsize"))
    dup = (
        fp.join(gs, "fp_content")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("gsize") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_docs")
        )
    )
    boiler = dd.chunk_frequency_report(
        d.select("doc_id", "source", "text")
    ).select("source", F.col("tokens_removed").alias("boiler_tokens_removed"))
    nov = dd.ngram_novelty_by_source(d.select("doc_id", "source", "text")).select(
        "source", "n_grams", "n_novel"
    )
    # LEFT joins from base so a source whose every document tokenizes to
    # empty (or is shorter than the novelty width) still appears on the
    # sheet with zeroed counts and NULL rates, instead of silently
    # vanishing from its own datasheet (review r10); rates guard their
    # denominators for the same degenerate sources.
    out = (
        base.join(vocab, "source", "left")
        .join(dup, "source", "left")
        .join(boiler, "source", "left")
        .join(nov, "source", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
    rate = lambda num, den: F.when(
        F.col(den) > 0,
        F.coalesce(F.col(num), F.lit(0)).cast("double")
        / F.col(den).cast("double"),
    )
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        z("vocab"),
        z("dup_docs"),
        rate("dup_docs", "n_docs").alias("dup_rate"),
        z("boiler_tokens_removed"),
        rate("boiler_tokens_removed", "n_tokens").alias("boiler_removal_rate"),
        F.when(
            F.col("n_grams") > 0,
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        ).alias("novelty_micro"),
    ).orderBy("source")


_DATASHEET_ORACLE = f"""
WITH t AS (SELECT doc_id, source, n_chars, {TOKS_SQL} AS toks FROM documents),
base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM t GROUP BY source),
vocab AS (SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
          FROM (SELECT source, unnest(list_distinct(toks)) AS tok FROM t)
          GROUP BY source),
fp AS (SELECT source,
        {h64_sql("array_to_string(list_sort(list_distinct(toks)), ' ')")} AS fp_content
       FROM t),
gs AS (SELECT fp_content, COUNT(*) AS gsize FROM fp GROUP BY fp_content),
dup AS (SELECT source,
               CAST(SUM(CASE WHEN gsize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
        FROM fp JOIN gs USING (fp_content) GROUP BY source),
nz AS (SELECT * FROM t WHERE len(toks) > 0),
ch AS (SELECT doc_id, source,
              array_to_string(toks[(i - 1) * {_W} + 1:i * {_W}], ' ') AS chunk,
              len(toks[(i - 1) * {_W} + 1:i * {_W}]) AS chunk_toks
       FROM nz, unnest(generate_series(1, (len(toks) + {_W - 1}) // {_W})) AS u(i)),
dfr AS (SELECT chunk, COUNT(DISTINCT doc_id) AS dfreq FROM ch GROUP BY chunk),
boiler AS (SELECT source,
                  CAST(SUM(CASE WHEN dfreq >= {_K} AND chunk_toks = {_W}
                           THEN chunk_toks ELSE 0 END) AS BIGINT)
                    AS boiler_tokens_removed
           FROM ch JOIN dfr USING (chunk) GROUP BY source),
sh AS (SELECT doc_id, source, unnest({_shingles_sql(_NOV_N)}) AS s
       FROM t WHERE len(toks) >= {_NOV_N}),
gdf AS (SELECT s, COUNT(*) AS sdf FROM sh GROUP BY s),
nov AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN sdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM sh JOIN gdf USING (s) GROUP BY source)
SELECT b.source, b.n_docs, b.n_tokens, b.n_chars,
       CAST(COALESCE(v.vocab, 0) AS BIGINT) AS vocab,
       CAST(COALESCE(d.dup_docs, 0) AS BIGINT) AS dup_docs,
       CASE WHEN b.n_docs > 0 THEN
         CAST(COALESCE(d.dup_docs, 0) AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
       END AS dup_rate,
       CAST(COALESCE(bo.boiler_tokens_removed, 0) AS BIGINT)
         AS boiler_tokens_removed,
       CASE WHEN b.n_tokens > 0 THEN
         CAST(COALESCE(bo.boiler_tokens_removed, 0) AS DOUBLE)
           / CAST(b.n_tokens AS DOUBLE)
       END AS boiler_removal_rate,
       CASE WHEN n.n_grams > 0 THEN
         CAST(n.n_novel AS DOUBLE) / CAST(n.n_grams AS DOUBLE)
       END AS novelty_micro
FROM base b
LEFT JOIN vocab v USING (source)
LEFT JOIN dup d USING (source)
LEFT JOIN boiler bo USING (source)
LEFT JOIN nov n USING (source)
ORDER BY source
"""


QUERIES = [
    Query("text_token_stats", text_token_stats, TEXT_TOKEN_STATS_ORACLE,
          ("text", "pipeline")),
    Query("text_quality_scores", text_quality_scores, TEXT_QUALITY_ORACLE,
          ("text", "pipeline")),
    Query("text_language_id", text_language_id, _lang_id_oracle(),
          ("text", "pipeline"), bench=True),
    Query("text_fingerprints", text_fingerprints, TEXT_FINGERPRINT_ORACLE,
          ("text", "pipeline")),
    Query("text_pii_scan", text_pii_scan, _PII_ORACLE, ("text", "pipeline"),
          doc="PII detect+redact (emails/phones/IPv4), planted-PII oracle "
              "incl. redacted-text MD5"),
    Query("text_repetition_scores", text_repetition_scores, _REPETITION_ORACLE,
          ("text", "pipeline"),
          doc="Gopher-style repetition signals: dup-token/dup-3gram/"
              "top-token fractions"),
    Query("text_boilerplate_profile", text_boilerplate_profile,
          _BOILERPLATE_ORACLE, ("text", "pipeline"), bench=True,
          doc="CCNet-style per-source boilerplate n-gram profile: df>=4 "
              "2-grams flagged, single DF-count agg + annotate-back join"),
    Query("decontamination_ngrams", decontamination_ngrams,
          _DECONTAMINATION_ORACLE, ("dedup", "pipeline"),
          doc="train/eval 5-gram overlap sweep, df-capped gram blocking"),
    Query("dedup_exact_fingerprint", dedup_exact_fingerprint, DEDUP_EXACT_ORACLE,
          ("dedup", "pipeline"), bench=True),
    Query("dedup_cross_source_matrix", dedup_cross_source_matrix,
          _CROSS_SOURCE_ORACLE, ("dedup", "pipeline"), bench=True,
          doc="cross-source duplicate-overlap matrix on the content "
              "fingerprint: one (fp, source) hash agg + S²-bounded "
              "self-equi-join — crawl-provenance / mirror detection"),
    Query("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_ORACLE,
          ("dedup", "pipeline")),
    Query("dedup_chunk_frequency", dedup_chunk_frequency, _CHUNK_FREQ_ORACLE,
          ("dedup", "text", "pipeline"), bench=True,
          doc="C4/CCNet-style sub-document frequency dedup: fixed 10-token "
              "chunks, corpus-wide distinct-doc frequency, full-width "
              "chunks in >=3 docs costed as removed boilerplate — "
              "per-source tokens kept/removed; all shuffles keyed on the "
              "chunk (hash aggs + equi-join back)"),
    Query("dedup_chunk_width_curve", dedup_chunk_width_curve,
          _chunk_width_curve_oracle(), ("dedup", "text", "pipeline"),
          doc="chunk-width tuning curve for sub-document dedup: corpus "
              "totals + removal rate at widths 5/10/20 — the measured "
              "data behind the CHUNK_W=10 operating point; one no-join "
              "chunk-grain hash agg per width"),
    Query("corpus_datasheet", corpus_datasheet, _DATASHEET_ORACLE,
          ("text", "dedup", "pipeline"),
          doc="per-source data-card sheet: volume (docs/tokens/chars), "
              "vocabulary, exact-dup docs + rate, boilerplate-strip token "
              "exposure, 5-gram novelty — five bounded per-source "
              "aggregates joined on the ~|sources|-row key, every rate "
              "integer-derived"),
    Query("dedup_chunk_excise", dedup_chunk_excise, _CHUNK_EXCISE_ORACLE,
          ("dedup", "text", "pipeline"),
          doc="executable boilerplate strip: documents reconstructed with "
              "duplicated full-width chunks excised, kept chunks re-joined "
              "in order (anti-join on the chunk key + one groupBy on the "
              "doc id) — the transform dedup_chunk_frequency costs"),
    Query("dedup_chunk_excise_keep_first", dedup_chunk_excise_keep_first,
          _CHUNK_EXCISE_KEEP_FIRST_ORACLE, ("dedup", "text", "pipeline"),
          doc="C4-proper strip: exactly one occurrence of each boilerplate "
              "chunk survives corpus-wide (min doc id, then min offset — "
              "'discard all but one' made deterministic); keeper is one "
              "min(struct) column on the same chunk-keyed agg"),
    Query("text_ngram_novelty", text_ngram_novelty, _NGRAM_NOVELTY_ORACLE,
          ("text", "dedup", "pipeline"),
          doc="per-source 5-gram novelty: micro-averaged fraction of "
              "distinct grams unique to one document plus min/max "
              "per-doc fraction — the 'genuinely new text' curation "
              "statistic; gram-keyed hash agg + equi-join back"),
    Query("dedup_split_leakage", dedup_split_leakage, SPLIT_LEAKAGE_ORACLE,
          ("dedup", "sampling", "pipeline"),
          doc="train/eval contamination audit: near-dup pairs straddling "
              "the 10% hash split, pair counts + worst Jaccard per split "
              "cell (blocked equi-join, split label is a pure hash expr)"),
    Query("embedding_semantic_decontam", embedding_semantic_decontam,
          _SEMANTIC_DECONTAM_ORACLE, ("similarity", "dedup", "pipeline"),
          doc="semantic decontamination review queue: top-25 corpus vectors "
              "by exact cosine vs the broadcast benchmark embeddings, "
              "best match per vector via one max(struct) agg"),
    Query("dedup_benchmark_decontam", dedup_benchmark_decontam,
          _BENCH_DECONTAM_ORACLE, ("dedup", "sampling", "pipeline"),
          bench=True,
          doc="GPT-3-style decontamination vs an external eval-set table: "
              "per-doc 3-gram contamination score via broadcast semi-join "
              "against the benchmark gram set, docs at the shared "
              "_DECONTAM_THRESHOLD (0.08) flagged"),
    Query("dedup_benchmark_decontam_8gram", dedup_benchmark_decontam_8gram,
          _BENCH_DECONTAM_8GRAM_ORACLE, ("dedup", "sampling", "pipeline"),
          doc="production-width (GPT-3-style) decontamination: 8-gram "
              "shingles, ANY collision flags — the operating point real "
              "pretraining pipelines run; same broadcast-semi-join shape "
              "as the 3-gram fixture-regime variant"),
    Query("dedup_benchmark_decontam_8gram_norm",
          dedup_benchmark_decontam_8gram_norm,
          _BENCH_DECONTAM_8GRAM_NORM_ORACLE, ("dedup", "sampling", "pipeline"),
          doc="normalized production-width decontamination: GPT-3-appendix-"
              "C-style lowercase+punctuation-strip normalization (identical "
              "translate+regexp_replace in both engines) applied before "
              "8-gram any-collision matching, so cased/re-punctuated "
              "variants of eval items no longer evade the check"),
    Query("decontam_span_report", decontam_span_report,
          _decontam_span_oracle(), ("dedup", "sampling", "pipeline"),
          doc="span-level contamination at the 8-gram operating point: "
              "maximal token-offset spans of benchmark collisions per doc "
              "(posexplode windows -> broadcast semi-join -> islands merge) "
              "— the PaLM-style surgical-excision form instead of "
              "whole-doc drops"),
    Query("decontam_span_report_norm", decontam_span_report_norm,
          _decontam_span_norm_oracle(), ("dedup", "sampling", "pipeline"),
          doc="normalized-operating-point span report with RAW-offset "
              "excision spans: per-raw-token provenance through the "
              "normalization (split/deleted tokens handled), positional "
              "8-gram leads, broadcast semi-join, running-max interval "
              "merge — closes decontam_span_report's documented "
              "normalized-to-raw offset-map limitation"),
    Query("decontam_excision_economics_norm", decontam_excision_economics_norm,
          _decontam_excision_norm_oracle(), ("dedup", "sampling", "pipeline"),
          doc="excision economics at the normalized operating point (the "
              "one production pipelines run): whole-doc-drop tokens vs "
              "normalized-span excised tokens per source, spans already "
              "in raw offsets so both sides count raw tokens"),
    Query("decontam_excision_economics", decontam_excision_economics,
          _decontam_excision_oracle(), ("dedup", "sampling", "pipeline"),
          doc="span-excision economics per source: tokens a whole-doc "
              "drop policy discards vs tokens the span policy excises — "
              "tokens_recovered is the clean data surgical removal saves "
              "at the production 8-gram operating point"),
    Query("decontam_width_curve", decontam_width_curve,
          _decontam_width_curve_oracle(), ("dedup", "sampling", "pipeline"),
          doc="n-gram-width tuning curve for decontamination: any-"
              "collision document counts at widths 3/5/8 — width 3 flags "
              "51% of this corpus, widths 5/8 only the genuine copy; one "
              "broadcast-semi-join pass per width"),
    Query("decontam_rate_by_source", decontam_rate_by_source,
          _DECONTAM_BY_SOURCE_ORACLE, ("dedup", "sampling", "pipeline"),
          doc="per-source contamination rate + worst score vs the external "
              "benchmark — the crawl-overlap dashboard number; zero-hit "
              "docs counted via left join, no second text scan"),
    Query("dedup_minhash_quality", dedup_minhash_quality,
          _minhash_quality_oracle(), ("dedup", "pipeline"),
          doc="MinHash-LSH precision/recall vs exact Jaccard ground truth, "
              "confusion counts differential-checked"),
    Query("dedup_minhash_lsh", dedup_minhash_lsh, _minhash_oracle(),
          ("dedup", "pipeline"), bench=True),
    Query("dedup_minhash_recall", dedup_minhash_recall, _minhash_recall_oracle(),
          ("dedup", "pipeline"),
          doc="recall-tuned b=8/r=2 banding of the same 16 permutations "
              "(s-curve midpoint ~0.35): the high-recall serving "
              "configuration, same est filter and skew cap"),
    Query("corpus_dup_aware_sample", corpus_dup_aware_sample,
          _DUP_AWARE_SAMPLE_ORACLE, ("sampling", "dedup", "pipeline"),
          doc="duplicate-count-aware downsampling: keep each copy with "
              "deterministic-hash probability ~1/group_size (unit total "
              "weight per duplicate group, no rng, no joins)"),
    Query("dedup_banding_tradeoff", dedup_banding_tradeoff,
          _banding_tradeoff_oracle(), ("dedup", "pipeline", "quality"),
          doc="precision/recall of b=4/r=4 vs b=8/r=2 banding against one "
              "exact Jaccard truth — the s-curve trade measured on live "
              "data, confusion counts differential-checked"),
    Query("dedup_band_cap_audit", dedup_band_cap_audit, _band_cap_audit_oracle(),
          ("dedup", "pipeline", "quality"),
          doc="MAX_BAND_BUCKET observability: buckets/band-rows/docs the "
              "skew cap routes out of the pair join (zero on a healthy "
              "corpus; the boilerplate-flood alarm)"),
    Query("dedup_simhash", dedup_simhash, _simhash_oracle(),
          ("dedup", "pipeline")),
    Query("dedup_incremental", dedup_incremental, _incremental_dedup_oracle(),
          ("dedup", "pipeline"),
          doc="new-snapshot-vs-corpus dedup: exact fp + LSH vs corpus, "
              "no corpus self-join (the recurring-ingest shape)"),
    Query("dedup_duplicate_groups", dedup_duplicate_groups, _dup_groups_oracle(),
          ("dedup", "pipeline", "graph"),
          doc="connected components over the near-dup pair graph"),
    Query("split_cluster_safe", split_cluster_safe, SPLIT_CLUSTER_SAFE_ORACLE,
          ("sampling", "dedup", "pipeline", "graph"),
          doc="near-dup-safe 90/5/5 split: the draw is per duplicate "
              "CLUSTER (CC canonical id hash), so near-copies never "
              "straddle an eval boundary — doc-level assignment"),
    Query("split_cluster_safe_audit", split_cluster_safe_audit,
          SPLIT_CLUSTER_AUDIT_ORACLE,
          ("sampling", "dedup", "pipeline", "graph"),
          doc="per-split doc/cluster counts + the zero-leaked-pairs proof "
              "column a per-document hash split fails"),
    Query("sample_hash_uniform", sample_hash_uniform, SAMPLE_UNIFORM_ORACLE,
          ("sampling", "pipeline")),
    Query("sample_hash_split", sample_hash_split, SAMPLE_SPLIT_ORACLE,
          ("sampling", "pipeline")),
    Query("sample_weighted_reservoir", sample_weighted_reservoir,
          SAMPLE_WEIGHTED_ORACLE, ("sampling", "pipeline"),
          doc="Efraimidis-Spirakis exact-k weighted sample without "
              "replacement: snapped ln(u)/w keys, bounded top-k, "
              "engine-replayable"),
    Query("sample_stratified", sample_stratified, SAMPLE_STRATIFIED_ORACLE,
          ("sampling", "pipeline")),
    Query("corpus_vocabulary", corpus_vocabulary, VOCABULARY_ORACLE,
          ("text", "pipeline"), bench=True),
    Query("sketch_kmv_distinct", sketch_kmv_distinct, _kmv_oracle(),
          ("sketch", "pipeline"), doc="KMV distinct-count sketch, estimate oracle-checked"),
    Query("sketch_kmv_set_ops", sketch_kmv_set_ops, _kmv_set_ops_oracle(),
          ("sketch", "pipeline"),
          doc="union/intersection/Jaccard from mergeable KMV synopses "
              "(audience overlap on O(k) state), estimates oracle-checked"),
    Query("sketch_kmv_per_group", sketch_kmv_per_group, _kmv_per_group_oracle(),
          ("sketch", "pipeline"),
          doc="per-group distinct estimates from per-group k-min synopses "
              "(O(groups x k) state), estimates oracle-checked"),
    Query("corpus_temperature_mix", corpus_temperature_mix,
          _temperature_mix_oracle(), ("sampling", "pipeline"),
          doc="temperature-scaled rebalancing (p ~ n^0.7) with corpus-"
              "derived rates and deterministic hash membership"),
    Query("sketch_cms_heavy_hitters", sketch_cms_heavy_hitters, _cms_oracle(),
          ("sketch", "pipeline"),
          doc="count-min frequency sketch, estimates (incl. collisions) oracle-checked"),
    Query("corpus_curation", corpus_curation, _curation_oracle(),
          ("text", "dedup", "pipeline"), bench=True,
          doc="lang filter + quality bar + canonical-copy dedup, one pipeline"),
    Query("corpus_training_ready", corpus_training_ready,
          _training_ready_oracle(), ("text", "dedup", "sampling", "pipeline"),
          doc="curation + Gopher repetition gate COMPOSED with benchmark "
              "decontamination + bench-row exclusion in one lazy DAG: "
              "per-source (docs, tokens) of the corpus that actually "
              "trains"),
    Query("corpus_assembly_tokens", corpus_assembly_tokens,
          _assembly_tokens_oracle(), ("text", "dedup", "sampling", "pipeline"),
          doc="the final assembly stage: C4-style boilerplate strip over "
              "the training-ready set (chunk frequency computed over the "
              "post-dedup survivors) — per-source ready vs final docs and "
              "tokens, the number a training run actually ingests"),
    Query("pipeline_stage_yield", pipeline_stage_yield, _stage_yield_oracle(),
          ("text", "dedup", "pipeline"),
          doc="per-source stage-yield funnel (raw→lang→quality→dedup, docs "
              "+ tokens) in one scan via conditional aggregation"),
    Query("embedding_cosine_topk", embedding_cosine_topk, EMBEDDING_TOPK_ORACLE,
          ("similarity", "pipeline"), bench=True),
    Query("embedding_ivf_topk", embedding_ivf_topk, _IVF_ORACLE,
          ("similarity", "pipeline"), bench=True),
    Query("embedding_ivf_recall", embedding_ivf_recall, _ivf_recall_oracle(),
          ("similarity", "pipeline"),
          doc="recall@10 of the IVF index vs exact search, overlap "
              "differential-checked"),
    Query("embedding_ivf_recall_curve", embedding_ivf_recall_curve,
          _ivf_recall_curve_oracle(), ("similarity", "pipeline", "embedding"),
          doc="recall@10 at nprobe = 1/2/4 over the same materialized "
              "index — the effort/recall tuning curve, every probe and "
              "overlap differential-checked"),
    Query("embedding_kmeans_refine", embedding_kmeans_refine, _KMEANS_ORACLE,
          ("similarity", "pipeline"),
          doc="spherical k-means Lloyd step (IVF centroid training), exact-decimal means"),
    Query("embedding_near_duplicates", embedding_near_duplicates, _srp_oracle(),
          ("similarity", "pipeline")),
    Query("dedup_semantic", dedup_semantic, _SEMANTIC_DEDUP_ORACLE,
          ("dedup", "similarity", "pipeline"),
          doc="SemDeDup: IVF cluster + within-cluster cosine prune, "
              "keep-lowest-id canonical (arXiv:2303.09540)"),
    Query("dedup_semantic_threshold_curve", dedup_semantic_threshold_curve,
          _SEMDEDUP_CURVE_ORACLE, ("dedup", "similarity", "pipeline"),
          doc="SemDeDup threshold tuning curve: pruned count + retention "
              "at cosine 0.25/0.3/0.35/0.5 from ONE pair-join pass "
              "(literal-threshold conditional sums stacked to long "
              "format) — the measured data behind the 0.35 operating "
              "point"),
    Query("multimodal_feature_extract", multimodal_feature_extract,
          _MULTIMODAL_FEATURES_ORACLE, ("multimodal", "pipeline"),
          doc="real PPM/BMP/PNG/GIF encode→decode round-trip, pixel-stat oracle"),
    Query("multimodal_resize_box", multimodal_resize_box,
          _MULTIMODAL_RESIZE_ORACLE, ("multimodal", "pipeline"),
          doc="real decode + 2x box-filter downscale (numpy-vectorized "
              "mapInPandas), every resized pixel oracle-recomputed"),
    Query("multimodal_image_dedup", multimodal_image_dedup,
          _IMAGE_DEDUP_ORACLE, ("multimodal", "dedup", "pipeline"),
          doc="perceptual image dedup: real decode + all-integer 4x3 "
              "average hash, equal hashes = near-dup buckets "
              "(equi-groupBy, no pairwise compare); every hash "
              "oracle-recomputed from the pixel formula"),
    Query("multimodal_image_dedup_full", multimodal_image_dedup_full,
          _IMAGE_DEDUP_FULL_ORACLE, ("multimodal", "dedup", "pipeline"),
          doc="UNBOUNDED perceptual image dedup (the scale100-probe form, "
              "4.4x at 100x, now oracle-checked): every document's image "
              "encoded, real-decoded, aHashed and bucket-sized; oracle "
              "recomputes every hash from the pixel formula — tractable "
              "unbounded because synthesized dims are globally <= 16x13"),
    Query("multimodal_jpeg_roundtrip", multimodal_jpeg_roundtrip,
          _MULTIMODAL_JPEG_ORACLE, ("multimodal", "pipeline"), bench=True,
          doc="baseline JPEG (444+420) encode→decode with in-pass tolerance audit"),
    Query("binary_chunking", binary_chunking, _BINARY_CHUNKING_ORACLE,
          ("multimodal", "pipeline"),
          doc="flatMap blob sharding, chunk boundaries + content MD5-pinned"),
    Query("dedup_levenshtein", dedup_levenshtein, DEDUP_LEVENSHTEIN_ORACLE,
          ("dedup", "pipeline"),
          doc="edit-distance fuzzy pairs, token-blocked candidate join"),
    Query("multimodal_metadata", multimodal_metadata, MULTIMODAL_META_ORACLE,
          ("multimodal", "pipeline"),
          doc="binary payload + metadata struct, UTF-8 octet length, payload MD5"),
    Query("embedding_batch_topk", embedding_batch_topk, EMBEDDING_BATCH_TOPK_ORACLE,
          ("similarity", "pipeline"),
          doc="top-k per query vector for a broadcast query batch, one job"),
]


# ---------------------------------------------------------------------------
# Product quantization + ADC (round 4): the memory-compression half of
# IVF-PQ.  Oracle replays the full encode + lookup-table pipeline in SQL.
# ---------------------------------------------------------------------------

def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.pq_adc_topk(e, query_id=0, n_codes=16, m=4, dims=64, k=10)


EMBEDDING_PQ_ORACLE = f"""
WITH {_EX_SQL.strip()},
el AS (
  SELECT vec_id, a,
         CAST(FLOOR((i - 1) / 16) AS INT) AS j,
         CAST((i - 1) % 16 AS INT) AS pos
  FROM ex
),
cb AS (
  SELECT CAST(vec_id - 1 AS INT) AS c, j, pos, a AS b
  FROM el WHERE vec_id BETWEEN 1 AND 16
),
d2 AS (
  SELECT el.vec_id, el.j, cb.c,
         CAST(ROUND(SUM((el.a - cb.b) * (el.a - cb.b)), 6) AS DECIMAL(24,6)) AS d2
  FROM el JOIN cb ON el.j = cb.j AND el.pos = cb.pos
  WHERE el.vec_id <> 0
  GROUP BY el.vec_id, el.j, cb.c
),
codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    FROM d2
  ) WHERE rn = 1
),
qd AS (
  SELECT el.j, cb.c,
         CAST(ROUND(SUM((el.a - cb.b) * (el.a - cb.b)), 6) AS DECIMAL(24,6)) AS qd2
  FROM el JOIN cb ON el.j = cb.j AND el.pos = cb.pos
  WHERE el.vec_id = 0
  GROUP BY el.j, cb.c
)
SELECT codes.vec_id,
       CAST(CAST(SUM(qd.qd2) AS DECIMAL(24,6)) AS DOUBLE) AS adc_dist
FROM codes JOIN qd ON codes.j = qd.j AND codes.code = qd.c
GROUP BY codes.vec_id
ORDER BY adc_dist, codes.vec_id LIMIT 10
"""

def embedding_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact rerank (operators/similarity.py:ivf_pq_topk) —
    the three-stage production ANN shape: coarse-quantizer probe prunes
    to IVF_NPROBE of IVF_K cells, asymmetric PQ distance ranks the
    probed vectors without decoding, the 40-best shortlist is re-scored
    with the exact decimal cosine.  The oracle replays probe, assignment,
    encode, ADC and rerank bit-exactly.

    Reuses embedding_ivf_topk's materialized partitioned index for the
    assignment (same IVF_K seed-centroid convention), so the per-query
    plan prunes index partitions instead of re-scoring the corpus
    against every centroid — the build/probe split in service shape."""
    import os

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= IVF_K))
    index_path = _ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(index_path, "_SUCCESS")):
        sim.ivf_build(e.filter(F.col("vec_id") != 0), centroids, index_path)
    assigned = spark.read.parquet(index_path)
    return sim.ivf_pq_topk(
        e, query_id=0, n_cells=IVF_K, nprobe=IVF_NPROBE,
        n_codes=16, m=4, dims=64, shortlist=40, k=10, assigned=assigned,
    )


# Assignment/probe CTEs follow _IVF_ORACLE; encode/ADC CTEs follow
# EMBEDDING_PQ_ORACLE; the rerank follows EMBEDDING_TOPK_ORACLE — one
# composed statement so every stage constant is interpolated once.
EMBEDDING_IVF_PQ_ORACLE = f"""
WITH {_EX_SQL.strip()},
nrm AS (
  SELECT vec_id, CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nn
  FROM ex GROUP BY vec_id
),
cc AS (
  SELECT x.vec_id, c.vec_id AS cell_id,
         CAST(CAST(ROUND(SUM(x.a * c.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x
  JOIN ex c ON c.i = x.i AND c.vec_id BETWEEN 1 AND {IVF_K}
  WHERE x.vec_id >= 1
  GROUP BY x.vec_id, c.vec_id
),
cosc AS (
  SELECT cc.vec_id, cc.cell_id, cc.dot / (sqrt(nx.nn) * sqrt(nc.nn)) AS cos
  FROM cc
  JOIN nrm nx ON nx.vec_id = cc.vec_id
  JOIN nrm nc ON nc.vec_id = cc.cell_id
),
assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT vec_id, cell_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell_id) AS rn
    FROM cosc
  ) WHERE rn = 1
),
qdp AS (
  SELECT c.vec_id AS cell_id,
         CAST(CAST(ROUND(SUM(q.a * c.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex q
  JOIN ex c ON c.i = q.i AND c.vec_id BETWEEN 1 AND {IVF_K}
  WHERE q.vec_id = 0
  GROUP BY c.vec_id
),
probe AS (
  SELECT cell_id FROM (
    SELECT qdp.cell_id, CASE WHEN nq.nn > 0 AND nc.nn > 0
           THEN qdp.dot / (sqrt(nq.nn) * sqrt(nc.nn)) ELSE -2.0 END AS cos
    FROM qdp
    JOIN nrm nq ON nq.vec_id = 0
    JOIN nrm nc ON nc.vec_id = qdp.cell_id
    ORDER BY cos DESC, qdp.cell_id LIMIT {IVF_NPROBE}
  )
),
probedids AS (
  SELECT a2.vec_id FROM assign a2 JOIN probe USING (cell_id)
),
el AS (
  SELECT vec_id, a,
         CAST(FLOOR((i - 1) / 16) AS INT) AS j,
         CAST((i - 1) % 16 AS INT) AS pos
  FROM ex
),
cb AS (
  SELECT CAST(vec_id - 1 AS INT) AS c, j, pos, a AS b
  FROM el WHERE vec_id BETWEEN 1 AND 16
),
d2 AS (
  SELECT el.vec_id, el.j, cb.c,
         CAST(ROUND(SUM((el.a - cb.b) * (el.a - cb.b)), 6) AS DECIMAL(24,6)) AS d2
  FROM el JOIN cb ON el.j = cb.j AND el.pos = cb.pos
  WHERE el.vec_id IN (SELECT vec_id FROM probedids)
  GROUP BY el.vec_id, el.j, cb.c
),
codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    FROM d2
  ) WHERE rn = 1
),
qdt AS (
  SELECT el.j, cb.c,
         CAST(ROUND(SUM((el.a - cb.b) * (el.a - cb.b)), 6) AS DECIMAL(24,6)) AS qd2
  FROM el JOIN cb ON el.j = cb.j AND el.pos = cb.pos
  WHERE el.vec_id = 0
  GROUP BY el.j, cb.c
),
short AS (
  SELECT codes.vec_id,
         CAST(CAST(SUM(qdt.qd2) AS DECIMAL(24,6)) AS DOUBLE) AS adc_dist
  FROM codes JOIN qdt ON codes.j = qdt.j AND codes.code = qdt.c
  GROUP BY codes.vec_id
  ORDER BY adc_dist, codes.vec_id LIMIT 40
),
rr AS (
  SELECT ex.vec_id,
         CAST(CAST(ROUND(SUM(ex.a * q.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex JOIN ex q ON q.i = ex.i AND q.vec_id = 0
  WHERE ex.vec_id IN (SELECT vec_id FROM short)
  GROUP BY ex.vec_id
)
SELECT rr.vec_id, short.adc_dist,
       CASE WHEN nx.nn > 0 AND nq.nn > 0
            THEN rr.dot / (sqrt(nx.nn) * sqrt(nq.nn)) ELSE -2.0 END AS cosine
FROM rr
JOIN short ON short.vec_id = rr.vec_id
JOIN nrm nx ON nx.vec_id = rr.vec_id
JOIN nrm nq ON nq.vec_id = 0
ORDER BY cosine DESC, rr.vec_id LIMIT 10
"""

def embedding_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the full IVF-PQ pipeline against exact brute-force
    search — the compound approximation loss of BOTH lossy stages (cell
    pruning may miss true neighbours entirely; PQ distortion may rank
    them out of the shortlist).  The sibling of embedding_ivf_recall,
    which audits cell pruning alone: the difference between the two
    numbers is the PQ stage's marginal cost on live data.  Both result
    sets come from the engine's own operators and the oracle recomputes
    both searches plus the overlap, so the recall number itself is
    differential-checked."""
    ivfpq = embedding_ivf_pq_topk(spark, sf_dir).select("vec_id")
    e = load_table(spark, sf_dir, "embeddings")
    exact = sim.cosine_topk(
        e.filter(F.col("vec_id") != 0), e.filter(F.col("vec_id") == 0), k=10
    ).select("vec_id")
    return (
        ivfpq.join(exact, "vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(
            F.lit(10).cast("long").alias("k"),
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(10.0)).alias("recall_at_k"),
        )
    )


def _ivf_pq_recall_oracle() -> str:
    return f"""
SELECT CAST(10 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_k
FROM ({EMBEDDING_IVF_PQ_ORACLE}) ivfpq
JOIN ({EMBEDDING_TOPK_ORACLE}) exact ON ivfpq.vec_id = exact.vec_id
"""


QUERIES += [
    Query("embedding_pq_adc_topk", embedding_pq_adc_topk, EMBEDDING_PQ_ORACLE,
          ("similarity", "pipeline"),
          doc="product quantization (m=4, 16 codes, seed codebooks) + "
              "asymmetric-distance top-k; oracle replays encode + ADC "
              "lookup table bit-exactly"),
    Query("embedding_ivf_pq_topk", embedding_ivf_pq_topk,
          EMBEDDING_IVF_PQ_ORACLE, ("similarity", "pipeline", "embedding"),
          bench=True,
          doc="IVF-PQ with exact rerank: coarse-cell probe prunes the "
              "corpus, asymmetric PQ distance shortlists 40, exact "
              "decimal-cosine rerank returns top-10 — the three-stage "
              "production ANN composition, all stages replayed bit-"
              "exactly by the oracle"),
    Query("embedding_ivf_pq_recall", embedding_ivf_pq_recall,
          _ivf_pq_recall_oracle(), ("similarity", "pipeline", "embedding"),
          doc="recall@10 of IVF-PQ (probe + ADC + rerank) vs exact "
              "search — the COMPOUND approximation loss of both lossy "
              "stages, overlap differential-checked"),
]
