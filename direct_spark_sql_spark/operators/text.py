"""Text analysis operators: tokenization, language ID, quality scoring,
token counting, document fingerprinting.

All pure `pyspark.sql.functions` (JVM-side, codegen'd, no Python in the hot
path) over a `text` column of whitespace-separated tokens.  Each operator
has an exact DuckDB-SQL twin in plans/pipeline.py — deterministic by
construction (integer counts, single-division doubles, MD5 fingerprints).

Scale: every operator is a per-row map (no shuffle at all) except the
corpus-level aggregations, which are plain partial+final hash aggs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from direct_spark_sql_spark.hashing import MERSENNE_P, h64

#: Minimal function-word lexicons for the language-ID heuristic.  Real
#: pipelines plug in larger lists; the operator only assumes "a lexicon per
#: language" and scores by hit count.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "en"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es": ("el", "la", "de", "y", "los", "las", "un", "una", "en", "que"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"),
}

#: Stopwords for the quality score (English function words).
STOPWORDS: tuple[str, ...] = LANG_LEXICONS["en"]


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokenization (single-space split, empty tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: F.length(t) > 0)


def token_count(col: Column | str = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def regex_token_count(col: Column | str = "text") -> Column:
    """BPE-ish token counting: runs of word characters or single
    non-word-non-space characters, the usual pre-tokenizer shape."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)).cast("long")


def _hit_count(toks: Column, lexicon: tuple[str, ...]) -> Column:
    """Non-distinct count of tokens that appear in the lexicon (JVM-side
    higher-order filter, no explode/shuffle)."""
    arr = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def language_scores(col: Column | str = "text") -> list[tuple[str, Column]]:
    toks = tokens(col)
    return [(lang, _hit_count(toks, lex)) for lang, lex in LANG_LEXICONS.items()]


def _language_hit_struct(col: Column | str) -> Column:
    """All lexicon hit counts in a SINGLE token-array pass: one aggregate
    accumulating a struct of per-language counters, instead of one filter
    pass per language.  HOFs evaluate interpreted (CodegenFallback), so the
    per-token walk dominates — folding 5 passes into 1 measured 40% faster
    on the sf0.1 documents corpus at identical output."""
    langs = sorted(LANG_LEXICONS)
    arrs = {l: F.array(*[F.lit(w) for w in LANG_LEXICONS[l]]) for l in langs}
    zero = F.struct(*[F.lit(0).cast("int").alias(f"c_{l}") for l in langs])

    def step(acc: Column, t: Column) -> Column:
        return F.struct(*[
            (acc[f"c_{l}"] + F.when(F.array_contains(arrs[l], t), 1).otherwise(0))
            .alias(f"c_{l}")
            for l in langs
        ])

    return F.aggregate(tokens(col), zero, step)


def predicted_language(col: Column | str = "text") -> Column:
    """argmax of lexicon hit counts; deterministic tiebreak = alphabetical
    language code (greatest(...) with ordered CASE)."""
    langs = sorted(LANG_LEXICONS)
    counts = _language_hit_struct(col)
    best = F.greatest(*[counts[f"c_{l}"] for l in langs])
    expr = None
    for lang in langs:
        cond = counts[f"c_{lang}"] == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token counts, type-token ratio,
    average token length, stopword ratio, and a composite score.

    The composite is a linear combination evaluated in a fixed order so the
    IEEE result is reproducible across engines.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    n_stop = _hit_count(toks, STOPWORDS)
    ttr = n_uniq.cast("double") / n_tok
    avg_len = total_len.cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        ttr.alias("type_token_ratio"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        # composite: favor lexical diversity and moderate length, penalize
        # stopword stuffing — fixed evaluation order for determinism
        (ttr * F.lit(0.5) + stop_ratio * F.lit(0.2)
         + F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.3)
         ).alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``fp_md5``      — exact-content fingerprint (MD5 hex of raw text)
    - ``fp_content``  — order/multiplicity-insensitive content fingerprint:
      60-bit hash of the sorted distinct token list (catches reshuffled
      near-duplicates)
    - ``fp_rolling``  — additive rolling hash: sum of per-token 60-bit
      hashes mod 2^31-1 (order-insensitive but multiplicity-sensitive)
    """
    toks = tokens(text_col)
    sorted_uniq = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    rolling = F.aggregate(
        F.transform(toks, lambda t: h64(t) % MERSENNE_P),
        F.lit(0).cast("long"),
        lambda acc, h: (acc + h) % MERSENNE_P,
    )
    return df.select(
        "*",
        F.md5(F.col(text_col)).alias("fp_md5"),
        h64(sorted_uniq).alias("fp_content"),
        rolling.alias("fp_rolling"),
    )
