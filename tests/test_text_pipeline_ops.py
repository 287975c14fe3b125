"""Behavior tests for the round-2 training-pipeline text operators: PII
detect/redact, repetition quality signals, and train/eval decontamination.
The registry oracle sweep checks them bit-exactly against DuckDB; these pin
the operator-level semantics on crafted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from direct_spark_sql_spark.operators import text as tx


def test_pii_scan_detects_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jo.smith+x@mail-host.org or 555-123-4567"),
            (2, "server at 192.168.0.1 and backup 10.0.0.2"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tx.pii_scan(df).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ipv4) == (1, 1, 0)
    assert rows[1].redacted == "reach me at <EMAIL> or <PHONE>"
    assert (rows[2].n_ipv4, rows[2].n_emails) == (2, 0)
    assert rows[2].redacted == "server at <IP> and backup <IP>"
    assert not rows[3].has_pii and rows[3].redacted == rows[3].text


def test_repetition_features_on_crafted_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # one token repeated 4x
            (2, "w x y z"),            # all unique
            (3, "p q p q p q"),        # "p q p"/"q p q" alternating grams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in tx.repetition_features(df).collect()}
    assert rows[1].dup_token_frac == 0.75          # 4 tokens, 1 distinct
    assert rows[1].dup_3gram_frac == 0.5           # grams: aaa, aaa (2 of 1)
    assert rows[1].top_token_frac == 1.0
    assert rows[2].dup_token_frac == 0.0
    assert rows[2].top_token_frac == 0.25
    assert rows[3].dup_3gram_frac == 0.5           # 4 grams, 2 distinct
    assert rows[3].top_token_frac == 0.5


def test_contamination_finds_planted_overlap(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, "completely unrelated training text about spark engines"),
            (2, f"prefix words then {shared} and a suffix"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"eval question mentions {shared} verbatim")],
        "doc_id long, text string",
    )
    pairs = tx.contamination_pairs(train, ev, n=5, min_shared=1).collect()
    assert [(p.train_id, p.eval_id) for p in pairs] == [(2, 100)]
    assert pairs[0].n_shared >= 6  # 10-token span → 6 shared 5-grams


def test_contamination_df_cap_drops_boilerplate(spark):
    boiler = "standard legal disclaimer applies to this document footer"
    train = spark.createDataFrame(
        [(i, f"doc {i} body text . {boiler}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"totally new eval material . {boiler}")],
        "doc_id long, text string",
    )
    # every train doc shares only the boilerplate grams; df cap 3 < 5 docs
    # drops them, so no pair survives
    assert tx.contamination_pairs(train, ev, n=5, max_gram_df=3).count() == 0
    # without the cap all 5 pairs appear
    assert tx.contamination_pairs(train, ev, n=5, max_gram_df=100).count() == 5


def test_h64_cross_engine_on_multibyte_text(spark, oracle):
    """Real corpora aren't ASCII: the MD5-family hash must agree across
    engines on CJK, emoji, combining marks, and mixed-script strings
    (both engines hash the UTF-8 bytes)."""
    import duckdb

    from direct_spark_sql_spark.hashing import h64, h64_sql

    samples = [
        "日本語の文書",          # Japanese
        "中文 mixed with ASCII",                  # Chinese + ASCII
        "café naïve résumé",          # Latin-1 accents
        "étoile",                                    # combining mark (NFD)
        "\U0001f600\U0001f680 emoji text",                # emoji
        "العربية",      # Arabic (RTL)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    got = {r.s: r.h for r in df.select("s", h64(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in samples:
        expected = con.execute(
            f"SELECT {h64_sql('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got[s] == expected, s


def test_tokens_and_shingles_on_multibyte_text(spark):
    """Whitespace tokenization and shingling must be byte-safe on
    multibyte input (no mojibake, no dropped tokens)."""
    from pyspark.sql import functions as F

    from direct_spark_sql_spark.operators.text import tokens

    df = spark.createDataFrame(
        [("café 日本語 \U0001f600 word",)], "text STRING"
    )
    toks = df.select(tokens("text").alias("t")).collect()[0].t
    assert toks == ["café", "日本語", "\U0001f600", "word"]


def test_boilerplate_ngrams_flags_shared_footer(spark):
    """A 2-gram shared by >= min_df docs of one source is boilerplate for
    that source only; unique content is never flagged; a doc made entirely
    of the footer has ratio 1.0."""
    footer = "all rights reserved"
    rows = [
        (1, "a", f"alpha beta {footer}"),
        (2, "a", f"gamma delta {footer}"),
        (3, "a", f"epsilon zeta {footer}"),
        (4, "a", footer),                      # pure boilerplate doc
        (5, "b", f"eta theta {footer}"),       # same text, other source: df=1
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    per_doc, boiler = __import__(
        "direct_spark_sql_spark.operators.text", fromlist=["text"]
    ).boilerplate_ngrams(df, n=2, min_df=3)

    flagged = {(r.source, r.gram) for r in boiler.collect()}
    assert ("a", "all rights") in flagged and ("a", "rights reserved") in flagged
    assert not any(src == "b" for src, _ in flagged)
    assert not any(g.startswith(("alpha", "gamma", "epsilon")) for _, g in flagged)

    pd_rows = {r.doc_id: r for r in per_doc.collect()}
    # "alpha beta all rights reserved" -> 4 distinct 2-grams, 2 boiler
    assert (pd_rows[1].n_grams, pd_rows[1].n_boiler) == (4, 2)
    assert (pd_rows[4].n_grams, pd_rows[4].n_boiler) == (2, 2)  # ratio 1.0
    assert pd_rows[5].n_boiler == 0
