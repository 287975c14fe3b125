"""Suffix-array ExactSubstr (operators/suffix.py, VERDICT r12 #8).

The planted boundary case is the verdict's done-criterion: a 49-token
repeat is EXCLUDED at the len-50 operating point and a 50-token repeat
is CAUGHT with exact boundaries.  The brute-force test holds dup_len to
a quadratic all-pairs Python reference on a corpus engineered with
whole-doc duplicates, nested repeats, and singleton docs.
"""

from __future__ import annotations

from direct_spark_sql_spark.operators.suffix import (
    exact_substring_spans_sa,
    suffix_dup_len,
)


def _mkdocs(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _words(seed: str, n: int):
    # deterministic distinct-ish fillers: 'seed0 seed1 ...'
    return [f"{seed}{i}" for i in range(n)]


def test_len50_boundary_49_excluded_50_caught(spark):
    shared49 = _words("s", 49)
    shared50 = _words("t", 50)
    docs = [
        shared49 + _words("a", 30),            # doc 0: 49-run at [0, 48]
        _words("b", 10) + shared49 + _words("c", 5),   # doc 1: 49-run at [10, 58]
        shared50 + _words("d", 20),            # doc 2: 50-run at [0, 49]
        _words("e", 7) + shared50,             # doc 3: 50-run at [7, 56]
    ]
    spans = exact_substring_spans_sa(_mkdocs(spark, docs), min_len=50)
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in spans.collect()
    }
    # the 49-token repeat produces NO span; the 50-token one exactly its run
    assert rows == {(2, 0, 49, 50), (3, 7, 56, 50)}, rows


def _brute_dup_len(docs):
    """All-pairs reference: dup_len(d, p) = longest common prefix of
    suffix (d, p) with any OTHER suffix position in the corpus."""
    suf = [
        (d, p, toks[p:])
        for d, toks in enumerate(docs)
        for p in range(len(toks))
    ]
    out = {}
    for i, (d, p, s) in enumerate(suf):
        best = 0
        for j, (d2, p2, s2) in enumerate(suf):
            if i == j:
                continue
            m = 0
            for a, b in zip(s, s2):
                if a != b:
                    break
                m += 1
            best = max(best, m)
        out[(d, p)] = best
    return out


def test_dup_len_matches_bruteforce(spark):
    base = _words("w", 12)
    docs = [
        base + ["x", "y"] + base[:5],       # internal repeat of base[:5]
        base,                               # doc 1 = proper prefix of doc 0
        base,                               # doc 2 = exact duplicate of doc 1
        ["z1", "z2", "z3"],                 # singleton tokens, no dups
        ["w3", "w4", "w5", "q"],            # mid-slice of base + divergence
        ["lone"],                           # 1-token doc
    ]
    got = {
        (r["doc_id"], r["pos"]): r["dup_len"]
        for r in suffix_dup_len(_mkdocs(spark, docs)).collect()
    }
    want = _brute_dup_len(docs)
    assert got == want, {k: (got.get(k), want.get(k)) for k in want if got.get(k) != want.get(k)}


def test_overlapping_repeats_merge_into_one_span(spark):
    """Two >=min_len duplicated runs overlapping in one doc merge into a
    single maximal island; disjoint non-adjacent runs stay separate."""
    r1 = _words("p", 6)
    r2 = _words("q", 6)
    docs = [
        r1 + r2 + _words("f", 10) + r1[3:] + r2 + _words("g", 3),
        r1 + _words("h", 4) + r2,
    ]
    # min_len 6: doc 0 has hits for r1 at 0 (len>=6), r2 at 6, and the
    # tail r1[3:]+r2 region; doc 1 hits r1 at 0 and r2 at 10.
    spans = exact_substring_spans_sa(_mkdocs(spark, docs), min_len=6)
    by_doc = {}
    for r in spans.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for v in by_doc.values():
        v.sort()
    # doc 0: [0, 11] (r1+r2 contiguous dup region) and the tail island
    # [22, 30] (r1[3:] then r2 overlapping-adjacent); doc 1: [0,5], [10,15]
    assert by_doc[0] == [(0, 11), (22, 30)], by_doc
    assert by_doc[1] == [(0, 5), (10, 15)], by_doc
