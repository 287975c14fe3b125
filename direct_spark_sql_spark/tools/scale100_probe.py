"""One-off 100× scale probe (not part of the per-round bench budget).

Materializes a 100× key-shifted copy of the sf0.1 testdata (~60 M events
/ ~60 M lineitem rows) and measures a strategy-spanning query set at base
and at 100×, printing one JSON line with per-query wall ratios.  The
per-round bench already pins 10× (all headline queries) and 30× (the
worst three); this records the same evidence one decade further out —
run it once per round by hand when plans change:

    python -m direct_spark_sql_spark.tools.scale100_probe

Query picks cover the distinct physical strategies:
- full-scan aggregate (q1), filter-scan (q6): should track data volume
  until the 32 local cores saturate (ratio << 100 while base runs
  underutilize, approaching ~linear once saturated);
- zone-map pruned scan: should stay FAR sub-linear — pruning skips
  untouched row groups no matter how many exist;
- bounded top-k (embedding cosine): bounded result, sub-linear;
- hash-agg dedup fingerprint, window sessionization, AQE 3-way join,
  banded LSH self-join: the shapes whose degradation would signal a plan
  that can't survive a real scale-up.
"""

from __future__ import annotations

import json
import os
import time

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "zonemap_pruned_scan",
    "embedding_cosine_topk",
    "dedup_exact_fingerprint",
    "events_user_sessions",
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    # round-6 additions: reused-exchange self-join on the fingerprint
    # (S²-bounded fan-out), pure QI hash agg, and posexplode + per-vector
    # agg — the three new aggregate/join shapes this round introduced
    "dedup_cross_source_matrix",
    "privacy_k_anonymity",
    "embedding_outlier_scores",
    # round-7 additions: the three-stage IVF-PQ composition (partition-
    # pruned index scan + encode join over probed cells + bounded
    # rerank) — note dedup_minhash_lsh and events_user_sessions above
    # now run their skew-guarded round-7 plans (band-bucket cap,
    # two-phase sessionizer)
    "embedding_ivf_pq_topk",
    # round-8 additions (VERDICT r7 #3): representatives of the three
    # families the 100× tier never covered —
    # text: df-capped (source, gram) agg + annotate-back join
    "text_boilerplate_profile",
    # graph: bounded-round iterative joins with localCheckpoint hygiene
    "graph_pagerank",
    # end-to-end curation (language + quality + keep-min-id canonical,
    # now the de-skewed groupBy+semi-join plan)
    "corpus_curation",
    # the streaming LSH ingest's batch core: dedup_incremental runs the
    # same batch-vs-accumulated-index band join each foreachBatch
    # micro-batch executes (readStream itself can't be wall-ratio-probed
    # on a static 100× directory — the fold shape can)
    "dedup_incremental",
    # round-9 addition (VERDICT r8 #5): the mapInPandas codec family was
    # the only major family absent from every probe tier — real decode +
    # integer aHash + fingerprint-equality buckets, Arrow batch shape
    # under 100× input is the thing being measured
    "multimodal_image_dedup",
    # round-9: the flagship composed DAG (curation + repetition gate +
    # decontamination + bench exclusion in one plan) — the end-to-end
    # shape a real assembly run executes, not just its pieces
    "corpus_training_ready",
    # round-10: the C4-style sub-document family's aggregate-before-join
    # shape — chunk explode collapsing to (chunk, source) grain before
    # any join; the chunk-frequency table grows with corpus volume, so
    # this is the family's genuine scale axis (the excise variant shares
    # the plan prefix)
    "dedup_chunk_frequency",
    # round-10: the datasheet capstone — five independent per-source
    # aggregates (incl. distinct-vocab and fingerprint join-back) in one
    # DAG; probes that composing bounded rollups stays additive
    "corpus_datasheet",
    # round-11: the stop-gram-capped span report — its WHOLE claim is
    # the 100 TB posture (hot grams broadcast-anti-joined map-side, no
    # shuffled gram key above the cap), so it carries its own 100×
    # datapoint; the economics rollup runs the newly UNHINTED doc_id
    # equi-join (ADVICE r10) whose strategy AQE now picks from measured
    # sizes — probed here at the size where that choice matters
    "dedup_exact_substring_spans_capped",
    "dedup_exact_substring_economics",
    # round-11: DSIR — bucket-capped distribution aggs (≤1024 keys)
    # must stay flat while the feature explode tracks volume; UniMax —
    # one map-side token agg + a waterfill on the bounded lang dim,
    # should be pure scan-bound
    "sample_dsir_source_shift",
    "corpus_unimax_mix",
]

FACTOR = 100


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from direct_spark_sql_spark.session import Engine

    engine = (
        Engine.builder()
        .master(f"local[{cpus}]")
        .app_name("direct_spark_sql_spark-scale100")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .get_or_create()
    )
    spark = engine.spark
    spark.sparkContext.setLogLevel("ERROR")

    from direct_spark_sql_spark.plans.registry import QUERIES
    from direct_spark_sql_spark.sources.scale import ensure_scaled_dataset

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    scale_dir = os.path.join(repo, "spark-warehouse", "scaledata", f"sf{sf}x{FACTOR}")
    t0 = time.perf_counter()
    ensure_scaled_dataset(spark, sf_dir, scale_dir, factor=FACTOR)
    gen_sec = round(time.perf_counter() - t0, 1)

    def measure(q, data_dir: str) -> float:
        def once() -> float:
            t = time.perf_counter()
            df = q.spark_fn(spark, data_dir)
            try:
                df.toPandas()
            except Exception:
                df.collect()
            return time.perf_counter() - t

        once()  # warmup
        return round(min(once() for _ in range(3)), 4)

    base, scaled = {}, {}
    for name in PROBE_QUERIES:
        q = QUERIES[name]
        base[name] = measure(q, sf_dir)
        scaled[name] = measure(q, scale_dir)

    ratios = {n: round(scaled[n] / base[n], 2) for n in PROBE_QUERIES}
    out = {
        "metric": "scale100_probe",
        "factor": FACTOR,
        "sf": sf,
        "gen_sec": gen_sec,
        "base_sec": base,
        "scaled_sec": scaled,
        "ratio_vs_base": ratios,
        "superlinear": sorted(n for n, r in ratios.items() if r > FACTOR * 1.25),
    }

    # The registered multimodal queries all bound their input
    # (doc_id < 100 — the pixel-exact oracles recompute every hash, so
    # the REGISTRY form keeps oracle cost bounded), which makes their
    # wall time scale-invariant by construction.  The honest codec-scale
    # measurement is therefore the same operator pipeline UNBOUNDED —
    # synthesize -> real decode -> integer aHash -> fingerprint-equality
    # buckets over the FULL documents table — measured here under its
    # own name so the probe record says exactly what was run.
    # Since round 10 the unbounded form is a first-class REGISTERED,
    # oracle-checked query (plans/pipeline.py:multimodal_image_dedup_full)
    # — the probe imports it instead of keeping a drifting inline copy.
    class _FullCodecProbe:
        name = "multimodal_image_dedup_full"
        bench = False

        @staticmethod
        def spark_fn(spark_, data_dir):
            from direct_spark_sql_spark.plans.pipeline import (
                multimodal_image_dedup_full,
            )

            return multimodal_image_dedup_full(spark_, data_dir)

    full_codec = _FullCodecProbe()
    base_full = measure(full_codec, sf_dir)
    scaled_full = measure(full_codec, scale_dir)
    out["base_sec"][full_codec.name] = base_full
    out["scaled_sec"][full_codec.name] = scaled_full
    out["ratio_vs_base"][full_codec.name] = round(scaled_full / base_full, 2)
    out["superlinear"] = sorted(
        n for n, r in out["ratio_vs_base"].items() if r > FACTOR * 1.25
    )
    out["codec_probe_note"] = (
        "multimodal_image_dedup_full = the REGISTERED unbounded codec "
        "query (oracle-checked since round 10); the doc_id<100-bounded "
        "multimodal_image_dedup form is scale-invariant by construction "
        "and its ratio is reported only for completeness"
    )

    # 10× pass for probe picks OUTSIDE the bench headline set: those
    # never appear in bench.py's rotating 10× tier, so this tool is
    # their only 10× datapoint (VERDICT r8 #5 — the codec family)
    ten_x = [n for n in PROBE_QUERIES if not QUERIES[n].bench]
    if ten_x:
        dir10 = os.path.join(repo, "spark-warehouse", "scaledata", f"sf{sf}x10")
        ensure_scaled_dataset(spark, sf_dir, dir10, factor=10)
        t10 = {n: measure(QUERIES[n], dir10) for n in ten_x}
        base10 = dict(base)
        t10[full_codec.name] = measure(full_codec, dir10)
        base10[full_codec.name] = base_full
        r10 = {n: round(t10[n] / base10[n], 2) for n in t10}
        out["probe_10x"] = {
            "factor": 10,
            "queries": t10,
            "ratio_vs_base": r10,
            "superlinear": sorted(n for n, r in r10.items() if r > 10 * 1.25),
        }

    print(json.dumps(out))
    # persist the full record (the printed line can be tail-truncated by
    # callers); baselines/scale100_probe.json is the judged artifact
    try:
        with open(os.path.join(repo, "baselines", "scale100_probe.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
