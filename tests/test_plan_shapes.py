"""Plan-shape regression guards: the physical plans of headline queries
must keep the structural properties the 100 TB design depends on —
filters pushed into parquet scans, dimension joins broadcast, bounded
top-k, partial aggregation.  A correctness-preserving change that loses
one of these would silently regress at scale; these tests make it loud.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from direct_spark_sql_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark_fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _broadcast_disabled(spark) -> bool:
    """True under the robustness-matrix axis that sets
    autoBroadcastJoinThreshold=-1.  With the threshold at -1 both
    broadcast AND shuffled-hash join are ineligible (shuffled-hash's
    build-side bound derives from the same threshold), so every equi-join
    plans as sort-merge.  Strategy pins that assert the *default-config*
    physical choice skip under this axis; the quadratic-plan guards
    (no NLJ / no CartesianProduct) still apply unconditionally."""
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold") in ("-1", "-1b")


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "HashAggregate" in plan  # partial+final pair


def test_q5_dimensions_broadcast(spark):
    if _broadcast_disabled(spark):
        pytest.skip("axis disables broadcast; pin is for the default config")
    plan = _plan(spark, "q5_local_supplier_volume")
    # all five dimension joins broadcast; the fact-side join keys stay put
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan.split("lineitem")[0]


def test_topk_uses_bounded_operator(spark):
    plan = _plan(spark, "sort_topk")
    assert "TakeOrderedAndProject" in plan


def test_q6_scan_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    # projection pruning: the scan must not read the string columns
    assert "l_returnflag" not in plan.split("ReadSchema")[1][:400]


def test_q4_aggregates_lineitem_before_join(spark):
    """r13: the EXISTS collapsed to a per-order MAX(l_shipdate) aggregate
    joined to orders (guide §2.3 aggregate-before-join) — lineitem must
    collapse map-side BEFORE any join, never feed a semi-join's hash
    relation as raw rows.  The late filter compares the aggregated max,
    so no Window/expansion may appear either."""
    plan = _plan(spark, "q4_order_priority")
    assert "max(l_shipdate" in plan, "per-order MAX(l_shipdate) aggregate missing"
    assert "partial_max" in plan, "lineitem aggregate lost its map-side partial stage"
    assert "LeftSemi" not in plan, "raw-lineitem semi-join shape resurfaced"
    assert "CartesianProduct" not in plan


def test_minhash_no_cartesian(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_window_not_expansion(spark):
    plan = _plan(spark, "asof_event_order")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _executed_plan_after_action(spark, name: str) -> str:
    """AQE finalizes reuse decisions only during execution — inspect the
    plan AFTER an action, not before."""
    df = QUERIES[name].spark_fn(spark, SF_DIR)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_band_selfjoin_reuses_exchange(spark):
    """The LSH band table feeds both sides of the candidate self-join; the
    signature pipeline (shingle → md5 → 16-way min agg) must be computed
    once and reused, not evaluated per join side."""
    plan = _executed_plan_after_action(spark, "dedup_minhash_lsh")
    assert "ReusedExchange" in plan or "ReusedSubquery" in plan or (
        plan.count("Scan parquet") <= 2
    ), "band-table self-join recomputes the signature pipeline per side"


def test_shingles_stay_out_of_python(spark):
    """Shingling is a regexp_extract_all JVM expression — a regression to a
    Python UDF would show as BatchEvalPython/ArrowEvalPython in the plan."""
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_sliding_window_single_shuffle(spark):
    """The sliding-window expansion is a generator (Expand/Explode), not a
    join: one shuffle for the window aggregation, no nested-loop join."""
    plan = _plan(spark, "events_sliding_window")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_not_in_uses_null_aware_anti_join(spark):
    plan = _plan(spark, "join_not_in_nulls")
    assert "LeftAnti" in plan


def test_ivf_centroids_broadcast_not_shuffled(spark):
    """IVF assignment is map-only: the centroid array is broadcast; no
    shuffle may appear below the final top-k."""
    plan = _plan(spark, "embedding_ivf_topk")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_pairs_are_cluster_equijoin(spark):
    """SemDeDup candidate generation must be an equi-join keyed on
    cluster_id — the quadratic work stays confined to clusters.  The only
    NLJ allowed in the plan is ivf_assign's bounded 1-row centroid-array
    broadcast; an all-pairs join would plan a second, unbounded one."""
    plan = _plan(spark, "dedup_semantic")
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), "within-cluster pair join lost its equi-join key"
    # only the bounded 1-row centroid broadcast, recomputed once per
    # consumer of the (map-only, exchange-free) assignment — never a
    # pair-side cartesian
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") <= 3, (
        "unexpected unbounded join in the SemDeDup plan"
    )


#: Queries whose plans legitimately contain a nested-loop/cartesian join:
#: every one broadcasts a provably-bounded side (a literal band table, a
#: single-row aggregate, or the ANN query batch) — the 100 TB-safe cases.
_NLJ_ALLOWED = {
    "join_cross",            # deliberate cross join conformance query
    "join_nonequi_range",    # theta join, broadcast side = 4-row band table
    "q11_important_parts",   # scalar subquery → broadcast 1-row threshold
    "q22_idle_customers",    # scalar subquery → broadcast 1-row avg
    "agg_histogram",         # broadcast 1-row (min, max) bounds
    "corpus_negative_pairs",  # broadcast 1-row id-space bound
    "embedding_cosine_topk",   # broadcast single query vector
    "embedding_filtered_topk",  # broadcast single query vector (pre-filtered scan)
    "embedding_ivf_topk",      # broadcast query vector + centroid array
    "embedding_ivf_recall",    # composes cosine_topk: same 1-row broadcast
    "embedding_batch_topk",    # broadcast bounded query batch
    "bm25_search",             # broadcast 1-row corpus stats (N, sum_dl)
    "bm25_indexed_search",     # same 1-row stats cross as bm25_search
    "rag_chunk_search",        # same 1-row stats cross (BM25 over chunks)
    "embedding_kmeans_refine",  # ivf_assign: broadcast 1-row centroid array
    "dedup_semantic",           # ivf_assign: broadcast 1-row centroid array
    "dedup_semantic_threshold_curve",  # same ivf_assign broadcast 1-row
                                       # centroid array (dedup_semantic's
                                       # plan prefix); the curve itself
                                       # adds only a global agg + stack
    "embedding_centroid_classify",  # ivf_assign: broadcast 1-row array of
                                    # L label centroids (L = #labels)
    "quality_constraint_audit",  # fk check: 1-row agg × 1-row agg cross
    "privacy_delete_propagation",  # audit rows: 1-row agg × 1-row agg cross
    "tfidf_cosine_pairs",        # broadcast 1-row corpus size (N)
    "events_resample_ffill",     # broadcast 1-row (dmin, dmax) day bounds
    "events_resample_interp",    # broadcast 1-row (dmin, dmax) day bounds
    "embedding_quantized_rerank",  # broadcast single query vector
    "embedding_sq8_rerank",        # broadcast single query vector (SQ8)
    "text_bigram_logprob",         # broadcast 1-row vocabulary size (V)
    "text_pmi_collocations",       # broadcast 1-row total bigram count (N)
    "events_anomaly_days",         # broadcast 1-row corpus day stats
    "basket_brand_affinity",       # broadcast 1-row basket total (N)
    "quality_psi_drift",           # broadcast 1-row (tot_ref, tot_cur, n_bins)
    "events_seasonal_decompose",   # broadcast 1-row residual stats
    "events_crosscorr_lags",       # broadcast 7-row lag dimension
    "hybrid_search_rrf",           # composes bm25 (1-row stats broadcast) +
                                   # cosine_topk (single query vector)
    "sketch_kmv_set_ops",          # 1-row stats × 1-row overlap count cross
    "corpus_temperature_mix",      # broadcast 1-row normalizer (Σ n^alpha)
    "hybrid_rerank_cross",         # composes hybrid_search_rrf's bounded
                                   # broadcasts; candidate side ≤ 10 rows
    "quality_nb_classify",         # broadcast model = one row per language
    "embedding_sgns_step",         # broadcast 8-row dims table × bounded
                                   # top-200 pair set
    "embedding_ivf_pq_topk",       # composes ivf_assign (broadcast 1-row
                                   # centroid array) + rerank (broadcast
                                   # single query vector)
    "embedding_ivf_pq_recall",     # composes embedding_ivf_pq_topk (above)
                                   # + cosine_topk (single query vector)
    "embedding_ivf_recall_curve",  # composes cosine_topk (single query
                                   # vector) + three pruned index probes
    "dedup_band_cap_audit",        # 1-row stats agg × 1-row affected-docs
                                   # agg cross (quality_constraint_audit
                                   # precedent)
    "embedding_semantic_decontam",  # broadcast benchmark embedding slice —
                                    # bounded by the eval-set size (the
                                    # embedding_batch_topk precedent)
    "privacy_t_closeness",         # broadcast per-lang global counts —
                                   # bounded by the sensitive-value domain
                                   # (languages); QI-class × lang cells are
                                   # metadata-sized
    "decontam_width_curve",        # 3-row width curve × broadcast 1-row
                                   # corpus total (bm25_search precedent)
    "sample_dsir_topk",            # λ table (≤1024 bucket rows) × broadcast
    "sample_dsir_source_shift",    # 1-row target/raw totals (bm25 precedent)
    "corpus_unimax_mix",           # lang dim × broadcast 1-row corpus-total
                                   # (budget derives from it); waterfill runs
                                   # on the bounded lang frame
    "split_cluster_safe_audit",    # ≤3-row per-split rollup × broadcast
                                   # 1-row leaked-pairs count (the
                                   # quality_constraint_audit precedent)
    "sketch_hll_union_estimate",   # 'ALL' branch: ≤5-row priority rollup ×
                                   # broadcast 1-row global COUNT DISTINCT
                                   # (r13 hoist of 3 identical scalar
                                   # subqueries into one tot CTE — the
                                   # decontam_width_curve precedent)
}


@pytest.mark.parametrize(
    "query", list(QUERIES.values()), ids=[q.name for q in QUERIES.values()]
)
def test_no_unbounded_nested_loop_joins(query, spark):
    """Plan hygiene across the whole registry: no CartesianProduct or
    BroadcastNestedLoopJoin may appear unless the query is allowlisted
    with a bounded broadcast side.  A new query that accidentally plans a
    quadratic join fails here before it ships."""
    df = query.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_nlj = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if query.name in _NLJ_ALLOWED:
        return  # bounded-by-construction; presence is expected and fine
    assert not has_nlj, (
        f"{query.name} plans a nested-loop/cartesian join; either fix the "
        "join or allowlist it with a boundedness justification"
    )


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of the bucketed layout: joining the two bucketed
    copies on the bucket key must plan with ZERO shuffle exchanges (each
    task reads bucket i of both sides).  Broadcast is disabled so the
    small-SF plan is the same SortMergeJoin a 100 TB run would use."""
    from direct_spark_sql_spark.plans.pipeline_ext import bucketed_order_lineitem

    o, l = bucketed_order_lineitem(spark, SF_DIR)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # the scans advertise the bucket layout
    assert "Bucketed: true" in plan


def test_salted_join_expands_build_side(spark):
    """join_skew_salted must actually salt: the build side is replicated
    via explode(sequence) (a Generate node) and the join keys include the
    salt, so a hot key's rows land on n_salt different reducers."""
    plan = _plan(spark, "join_skew_salted")
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert "_salt" in plan


def test_binned_interval_join_is_equi_join(spark):
    # The raw BETWEEN predicate has no equality conjunct and would plan as
    # BroadcastNestedLoopJoin (quadratic); the binned rewrite must hash-join
    # on the time bin with the range residual post-probe.
    for name in ("join_interval_binned", "join_overlap_binned"):
        plan = _plan(spark, name)
        # quadratic-plan guard holds under every robustness axis; the
        # hash-vs-merge choice is a default-config pin (broadcast-disabled
        # axis makes every equi-join sort-merge, which is equally bounded)
        if not _broadcast_disabled(spark):
            assert "HashJoin" in plan, name
        else:
            assert "SortMergeJoin" in plan or "HashJoin" in plan, name
        assert "NestedLoop" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_join_hints_pass_through(spark):
    """SQL join hints survive the engine path: BROADCAST forces a
    broadcast hash join; MERGE forces sort-merge — users tuning a 100 TB
    join by hint must get the plan they asked for."""
    from direct_spark_sql_spark.plans.base import sql_query

    b = sql_query(
        spark, SF_DIR,
        "SELECT /*+ BROADCAST(n) */ count(*) AS c "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey",
    )
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    m = sql_query(
        spark, SF_DIR,
        "SELECT /*+ MERGE(o) */ count(*) AS c "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
    )
    plan_m = m._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_m


def test_partition_pruning_through_join(spark, tmp_path):
    """Partition pruning through a join on the partition column — at
    100 TB this is the difference between reading one partition and the
    whole table.  Two regimes, both pinned:

    - a LITERAL dim filter: Catalyst infers the partition predicate
      statically (PartitionFilters on the fact scan, no runtime subquery
      needed);
    - a DATA-DEPENDENT dim filter: the partition values aren't knowable
      at plan time, so dynamic partition pruning must inject a runtime
      pruning subquery into the fact scan."""
    from direct_spark_sql_spark.sources.registry import load_table

    orders = load_table(spark, SF_DIR, "orders")
    fact = str(tmp_path / "fact")
    orders.write.partitionBy("o_orderpriority").parquet(fact)

    # literal filter: static inference
    dim_lit = orders.select("o_orderpriority").distinct().filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan_lit = (
        spark.read.parquet(fact).join(dim_lit, "o_orderpriority")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*= 1-URGENT", plan_lit), plan_lit[:1500]

    # data-dependent filter: runtime DPP subquery
    dim_dyn = (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 100)
        .select("o_orderpriority")
    )
    plan_dyn = (
        spark.read.parquet(fact).join(dim_dyn, "o_orderpriority")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan_dyn.lower(), plan_dyn[:1500]


def test_partitioned_export_readback_prunes_directories(spark):
    # the read-back's lang IN (...) must land in PartitionFilters (directory
    # pruning), never as a data filter the scan evaluates per row
    plan = _plan(spark, "export_partitioned_readback")
    scan = plan[plan.index("FileScan") :]
    part = scan[scan.index("PartitionFilters") : ]
    assert "lang" in part.split("]")[0]


def test_broadcast_hint_overrides_disabled_autobroadcast(spark):
    from direct_spark_sql_spark.plans.conformance_ext import join_hint_broadcast

    df = join_hint_broadcast(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]


def test_bitmap_distinct_has_no_expand(spark):
    """The exact-bitmap distinct's whole point is the mergeable
    partial-aggregate shape: no Expand-based COUNT(DISTINCT) rewrite may
    appear — each bucket's bitmap is built map-side and merged."""
    from direct_spark_sql_spark.plans.conformance_ext import sketch_bitmap_distinct

    df = sketch_bitmap_distinct(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:1200]
    assert "HashAggregate" in plan


def test_hll_union_is_object_hash_aggregate(spark):
    """Datasketches HLL aggregates carry binary sketch state — they must
    plan as ObjectHashAggregate (TypedImperativeAggregate), the mergeable
    sketch-buffer path."""
    from direct_spark_sql_spark.plans.conformance_ext import (
        sketch_hll_union_estimate,
    )

    df = sketch_hll_union_estimate(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan, plan[:1200]


def test_dp_release_is_one_aggregate_one_broadcast(spark):
    """The fixed-domain DP release's 100 TB contract: ONE hash
    aggregation over the corpus (the QI groupBy, map-side combinable),
    its bounded output BROADCAST to a left join against the literal
    domain grid (a LocalTableScan — no corpus participation), then the
    map-only literal-threshold noise projection — no shuffle join, no
    window, no second scan of the corpus, and the 32-term CASE chain
    stays JVM-side (no BatchEvalPython)."""
    from direct_spark_sql_spark.plans.pipeline_ext import privacy_dp_release

    df = privacy_dp_release(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan, plan[:1200]
    assert "BroadcastHashJoin" in plan, plan[:1200]
    for forbidden in (
        "SortMergeJoin",
        "ShuffledHashJoin",
        "Window",
        "BatchEvalPython",
        "CartesianProduct",
    ):
        assert forbidden not in plan, plan[:1200]
    # exactly one shuffle: the QI-key exchange (plus the output sort's
    # range exchange) — a second hash exchange would mean a second scan
    # or a shuffle join crept in
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan[:1500]
    # the domain grid side is a local literal relation (createDataFrame
    # renders as Scan ExistingRDD; a parquet/file scan here would mean
    # the domain somehow came from data)
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan[:1500]


def test_cross_source_matrix_reuses_exchange(spark):
    """Both sides of the cross-source self-join are the same
    (fingerprint, source) aggregate; AQE must reuse the exchange so the
    corpus is scanned and MD5-fingerprinted ONCE at runtime — at 100 TB
    a recompute-per-side would double the most expensive stage."""
    plan = _executed_plan_after_action(spark, "dedup_cross_source_matrix")
    assert "CartesianProduct" not in plan
    assert "ReusedExchange" in plan or "ReusedSubquery" in plan, (
        "cross-source self-join recomputes the fingerprint pipeline per side"
    )


def test_basket_affinity_reuses_exchange_no_product(spark):
    """The (basket, item) distinct feeds both sides of the pair self-join
    plus the item-count and total aggregates; AQE must reuse the exchange
    rather than recompute the scan+join per consumer, and the pair
    expansion must be an equi-join on the basket key, never a product."""
    plan = _executed_plan_after_action(spark, "basket_brand_affinity")
    assert "CartesianProduct" not in plan
    assert "ReusedExchange" in plan or "ReusedSubquery" in plan, (
        "basket self-join recomputes the basket-item pipeline per consumer"
    )


@pytest.mark.parametrize(
    "name",
    [
        "corpus_curation",
        "corpus_dup_aware_sample",
        "corpus_training_ready",
        "pipeline_stage_yield",
        "pipeline_pretraining_e2e",
        "dedup_cluster_canonical",
        "multimodal_image_dedup",
        "multimodal_audio_dedup",
        "multimodal_video_dedup",
    ],
)
def test_no_window_over_content_fingerprints(name, spark):
    """The round-8 de-skew contract: keep-min-id / group-size / argmax
    over content-fingerprint keys must stay groupBy+join-back (map-side
    combinable, AQE-splittable) — a window partitioned by
    fp_content/ahash/afp/vfp/component serializes a mass-duplicate hot
    key into one task and is the shape the skew probe measured at 4.5x
    elsewhere (VERDICT r7 #1)."""
    df = QUERIES[name].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition" not in ln:
            continue
        low = ln.lower()
        assert not any(
            k in low for k in ("fp_content", "__fp", "ahash", "afp", "vfp", "component")
        ), f"{name}: content-key window crept back:\n{ln}"


def test_dedup_incremental_keep_min_id_is_aggregate(spark):
    """incremental_dedup's batch keep-first must be the groupBy(min) +
    (fp, id) join-back, not a row_number window over __fp."""
    df = QUERIES["dedup_incremental"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan.lower()


def test_chunk_frequency_has_no_occurrence_level_join(spark):
    """dedup_chunk_frequency's skew contract (round 10): the corpus
    document frequency comes from a window over the (chunk, source)
    grain — at most |sources| rows per chunk partition — NOT from
    joining the raw chunk-occurrence stream against a per-chunk
    frequency table, which would funnel every occurrence of a
    mass-duplicated chunk into one reducer.  So the plan must contain a
    Window, and every join's keys must be the bounded source column,
    never the chunk."""
    import re

    plan = _plan(spark, "dedup_chunk_frequency")
    assert "Window" in plan, plan[:1500]
    # every equi-join key list in the plan must not mention the chunk
    for m in re.finditer(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\s*(\[[^\]]*\]),\s*(\[[^\]]*\])",
        plan,
    ):
        keys = m.group(1) + m.group(2)
        assert "chunk" not in keys, f"join keyed on chunk: {m.group(0)[:200]}"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
