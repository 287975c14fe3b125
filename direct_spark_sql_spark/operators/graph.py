"""Connected components via min-label propagation — the clustering step
that turns near-duplicate *pairs* into duplicate *groups* (so a pipeline
keeps one canonical doc per group, not one per pair).

Implementation: iterative small-step joins.  Each round every node adopts
the minimum label among itself and its neighbors; fixpoint is reached in
O(graph diameter) rounds — near-dup graphs are unions of small cliques, so
2-3 rounds in practice.  Each round is one shuffle join + one aggregation;
``localCheckpoint`` truncates the lineage so plans don't grow with the
iteration count (the classic large-scale iterative-algorithm hygiene).

This is the one operator in the engine that *must* be iterative — there is
no single-pass SQL for transitive closure — so it is driver-coordinated
(loop in Python) but fully distributed per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    minimum node id in the connected component (deterministic canonical)."""
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select("node").distinct().select(
        "node", F.col("node").alias("component")
    )
    for _ in range(max_iter):
        nbr_labels = labels.select(
            F.col("node").alias("lbl_node"), F.col("component").alias("lbl_comp")
        )
        nbr_min = (
            sym.join(nbr_labels, sym.nbr == F.col("lbl_node"))
            .groupBy(sym.node.alias("n"))
            .agg(F.min("lbl_comp").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == F.col("n"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def duplicate_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Collapse near-duplicate pairs into groups: (component, group_size,
    member_ids csv) — one row per duplicate cluster."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        cc.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("node").cast("string"))), ","
            ).alias("member_ids"),
        )
    )


def bellman_ford(
    edges: DataFrame,
    seed: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded Bellman-Ford relaxation: shortest distance from the seed
    set using at most ``rounds`` edges.  ``edges`` must already contain
    both directions for an undirected graph; ``seed`` is (node, dist)
    rows (normally dist 0).  Each round is one frontier-to-edges
    equi-join + a min aggregation, lineage truncated per round — the
    same iterative hygiene as :func:`connected_components`.
    """
    dist = seed.select(
        F.col(seed.columns[0]).alias("node"),
        F.col(seed.columns[1]).cast("long").alias("dist"),
    ).localCheckpoint()
    for _ in range(rounds):
        cand = dist.join(edges, dist.node == F.col(src)).select(
            F.col(dst).alias("node"),
            (F.col("dist") + F.col(weight)).cast("long").alias("dist"),
        )
        dist = (
            dist.union(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-duplicate-safe train/validation/test assignment: the split
    is drawn per duplicate CLUSTER, not per document, so two near-copies
    can never straddle an evaluation boundary — the leakage mode a
    per-document hash split silently allows (a test document whose
    near-duplicate sits in train is a memorization freebie; the
    dedup_split_leakage query MEASURES that failure, this operator
    PREVENTS it by construction).

    Every document's split key is its connected component over the
    near-dup pair graph (min-id canonical, :func:`connected_components`);
    documents in no pair are their own singleton component.  The draw is
    the corpus-standard deterministic hash bucket (h64 % 100 against
    integer percent cuts) — reproducible run-to-run, engine-to-engine,
    and stable under corpus growth for unchanged clusters.

    Returns (id, component, split) with split in
    {'train','validation','test'}.

    ``id_col`` must cast losslessly to BIGINT (non-negative integer ids,
    the same precondition :func:`pack_bins_harmonic` documents): the
    component key is ``CAST(coalesce(component, id) AS BIGINT)`` so the
    oracle can replay it.  A non-numeric id would cast to NULL and — per
    the repo's loud-overflow discipline — raises at execution instead of
    silently drawing 'test' for every such document (ADVICE r12).

    100 TB shape: the pair graph is the LSH output (corpus-sparse); CC
    is the bounded-iteration min-label propagation; the final assignment
    is a LEFT join from docs to the (node, component) labels — an
    equi-join on the unique doc id — plus a map-side hash.  Nothing
    shuffles the corpus text."""
    from direct_spark_sql_spark.hashing import h64

    cc = connected_components(pairs, id_a, id_b)
    labeled = docs.select(id_col).join(
        cc.select(F.col("node").alias(id_col), "component"), id_col, "left"
    )
    comp = F.coalesce(F.col("component"), F.col(id_col)).cast("long")
    # Loud precondition: a non-numeric id casts to NULL, the bucket
    # comparison goes NULL, and otherwise() would silently route every
    # such doc to 'test' — fail the job instead.
    comp = F.when(
        comp.isNull(),
        F.raise_error(
            F.lit(
                "cluster_safe_split: id_col must be a non-negative integer "
                "(castable to BIGINT); got a value that casts to NULL"
            )
        ).cast("long"),
    ).otherwise(comp)
    bucket = h64(comp) % 100
    split = (
        F.when(bucket < F.lit(int(train_pct)), F.lit("train"))
        .when(bucket < F.lit(int(train_pct + val_pct)), F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return labeled.select(
        id_col, comp.alias("component"), split.alias("split")
    )
