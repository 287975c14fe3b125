"""AQE runtime re-planning contracts.

At cluster scale the static plan is always wrong somewhere — stats are
stale, filters are more selective than estimated, a shuffle comes out
tiny.  Adaptive Query Execution fixes plans at runtime; these tests pin
the two mechanisms this engine leans on (both asserted on EXECUTED
plans, since AQE decisions do not exist before an action):

- **partition coalescing**: a shuffle configured for many partitions
  whose output is small must be read back as far fewer coalesced
  partitions (no fleet of empty tasks);
- **join demotion to broadcast**: a sort-merge join whose build side
  turns out to be tiny at runtime must execute as a broadcast join even
  though the static estimate forbade broadcasting.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def aqe_spark(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "64")
    return s


def test_aqe_coalesces_small_shuffle_output(aqe_spark):
    df = (
        aqe_spark.range(10_000)
        .select((F.col("id") % 7).alias("k"))
        .groupBy("k")
        .count()
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan
    assert df.rdd.getNumPartitions() < 64


def test_aqe_demotes_sort_merge_join_to_broadcast(aqe_spark):
    s = aqe_spark
    # static estimates see two "large" sides (autoBroadcastJoinThreshold
    # low enough that neither qualifies pre-execution), but the filtered
    # side is tiny at runtime
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        big = s.range(200_000).select(F.col("id").alias("k"), F.lit("x").alias("p"))
        small = s.range(200_000).filter(F.col("id") % 10_000 == 0).select(
            F.col("id").alias("k"), F.lit("y").alias("q")
        )
        joined = big.join(small, "k")
        static_plan = joined._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in static_plan, static_plan
        # execute THIS DataFrame (count() builds its own QueryExecution
        # and would leave joined's plan unfinalized)
        assert len(joined.collect()) == 20
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in final_plan, final_plan
    finally:
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
