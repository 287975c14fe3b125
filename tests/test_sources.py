"""Source/sink tests: csv / json / parquet round-trips and the
partition-pruning contract of partitioned writes.

The reference has *no* file sources in its direct path (SURVEY.md §2.1);
this surface is a deliberate superset built on Spark's DataSource readers,
so the tests pin the properties that matter at scale: schema fidelity,
pushdown reaching the scan, and partition pruning on hive-style layouts.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from direct_spark_sql_spark.sources.registry import (
    load_table,
    read_csv,
    read_json,
    write_parquet,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def sample(spark):
    return load_table(spark, SF_DIR, "orders").limit(500)


def _sorted_rows(df):
    return sorted(
        df.collect(), key=lambda r: r["o_orderkey"]
    )


def test_csv_roundtrip(spark, sample, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csv_rt") / "orders")
    sample.write.mode("overwrite").option("header", "true").csv(out)
    back = read_csv(spark, out, schema=sample.schema)
    assert _sorted_rows(back) == _sorted_rows(sample)
    # schema inference path
    inferred = read_csv(spark, out)
    assert inferred.count() == sample.count()


def test_json_roundtrip(spark, sample, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("json_rt") / "orders")
    sample.write.mode("overwrite").json(out)
    back = read_json(spark, out, schema=sample.schema)
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_partitioned_parquet_prunes(spark, sample, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pq_part") / "orders")
    by_status = sample.withColumn("status", F.col("o_orderstatus"))
    write_parquet(by_status, out, partition_by=["status"])
    back = spark.read.parquet(out)
    one = back.filter(F.col("status") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the scan must prune to the status=F hive partition, not filter post-scan
    assert "PartitionFilters" in plan
    assert one.count() == sample.filter(F.col("o_orderstatus") == "F").count()


def test_parquet_predicate_pushdown_visible(spark):
    l = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") < 5.0)
    plan = l._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)" in plan


def test_orc_round_trip(spark, tmp_path):
    """ORC source/sink parity: write the nation table as ORC, read it back,
    contents must equal the parquet original (column order preserved)."""
    from direct_spark_sql_spark.sources.registry import load_table

    src = load_table(spark, SF_DIR, "nation")
    dest = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_global_sorted_export(spark, tmp_path):
    """Terasort-shape export: repartitionByRange + sortWithinPartitions
    gives a GLOBALLY sorted dataset across ordered part files — the only
    scalable way to write 100 TB in total order (a single-partition
    orderBy would serialize through one task).  Verified: within every
    file rows are sorted, and file key-ranges don't overlap in part-file
    order."""
    import glob as g

    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "sorted")
    (
        df.repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.parquet(out)
    )
    prev_max = None
    for f in sorted(g.glob(out + "/part-*.parquet")):
        pdf = spark.read.parquet(f).toPandas()
        if len(pdf) == 0:
            continue
        assert (pdf.k.diff().dropna() >= 0).all(), "file not internally sorted"
        if prev_max is not None:
            assert pdf.k.min() >= prev_max, "file ranges overlap"
        prev_max = pdf.k.max()


def test_python_datasource_split_plan(spark):
    """The custom source must expose a real split plan: requested part
    count becomes Spark input partitions, each generating only its index
    range (no driver-side materialization)."""
    from direct_spark_sql_spark.sources import pysource

    pysource.register(spark)
    df = (
        spark.read.format("synthcorpus")
        .option("n", "1000").option("parts", "8").load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert df.select("doc_id").distinct().count() == 1000


def test_python_datasource_stream_resumes_from_offset(spark, tmp_path):
    """Two availableNow runs sharing a checkpoint must consume disjoint,
    consecutive index ranges — the offset persistence / replayable-batch
    contract of the streaming reader."""
    from direct_spark_sql_spark.sources import pysource

    pysource.register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    seen = []
    for run in range(2):
        q = (
            spark.readStream.format("synthcorpus")
            .option("n", "10000").option("batch", "100").load()
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", ck).start()
        )
        q.awaitTermination()
        ids = sorted(
            r[0] for r in spark.read.parquet(out).select("doc_id").collect()
        )
        seen.append(ids)
    assert seen[0] == list(range(0, 100))
    assert seen[1] == list(range(0, 200))  # run 2 appended the NEXT range


def test_corrupt_file_tolerance(spark, tmp_path):
    """Operational contract for large scans: with
    `spark.sql.files.ignoreCorruptFiles=true` a scan survives a corrupt
    parquet part (returns the readable rows); with the default (false)
    it fails loudly rather than silently dropping data.  At fleet scale
    a torn write WILL eventually appear in some partition — both
    behaviors (fail-loud default, opt-in skip) must be provable."""
    import pytest as _pytest

    d = tmp_path / "corrupt_src"
    spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(str(d))
    (d / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a real parquet file")

    s = spark.newSession()
    s.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    rows = s.read.parquet(str(d)).count()
    assert rows == 100

    strict = spark.newSession()
    strict.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    with _pytest.raises(Exception):
        strict.read.parquet(str(d)).count()


def test_scan_split_parallelism_controlled_by_max_partition_bytes(spark, tmp_path):
    """Scan parallelism contract: one large file must split into many
    input partitions when `spark.sql.files.maxPartitionBytes` shrinks —
    the knob that decides task granularity (and therefore executor
    utilization and spill pressure) on a 100 TB scan."""
    d = tmp_path / "bigfile"
    spark.range(2_000_000).selectExpr(
        "id", "CAST(id % 1000 AS STRING) AS s"
    ).coalesce(1).write.parquet(str(d))

    coarse = spark.newSession()
    coarse.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    n_coarse = coarse.read.parquet(str(d)).rdd.getNumPartitions()

    fine = spark.newSession()
    fine.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    n_fine = fine.read.parquet(str(d)).rdd.getNumPartitions()

    # coarse target → a handful of splits (Spark also factors in
    # default parallelism via files.minPartitionNum, so not exactly 1);
    # the contract is that shrinking the byte target raises parallelism
    assert n_fine > n_coarse
    assert n_fine > 4  # ~8 MB file / 1 MB target


def test_writer_bounds_file_sizes_with_max_records_per_file(spark, tmp_path):
    """Writer-side layout contract (the inverse of small-file
    compaction): `maxRecordsPerFile` must cap every output file so one
    task can never emit an unsplittable monster file."""
    d = tmp_path / "bounded_out"
    (
        spark.range(10_000)
        .coalesce(1)
        .write.option("maxRecordsPerFile", 2_500)
        .parquet(str(d))
    )
    files = [p for p in d.iterdir() if p.name.endswith(".parquet")]
    assert len(files) >= 4
    for p in files:
        n = spark.read.parquet(str(p)).count()
        assert n <= 2_500
    total = spark.read.parquet(str(d)).count()
    assert total == 10_000
