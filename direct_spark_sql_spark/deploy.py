"""Cluster deployment profile — conf derivation for real multi-executor
Spark clusters.

The reference pins a *single-thread* execution profile for its
sub-millisecond latency story (``DirectSparkSession.scala:326-337``:
``shuffle.partitions=1``, ``local[1]``, broadcast disabled, hash joins
only).  This module is the opposite end of the same dial: given the
dataset size and cluster shape, derive the conf set a 100 TB batch run
actually wants — so a user switching from the reference to this engine
gets a vetted scale-out recipe instead of hand-tuning folklore.

Everything here derives from public Spark tuning semantics (the Spark
configuration/tuning guides and the AQE design): no magic numbers without
a stated rationale, and every derived value is clamped to a sane range so
a weird input (tiny cluster + huge data, or the reverse) degrades to a
safe conf instead of an absurd one.

Derivation summary (each also documented on the key it produces):

- **Shuffle partitions**: enough that a single reduce partition holds
  ~``target_partition_mb`` of the post-shuffle data (assumed comparable
  to the input scan for the worst stage), but never fewer than 2 tasks
  per core (pipelining headroom) and never more than ``max_partitions``
  (task-scheduling overhead dominates beyond O(100k) tasks).  AQE
  coalescing then merges small partitions at runtime, so erring high is
  the cheap direction — this number is the *ceiling* AQE works under.
- **Broadcast threshold**: a broadcast table must fit deserialized in
  every executor alongside the stream side; ~5% of executor heap capped
  at 256 MB keeps the driver's collect and the executors' copies safe.
- **maxPartitionBytes**: 128 MB default scan split matches the parquet
  row-group sweet spot; kept explicit so a conf sweep can see it.
- **AQE**: enabled, with coalescing and skew-join splitting — the
  runtime re-plan is exactly what replaces hand-tuned partition counts
  at unknown data scale.
- **Dynamic allocation + shuffle tracking**: sized ``2..executors``, so
  a mostly-idle session releases capacity; shuffle tracking avoids
  losing map outputs when executors are reclaimed.
- **Memory overhead**: 10% (min 1 GiB) for the off-heap bits (Arrow
  buffers, shuffle netty, Python workers when pandas UDFs run).

Example::

    from direct_spark_sql_spark.deploy import cluster_conf
    conf = cluster_conf(dataset_tb=100, executors=1000,
                        cores_per_executor=8, executor_mem_gb=64)
    builder = SparkSession.builder
    for k, v in conf.items():
        builder = builder.config(k, v)
"""

from __future__ import annotations

from direct_spark_sql_spark.session import ENGINE_CONF

#: Bounds for the derived shuffle-partition count.  The lower bound is a
#: floor for *any* cluster (below this, one straggler task serializes the
#: stage); the upper bound keeps the task count in the range where Spark's
#: scheduler overhead (~O(ms)/task on the driver) stays negligible
#: against task runtime.
_MIN_SHUFFLE_PARTITIONS = 64
_MAX_SHUFFLE_PARTITIONS = 200_000

#: Broadcast side must fit deserialized in every executor next to the
#: stream side and the shuffle buffers; 256 MB is also the point where
#: the driver-side collect that builds the broadcast becomes a risk.
_MAX_BROADCAST_MB = 256


def derive_shuffle_partitions(
    dataset_tb: float,
    total_cores: int,
    target_partition_mb: int = 128,
) -> int:
    """Partition count such that one reduce partition holds roughly
    ``target_partition_mb`` of the worst full-shuffle stage, floored at
    2 tasks/core and clamped to the sane global range.

    At 100 TB / 128 MB that is ~800k raw, clamped to 200k — at that
    point per-partition size grows to ~500 MB, which is the documented
    trade: beyond ~O(100k) tasks the scheduler, not the data, becomes
    the bottleneck, and AQE's skew splitting handles the outliers.
    """
    by_size = int(dataset_tb * 1024 * 1024 / max(target_partition_mb, 1))
    by_cores = 2 * max(total_cores, 1)
    return max(
        _MIN_SHUFFLE_PARTITIONS,
        min(max(by_size, by_cores), _MAX_SHUFFLE_PARTITIONS),
    )


def derive_broadcast_threshold_mb(executor_mem_gb: float) -> int:
    """~5% of executor heap, clamped to [10 MB, 256 MB].

    The broadcast table is resident deserialized in EVERY executor (and
    built by a driver-side collect), so it must stay a small fraction of
    the heap that the stream side and shuffle buffers share.
    """
    return max(10, min(int(executor_mem_gb * 1024 * 0.05), _MAX_BROADCAST_MB))


def cluster_conf(
    dataset_tb: float,
    executors: int,
    cores_per_executor: int = 4,
    executor_mem_gb: float = 16.0,
    dynamic_allocation: bool = True,
) -> dict[str, str]:
    """Derived Spark conf for a batch analytics run of ``dataset_tb``
    on ``executors`` × ``cores_per_executor`` cores.

    Returns a plain ``dict[str, str]`` (appliable to any builder or
    ``spark-submit --conf`` list).  Includes the engine's semantic
    preset (``ENGINE_CONF``) so cluster and local runs plan the same
    way — AQE on, UTC, Arrow, parquet pushdown — with the scale knobs
    layered on top.
    """
    if dataset_tb <= 0:
        raise ValueError(f"dataset_tb must be positive, got {dataset_tb}")
    if executors <= 0 or cores_per_executor <= 0:
        raise ValueError("executors and cores_per_executor must be positive")
    if executor_mem_gb <= 0:
        raise ValueError(f"executor_mem_gb must be positive, got {executor_mem_gb}")

    total_cores = executors * cores_per_executor
    shuffle_parts = derive_shuffle_partitions(dataset_tb, total_cores)
    broadcast_mb = derive_broadcast_threshold_mb(executor_mem_gb)
    # 10% off-heap overhead (Arrow, netty shuffle, Python workers for
    # pandas UDFs), floored at 1 GiB — the default 384 MB is too small
    # once mapInPandas codecs or large shuffles are in play.
    overhead_mb = max(1024, int(executor_mem_gb * 1024 * 0.10))

    conf: dict[str, str] = dict(ENGINE_CONF)
    conf.update(
        {
            # -- parallelism ------------------------------------------------
            # ceiling AQE coalesces under, not a hand-pinned count
            "spark.sql.shuffle.partitions": str(shuffle_parts),
            "spark.default.parallelism": str(2 * total_cores),
            # scan splits at the parquet row-group sweet spot
            "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
            # pack small files into shared splits: at 100 TB the long tail
            # of small files otherwise becomes millions of tiny tasks
            "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
            # -- AQE targets ------------------------------------------------
            # post-shuffle partitions merged toward ~128 MB at runtime
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                128 * 1024 * 1024
            ),
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(
                16 * 1024 * 1024
            ),
            # a partition 5x the median AND >256 MB is split as skewed
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
                256 * 1024 * 1024
            ),
            # -- joins ------------------------------------------------------
            "spark.sql.autoBroadcastJoinThreshold": str(
                broadcast_mb * 1024 * 1024
            ),
            # -- memory -----------------------------------------------------
            # megabyte units: f"{int(gb)}g" would truncate 1.9 GB to "1g"
            # and sub-1-GB inputs (which pass validation) to a fatal "0g"
            "spark.executor.memory": f"{int(executor_mem_gb * 1024)}m",
            "spark.executor.memoryOverhead": f"{overhead_mb}m",
            "spark.executor.cores": str(cores_per_executor),
            # -- serialization / transfer ----------------------------------
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            # -- resilience -------------------------------------------------
            # stragglers on 1000 nodes are a statistical certainty
            "spark.speculation": "true",
            "spark.speculation.quantile": "0.9",
            # decommissioned/lost executors re-run map stages without
            # losing the whole job
            "spark.stage.maxConsecutiveAttempts": "8",
        }
    )
    if dynamic_allocation:
        conf.update(
            {
                "spark.dynamicAllocation.enabled": "true",
                # clamp: min > max is a fatal validateSettings error on a
                # 1-executor cluster
                "spark.dynamicAllocation.minExecutors": str(
                    min(2, executors)
                ),
                "spark.dynamicAllocation.maxExecutors": str(executors),
                # keep shuffle files usable after executor release, without
                # requiring an external shuffle service on the nodes
                "spark.dynamicAllocation.shuffleTracking.enabled": "true",
            }
        )
    return conf


def ship_package(spark) -> str | None:
    """Ship this package's source to the cluster's executors.

    In ``local[n]`` the executor Python workers share the driver's
    working directory and ``sys.path``, so imports inside UDFs /
    ``mapInPandas`` / UDTFs resolve for free — which silently hides a
    real deployment gap: on any REAL cluster (and on
    ``local-cluster[...]``, which the r13 multi-JVM differential runs),
    executor-side pickles that reference ``direct_spark_sql_spark``
    die with ModuleNotFoundError (12/313 queries: every codec
    ``mapInPandas``, the Python data source, the UDTF, and
    ``applyInPandas`` state).  The fix is the standard one a 100 TB
    deployment uses: zip the package once and ``sc.addPyFile`` it —
    Spark distributes the archive and prepends it to every executor
    worker's ``sys.path``.

    Idempotent per session (re-adding the same path is a no-op warning);
    returns the shipped zip path, or None when the package isn't a
    plain directory (already running from an archive)."""
    import os
    import tempfile
    import zipfile

    import direct_spark_sql_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    if not os.path.isdir(pkg_dir):
        return None
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"direct_spark_sql_spark-{os.path.getmtime(pkg_dir):.0f}.zip",
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".part"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for name in files:
                    if not name.endswith((".py", ".json")):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.join(
                        "direct_spark_sql_spark",
                        os.path.relpath(full, pkg_dir),
                    )
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
