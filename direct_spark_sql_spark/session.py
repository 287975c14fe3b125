"""Engine — the session facade.

API parity with the reference's ``DirectSparkSession`` (the subclassed
SparkSession driving everything, DirectSparkSession.scala), rebuilt on a
*composed* (not subclassed) SparkSession:

- ``sql_directly(sql) -> DataTable``        (reference :88-127)
- ``register_table(name, rows, schema)``    (reference :129-137, db-qualified
  names via a side registry like DirectSessionCatalog.directTempViews)
- ``execute_and_register_temp_view``        (reference :181-219)
- ``temp_view(name) -> DataTable``          (reference :139-154)
- ``set_namespace`` / plan+result LRU cache keyed ``namespace + sql``
  (reference :91-92, :411-415, Guava cache → functools-style OrderedDict LRU)
- ``new_session()`` isolation               (reference :81-86)

Execution-model differences are deliberate (SURVEY.md §7.0): where the
reference rebuilt a single-threaded iterator engine to avoid the DAG
scheduler, this engine keeps Spark's distributed execution — the config
preset below enables AQE and keeps shuffle parallelism, because the target
is 100 TB on a cluster, not single-node latency.  What *is* kept from the
reference's latency story is the cache design: analyzed-plan reuse keyed by
(namespace, sql), result caching with invalidation on view registration,
and per-execution-stable ``now()`` semantics
(DirectExecutionContext.scala:47-58) via literal substitution.
"""

from __future__ import annotations

import os
import re
import sys
import threading
import time
from collections import OrderedDict, deque
from typing import Any, Iterable

from pyspark.sql import DataFrame, Row, SparkSession, types as T

from direct_spark_sql_spark.datatable import DataTable


def _schema_has_containers(schema: T.StructType) -> bool:
    """True iff any field (at any struct depth) is an array, map, or
    binary — the Python-side representations (list / dict / bytearray)
    are MUTABLE, so cached result rows containing them must be copied on
    every cache hit or one caller's in-place edit would poison the rows
    every later hit returns.  Scalar/struct-only schemas (the common
    facade shape) skip the copy entirely."""

    def walk(dt: T.DataType) -> bool:
        if isinstance(dt, (T.ArrayType, T.MapType, T.BinaryType)):
            return True
        if isinstance(dt, T.StructType):
            return any(walk(f.dataType) for f in dt.fields)
        return False

    return any(walk(f.dataType) for f in schema.fields)


def _copy_containers(value: Any) -> Any:
    """Deep-copy just the mutable containers inside a result value; Rows
    are rebuilt (tuples are immutable but their elements may not be) and
    scalars pass through untouched."""
    if isinstance(value, list):
        return [_copy_containers(v) for v in value]
    if isinstance(value, dict):
        return {k: _copy_containers(v) for k, v in value.items()}
    if isinstance(value, Row):
        fresh = Row(*[_copy_containers(v) for v in value])
        fresh.__fields__ = list(value.__fields__)
        return fresh
    if isinstance(value, bytearray):
        return bytearray(value)
    return value


def _approx_value_bytes(value: Any) -> int:
    """Approximate in-memory weight of one result cell: getsizeof for
    scalars, shallow-recursive for the container shapes result rows can
    hold (list/dict/Row/bytes).  An estimate, not an audit — the byte
    budget needs the right order of magnitude, not allocator truth."""
    if isinstance(value, (list, tuple, Row)):
        return sys.getsizeof(value) + sum(_approx_value_bytes(v) for v in value)
    if isinstance(value, dict):
        return sys.getsizeof(value) + sum(
            _approx_value_bytes(k) + _approx_value_bytes(v)
            for k, v in value.items()
        )
    return sys.getsizeof(value)


def _approx_rows_bytes(rows: tuple) -> int:
    """Approximate byte weight of a cached result: exact walk of a
    bounded sample, extrapolated — wide/tall results are exactly the
    ones worth bounding, and a full walk of a 100k-row result on every
    put would tax the facade's hot path.  The sample is the first 32 +
    last 32 rows, not a head-only slice: a result sorted by payload
    size (small rows first) would skew a head sample to a fraction of
    the true weight and quietly bust the byte budget (ADVICE r12)."""
    n = len(rows)
    if n == 0:
        return 0
    if n <= 64:
        sample = rows
    else:
        sample = rows[:32] + rows[-32:]
    sampled = sum(_approx_value_bytes(r) for r in sample)
    return int(sampled * (n / len(sample)))


#: Config preset — the cluster-friendly analogue of the reference's pinned
#: profile (DirectSparkSession.scala:326-337).  The reference pins
#: shuffle.partitions=1/local[1] for its single-thread model; at 100 TB we
#: want the opposite: AQE-managed parallelism.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: pushdown + pruning are defaults, keep them explicit
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.codegen.wholeStage": "true",
    # Runtime Bloom-filter join pre-filtering (guide §3.2, SPARK-32268):
    # enabled by default in Spark 4, but the stock thresholds make it
    # fire almost never — creation side capped at 10 MB (a selectively
    # filtered dimension at any real scale is bigger; the FILTER itself
    # stays ~1 MB, sized by expectedNumItems, so a larger creation side
    # costs one extra aggregate scan, not memory) and application side
    # must exceed 10 GB (skipping exactly the mid-size fact scans where
    # dropping non-matching rows before the exchange pays).  Raising /
    # lowering these is scale-directional: at cluster scale the filter
    # fires MORE, never less.  64 MB keeps the sf0.1 base tier (11 MB
    # lineitem) bit-identical in plan; the 30× tier measured q10
    # 2.54 → 1.86 s with might_contain pruning lineitem before its
    # orderkey shuffle.  Env-overridable for probes.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": (
        os.environ.get("SPARK_GRAFT_BLOOM_CREATION_SIDE", "512MB")
    ),
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": (
        os.environ.get("SPARK_GRAFT_BLOOM_APP_SIDE", "64MB")
    ),
}

#: Nondeterministic-expression detection (plan-cache bypass).  Two classes
#: of expression get their value fixed during the FIRST analysis and would
#: be frozen by a cached analyzed plan:
#:
#: - time functions — Spark folds ``current_timestamp``/``current_date``
#:   to a literal at analysis (the bug the reference built
#:   DirectCurrentDate/Timestamp to fix, DirectSessionStateBuilder.scala:
#:   134-155);
#: - seeded-random expressions — ``rand()``/``randn()``/``shuffle()``/
#:   ``uuid()`` pick their seed during analysis
#:   (``ResolveRandomSeed``), and ``monotonically_increasing_id`` depends
#:   on runtime partition layout, so a cached plan replays identical
#:   "random" values on every execution.
#:
#: Word-boundary anchored so substrings inside identifiers (``known``,
#: ``nowhere``, ``renowned``, ``operand``) don't spuriously bypass the
#: cache; ``now``/``unix_timestamp`` only count when called with zero args
#: (with args unix_timestamp parses a column and is cache-safe); the
#: random family must look like a call (``rand(``) so a column named
#: ``rand`` stays cacheable — except ``monotonically_increasing_id``,
#: callable without parens in SQL.
_NONDETERMINISTIC_RE = re.compile(
    r"\bcurrent_date\b|\bcurrent_timestamp\b|\blocaltimestamp\b"
    r"|\bnow\s*\(\s*\)|\bunix_timestamp\s*\(\s*\)"
    r"|\brandn?\s*\(|\buuid\s*\(|\bshuffle\s*\(|\brandom\s*\("
    r"|\bmonotonically_increasing_id\b",
    re.IGNORECASE,
)
#: Backwards-compat alias (pre-round-4 name, time functions only then).
_TIME_FUNCS_RE = _NONDETERMINISTIC_RE

#: Quoted spans a qualified-name rewrite must not touch: single-quoted SQL
#: string literals (with '' escapes) and backtick-quoted identifiers.
_QUOTED_SPAN_RE = re.compile(r"'(?:[^']|'')*'|`(?:[^`]|``)*`")

#: View DDL through the SQL surface (CREATE/DROP/ALTER ... VIEW name).
#: These mutate what a view name resolves to, so cached analyzed plans
#: referencing the name must be dropped — the same invalidation contract
#: register_table() applies (NamedLocalRelation.scala:25-44).
_VIEW_DDL_RE = re.compile(
    r"^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?(?:GLOBAL\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW"
    r"|DROP\s+VIEW(?:\s+IF\s+EXISTS)?"
    r"|ALTER\s+VIEW)\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>`[^`]+`|[\w.]+)",
    re.IGNORECASE,
)

#: Statements whose results are cacheable analyzed plans: queries only.
#: Everything else (DDL, SET, CACHE TABLE, INSERT, ...) executes uncached —
#: caching a command's DataFrame would replay side effects unpredictably
#: and can pin stale analysis.
_QUERY_START_RE = re.compile(r"^\s*(?:SELECT|WITH|VALUES|TABLE)\b", re.IGNORECASE)

#: The reference's JVM-function registration DDL
#: (DirectSessionCatalog.scala:72-91): CREATE [TEMPORARY] FUNCTION name
#: AS 'class' [USING JAR 'path'].  Routed to registerJavaFunction.
_FUNCTION_DDL_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?FUNCTION\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+AS\s+'(?P<cls>[\w.$]+)'"
    r"(?:\s+USING\s+JAR\s+'(?P<jar>[^']+)')?\s*;?\s*$",
    re.IGNORECASE,
)


def _walk_plan_metrics(jnode, out: list[dict[str, Any]]) -> None:
    """Depth-first walk of a java SparkPlan collecting each node's raw
    SQLMetric values — descends through AQE roots and query stages so the
    FINAL physical operators (post-reoptimization) are what's reported."""
    node_entry: dict[str, Any] = {"operator": "<unreadable>", "metrics": {}}
    try:
        node_entry["operator"] = str(jnode.nodeName())
        metrics: dict[str, int] = {}
        it = jnode.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[str(kv._1())] = kv._2().value()
        node_entry["metrics"] = metrics
    except Exception:
        # a node without the metrics surface (or a py4j hiccup) degrades to
        # ONE partial entry — the walk still descends, so a single bad node
        # cannot silently drop the rest of the subtree from shuffle/spill
        # totals (which feed bench.py's shuffle-regression gate).
        node_entry["partial"] = True
    out.append(node_entry)
    try:
        cls = jnode.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            _walk_plan_metrics(jnode.executedPlan(), out)
        elif "QueryStageExec" in cls:
            _walk_plan_metrics(jnode.plan(), out)
    except Exception:
        node_entry["partial"] = True
    try:
        ch = jnode.children().iterator()
        while ch.hasNext():
            _walk_plan_metrics(ch.next(), out)
    except Exception:
        node_entry["partial"] = True


#: accumulator keys last_metrics() reports as per-call deltas; everything
#: else in the per-node map stays cumulative (same contract as the Spark
#: UI's SQL tab for a reused plan object)
_DELTA_METRIC_KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "spillSize")


def _collect_delta_handles(jnode, out: list[tuple[str, Any]]) -> bool:
    """Collect the java SQLMetric accumulator objects for the delta-reported
    keys so a pre-execution baseline snapshot costs a handful of py4j value
    reads (not a full plan walk) on the warm path.

    Returns True only when the whole walk succeeded.  The same per-section
    degradation as ``_walk_plan_metrics``: a py4j hiccup on one node loses
    that node's handles, not the remaining subtree — and the caller must
    not cache (or silently trust) a truncated handle list, because a
    baseline that under-counts makes every per-call delta OVER-count."""
    complete = True
    try:
        it = jnode.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key = str(kv._1())
            if key in _DELTA_METRIC_KEYS:
                out.append((key, kv._2()))
    except Exception:
        complete = False
    try:
        cls = jnode.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            complete = _collect_delta_handles(jnode.executedPlan(), out) and complete
        elif "QueryStageExec" in cls:
            complete = _collect_delta_handles(jnode.plan(), out) and complete
    except Exception:
        complete = False
    try:
        ch = jnode.children().iterator()
        while ch.hasNext():
            complete = _collect_delta_handles(ch.next(), out) and complete
    except Exception:
        complete = False
    return complete


class EngineBuilder:
    """``Engine.builder().master(...).config(...).get_or_create()``."""

    def __init__(self) -> None:
        self._master: str | None = None
        self._app_name = "direct_spark_sql_spark"
        self._conf: dict[str, str] = {}
        self._hive = False

    def master(self, master: str) -> "EngineBuilder":
        self._master = master
        return self

    def app_name(self, name: str) -> "EngineBuilder":
        self._app_name = name
        return self

    def config(
        self, key: "str | dict | None" = None, value: Any = None
    ) -> "EngineBuilder":
        """Set one conf or many — the reference Builder's typed overloads
        (String/Long/Double/Boolean and the whole-SparkConf form,
        DirectSparkSession.scala:254-297) collapse in Python to value
        coercion plus a dict overload (VERDICT r11 #8).  Booleans render
        JVM-style lowercase ``true``/``false``; ints and floats via str."""
        if isinstance(key, dict):
            if value is not None:
                raise TypeError("config(dict) takes no second argument")
            for k, v in key.items():
                self._conf[k] = self._coerce_conf(v)
            return self
        if key is None:
            raise TypeError("config() requires a key or a dict")
        self._conf[key] = self._coerce_conf(value)
        return self

    @staticmethod
    def _coerce_conf(value: Any) -> str:
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, (int, float, str)):
            return str(value)
        raise TypeError(f"unsupported conf value type: {type(value).__name__}")

    def enable_hive_support(self) -> "EngineBuilder":
        """Opt into a Hive-enabled session state so ``CREATE [TEMPORARY]
        FUNCTION f AS 'class'`` works with classes written against the
        *Hive* UDF APIs (``org.apache.hadoop.hive.ql.exec.UDF`` /
        ``GenericUDF`` / UDAF / UDTF) — the reference's registration
        contract (DirectSessionCatalog.scala:72-91).

        ``spark.sql.catalogImplementation`` is a static conf, frozen when
        the first SparkSession in the JVM is created — call this on the
        process's FIRST engine, not after a plain session already exists.
        """
        self._hive = True
        return self

    def get_or_create(self) -> "Engine":
        builder = SparkSession.builder.appName(self._app_name)
        if self._master:
            builder = builder.master(self._master)
        for k, v in {**ENGINE_CONF, **self._conf}.items():
            builder = builder.config(k, v)
        if self._hive:
            builder = builder.enableHiveSupport()
        spark = builder.getOrCreate()
        # Non-local masters run executor Python workers in their own
        # processes/machines where this package isn't importable; ship
        # it once via addPyFile (deploy.ship_package) so UDF/UDTF/
        # mapInPandas pickles resolve — the standard cluster deployment
        # step local[n] silently skips (r13 local-cluster differential).
        master = spark.sparkContext.master or ""
        if not master.startswith("local["):
            from direct_spark_sql_spark.deploy import ship_package

            try:
                ship_package(spark)
            except Exception:
                pass  # a cluster with pre-installed packages needs nothing
        return Engine(spark)


class _LRU:
    """Tiny thread-safe LRU (reference: Guava cache, max "direct.plan.cache.size"
    entries, DirectSparkSession.scala:411-415).

    Optionally byte-budgeted (VERDICT r11 #7): entry and row caps alone
    let a thousand wide-row results pin real driver memory, so ``put``
    accepts the entry's approximate byte weight and eviction also runs
    while the tracked total exceeds ``max_bytes``.  An entry that alone
    exceeds the whole budget is refused outright (caching it would just
    evict everything else and still bust the budget)."""

    def __init__(self, capacity: int = 1000, max_bytes: int | None = None):
        self.capacity = capacity
        self.max_bytes = max_bytes
        self.bytes = 0
        self._sizes: dict[str, int] = {}
        self._data: OrderedDict[str, Any] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Any | None:
        with self._lock:
            if key not in self._data:
                self.misses += 1
                return None
            self._data.move_to_end(key)
            self.hits += 1
            return self._data[key]

    def __contains__(self, key: str) -> bool:
        """Membership probe that does NOT promote recency or count as a
        hit/miss — for assertions and invalidation checks only."""
        with self._lock:
            return key in self._data

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)

    def _evict_locked(self, key: str) -> None:
        del self._data[key]
        self.bytes -= self._sizes.pop(key, 0)

    def put(self, key: str, value: Any, nbytes: int = 0) -> None:
        with self._lock:
            if key in self._data:
                self._evict_locked(key)
            if self.max_bytes is not None and nbytes > self.max_bytes:
                return
            self._data[key] = value
            self._sizes[key] = nbytes
            self.bytes += nbytes
            self._data.move_to_end(key)
            while len(self._data) > self.capacity or (
                self.max_bytes is not None and self.bytes > self.max_bytes
            ):
                self._evict_locked(next(iter(self._data)))

    def clear(self) -> None:
        with self._lock:
            self._data.clear()
            self._sizes.clear()
            self.bytes = 0

    def drop_where(self, predicate) -> None:
        with self._lock:
            for key in [k for k in self._data if predicate(k)]:
                self._evict_locked(key)


class Engine:
    """PySpark-native engine session with the reference's API surface."""

    def __init__(
        self,
        spark: SparkSession,
        plan_cache_size: int = 1000,
        result_cache_size: int = 64,
        result_cache_max_bytes: int = 256 << 20,
    ):
        self.spark = spark
        self._namespace = ""
        #: (namespace+sql) -> analyzed DataFrame; re-executes lazily with
        #: fresh view data, mirroring the reference's plan-cache-with-late-
        #: bound-scan design (NamedLocalRelation.scala:25-44).
        self._plan_cache = _LRU(plan_cache_size)
        #: db-qualified temp views, reference: DirectSessionCatalog.directTempViews
        #: (DirectSessionCatalog.scala:55).
        self._qualified_views: dict[str, DataFrame] = {}
        #: name -> the .cache()d DataFrame backing an
        #: execute_and_register_temp_view result, so replacing it can
        #: unpersist the old storage (reference re-registers freely,
        #: DirectSparkSession.scala:181-219).
        self._materialized_views: dict[str, DataFrame] = {}
        #: (DataFrame, wall_sec, result_rows, pre_exec_metric_baseline,
        #: result_cache_hit) of the most recent sql_directly — backs
        #: last_metrics() (reference: per-execution SQLMetric map,
        #: DirectSQLMetrics.scala:21-72, DirectExecutionContext.scala:45).
        self._last_execution: tuple | None = None
        #: Result cache — the Spark-analogue of the reference's sub-ms
        #: repeated-query class.  The reference re-executes a cached
        #: single-node plan same-thread (DirectPlan.scala:79-83), which
        #: costs microseconds; Spark's distributed execution has a
        #: ~30 ms-per-job floor (measured: plan-cache lookup is 11 µs,
        #: the rest is stage scheduling — a cProfile of the warm
        #: recompute path shows >90% of wall inside the blocking socket
        #: read that waits on the JVM job, with all Python-side work
        #: under 2 ms/call, so the floor is structural, not facade
        #: overhead), so the semantically-equivalent
        #: fast path is caching the *materialized result* of a
        #: deterministic query over unchanged temp views.  Entries are
        #: dropped by exactly the invalidation that drops cached plans
        #: (view re-register / view DDL / function DDL), and a statement
        #: is eligible only when the statement text AND the analyzed plan
        #: are deterministic, non-streaming, and read no files (file data
        #: can change outside the facade's view of the world).
        #: entry cap AND a ~256 MiB approximate byte budget (VERDICT
        #: r11 #7): the row cap alone lets a thousand wide-row results
        #: pin real driver memory.
        self._result_cache = _LRU(result_cache_size, result_cache_max_bytes)
        self.result_cache_enabled = result_cache_size > 0
        #: rows above this are never result-cached (driver-memory bound)
        self.result_cache_max_rows = 100_000
        #: bumped on every invalidation event (view re-register, view DDL,
        #: function DDL).  A result computed against pre-invalidation data
        #: can finish AFTER the invalidation sweep ran; comparing the epoch
        #: captured before execution against the current one at put() time
        #: keeps that in-flight stale result out of the cache.
        self._invalidation_epoch = 0
        #: bounded ring buffer of per-call summaries (no plan walks — the
        #: cheap always-on sibling of last_metrics()); see metrics_history()
        self._call_history: deque = deque(maxlen=200)
        self._lock = threading.Lock()
        #: UDF surface (reference: DirectSessionCatalog.scala:62-112 Hive
        #: UDF registration): engine functions callable from SQL text.
        from direct_spark_sql_spark.functions import register_udfs

        self.registered_udfs = register_udfs(spark)

    @staticmethod
    def builder() -> EngineBuilder:
        return EngineBuilder()

    # -- namespace / cache --------------------------------------------------

    def set_namespace(self, namespace: str) -> None:
        """Cache-key prefix for multi-tenant isolation (reference:
        DirectSparkSession.scala:221-223)."""
        self._namespace = namespace

    def _cache_key(self, sql: str) -> str:
        return f"{self._namespace}\x00{sql}"

    # -- ingress ------------------------------------------------------------

    def register_table(
        self,
        name: str,
        rows: Iterable[dict[str, Any]] | DataTable | DataFrame,
        schema: T.StructType | str | None = None,
    ) -> None:
        """Register in-memory data as a (possibly db-qualified) temp view.

        Reference: registerTempView (DirectSparkSession.scala:129-137) with
        the lenient list-of-dicts coercion of DirectDataTable.fromJavaMapList.
        """
        if isinstance(rows, DataFrame):
            df = rows
        else:
            if isinstance(rows, DataTable):
                table = rows
            else:
                if schema is None:
                    raise ValueError("schema is required for list-of-dicts input")
                table = DataTable.from_list_of_dicts(rows, schema)
            df = table.to_dataframe(self.spark)
            # Driver-local ingress arrives via sc.parallelize, which slices
            # tiny lists across defaultParallelism (32 on the target rig)
            # partitions — dozens of near-empty scan tasks per execution.
            # Right-size to ~50k rows/partition so small reference tables
            # scan in one task (the dominant term in warm facade latency)
            # while genuinely large ingress keeps its parallelism.
            slices = max(
                1,
                min(
                    self.spark.sparkContext.defaultParallelism,
                    len(table.data) // 50_000,
                ),
            )
            df = df.coalesce(slices)

        if "." in name:
            # db-qualified temp view: keep it in a python-side registry and
            # also register a mangled global name so SQL can reach it.
            self._qualified_views[name] = df
            df.createOrReplaceTempView(self._mangle(name))
        else:
            df.createOrReplaceTempView(name)
        # The reference's cache contract is plan-by-name, data-re-read-at-
        # execution (NamedLocalRelation.scala:25-44).  A cached *analyzed*
        # DataFrame has already bound the previous LocalRelation, so any
        # cached statement that references this view must be dropped; it
        # re-analyzes (and re-binds fresh data) on its next execution.
        self._drop_cached_plans_referencing(name)

    @staticmethod
    def _mangle(qualified: str) -> str:
        return qualified.replace(".", "__")

    def _drop_cached_plans_referencing(self, name: str) -> None:
        """Evict cached plans whose SQL text references view ``name``.

        Conservative (over-invalidation re-analyzes, never corrupts) but
        bounded in two ways the naive ``\\bname\\b`` scan wasn't:

        - *Quoted-span aware*: the name inside a single-quoted string
          literal in an unrelated cached query is data, not a reference —
          it no longer evicts.  Backtick-quoted identifiers, by contrast,
          ARE references, so their inner text is kept for matching (a
          cached ``SELECT * FROM `v```` must still drop when ``v``
          changes).
        - *Spelling-normalized*: the DDL name is stripped of backticks, and
          a qualified ``db.view`` invalidates on the qualified spelling,
          the bare view name, and the mangled ``db__view`` rewrite — so a
          cached query referencing any spelling is dropped regardless of
          how the DDL spelled it.
        """
        norm = name.replace("`", "")
        variants = {norm}
        if "." in norm:
            variants.add(norm.rsplit(".", 1)[-1])
            variants.add(self._mangle(norm))
        pattern = re.compile(
            "|".join(rf"\b{re.escape(v)}\b" for v in sorted(variants)),
            re.IGNORECASE,
        )

        def _matchable(key: str) -> str:
            # Drop string-literal content; unwrap backtick identifiers.
            return _QUOTED_SPAN_RE.sub(
                lambda m: f" {m.group(0)[1:-1]} "
                if m.group(0).startswith("`")
                else "''",
                key,
            )

        def _references(key: str) -> bool:
            return pattern.search(_matchable(key)) is not None

        # Drop-then-bump, all under the same lock the epoch-guarded puts
        # take (plan cache in dataframe(), result cache in sql_directly).
        # Both orderings matter:
        # - puts: a put that passed its epoch check happened strictly
        #   before the bump, hence before nothing — but the sweep's drops
        #   run in the same critical section, so either the drop evicts
        #   the entry (put preceded the section) or the check fails (put
        #   followed the bump).  Dropping OUTSIDE the lock (pre-round-5)
        #   left a window where a stale plan could land after the sweep.
        # - reads: sql_directly snapshots the epoch unlocked BEFORE its
        #   cache lookups; bumping AFTER the drops means a reader that
        #   observes the new epoch can no longer find a displaced entry
        #   (drops already done), while a reader holding the old epoch
        #   has every put rejected.  Bumping FIRST would let a reader
        #   capture the new epoch, win the cache lock before the drop,
        #   execute the stale plan, and cache its rows at the new epoch.
        with self._lock:
            self._plan_cache.drop_where(_references)
            self._result_cache.drop_where(_references)
            self._invalidation_epoch += 1

    def _rewrite_qualified(self, sql: str) -> str:
        """Rewrite ``db.table`` references for registered qualified views.

        Identifier-boundary aware: longest name first (so ``db.tab`` never
        clobbers a ``db.table2`` reference), anchored so neither side of the
        match continues into a longer identifier or deeper qualifier, and
        quoted spans (string literals, backtick identifiers) are skipped.
        """
        if not self._qualified_views:
            return sql
        names = sorted(self._qualified_views, key=len, reverse=True)
        pattern = re.compile(
            "|".join(rf"(?<![\w.$]){re.escape(n)}(?![\w.$])" for n in names),
            re.IGNORECASE,
        )
        # Map lowercase registered name -> mangled form for case-insensitive
        # resolution (Spark identifiers are case-insensitive by default).
        mangled = {n.lower(): self._mangle(n) for n in self._qualified_views}

        def _rewrite_segment(segment: str) -> str:
            return pattern.sub(lambda m: mangled[m.group(0).lower()], segment)

        out: list[str] = []
        pos = 0
        for span in _QUOTED_SPAN_RE.finditer(sql):
            out.append(_rewrite_segment(sql[pos : span.start()]))
            out.append(span.group(0))
            pos = span.end()
        out.append(_rewrite_segment(sql[pos:]))
        return "".join(out)

    # -- query --------------------------------------------------------------

    def dataframe(self, sql: str) -> DataFrame:
        """Analyzed (lazy) DataFrame for a SQL text, via the plan cache.

        Time-dependent statements bypass the cache: Spark folds
        ``current_timestamp``/``current_date`` to a literal during analysis,
        so re-using an analyzed plan would freeze time across executions —
        exactly the bug the reference built DirectCurrentTimestamp to avoid
        (DirectCurrentDate.scala:26-50).  Re-analyzing per call restores
        one-value-per-execution semantics, stable across the whole plan.
        """
        ddl = _FUNCTION_DDL_RE.match(sql)
        if ddl:
            return self._register_function_ddl(
                sql, ddl.group("name"), ddl.group("cls"), ddl.group("jar")
            )
        view_ddl = _VIEW_DDL_RE.match(sql)
        if view_ddl:
            # commands execute eagerly on spark.sql(); afterwards drop any
            # cached plan that referenced the (re)defined or dropped view
            df = self.spark.sql(self._rewrite_qualified(sql))
            self._drop_cached_plans_referencing(view_ddl.group("name"))
            return df
        if not _QUERY_START_RE.match(sql):
            return self.spark.sql(self._rewrite_qualified(sql))
        if self._is_nondeterministic(sql):
            return self.spark.sql(self._rewrite_qualified(sql))
        key = self._cache_key(sql)
        df = self._plan_cache.get(key)
        if df is None:
            # Epoch captured BEFORE analysis: spark.sql() binds the view
            # data visible NOW, so if an invalidation sweep (view swap +
            # epoch bump + drop) completes before our put, this plan may
            # hold the displaced binding.  The put is epoch-guarded and
            # atomic with the sweep (same lock): a put that passes the
            # check strictly precedes any bump, whose sweep then evicts
            # it — a stale analyzed plan can never survive an
            # invalidation and feed post-invalidation result caching.
            epoch = self._invalidation_epoch
            df = self.spark.sql(self._rewrite_qualified(sql))
            with self._lock:
                if epoch == self._invalidation_epoch:
                    self._plan_cache.put(key, df)
        return df

    def sql_directly(self, sql: str) -> DataTable:
        """Execute SQL and materialize the result (reference:
        sqlDirectly, DirectSparkSession.scala:88-127).

        Warm repeated queries take the result cache (see ``__init__``):
        a deterministic, file-free, non-streaming query whose referenced
        views haven't changed returns its previously materialized rows
        without re-running the Spark job — the engine's answer to the
        reference's same-thread iterator over a cached single-node plan.
        """
        # Epoch captured BEFORE the plan-cache lookup: an invalidation
        # that lands anywhere between the lookup and the put (including
        # during the cacheable check or the metric-baseline py4j reads)
        # must fail the put check, or a result computed from the displaced
        # plan could poison the cache until the NEXT invalidation.
        epoch = self._invalidation_epoch
        df = self.dataframe(sql)  # plan-cache get: stats + invalidation
        cacheable = self.result_cache_enabled and self._statement_result_cacheable(
            sql
        )
        key = self._cache_key(sql)
        if cacheable:
            t0 = time.perf_counter()
            hit = self._result_cache.get(key)
            if hit is not None:
                schema, rows, hit_df, snap, mutable = hit
                wall = time.perf_counter() - t0
                self._last_execution = (hit_df, wall, len(rows), None, True, snap)
                self._record_call(sql, wall, len(rows), True)
                # Rows holding mutable containers (arrays/maps/binary) are
                # copied per hit so no caller can mutate the cached copy;
                # scalar rows (the common shape) skip the copy.
                if mutable:
                    return DataTable(schema, [_copy_containers(r) for r in rows])
                return DataTable(schema, list(rows))
        pre = self._metric_baseline(df)
        t0 = time.perf_counter()
        table = DataTable.from_dataframe(df)
        wall = time.perf_counter() - t0
        df.__dict__["_dss_executed"] = True
        self._last_execution = (df, wall, len(table.data), pre, False, None)
        self._record_call(sql, wall, len(table.data), False)
        if (
            cacheable
            and len(table.data) <= self.result_cache_max_rows
            and self._plan_result_cacheable(df)
        ):
            # Metrics snapshot frozen AT PUT TIME: a later cache hit must
            # reproduce the materializing execution's metrics even if the
            # same plan object executed again in between (sql_iterator, a
            # concurrent thread, a cache-bypassed call) — re-walking the
            # live accumulators at hit time would count those executions.
            snap = self._compute_metrics(df, wall, len(table.data), pre, False)
            # epoch re-check and put are atomic w.r.t. the invalidation
            # sweep (which bumps the epoch and drops entries under the
            # same lock), so a result computed against pre-invalidation
            # view data can never land after the sweep and survive
            # Rows holding mutable containers are copied at PUT (so the
            # materializing caller's own table can't poison the cache) and
            # again on every HIT (see above); scalar rows skip both.
            mutable = _schema_has_containers(table.schema)
            stored = (
                tuple(_copy_containers(r) for r in table.data)
                if mutable
                else tuple(table.data)
            )
            with self._lock:
                if epoch == self._invalidation_epoch:
                    self._result_cache.put(
                        key,
                        (table.schema, stored, df, snap, mutable),
                        nbytes=_approx_rows_bytes(stored),
                    )
        return table

    def _record_call(self, sql: str, wall: float, rows: int, hit: bool) -> None:
        self._call_history.append(
            {
                "sql": sql if len(sql) <= 200 else sql[:200] + "…",
                "wall_sec": wall,
                "rows": rows,
                "result_cache_hit": hit,
                "ts": time.time(),
            }
        )

    def metrics_history(self, n: int = 50) -> list[dict[str, Any]]:
        """The last ``n`` ``sql_directly`` calls, newest last: statement
        (truncated), wall seconds, result rows, result-cache hit flag,
        unix timestamp.  Always-on and walk-free (unlike
        :meth:`last_metrics`, which reads plan accumulators), so a
        long-lived service can expose its recent query log at zero
        per-call cost — the operational readout the reference's
        per-execution context map implies but never surfaces
        (DirectExecutionContext.scala:45)."""
        if n <= 0:
            return []  # list[-0:] would be the WHOLE history
        return list(self._call_history)[-n:]

    def _statement_result_cacheable(self, sql: str) -> bool:
        """Statement-text gate for the result cache: queries only, no
        time/random functions (same regexes that gate the plan cache)."""
        return bool(_QUERY_START_RE.match(sql)) and not self._is_nondeterministic(
            sql
        )

    #: Analyzed-plan leaf classes whose content cannot change outside the
    #: facade's invalidation hooks.  LocalRelation/LogicalRDD is what
    #: register_table/createDataFrame temp views bind to (driver-local
    #: data, re-bound only through register_table, which sweeps the
    #: caches); InMemoryRelation is a facade-cached materialization.
    #: Everything else — notably LogicalRelation, which wraps EXTERNAL
    #: relations like JDBC with an empty inputFiles() — is rejected: an
    #: external database can mutate with no invalidation hook ever firing.
    #: CTERelationRef / UnionLoopRef are pointers, not sources: their
    #: definitions are children of the enclosing WithCTE / UnionLoop node
    #: (cteDefs :+ plan), so the walk inspects the real leaves through
    #: them — the refs themselves carry no external state.
    _RESULT_CACHE_LEAVES = frozenset(
        {"LocalRelation", "LogicalRDD", "OneRowRelation", "Range",
         "InMemoryRelation", "CTERelationRef", "UnionLoopRef"}
    )

    def _in_memory_leaves_only(self, df: DataFrame) -> bool:
        """True iff every leaf of the analyzed plan — including leaves
        inside subquery expressions (``subqueriesAll``) — is a known
        in-memory relation (see ``_RESULT_CACHE_LEAVES``)."""
        roots = [df._jdf.queryExecution().analyzed()]
        it = roots[0].subqueriesAll().iterator()
        while it.hasNext():
            roots.append(it.next())
        for root in roots:
            stack = [root]
            while stack:
                p = stack.pop()
                kids = p.children().iterator()
                n = 0
                while kids.hasNext():
                    stack.append(kids.next())
                    n += 1
                if n == 0 and (
                    p.getClass().getSimpleName().rstrip("$")
                    not in self._RESULT_CACHE_LEAVES
                ):
                    return False
        return True

    def _plan_result_cacheable(self, df: DataFrame) -> bool:
        """Plan-level gate, computed once per cached-plan object: the
        ANALYZED plan must be fully deterministic (catches rand()/uuid()
        hidden inside a referenced view body, which the statement regex
        can't see), non-streaming, read no files (file-backed data can
        change on disk outside the facade's invalidation hooks), and
        bottom out ONLY in known in-memory leaf relations — an empty
        ``inputFiles()`` alone is not proof of immutability, because
        external relations (e.g. JDBC) report no files yet re-read
        mutable external state on every execution."""
        ok = df.__dict__.get("_dss_result_ok")
        if ok is None:
            try:
                ok = (
                    not df.isStreaming
                    and not df.inputFiles()
                    and bool(df._jdf.queryExecution().analyzed().deterministic())
                    and self._in_memory_leaves_only(df)
                )
            except Exception:
                ok = False
            df.__dict__["_dss_result_ok"] = ok
        return ok

    def _metric_baseline(self, df: DataFrame) -> dict[str, int] | None:
        """Pre-execution snapshot of the delta-reported accumulators.

        ``None`` for a plan's first execution (fresh accumulators — the
        absolute values ARE that execution's values).  For a re-executed
        cached plan the SQLMetric accumulators keep counting, so
        last_metrics() subtracts this snapshot to report per-call values
        (reference resets its metric map per execution,
        DirectExecutionContext.scala:45)."""
        if not df.__dict__.get("_dss_executed"):
            return None
        handles = df.__dict__.get("_dss_delta_handles")
        complete = True
        if handles is None:
            handles = []
            try:
                complete = _collect_delta_handles(
                    df._jdf.queryExecution().executedPlan(), handles
                )
            except Exception:
                complete = False
            if complete:
                # A partially consumed sql_iterator can leave AQE mid-
                # flight: the current executedPlan may still re-shape
                # (new exchanges whose accumulators a pinned handle list
                # would miss, under-counting every later baseline).  Only
                # a FINAL adaptive plan's handles are safe to cache.
                try:
                    root = df._jdf.queryExecution().executedPlan()
                    if (
                        root.getClass().getSimpleName()
                        == "AdaptiveSparkPlanExec"
                        and not root.isFinalPlan()
                    ):
                        complete = False
                except Exception:
                    complete = False
            if complete:
                # only a COMPLETE walk is cached on the plan object; a
                # truncated one is retried next call instead of pinning an
                # under-counting baseline forever
                df.__dict__["_dss_delta_handles"] = handles
        base = dict.fromkeys(_DELTA_METRIC_KEYS, 0)
        for metric_key, jmetric in handles:
            try:
                v = int(jmetric.value())
            except Exception:
                complete = False
                continue
            if v > 0:
                base[metric_key] += v
        if not complete:
            # surfaced by last_metrics() as partial: true — the deltas
            # derived from this baseline may over-count
            base["__partial__"] = 1
        return base

    def sql(self, sql: str) -> DataFrame:
        """Escape hatch: plain lazy Spark SQL, uncached."""
        return self.spark.sql(sql)

    def sql_iterator(self, sql: str):
        """Execute SQL and stream the result rows as dicts WITHOUT
        materializing the full result on the driver — the pull-based
        result contract the reference exposes as ``Iterator[InternalRow]``
        (DirectPlan.scala:81-83).  Backed by ``toLocalIterator`` with
        partition prefetch: one partition is in driver memory at a time
        (plus one being fetched), so a larger-than-driver result can be
        consumed incrementally."""
        df = self.dataframe(sql)
        # Mark the plan executed BEFORE consuming: toLocalIterator ticks
        # the same SQLMetric accumulators sql_directly reads, so a later
        # sql_directly on this cached plan must take a baseline snapshot
        # rather than treat the accumulated values as its own first run
        # (unset, they'd be reported — and result-cache-frozen — at ~2x).
        df.__dict__["_dss_executed"] = True
        for row in df.toLocalIterator(prefetchPartitions=True):
            yield row.asDict(recursive=True)

    def execute_and_register_temp_view(self, sql: str, name: str) -> int:
        """Materialize a query into a new temp view; returns the row count
        (reference: DirectSparkSession.scala:181-219).  Spark-first: the
        result is cached (memory-and-disk) rather than collected to the
        driver, so multi-step pipelines stay distributed.

        Re-registration semantics: the replaced DataFrame is unpersisted
        BEFORE the new statement materializes — so re-running the SAME
        statement re-reads fresh source data (a re-register is a refresh,
        matching the reference's collect-a-new-snapshot behavior) and a
        long-lived service loop never leaks one cached RDD per call.
        Spark's CacheManager keys by canonicalized plan, so the
        unpersist-first ordering is what makes the refresh work: caching
        the new identical plan AFTER the old entry is gone materializes
        anew instead of silently reusing stale cached rows.  If a
        concurrent re-register of the same name races us, the displaced
        DataFrame's storage is dropped only when it doesn't share the
        survivor's cache entry (conservative: on doubt, keep).
        """
        with self._lock:
            old = self._materialized_views.pop(name, None)
        if old is not None:
            old.unpersist()
        df = self.spark.sql(self._rewrite_qualified(sql)).cache()
        count = df.count()
        with self._lock:
            displaced = self._materialized_views.get(name)
            df.createOrReplaceTempView(name)
            self._materialized_views[name] = df
        if displaced is not None and displaced is not df:
            try:
                shares_cache_entry = (
                    displaced._jdf.queryExecution()
                    .analyzed()
                    .sameResult(df._jdf.queryExecution().analyzed())
                )
            except Exception:
                shares_cache_entry = True  # keep: never uncache survivor
            if not shares_cache_entry:
                displaced.unpersist()
        self._drop_cached_plans_referencing(name)
        return count

    def _is_nondeterministic(self, sql: str) -> bool:
        return _NONDETERMINISTIC_RE.search(sql) is not None

    # pre-round-4 name, kept for callers/tests written against it
    _uses_time = _is_nondeterministic

    def _register_function_ddl(
        self, sql: str, name: str, cls: str, jar: str | None
    ) -> DataFrame:
        """JVM UDF DDL surface (reference: CREATE FUNCTION ... AS 'class',
        DirectSessionCatalog.scala:72-91; DirectExecSuite.scala:159-178).

        Two class contracts are accepted:

        - ``org.apache.spark.sql.api.java.UDF1..22`` — registered via
          ``registerJavaFunction`` (return type inferred from the generic
          signature).  Works in any session.
        - Hive-API classes (``org.apache.hadoop.hive.ql.exec.UDF`` /
          ``GenericUDF`` / UDAF / UDTF) — the DDL text is passed through to
          Spark SQL, whose Hive session catalog builds the HiveUDF wrapper.
          Requires ``EngineBuilder.enable_hive_support()``; in a plain
          session the passthrough raises Spark's descriptive error.

        Returns an empty result like any DDL statement."""
        from direct_spark_sql_spark.functions.jvm import register_java_function

        # a (re)defined function can change any cached result that called
        # it — and any cached ANALYZED plan, which bound the old
        # implementation at resolution time (a kept plan would re-execute
        # the old class and re-poison the just-cleared result cache).
        # Clearing both is cheap and DDL is rare.  Clear-then-bump, same
        # reader-race reasoning as _drop_cached_plans_referencing: a
        # reader observing the new epoch must already see empty caches.
        with self._lock:
            self._plan_cache.clear()
            self._result_cache.clear()
            self._invalidation_epoch += 1
        try:
            register_java_function(self.spark, name, cls, jar_path=jar)
        except Exception:
            # Not a Spark Java UDF interface (or not loadable as one):
            # delegate to Spark SQL's own function DDL, which resolves
            # Hive-API classes when the session is Hive-enabled.
            self.spark.sql(sql)
        return self.spark.sql(
            f"SELECT '{name}' AS function_registered"
        ).limit(0)

    # -- egress -------------------------------------------------------------

    def cache_stats(self) -> dict[str, int]:
        """Plan-cache observability: hits / misses / live entries /
        capacity.  The reference's repeated-query latency rests entirely
        on this cache (Guava stats were reachable but unexposed,
        DirectSparkSession.scala:411-415); operating a shared engine
        without a hit-rate signal means flying blind, so the rebuild
        exposes it."""
        c = self._plan_cache
        with c._lock:
            out = {
                "hits": c.hits,
                "misses": c.misses,
                "entries": len(c._data),
                "capacity": c.capacity,
            }
        r = self._result_cache
        with r._lock:
            out.update(
                {
                    "result_hits": r.hits,
                    "result_misses": r.misses,
                    "result_entries": len(r._data),
                    "result_capacity": r.capacity,
                    "result_bytes": r.bytes,
                    "result_max_bytes": r.max_bytes,
                }
            )
        return out

    def last_metrics(self) -> dict[str, Any] | None:
        """Executed-plan metrics of the most recent ``sql_directly``.

        The reference exposes a per-plan-node SQLMetric map
        (DirectSQLMetrics.scala:21-72, wired through DirectPlan.scala:
        63-77); this is the same readout off Spark's own executed plan:
        every physical node's metrics (raw numeric accumulator values),
        plus rolled-up totals an operator would alert on — output rows,
        shuffle bytes, spill bytes, peak memory — and the driver-side
        wall time of the materialization.

        Returns ``None`` before any ``sql_directly`` call.  The rollup
        keys (``shuffle_*``, ``spill_bytes``) are PER-CALL values: for a
        plan-cache-hit re-execution they are deltas against a
        pre-execution accumulator snapshot, matching the reference's
        reset-per-execution metric map (DirectExecutionContext.scala:45).
        The per-node ``operators`` list stays raw/cumulative (the Spark
        UI's contract for a reused plan object), and ``partial: true``
        flags a truncated plan walk whose rollups may under-count.

        For a result-cache hit the snapshot frozen at put time is
        returned (with this call's wall time), so intervening executions
        of the same plan object can never inflate the readout."""
        if self._last_execution is None:
            return None
        df, wall, n_rows, pre, cache_hit, snap = self._last_execution
        if snap is not None:
            out = dict(snap)
            out["wall_sec"] = wall
            out["result_cache_hit"] = True
            return out
        return self._compute_metrics(df, wall, n_rows, pre, cache_hit)

    def _compute_metrics(
        self,
        df: DataFrame,
        wall: float,
        n_rows: int,
        pre: dict[str, int] | None,
        cache_hit: bool,
    ) -> dict[str, Any]:
        nodes: list[dict[str, Any]] = []
        _walk_plan_metrics(df._jdf.queryExecution().executedPlan(), nodes)

        def _total(metric: str) -> int:
            # skip SQLMetric's -1 "unset" sentinel
            return sum(
                v
                for n in nodes
                if (v := n["metrics"].get(metric)) is not None and v > 0
            )

        def _per_call(metric: str) -> int:
            total = _total(metric)
            if pre is not None:
                total -= pre.get(metric, 0)
            return max(0, total)

        return {
            "wall_sec": wall,
            # the statement's actual result-row count (counted at the
            # egress boundary — plan-root numOutputRows would report a
            # deep operator's count for roots like CollectLimit that
            # carry no metric themselves)
            "output_rows": n_rows,
            # per-call values: for a re-executed cached plan these are
            # deltas against the pre-execution accumulator snapshot, the
            # reference's reset-per-execution contract
            # (DirectExecutionContext.scala:45); for a result-cache-hit
            # call they reproduce the metrics of the execution that
            # materialized the cached rows
            "shuffle_bytes_written": _per_call("shuffleBytesWritten"),
            "shuffle_records_written": _per_call("shuffleRecordsWritten"),
            "spill_bytes": _per_call("spillSize"),
            "peak_memory_bytes": max(
                (
                    n["metrics"]["peakMemory"]
                    for n in nodes
                    if "peakMemory" in n["metrics"]
                ),
                default=0,
            ),
            "result_cache_hit": cache_hit,
            # True when a py4j failure truncated part of the plan walk —
            # the rollups above may then under- or over-count (ADVICE r4;
            # a truncated BASELINE walk makes the deltas over-count, so
            # its marker surfaces here too)
            "partial": any(n.get("partial") for n in nodes)
            or bool(pre and pre.get("__partial__")),
            # raw per-node accumulator values (cumulative across
            # executions of a reused plan object, like the Spark UI)
            "operators": nodes,
        }

    def explain(self, sql: str, mode: str = "formatted") -> str:
        """Formatted plan text for a SQL statement (debugging surface; goes
        through the same qualified-view rewrite as execution).  Modes:
        simple | extended | codegen | cost | formatted."""
        df = self.spark.sql(self._rewrite_qualified(sql))
        jvm = df._sc._jvm  # type: ignore[attr-defined]
        mode_obj = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(mode_obj)  # type: ignore[attr-defined]

    def temp_view(self, name: str) -> DataTable:
        """Read a registered view back out (reference:
        DirectSparkSession.scala:139-154)."""
        if name in self._qualified_views:
            return DataTable.from_dataframe(self._qualified_views[name])
        return DataTable.from_dataframe(self.spark.table(name))

    def list_tables(self, pattern: str | None = None) -> list[str]:
        """All visible table/view names — Spark's catalog merged with the
        engine's db-qualified temp-view registry, optionally filtered by a
        ``*``-wildcard pattern (``'|'``-separated alternatives), matching
        the reference's listTables override
        (DirectSessionCatalog.scala:185-201, StringUtils.filterPattern)."""
        names = set(t.name for t in self.spark.catalog.listTables())
        names |= set(self._qualified_views)
        if pattern is not None:
            regexes = [
                re.compile("(?i)^" + ".*".join(map(re.escape, p.split("*"))) + "$")
                for p in pattern.split("|")
            ]
            names = {n for n in names if any(r.match(n) for r in regexes)}
        return sorted(names)

    def is_temporary_table(self, name: str) -> bool:
        """Whether ``name`` resolves to a temporary view — Spark's own temp
        views plus the db-qualified registry, mirroring the reference's
        isTemporaryTable override (DirectSessionCatalog.scala:173-183)."""
        if name in self._qualified_views:
            return True
        try:
            if "." in name:
                db, tbl = name.rsplit(".", 1)
                tables = self.spark.catalog.listTables(db)
                return any(t.name == tbl and t.isTemporary for t in tables)
            tables = self.spark.catalog.listTables()
            return any(t.name == name and t.isTemporary for t in tables)
        except Exception:  # unknown database -> not a temp view
            return False

    def temp_view_java(self, name: str) -> list[dict[str, Any]]:
        """The view's rows as a list of dicts — the reference's
        ``tempViewJava`` readout (DirectSparkSession.scala:156-179),
        which materialized a temp view as java List<Map<column, value>>."""
        return self.temp_view(name).to_list_of_dicts()

    # -- session management --------------------------------------------------

    def new_session(self) -> "Engine":
        """Isolated catalog + cache over the shared SparkContext
        (reference: DirectSparkSession.scala:81-86).  The child inherits
        the parent's cache sizing AND runtime toggles — an engine built
        with result caching disabled must not hand out children that
        silently re-enable it (each entry can pin up to
        ``result_cache_max_rows`` materialized rows on the driver)."""
        child = Engine(
            self.spark.newSession(),
            self._plan_cache.capacity,
            self._result_cache.capacity,
            result_cache_max_bytes=self._result_cache.max_bytes,
        )
        child.result_cache_enabled = self.result_cache_enabled
        child.result_cache_max_rows = self.result_cache_max_rows
        return child

    def stop(self) -> None:
        self.spark.stop()
