"""Bucketed co-located joins: the shuffle must be paid at WRITE time
only — a join of two tables bucketed on the join key plans with no
Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.io.bucketing import (
    read_bucketed,
    write_bucketed,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"),
                   "orders_bkt", "custkey", n_buckets=8)
    write_bucketed(cust.withColumnRenamed("c_custkey", "custkey"),
                   "customer_bkt", "custkey", n_buckets=8)
    try:
        # disable broadcast so the test proves the SMJ itself is
        # exchange-free, not that one side got broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            o = read_bucketed(spark, "orders_bkt")
            c = read_bucketed(spark, "customer_bkt")
            joined = o.join(c, "custkey").select(
                "custkey", "o_orderkey", "c_mktsegment")
            plan = _physical_plan(joined)
            assert "Exchange" not in plan, plan
            # and the result is still correct
            expected = (orders.join(
                cust, orders.o_custkey == cust.c_custkey).count())
            assert joined.count() == expected
            # contrast: the unbucketed join DOES shuffle both sides
            unbucketed = orders.join(
                cust, orders.o_custkey == cust.c_custkey)
            assert "Exchange" in _physical_plan(unbucketed)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_aggregate_has_no_shuffle(spark, sf_dir):
    """groupBy on the bucket key reuses the write-time partitioning —
    no Exchange before the final aggregate either."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"),
                   "orders_bkt_agg", "custkey", n_buckets=8)
    try:
        agg = (read_bucketed(spark, "orders_bkt_agg")
               .groupBy("custkey").agg(F.count(F.lit(1)).alias("n")))
        assert "Exchange" not in _physical_plan(agg), _physical_plan(agg)
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt_agg")


def test_bucketed_query_plan_and_parity(spark, sf_dir):
    """The queries() entry itself: join side must be Exchange-free (the
    write-time shuffle is the only one), and the answer must equal the
    plain-parquet join."""
    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    orders, lineitem = scaleops.bucketed_tables(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_only = lineitem.join(orders, "orderkey")
        assert "Exchange" not in _physical_plan(join_only), \
            _physical_plan(join_only)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    got = {(r["o_orderpriority"], r["n_items"], round(r["revenue"], 2))
           for r in scaleops.bucketed_orders_lineitem_join(spark, sf_dir)
           .collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = {(r["o_orderpriority"], r["n_items"], round(r["revenue"], 2))
                for r in li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n_items"),
                     F.sum((F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))
                           .cast("decimal(20,6)"))
                     .cast("double").alias("revenue"))
                .collect()}
    assert got == expected and got


def _private_bucketed_sf(spark, tmp_path):
    """Private sf_dir + green bucketed layout for probe-injection tests
    (private token, can't poison the shared scratch). Single source for
    the sf-build/token/probe_key/tdir block the four probe tests below
    share — the scratch layout and token scheme live in one place."""
    import hashlib
    from pathlib import Path

    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("orders", "lineitem"):
        (spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
         .coalesce(1).write.parquet(str(sf / f"{t}.parquet")))
    want = spark.read.parquet(str(sf / "orders.parquet")).count()
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert orders.count() == want
    token = hashlib.md5(str(sf).encode()).hexdigest()[:10]
    probe_key = (spark.sparkContext.applicationId, token, "orders")
    tdir = Path(scaleops._WAREHOUSE) / token / "orders"
    return sf, want, probe_key, tdir


def test_bucketed_tables_probe_repairs_doubled_file(spark, tmp_path):
    """bucketed_tables carries the same torn-write invariant probe as
    partitioned_events (r12): a doubled part file in the shared
    scratch layout — the r10 concurrent-overwrite footprint, join
    answers exactly 2x — must be caught by the next SESSION's
    row-count probe and repaired by rewrite. Also pins the memo: with
    the memo intact the probe is skipped (happy path pays it once)."""
    import shutil

    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    sf, want, probe_key, tdir = _private_bucketed_sf(spark, tmp_path)
    part = next(p for p in tdir.glob("part-*")
                if not p.name.endswith(".crc"))
    shutil.copy(part, tdir / f"part-injected-{part.name[5:]}")

    # memo intact -> probe skipped -> doubling unseen this session:
    # the injected file must SURVIVE this call and its duplicate rows
    # must be visible in the table (r12 ADVICE: without these asserts
    # a regression that probes-and-repairs on every call would pass).
    # The copied file is ONE of the n_buckets bucket files, so the
    # inflation is that bucket's row count, not a full 2x.
    dup_rows = spark.read.parquet(str(part)).count()
    assert dup_rows > 0
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert list(tdir.glob("part-injected-*"))
    spark.catalog.refreshTable(f"bkt_orders_{probe_key[1]}")
    assert orders.count() == want + dup_rows

    # new session models: drop the memo -> probe sees 2x -> rewrite
    scaleops._BUCKETS_PROBED_OK.discard(probe_key)
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert orders.count() == want
    assert not list(tdir.glob("part-injected-*"))


def test_bucketed_tables_probe_repairs_missing_and_corrupt_layout(
        spark, tmp_path):
    """(r14 review) The footer probe must ROUTE, not raise, on the two
    degenerate layouts a lost cross-process race can leave behind: a
    missing table dir (the other writer's overwrite delete phase won)
    counts as 0 rows, and an unreadable footer (truncated part file)
    forces the mismatch — both land in the idempotent repair write.
    Before the fix either state crashed bucketed_tables, and the
    corrupt file wedged every FUTURE session's probe too (the rewrite
    that would delete it could never run)."""
    import shutil

    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    # the 0-rows degenerate treatment is OPT-IN (scratch side only,
    # r15 ADVICE fix): default raises on a missing path
    assert scaleops._footer_row_count(str(tmp_path / "nope"),
                                      missing_ok=True) == 0
    with pytest.raises(FileNotFoundError):
        scaleops._footer_row_count(str(tmp_path / "nope"))

    sf, want, probe_key, tdir = _private_bucketed_sf(spark, tmp_path)

    # 1) table dir deleted under a registered catalog entry
    shutil.rmtree(tdir)
    scaleops._BUCKETS_PROBED_OK.discard(probe_key)
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert orders.count() == want

    # 2) one part file truncated to an unreadable stub
    part = next(p for p in tdir.glob("part-*") if p.suffix == ".parquet")
    part.write_bytes(part.read_bytes()[:64])
    scaleops._BUCKETS_PROBED_OK.discard(probe_key)
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert orders.count() == want


def test_bucketed_tables_probe_catches_stray_nonparquet_file(
        spark, tmp_path):
    """(r14 ADVICE #1) A stray committed data file WITHOUT the .parquet
    suffix is read by Spark's InMemoryFileIndex (which lists all
    non-hidden files) but was invisible to the old suffix-filtered
    footer sum — the probe would have stayed green while Spark's row
    count inflated. The listing now mirrors Spark's rule: the stray
    file is footer-read, fails to parse, forces the mismatch, and the
    repair overwrite removes it."""
    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    sf, want, probe_key, tdir = _private_bucketed_sf(spark, tmp_path)
    (tdir / "stray-datafile").write_bytes(b"not a parquet footer")
    scaleops._BUCKETS_PROBED_OK.discard(probe_key)
    orders, _ = scaleops.bucketed_tables(spark, str(sf))
    assert orders.count() == want
    assert not (tdir / "stray-datafile").exists()
    assert probe_key in scaleops._BUCKETS_PROBED_OK


def test_bucketed_tables_probe_raises_on_missing_source(
        spark, tmp_path, monkeypatch):
    """(r14 ADVICE #2) When the SOURCE parquet is gone, the probe must
    surface it THERE — not read missing-vs-missing as 0 == 0, mark the
    probe green, memoize, and defer the failure to a later confusing
    read error. The raise also skips memoization, so a restored source
    gets a fresh probe instead of a poisoned memo.

    A source missing at CALL time already raises in table() (Spark's
    eager schema resolution), so the probe guard covers the race
    WINDOW: the source vanishes after the source frame is constructed
    but before the probe compares footers. Model exactly that skew by
    pinning table() to frames captured while the source existed."""
    import shutil

    from spark_kafka_airflow_pipeline_spark.operators import base, scaleops

    sf, _, probe_key, tdir = _private_bucketed_sf(spark, tmp_path)
    frames = {t: base.table(spark, str(sf), t)
              for t in ("orders", "lineitem")}
    monkeypatch.setattr(scaleops, "table",
                        lambda _s, _d, t: frames[t])
    shutil.rmtree(sf / "orders.parquet")  # source vanishes
    shutil.rmtree(tdir)                   # scratch vanishes too (the
    scaleops._BUCKETS_PROBED_OK.discard(probe_key)  # 0 == 0 trap)
    with pytest.raises(FileNotFoundError):
        scaleops.bucketed_tables(spark, str(sf))
    assert probe_key not in scaleops._BUCKETS_PROBED_OK


def test_probe_memo_evicts_other_apps():
    """The probe memos drop keys from OTHER applications on entry
    (r12 ADVICE: stopped sessions' keys otherwise accumulate for the
    process lifetime). Pure set logic, pinned deterministically —
    the threaded path is serialized by _PROBE_LOCK and exercised by
    the injection tests above."""
    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    memo = {("appA", "t1"), ("appA", "t2", "orders"), ("appB", "t1")}
    scaleops._evict_other_apps(memo, "appB")
    assert memo == {("appB", "t1")}
    # idempotent / no-op when only the live app remains
    scaleops._evict_other_apps(memo, "appB")
    assert memo == {("appB", "t1")}
