"""Relational operator catalog: scans, joins, aggregations, windows,
set ops, sort/limit/top-k, scalar functions — the [EXT] surface of
SURVEY.md §2.2, exercised as TPC-H-style queries over the test star
schema with DuckDB oracles.

Scale posture (100 TB):
- Only FIXED-SIZE dimension tables (region: 5 rows, nation: 25 rows)
  carry explicit ``F.broadcast`` hints. Tables that grow with the data
  (customer/supplier/part/orders) get NO hard hint — AQE converts the
  join to broadcast at runtime when the (filtered) side fits under
  ``spark.sql.autoBroadcastJoinThreshold``, and falls back to a shuffle
  join when it doesn't. A hard hint on a scaling table OOMs at 100 TB
  (customer ~10^9 rows); the hint-free plan is identical at small SF
  (AQE broadcasts it anyway) and safe at large SF.
- Aggregates run as partial (map-side) + final automatically; sums are
  cast to decimal so the result is order-independent (bit-identical
  across partitionings AND engines — doubles would drift in the last
  ulp run-to-run).
- Filters sit directly on scans so Parquet pushdown + column pruning
  apply (verify with ``.explain``: PushedFilters / ReadSchema).
- Top-k uses orderBy+limit (Spark plans TakeOrderedAndProject — no full
  sort, no single-node shuffle of the whole input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table

# --- deterministic aggregate helpers (see module docstring) -----------

def dsum(col, alias: str):
    """Order-independent double sum: sum over decimal(20,6), cast back."""
    return F.sum(col.cast("decimal(20,6)")).cast("double").alias(alias)


def davg(col, alias: str):
    """Order-independent double average (decimal sum / non-null count)."""
    return (F.sum(col.cast("decimal(20,6)")).cast("double")
            / F.count(col)).alias(alias)


SQL_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE) / COUNT({expr})"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ----------------------------------------------------------------------
# q1: pricing summary — groupBy + rich aggregates (TPC-H Q1 shape)
# ----------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= _ts("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
       {SQL_DSUM.format(expr='l_extendedprice')} AS sum_base_price,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {SQL_DAVG.format(expr='l_quantity')} AS avg_qty,
       {SQL_DAVG.format(expr='l_extendedprice')} AS avg_price,
       {SQL_DAVG.format(expr='l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

# ----------------------------------------------------------------------
# q3: shipping priority — 3-way join + group + top-k (TPC-H Q3 shape)
# ----------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < _ts("1997-01-01"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > _ts("1997-01-01"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer scales with SF — no hard broadcast hint; AQE broadcasts
    # the filtered projection when it fits. orders x lineitem is
    # fact-x-fact and must stay a shuffle join at scale.
    return (
        li.join(orders.join(cust,
                            orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "revenue")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# ----------------------------------------------------------------------
# q5: revenue by nation — 5-way star join, all dims broadcast (Q5 shape)
# ----------------------------------------------------------------------

def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    customer = table(spark, sf_dir, "customer")
    orders = (table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= _ts("1996-01-01"))
                      & (F.col("o_orderdate") < _ts("1998-01-01"))))
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # region x nation is 5 x 25 rows FIXED — the only joins that earn an
    # unconditional broadcast hint. customer/supplier scale linearly
    # with SF (~10^9 rows at 100 TB): no hard hint; AQE upgrades those
    # joins to broadcast at runtime iff the side actually fits. The big
    # fact-fact join (lineitem x orders) stays a shuffle join on
    # orderkey (shuffle_hash avoids the sort at this cardinality).
    dims = (nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey))
    return (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(supplier,
              (F.col("l_suppkey") == supplier.s_suppkey)
              & (F.col("c_nationkey") == supplier.s_nationkey))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


Q5_SQL = f"""
SELECT n_name, {SQL_DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

# ----------------------------------------------------------------------
# q6: forecast revenue — pure pushdown filter + single aggregate (Q6)
# ----------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= _ts("1996-01-01"))
                  & (F.col("l_shipdate") < _ts("1997-01-01"))
                  & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.06)
                  & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


Q6_SQL = f"""
SELECT {SQL_DSUM.format(expr='l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24
"""

# ----------------------------------------------------------------------
# top-k: customers by lifetime revenue — join + agg + TakeOrdered
# ----------------------------------------------------------------------

def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey").agg(dsum(F.col("o_totalprice"), "revenue"),
                                        F.count(F.lit(1)).alias("n_orders"))
        # customer scales with SF — no hard broadcast; AQE decides
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


TOP10_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name,
       {SQL_DSUM.format(expr='o_totalprice')} AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""

# ----------------------------------------------------------------------
# window functions: rank + running total
# ----------------------------------------------------------------------

def latest3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (customer, orderdate desc) <= 3 — the scalable
    per-group top-k pattern (no per-group sort of everything)."""
    orders = table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc()))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
    )


LATEST3_SQL = """
SELECT o_custkey, o_orderkey, rn, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS INT) AS rn
  FROM orders)
WHERE rn <= 3
"""


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer ordered by order date (cumulative
    window frame). Decimal running sum keeps it order-exact."""
    orders = table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(20,6)")).over(w)
        .cast("double").alias("running_revenue"),
    )


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue
FROM orders
"""

# ----------------------------------------------------------------------
# rollup / cube — multi-level aggregates
# ----------------------------------------------------------------------

def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             dsum(F.col("l_quantity"), "sum_qty"))
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {SQL_DSUM.format(expr='l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice"), "sum_price"))
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {SQL_DSUM.format(expr='o_totalprice')} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

# ----------------------------------------------------------------------
# semi / anti joins — existence predicates without row multiplication
# ----------------------------------------------------------------------

def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = (table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment"))


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = (table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


ANTI_JOIN_SQL = """
-- NOT EXISTS, not NOT IN: NOT IN returns zero rows if the subquery
-- yields any NULL key, while Spark's left_anti keeps unmatched rows —
-- NOT EXISTS matches left_anti semantics for nullable keys.
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderpriority = '1-URGENT')
"""

# ----------------------------------------------------------------------
# set operations
# ----------------------------------------------------------------------

def nations_with_both_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present among customers INTERSECT among suppliers."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics), matches SQL EXCEPT


EXCEPT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""

# ----------------------------------------------------------------------
# distinct aggregates
# ----------------------------------------------------------------------

def segment_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.countDistinct("c_nationkey").alias("n_nations"),
             F.count(F.lit(1)).alias("n_customers"))
    )


DISTINCT_SQL = """
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""

# ----------------------------------------------------------------------
# scalar function surface: string / math / date
# ----------------------------------------------------------------------

def part_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_brand"), 1, 5).alias("brand_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        # decimal arithmetic, not round(double): Spark rounds doubles via
        # HALF_UP on the shortest decimal repr, DuckDB on the binary value
        # — they disagree on ~5% of .xx5 boundaries. Decimal is exact.
        (F.col("p_retailprice").cast("decimal(12,2)")
         * F.lit("1.1").cast("decimal(3,1)")).cast("double").alias("price_markup"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("bucket7"),
    )


PART_SCALAR_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_brand, 1, 5) AS brand_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       CAST(length(p_name) AS INT) AS name_len,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE) AS price_markup,
       abs(p_size - 25) AS size_dev,
       p_partkey % 7 AS bucket7
FROM part
"""


def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").alias("yr"),
                 F.month("o_orderdate").alias("mo"),
                 F.dayofweek("o_orderdate").alias("dow"),
                 "o_totalprice")
        .groupBy("yr", "mo", "dow")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice"), "sum_price"))
    )


DATE_FUNC_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       COUNT(*) AS n_orders,
       {SQL_DSUM.format(expr='o_totalprice')} AS sum_price
FROM orders
GROUP BY 1, 2, 3
"""

# ----------------------------------------------------------------------
# pivot — wide-format conditional aggregation
# ----------------------------------------------------------------------

def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority pivoted on status. Explicit pivot
    values keep the plan single-pass (no distinct-scan job) — the form
    that scales."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "P", "F"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .withColumnsRenamed({"O": "n_open", "P": "n_partial", "F": "n_filled"})
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled
FROM orders GROUP BY o_orderpriority
"""

# ----------------------------------------------------------------------
# deterministic second moments: stddev / correlation via decimal sums
# ----------------------------------------------------------------------

def lineitem_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev of quantity and quantity<->price correlation per
    return flag, computed from exact decimal power sums so the doubles
    are bit-identical across engines and partitionings (native stddev/
    corr aggregate in float accumulation order — nondeterministic)."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(24,6)")).cast("double").alias("sq"),
        F.sum((q * q).cast("decimal(24,6)")).cast("double").alias("sqq"),
        F.sum(p.cast("decimal(24,6)")).cast("double").alias("sp"),
        F.sum((p * p).cast("decimal(30,6)")).cast("double").alias("spp"),
        F.sum((q * p).cast("decimal(30,6)")).cast("double").alias("sqp"),
    )
    n = F.col("n")
    var_q = (F.col("sqq") - F.col("sq") * F.col("sq") / n) / (n - 1)
    cov = F.col("sqp") - F.col("sq") * F.col("sp") / n
    den = F.sqrt((F.col("sqq") - F.col("sq") * F.col("sq") / n)
                 * (F.col("spp") - F.col("sp") * F.col("sp") / n))
    return agg.select(
        "l_returnflag", "n",
        F.round(F.sqrt(var_q), 6).alias("stddev_qty"),
        F.round(cov / den, 6).alias("corr_qty_price"),
    )


MOMENT_STATS_SQL = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sqrt((sqq - sq * sq / n) / (n - 1)), 6) AS stddev_qty,
       round((sqp - sq * sp / n)
             / sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)), 6) AS corr_qty_price
FROM s
"""

# ----------------------------------------------------------------------
# approximate aggregates — the 100 TB cardinality path
# ----------------------------------------------------------------------

def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count next to the exact one. At 100 TB the
    approximate form is the only affordable distinct over a high-card
    key (no exact-distinct shuffle). Rows-only check: DuckDB's HLL
    yields different estimates by construction; the test asserts the
    estimate lands within the configured 2% rsd of exact."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
             F.countDistinct("o_custkey").alias("exact_customers"))
    )


def approx_price_quantiles(spark: SparkSession, sf_dir: str,
                           accuracy: int = 10000) -> DataFrame:
    """Approximate percentiles (Spark's Greenwald-Khanna / KLL-family
    ``percentile_approx`` sketch) validated against the exact
    interpolated ones — the mergeable single-pass form that at 100 TB
    replaces the exact sort-based percentile (whose per-group state is
    unbounded). The sketch guarantees rank error <= n/accuracy and is
    mergeable across partitions, so the aggregation stays one shuffle
    with bounded state.

    DuckDB has no twin sketch, so the sketch values themselves are not
    output columns (scalar columns only — ARRAY output crashed the r6
    driver canonicalizer); instead a second scan counts each group's
    rows below/at the sketch value and emits ``ok_p*`` flags proving
    the value sits inside the guaranteed rank window (+1 row slack for
    interpolation). The oracle pins the flags to 1 and recomputes the
    exact percentiles, so a sketch regression IS a hash mismatch."""
    orders = table(spark, sf_dir, "orders")
    qs = {"50": 0.5, "90": 0.9, "99": 0.99}
    # one array-percentile (and one array-percentile_approx) buffer per
    # group instead of 3 each — bit-identical values, ~3x less agg
    # state (r17, see scaleops.orders_equidepth_bins)
    arr = ", ".join(f"{p}D" for p in qs.values())
    agg = (orders.groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n_orders"),
                F.expr(f"percentile(o_totalprice, array({arr}))")
                .alias("_ep"),
                F.expr(f"percentile_approx(o_totalprice, array({arr}), "
                       f"{accuracy})").alias("_ap"))
           .select("o_orderpriority", "n_orders",
                   *[F.round(F.col("_ep")[i], 6).alias(f"exact_p{k}")
                     for i, k in enumerate(qs)],
                   *[F.col("_ap")[i].alias(f"a{k}")
                     for i, k in enumerate(qs)]))
    # 5-row priority aggregate: bounded broadcast back onto the fact
    joined = (orders.select("o_orderpriority", "o_totalprice")
              .join(F.broadcast(agg), "o_orderpriority"))
    ranked = joined.groupBy("o_orderpriority").agg(
        F.min("n_orders").alias("n_orders"),
        *[F.min(f"exact_p{k}").alias(f"exact_p{k}") for k in qs],
        *[F.sum((F.col("o_totalprice") < F.col(f"a{k}")).cast("bigint"))
          .alias(f"lt{k}") for k in qs],
        *[F.sum((F.col("o_totalprice") <= F.col(f"a{k}")).cast("bigint"))
          .alias(f"le{k}") for k in qs])
    flags = [
        ((F.col(f"lt{k}") * accuracy
          <= (int(p * accuracy) + 1) * F.col("n_orders") + accuracy)
         & (F.col(f"le{k}") * accuracy
            >= (int(p * accuracy) - 1) * F.col("n_orders") - accuracy))
        .cast("int").alias(f"ok_p{k}") for k, p in qs.items()]
    return ranked.select("o_orderpriority", "n_orders",
                         *[f"exact_p{k}" for k in qs], *flags)


APPROX_QUANTILES_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(quantile_cont(o_totalprice, 0.50), 6) AS exact_p50,
       round(quantile_cont(o_totalprice, 0.90), 6) AS exact_p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS exact_p99,
       1 AS ok_p50, 1 AS ok_p90, 1 AS ok_p99
FROM orders GROUP BY o_orderpriority
"""


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

QUERIES: dict[str, QueryFn] = {
    "approx_price_quantiles": approx_price_quantiles,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top10_customers_by_revenue": top10_customers_by_revenue,
    "latest3_orders_per_customer": latest3_orders_per_customer,
    "customer_running_total": customer_running_total,
    "rollup_lineitem_flags": rollup_lineitem_flags,
    "cube_order_status_priority": cube_order_status_priority,
    "customers_with_urgent_orders": customers_with_urgent_orders,
    "customers_without_urgent_orders": customers_without_urgent_orders,
    "nations_with_both_roles": nations_with_both_roles,
    "customer_only_nations": customer_only_nations,
    "segment_distinct_stats": segment_distinct_stats,
    "part_scalar_functions": part_scalar_functions,
    "orders_date_functions": orders_date_functions,
    "pivot_status_by_priority": pivot_status_by_priority,
    "lineitem_moment_stats": lineitem_moment_stats,
    "approx_distinct_customers": approx_distinct_customers,
}

ORACLES: dict[str, str] = {
    "approx_price_quantiles": APPROX_QUANTILES_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
    "lineitem_moment_stats": MOMENT_STATS_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_revenue_by_nation": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "top10_customers_by_revenue": TOP10_CUSTOMERS_SQL,
    "latest3_orders_per_customer": LATEST3_SQL,
    "customer_running_total": RUNNING_TOTAL_SQL,
    "rollup_lineitem_flags": ROLLUP_SQL,
    "cube_order_status_priority": CUBE_SQL,
    "customers_with_urgent_orders": SEMI_JOIN_SQL,
    "customers_without_urgent_orders": ANTI_JOIN_SQL,
    "nations_with_both_roles": INTERSECT_SQL,
    "customer_only_nations": EXCEPT_SQL,
    "segment_distinct_stats": DISTINCT_SQL,
    "part_scalar_functions": PART_SCALAR_SQL,
    "orders_date_functions": DATE_FUNC_SQL,
}
