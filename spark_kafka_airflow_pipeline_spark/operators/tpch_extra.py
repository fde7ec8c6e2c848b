"""Third wave of relational coverage [EXT]: TPC-H Q2/Q8/Q9/Q11/Q12/Q16/
Q20/Q21 shapes adapted to the test schema (no partsupp/commitdate/
shipmode/container columns — each shape keeps the original's PLAN
CHALLENGE and swaps the missing columns for present ones).

Shapes exercised: min-per-group join-back (Q2), ratio-of-conditional-
sums per group (Q8), multi-dimension profit rollup (Q9), HAVING over a
scalar-subquery threshold (Q11), two-way conditional counts (Q12),
count-distinct with NOT-IN exclusion (Q16), semi join against a grouped
threshold (Q20), and double-correlated sole-failure detection (Q21).

Scale posture follows PLANS.md: no hard broadcast hints on SF-scaling
tables (nation/supplier dims broadcast by planner size choice), all
money aggregates decimal-summed, ratio outputs rounded identically in
both engines.

Reference provenance: the reference has no joins or aggregations at all
(SURVEY.md §2.2 — grep over ``/root/reference/src`` = 0 hits); shapes
follow the public TPC-H spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table
from spark_kafka_airflow_pipeline_spark.operators.relational import SQL_DSUM, dsum


def _dec(col):
    return col.cast("decimal(20,6)")


# ----------------------------------------------------------------------
# q2 shape: min-per-group + join-back (correlated scalar min)
# ----------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every size-15 part, the supplier offering the minimum unit
    price (ties broken by min suppkey) — TPC-H Q2's correlated-min
    pattern: aggregate min per part, join back on equality, re-aggregate
    for the tie-break (the unit price is emitted UNROUNDED: both
    engines compute the identical IEEE double, while rounding a
    tie-boundary value differs between them). Two shuffles on partkey; the join-back reuses the
    same partitioning so AQE coalesces; unit price is computed with the
    IDENTICAL double expression in both engines so the equality
    join-back selects the same rows."""
    p15 = table(spark, sf_dir, "part").filter(F.col("p_size") == 15) \
        .select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"))
    u = li.join(p15, li.l_partkey == p15.p_partkey).select(
        "l_partkey", "l_suppkey", "unit")
    # rename the aggregate side's key: u and m share one lineage, so an
    # unrenamed join condition resolves to a trivially-true self-compare
    m = (u.groupBy("l_partkey").agg(F.min("unit").alias("min_unit"))
         .withColumnRenamed("l_partkey", "m_partkey"))
    w = (u.join(m, (F.col("l_partkey") == F.col("m_partkey"))
                & (F.col("unit") == F.col("min_unit")))
         .groupBy("l_partkey")
         .agg(F.min("l_suppkey").alias("s_key"),
              F.min("min_unit").alias("min_unit_price")))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (w.join(s, w.s_key == s.s_suppkey)
            .select(F.col("l_partkey").alias("p_partkey"),
                    "s_name", "min_unit_price"))


Q2_SQL = """
WITH u AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit
  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_size = 15
), m AS (
  SELECT l_partkey, min(unit) AS min_unit FROM u GROUP BY 1
), w AS (
  SELECT u.l_partkey, min(u.l_suppkey) AS s_key,
         min(m.min_unit) AS min_unit_price
  FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.min_unit
  GROUP BY 1
)
SELECT w.l_partkey AS p_partkey, s_name, min_unit_price
FROM w JOIN supplier ON s_suppkey = s_key
"""

# ----------------------------------------------------------------------
# q8 shape: per-group ratio of conditional sum over total sum
# ----------------------------------------------------------------------

def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of yearly order revenue — TPC-H Q8's
    numerator/denominator from ONE aggregation pass (a CASE'd sum and
    the plain sum), never a second scan. Four-table star: lineitem joins
    orders (year), customer, nation; nation is a fixed 25-row dim."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("rev"))
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nat_rev = F.when(F.col("n_name") == "NATION_3", F.col("rev")) \
        .otherwise(F.lit(0).cast("decimal(20,6)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("o_year")
        .agg(F.round(F.sum(nat_rev).cast("double")
                     / F.sum("rev").cast("double"), 6).alias("mkt_share"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(SUM(CASE WHEN n_name = 'NATION_3'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
                  ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE),
           6) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1
"""

# ----------------------------------------------------------------------
# q9 shape: profit rollup by supplier nation x year
# ----------------------------------------------------------------------

def q9_promo_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """After-tax profit on PROMO parts by supplier nation and ship
    year — TPC-H Q9's (nation, year) rollup; the part filter prunes the
    fact scan before any shuffle (predicate pushdown through the
    join)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO") \
        .select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.year("l_shipdate").alias("l_year"),
        _dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))
             * (1 - F.col("l_tax"))).alias("amount"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_year")
        .agg(F.sum("amount").cast("double").alias("profit"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q9_SQL = """
SELECT n_name, CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 - l_tax)
                AS DECIMAL(20,6))) AS DOUBLE) AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY 1, 2
"""

# ----------------------------------------------------------------------
# q11 shape: groups above a scalar-subquery threshold
# ----------------------------------------------------------------------

def q11_top_balance_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations whose suppliers hold > 4.1% of global supplier balance —
    TPC-H Q11's HAVING-over-scalar-subquery. The global total is a
    1-row aggregate cross-joined in (constant cost; Spark plans a
    broadcast nested loop of one row)."""
    s = table(spark, sf_dir, "supplier").select(
        "s_nationkey", _dec(F.col("s_acctbal")).alias("bal"))
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (s.join(n, s.s_nationkey == n.n_nationkey)
                  .groupBy("n_name")
                  .agg(F.sum("bal").alias("nation_bal")))
    total = s.agg(F.sum("bal").alias("total_bal"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nation_bal").cast("double")
                > 0.041 * F.col("total_bal").cast("double"))
        .select("n_name",
                F.col("nation_bal").cast("double").alias("total_bal"))
    )


Q11_SQL = """
SELECT n_name,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name
HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(20,6))) AS DOUBLE)
       > 0.041 * (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(20,6))) AS DOUBLE)
                  FROM supplier)
"""

# ----------------------------------------------------------------------
# q12 shape: two-way conditional counts over a late-shipment join
# ----------------------------------------------------------------------

def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late line items (> 90 days after order) per line status, split
    into critical- and normal-priority order counts — TPC-H Q12's
    CASE'd two-way count from one pass."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"))
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""

# ----------------------------------------------------------------------
# q16 shape: count-distinct with NOT-IN supplier exclusion
# ----------------------------------------------------------------------

def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) for selected
    sizes, excluding negative-balance suppliers — TPC-H Q16: the NOT IN
    becomes a LEFT ANTI join (suppkey is never NULL, so the semantics
    coincide); lineitem serves as the part-supplier bridge the schema
    lacks."""
    bridge = table(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_suppkey").dropDuplicates()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)) \
        .select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        bridge.join(bad, bridge.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, bridge.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#15'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

# ----------------------------------------------------------------------
# q20 shape: semi join against a grouped threshold
# ----------------------------------------------------------------------

def q20_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped > 400 units of PROMO parts in 1996, with
    their nation — TPC-H Q20's inner threshold aggregate joined back to
    the supplier dim. The heavy lifting (filtered fact aggregate)
    happens before any dimension join."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO") \
        .select("p_partkey")
    li = (table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    heavy = (li.join(p, li.l_partkey == p.p_partkey)
             .groupBy("l_suppkey")
             .agg(dsum(F.col("l_quantity"), "promo_qty"))
             .filter(F.col("promo_qty") > 400))
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (heavy.join(s, heavy.l_suppkey == s.s_suppkey)
            .join(n, s.s_nationkey == n.n_nationkey)
            .select("s_name", "n_name", "promo_qty"))


Q20_SQL = f"""
WITH heavy AS (
  SELECT l_suppkey, {SQL_DSUM.format(expr='l_quantity')} AS promo_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING {SQL_DSUM.format(expr='l_quantity')} > 400
)
SELECT s_name, n_name, promo_qty
FROM heavy
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
"""

# ----------------------------------------------------------------------
# q21 shape: sole-late-supplier detection (double correlation)
# ----------------------------------------------------------------------

def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on multi-supplier
    orders — TPC-H Q21's exists/not-exists double correlation,
    decorrelated into two aggregates: per (order, supplier) lateness,
    then per-order supplier/late-supplier counts, joined back. Top 10
    by wait count with a unique name tie-break."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pair = (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(
                F.when(F.col("l_shipdate")
                       > F.date_add(F.col("o_orderdate"), 75), 1)
                .otherwise(0)).alias("late")))
    # per-order supplier/late counts as WINDOW aggregates over the
    # pair frame (r17): the former per_order groupBy + join-back read
    # `pair` from two subtrees whose column pruning diverges, so the
    # join+aggregate lineage planned twice; the window shares pair's
    # existing l_orderkey clustering (no new exchange — the window
    # partition is the bounded per-order supplier group, <= ~7 rows),
    # single pass, identical counts (measured 3.7 -> 3.1 s at sf0.1
    # interleaved)
    w = Window.partitionBy("l_orderkey")
    waiting = (pair
               .withColumn("n_supp", F.count(F.lit(1)).over(w))
               .withColumn("n_late", F.sum("late").over(w))
               .filter((F.col("late") == 1) & (F.col("n_supp") > 1)
                       & (F.col("n_late") == 1)))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (waiting.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name")
            .limit(10))


Q21_SQL = """
WITH pair AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM pair GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM pair
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE pair.late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES: dict[str, QueryFn] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_nation_market_share": q8_nation_market_share,
    "q9_promo_profit": q9_promo_profit,
    "q11_top_balance_nations": q11_top_balance_nations,
    "q12_late_priority_counts": q12_late_priority_counts,
    "q16_part_supplier_variety": q16_part_supplier_variety,
    "q20_heavy_promo_suppliers": q20_heavy_promo_suppliers,
    "q21_sole_late_suppliers": q21_sole_late_suppliers,
}

ORACLES: dict[str, str] = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_nation_market_share": Q8_SQL,
    "q9_promo_profit": Q9_SQL,
    "q11_top_balance_nations": Q11_SQL,
    "q12_late_priority_counts": Q12_SQL,
    "q16_part_supplier_variety": Q16_SQL,
    "q20_heavy_promo_suppliers": Q20_SQL,
    "q21_sole_late_suppliers": Q21_SQL,
}
