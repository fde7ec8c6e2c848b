"""Join-shape completion [EXT]: outer joins, multiset set ops, grouping
sets, unpivot, and the as-of join (SURVEY.md §2.2 'Joins' row:
hash/broadcast/semi/anti are in `relational.py`; this module covers the
rest of the taxonomy).

As-of join design note: the naive formulation is an inequality join
(`b.ts <= a.ts`, take latest) which explodes into a range scan per row.
The scale-correct pattern used here is **union + ordered window**: tag
both streams, sort within user partitions by time, and carry the last
seen right-side value forward with `last_value(ignorenulls)`. One
shuffle on the key, no inequality join, no row multiplication —
survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table
from spark_kafka_airflow_pipeline_spark.operators.relational import dsum, SQL_DSUM


def nations_supplier_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a genuinely unmatched side (only 10
    suppliers across 25 nations): per-nation supplier stats, nulls
    coalesced to zero."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    per_nation = (supplier.groupBy("s_nationkey")
                  .agg(F.count(F.lit(1)).alias("n_suppliers_raw"),
                       dsum(F.col("s_acctbal"), "supplier_balance_raw")))
    return (
        nation.join(per_nation, nation.n_nationkey == per_nation.s_nationkey,
                    "left_outer")
        .select("n_nationkey", "n_name",
                F.coalesce("n_suppliers_raw", F.lit(0)).alias("n_suppliers"),
                F.coalesce("supplier_balance_raw", F.lit(0.0))
                .alias("supplier_balance"))
    )


NATIONS_SUPPLIER_OUTER_SQL = f"""
SELECT n_nationkey, n_name,
       COALESCE(s.n_suppliers_raw, 0) AS n_suppliers,
       COALESCE(s.supplier_balance_raw, 0.0) AS supplier_balance
FROM nation LEFT OUTER JOIN (
  SELECT s_nationkey, COUNT(*) AS n_suppliers_raw,
         {SQL_DSUM.format(expr='s_acctbal')} AS supplier_balance_raw
  FROM supplier GROUP BY s_nationkey
) s ON n_nationkey = s.s_nationkey
"""


def full_outer_nation_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations by customer-count vs supplier-count —
    either side may be absent."""
    c = (table(spark, sf_dir, "customer").groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_customers")))
    s = (table(spark, sf_dir, "supplier").groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_suppliers")))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"))
    )


FULL_OUTER_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
ON c.c_nationkey = s.s_nationkey
"""


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every purchase event, the value of the same
    user's most recent prior click (NULL if none). Union + ordered
    window, not an inequality join (see module docstring)."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts",
                                              "event_type", "value")
    tagged = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    carried = tagged.withColumn(
        "last_click_value",
        F.last(F.when(F.col("event_type") == "click", F.col("value")),
               ignorenulls=True).over(w))
    return (carried.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id", "last_click_value"))


ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type, value
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_value
  FROM tagged
)
SELECT user_id, event_id, last_click_value
FROM carried WHERE event_type = 'purchase'
"""


def intersect_all_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: (nationkey) bags from customers and from
    orders-per-customer... demonstrated on mktsegment x priority bags."""
    a = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"))
    b = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k"))
    return a.intersectAll(b)


INTERSECT_ALL_SQL = """
SELECT c_nationkey AS k FROM customer
INTERSECT ALL
SELECT s_nationkey AS k FROM supplier
"""


def except_all_nation_bags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: supplier nation bag minus customer nation
    bag (keeps surplus multiplicity)."""
    a = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k"))
    b = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"))
    return a.exceptAll(b)


EXCEPT_ALL_SQL = """
SELECT s_nationkey AS k FROM supplier
EXCEPT ALL
SELECT c_nationkey AS k FROM customer
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS beyond rollup/cube: totals by (flag),
    (status), and grand total — via SQL on a temp view (the DataFrame
    API expresses this through cube/rollup only)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
               COUNT(*) AS n_rows
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DSUM.format(expr='l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): part numeric measures to long format."""
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey",
                    F.col("p_size").cast("double").alias("size"),
                    F.col("p_retailprice").alias("retailprice")).unpivot(
        ids=["p_partkey"], values=["size", "retailprice"],
        variableColumnName="measure", valueColumnName="val")


UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
"""


QUERIES: dict[str, QueryFn] = {
    "nations_supplier_outer": nations_supplier_outer,
    "full_outer_nation_roles": full_outer_nation_roles,
    "asof_last_click_before_purchase": asof_last_click_before_purchase,
    "intersect_all_order_counts": intersect_all_order_counts,
    "except_all_nation_bags": except_all_nation_bags,
    "grouping_sets_revenue": grouping_sets_revenue,
    "unpivot_part_measures": unpivot_part_measures,
}

ORACLES: dict[str, str] = {
    "nations_supplier_outer": NATIONS_SUPPLIER_OUTER_SQL,
    "full_outer_nation_roles": FULL_OUTER_SQL,
    "asof_last_click_before_purchase": ASOF_SQL,
    "intersect_all_order_counts": INTERSECT_ALL_SQL,
    "except_all_nation_bags": EXCEPT_ALL_SQL,
    "grouping_sets_revenue": GROUPING_SETS_SQL,
    "unpivot_part_measures": UNPIVOT_SQL,
}
