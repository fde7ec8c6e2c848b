"""The reference pipeline's own operator surface (validate split,
add_fields) exercised as oracle-able queries over the star schema —
this is how the engine proves parity with
``PipelineProcessor.scala:44-103`` on real data, not just the 3-row
fixture.

Rules applied to customer: ``c_mktsegment notEmpty``, ``c_acctbal
positive`` (the sf data has ~8% negative balances, so both splits are
non-trivial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.metadata import AddField, Validation
from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table
from spark_kafka_airflow_pipeline_spark.transforms import (
    ERROR_COLUMN,
    add_fields,
    validate_fields,
)

RULES = [Validation("c_mktsegment", ["notEmpty"]),
         Validation("c_acctbal", ["positive"])]


def validate_split_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok, _ = validate_fields(table(spark, sf_dir, "customer"), RULES, cache=False)
    return ok.select("c_custkey", "c_name", "c_acctbal")


VALIDATE_OK_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE coalesce(c_mktsegment != '', false) AND coalesce(c_acctbal > 0, false)
"""


def validate_split_ko(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid rows with their error codes (error array rendered as a
    comma-joined string so the oracle hash is array-free)."""
    _, ko = validate_fields(table(spark, sf_dir, "customer"), RULES, cache=False)
    return ko.select("c_custkey", "c_acctbal",
                     F.array_join(ERROR_COLUMN, ",").alias("errors"))


VALIDATE_KO_SQL = """
SELECT c_custkey, c_acctbal,
       array_to_string(list_filter([
         CASE WHEN NOT coalesce(c_mktsegment != '', false)
              THEN 'c_mktsegment-notEmpty' END,
         CASE WHEN NOT coalesce(c_acctbal > 0, false)
              THEN 'c_acctbal-positive' END
       ], x -> x IS NOT NULL), ',') AS errors
FROM customer
WHERE NOT (coalesce(c_mktsegment != '', false) AND coalesce(c_acctbal > 0, false))
"""


def pipeline_add_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_fields through the real engine API: arbitrary SQL expression
    strings appended as columns (``expr(field.function)`` parity,
    ``PipelineProcessor.scala:99``)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    return add_fields(cust, [
        AddField("name_upper", "upper(c_name)"),
        AddField("balance_x2", "c_acctbal * 2"),
        AddField("tier", "CASE WHEN c_acctbal >= 5000 THEN 'gold' "
                         "WHEN c_acctbal >= 0 THEN 'silver' ELSE 'debt' END"),
    ])


ADD_FIELDS_SQL = """
SELECT c_custkey, c_name, c_acctbal,
       upper(c_name) AS name_upper,
       c_acctbal * 2 AS balance_x2,
       CASE WHEN c_acctbal >= 5000 THEN 'gold'
            WHEN c_acctbal >= 0 THEN 'silver' ELSE 'debt' END AS tier
FROM customer
"""


QUERIES: dict[str, QueryFn] = {
    "validate_split_ok": validate_split_ok,
    "validate_split_ko": validate_split_ko,
    "pipeline_add_fields": pipeline_add_fields,
}

ORACLES: dict[str, str] = {
    "validate_split_ok": VALIDATE_OK_SQL,
    "validate_split_ko": VALIDATE_KO_SQL,
    "pipeline_add_fields": ADD_FIELDS_SQL,
}
