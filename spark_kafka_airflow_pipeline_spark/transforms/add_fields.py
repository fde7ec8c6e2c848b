"""add_fields: append computed columns from SQL expression strings.

Reference: ``addFields`` at ``PipelineProcessor.scala:89-103`` — a
sequential ``withColumn`` loop over the configured fields, each evaluated
with ``expr(field.function)`` (``:99``). The reference's own TODO
(``:97``) notes the loop should be a fold; worse, every ``withColumn``
adds a Projection node to the logical plan, which makes analysis cost
quadratic in field count. The engine applies all fields in ONE
``withColumns`` call (a single Projection), same semantics.

Because the field value is an arbitrary Spark SQL expression string, the
whole Spark SQL scalar-function surface is available from config — the
reference's de-facto "query language" (SURVEY.md §3, entry point 2).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.metadata import AddField


def add_fields(df: DataFrame, fields: Iterable[AddField]) -> DataFrame:
    """Append every configured field in a single projection.

    Later fields may reference earlier ones (the reference's sequential
    loop allows it), so fall back to chained application only when a
    field name is referenced by a later expression; the common case is
    one projection.
    """
    fields = list(fields)
    if not fields:
        return df
    names = [f.name for f in fields]
    # If any later expression mentions an earlier new column, preserve the
    # reference's sequential semantics; otherwise batch into one node.
    sequential = any(
        earlier in later.function
        for i, earlier in enumerate(names)
        for later in fields[i + 1:]
    )
    if sequential:
        for fld in fields:
            df = df.withColumn(fld.name, F.expr(fld.function))
        return df
    return df.withColumns({fld.name: F.expr(fld.function) for fld in fields})
