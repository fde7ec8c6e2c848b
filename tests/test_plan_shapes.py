"""Physical-plan regression pins for the dedup family: the properties
that make these operators scale are asserted on the executed plan, so a
refactor that silently re-introduces a corpus re-scan, an aggregate
demotion, or a cartesian product fails loudly."""

from __future__ import annotations

import pytest

from spark_kafka_airflow_pipeline_spark.functions import text as T
from spark_kafka_airflow_pipeline_spark.operators import dedup
from spark_kafka_airflow_pipeline_spark.operators.base import table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_signature_agg_stays_codegen_hashagg(spark, sf_dir):
    """The MinHash signature aggregation must remain a pure codegen
    HashAggregate — adding any collection aggregate (the r2 design)
    demotes it to ObjectHashAggregate and ships corpus-sized state."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(dedup.minhash_signature_agg(d))
    assert "ObjectHashAggregate" not in plan
    assert "SortAggregate" not in plan
    assert plan.count("Scan parquet") == 1


@pytest.mark.parametrize("fn,max_scans", [
    (dedup.minhash_lsh_pairs, 2),   # signature pass + verify join scan
    (dedup.ngram_jaccard_dups, 2),
    (dedup.simhash_near_dups, 1),   # carried signature: no join-back
])
def test_dedup_operators_scan_budget(spark, sf_dir, fn, max_scans):
    """Each near-dup operator reads the corpus a bounded number of
    times; the pre-r3 simhash verify joined back to the signature
    table and cost 3 full corpus passes."""
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("Scan parquet") <= max_scans, plan.count("Scan parquet")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_minhash_single_signature_pass(spark, sf_dir):
    """Batch + corpus share ONE signature pipeline (the is_new flag
    rides the groupBy); cross-side screening must not add a second
    tokenize pass beyond the verify join's scan."""
    plan = _plan(dedup.incremental_dedup_minhash(spark, sf_dir))
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan


def test_char_blocking_verify_featurizes_per_doc(spark, sf_dir):
    """ngram_jaccard_dups must tokenize the verify side as a corpus
    projection (one array_distinct per DOC row), not per pair-slot:
    the projection must sit below the pair join, which shows up as the
    join's build/stream side carrying the tokenize expression over the
    documents scan, not over the join output. Cheap proxy: the verify
    join exists and the plan still has <= 2 scans (asserted above);
    here we pin that the estimate pre-filter survived optimization."""
    plan = _plan(dedup.ngram_jaccard_dups(spark, sf_dir))
    # the 32-term agreement sum compiles to chained IFs over carried
    # signature slots; spot-check one term reached the physical plan
    assert "carry_a" in plan and "carry_b" in plan


def test_dpp_join_prunes_partitions(spark, sf_dir):
    """The date-partitioned fact scan must carry a dynamicpruning
    PartitionFilter (injected from the day-dim join), so only the
    dim-surviving days are read."""
    from spark_kafka_airflow_pipeline_spark.operators import scaleops

    plan = _plan(scaleops.dpp_partitioned_join(spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan[:2000]
