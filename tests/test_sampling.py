"""Stratified sampling semantics (rows-only op): per-stratum rates and
seed determinism."""

from __future__ import annotations

from spark_kafka_airflow_pipeline_spark.operators.base import table
from spark_kafka_airflow_pipeline_spark.operators.textops import (
    SAMPLE_FRACTIONS,
    stratified_sample,
)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    totals = {r["lang"]: r["n"] for r in
              table(spark, sf_dir, "documents")
              .groupBy("lang").count().withColumnRenamed("count", "n")
              .collect()}
    run1 = {r["lang"]: (r["n_sampled"], r["min_doc_id"])
            for r in stratified_sample(spark, sf_dir).collect()}
    run2 = {r["lang"]: (r["n_sampled"], r["min_doc_id"])
            for r in stratified_sample(spark, sf_dir).collect()}
    assert run1 == run2, "same seed must give identical samples"
    for lang, frac in SAMPLE_FRACTIONS.items():
        if lang not in totals:
            continue
        n, total = run1.get(lang, (0, None))[0], totals[lang]
        # Bernoulli sampling: allow a generous tolerance on small strata
        assert abs(n / total - frac) < 0.35, (lang, n, total, frac)
    # the dominant language is actually downsampled below the tail rate
    if "en" in run1 and "de" in totals and "de" in run1:
        assert run1["en"][0] / totals["en"] < run1["de"][0] / totals["de"]
