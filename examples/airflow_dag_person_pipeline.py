"""Airflow DAG example for the person pipeline.

The reference keeps Airflow entirely external — shell scripts start the
stack and an Airflow task invokes spark-submit
(``/root/reference/src/main/resources/start-env.sh:8-11``); no DAG code
exists in the reference repo. This example is the idiomatic equivalent
for the new engine: one task per dataflow submitting the CLI module.

Import-guarded: Airflow is not installed in the test container; the
file documents the integration without creating a dependency.
"""

from __future__ import annotations

try:
    from datetime import datetime

    from airflow import DAG
    from airflow.operators.bash import BashOperator

    with DAG(
        dag_id="person_pipeline",
        start_date=datetime(2026, 1, 1),
        schedule="@hourly",
        catchup=False,
        tags=["spark", "etl"],
    ) as dag:
        run_pipeline = BashOperator(
            task_id="run_person_pipeline",
            bash_command=(
                "spark-submit --master ${SPARK_MASTER:-local[*]} "
                "-m spark_kafka_airflow_pipeline_spark "
                "{{ var.value.pipeline_metadata_path }} "
                "{{ var.value.kafka_bootstrap_servers }}"
            ),
        )
except ImportError:  # pragma: no cover - airflow absent in test env
    dag = None
