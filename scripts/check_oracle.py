#!/usr/bin/env python
"""Run the driver-style oracle comparison for every queries() entry at a
given SF dir (default sf0.01 — the driver's correctness gate scale).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod
from spark_kafka_airflow_pipeline_spark.session import get_spark
from tests.oracle_harness import compare, duckdb_connection


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(app_name="check-oracle")
    con = duckdb_connection(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        start = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                problems = compare(df, con, oracles[name])
                status = "OK " if not problems else "FAIL"
                if problems:
                    failed.append(name)
            else:
                n = df.count()
                problems = []
                status = f"ROWS({n})"
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {type(exc).__name__}: {exc}"]
            status = "ERR "
            failed.append(name)
        dt = time.perf_counter() - start
        print(f"{status:9s} {name:35s} {dt:6.2f}s")
        for p in problems[:4]:
            print(f"          {p}")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall green")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
