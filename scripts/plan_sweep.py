#!/usr/bin/env python
"""Mechanized plan-anti-pattern sweep over EVERY queries() entry.

The r6 lesson (customer_rfm_segments): per-operator discipline misses
scale-killers; only a mechanical sweep of all plans catches the class.
This script applies the explain_plans lints — cartesian/nested-loop
joins, unpushed parquet filters, hard broadcast hints over SF-scaling
tables, un-partitioned windows over unbounded frames — to ALL queries
at the given SF (default sf0.01), and exits non-zero on any flag.

Planning-only where possible: the lints read the analyzed logical plan
and the formatted physical plan, neither of which executes the query —
so the sweep is minutes, not hours.  (A handful of queries execute work
at DataFrame-construction time — streaming micro-batches, collected
offset maps — which is the cost of sweeping them at all.)

Usage: python scripts/plan_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import io
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod
from explain_plans import (
    hard_broadcast_hints_on_scaling_tables,
    unpartitioned_windows,
)
from spark_kafka_airflow_pipeline_spark.session import get_spark

#: Queries exempt from specific lints, each with a written rationale.
#: Format: name -> (lint-substring, why it is safe at 100 TB).
WHITELIST: dict[str, tuple[str, str]] = {
    # pandas-on-Spark's describe() materializes tiny per-column stats
    # via an internal unpartitioned window over an 8-row summary frame
    # the lint cannot see through the InternalFrame boundary.
    "pandas_api_status_profile": (
        "un-partitioned window",
        "ps.describe internal frame is a bounded per-column summary"),
}


def flags_for(df, name: str) -> list[str]:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    flags = []
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        flags.append("!! nested-loop/cartesian join")
    if "PushedFilters: []" in plan and "Filter" in plan:
        flags.append("?? filter not pushed to scan")
    flags.extend(hard_broadcast_hints_on_scaling_tables(df))
    flags.extend(unpartitioned_windows(df))
    # the 1-row-scalar cross-join idiom: a nested-loop join whose only
    # broadcast sides are bounded aggregates / literal frames is fine
    if ("!! nested-loop/cartesian join" in flags
            and any("ok)" in f for f in flags)
            and not any(f.startswith("!! hard broadcast") for f in flags)):
        flags.remove("!! nested-loop/cartesian join")
    hard = []
    for f in flags:
        if not (f.startswith("!!") or f.startswith("??")):
            continue
        wl = WHITELIST.get(name)
        if wl and wl[0] in f:
            continue
        hard.append(f)
    return hard


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="plan-sweep")
    queries = entry_mod.queries()
    failed: dict[str, list[str]] = {}
    t0 = time.perf_counter()
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        start = time.perf_counter()
        try:
            hard = flags_for(fn(spark, sf_dir), name)
        except Exception as exc:  # noqa: BLE001
            hard = [f"!! exception during planning: "
                    f"{type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - start
        status = "FLAG" if hard else "ok"
        print(f"{status:5s} {name:38s} {dt:5.1f}s {'; '.join(hard)}",
              flush=True)
        if hard:
            failed[name] = hard
    total = time.perf_counter() - t0
    print(f"\nswept {len(queries) if not only else len(only)} queries "
          f"in {total:.0f}s; {len(failed)} flagged")
    for n, fs in failed.items():
        print(f"  {n}: {fs}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
