"""Physical-plan audit across the whole query registry: per query,
count shuffle exchanges and broadcast joins and report whether parquet
scans carry pushed filters / pruned schemas.  Run after adding or
changing operators — a scan reading every column for a two-column
projection, or a dimension join that stopped broadcasting, shows up
here before it shows up in the benchmark.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'query':38s} {'exch':>4s} {'bcast':>5s} {'smj':>3s} {'pushed':>6s}")
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:38s} ERROR {type(e).__name__}: {str(e)[:80]}")
            continue
        exch = len(re.findall(r"Exchange (hash|range)partitioning", plan))
        bcast = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        smj = plan.count("SortMergeJoin")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        print(f"{name:38s} {exch:4d} {bcast:5d} {smj:3d} {pushed:6d}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
