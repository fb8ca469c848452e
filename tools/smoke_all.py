"""Smoke-run EVERY registry query at a given scale (default sf0.001,
the driver's t1 smoke scale): each must plan, execute, and return a
well-formed result — catches empty-input/edge-case crashes that the
sf0.01 oracle gate never reaches (e.g. zero near-dup pairs at tiny
scale).

Usage: python tools/smoke_all.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"

    from pyspark.sql import SparkSession

    from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-all")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            rows = spec.fn(spark, sf_dir).count()
            print(f"ok    {name}: {rows} rows ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL  {name}: {type(exc).__name__}: {str(exc)[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
