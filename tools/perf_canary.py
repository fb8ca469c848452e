"""Per-query timing canary over the ENTIRE registry — the wide-angle
complement to bench.py's fixed 29-query baseline suite.

bench.py answers "did the headline suite regress vs the r1 baseline";
this answers "did ANY of the ~200 registered queries silently go
quadratic" (the shape that found the HOF sibling-CSE re-evaluation:
a per-slot re-tokenize is invisible at sf0.001 test scale and absent
from the headline suite, but jumps out as a per-query outlier here).

Usage: python tools/perf_canary.py [sf_dir] [--top N]
Prints one line per query, slowest first, after a warmup pass that
absorbs JVM/codegen startup (without it, the first query is charged
~3-5 s of Janino compile and reads as a false outlier).

Reading the output: composite persistence queries (index build +
save + load + probe in one call) and fixed-iteration algorithms
legitimately take multiple seconds of scheduling latency at tiny SF —
compare a query against ITS OWN prior runs, not against single-scan
queries.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY


def main() -> int:
    argv = sys.argv[1:]
    top = None
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]  # drop the flag AND its value
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("perf-canary")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float | str:
        try:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 — canary must finish
            return f"ERR {type(e).__name__}"
        finally:
            spark.catalog.clearCache()
            gc.collect()

    # warmup: one cheap scan + one wide-codegen signature query
    run("q06_forecast_revenue")
    run("q_minhash_lsh_pairs")

    times = {name: run(name) for name in REGISTRY}
    rows = sorted(
        times.items(),
        key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9),
    )
    if top:
        rows = rows[:top]
    for name, v in rows:
        print(f"{v}\t{name}")
    errs = [n for n, v in times.items() if isinstance(v, str)]
    print(f"# {len(times)} queries, {len(errs)} errors: {errs}")
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
