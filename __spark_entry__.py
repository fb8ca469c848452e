"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``sample_dms_s3_kinesis_spark.plans.registry`` —
one (DataFrame fn, oracle SQL) pair per operator claimed in SURVEY §2
plus the north-star training-data ops (dedup / similarity / text /
multimodal).  Approximate or Spark-hash-specific operators carry no
oracle (rows-only check); their exactness is covered by pytest against
Python reference implementations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY


def _tune(spark: SparkSession) -> SparkSession:
    """Session-level settings safe to apply at runtime: UTC keeps
    timestamp renderings oracle-stable; AQE enables runtime re-planning
    (coalesced shuffle partitions, skew splitting)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the end-to-end curation pipeline (quality filter → exact
    dedup on normalized text → deterministic train/val/test split →
    per-(split, lang) counts): one declarative plan composing the
    engine's text, dedup, and sampling operators — the north-star
    training-data path.  Schema: (split string, lang string,
    n_docs bigint)."""
    _tune(spark)
    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    return REGISTRY["q_curation_pipeline"].fn(spark, f"{root}/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star
    ops.  Each callable takes (spark, sf_dir) and returns a DataFrame
    with every computed column aliased to match ``oracle_sql``."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return spec.fn(_tune(spark), sf_dir)

        run.__name__ = spec.name
        run.__doc__ = f"{spec.description} [{spec.survey_ref}]"
        return run

    return {name: wrap(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for approximate /
    hash-family-specific operators → driver records rows-only checks)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
