"""Declarative expectations: one-pass rule evaluation with explicit
NULL-as-violation semantics."""

import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import quality


def _df(spark):
    rows = [
        (1, 10, "O", 5.0),
        (2, 11, "F", -1.0),     # violates positivity
        (3, None, "O", 2.0),    # violates not-null
        (4, 12, "X", 3.0),      # violates domain
        (4, 13, "O", 4.0),      # duplicate key
        (5, 14, None, None),    # NULL status+price -> both violations
    ]
    return spark.createDataFrame(
        rows, "k long, cust long, status string, price double"
    )


def test_check_expectations_report(spark):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in quality.check_expectations(
            _df(spark),
            [
                quality.UniqueRule("k_unique", ("k",)),
                quality.not_null("cust_not_null", "cust"),
                quality.RowRule("price_positive", F.col("price") > 0),
                quality.in_set("status_domain", "status", ["O", "F"]),
            ],
        ).collect()
    }
    assert got == {
        "k_unique": (6, 1, False),
        "cust_not_null": (6, 1, False),
        "price_positive": (6, 2, False),   # -1 and NULL both violate
        "status_domain": (6, 2, False),    # 'X' and NULL both violate
    }


def test_check_expectations_all_pass_and_order(spark):
    out = quality.check_expectations(
        _df(spark).filter("k = 1"),
        [
            quality.not_null("a", "cust"),
            quality.RowRule("b", F.col("price") > 0),
        ],
    ).collect()
    assert [r["rule"] for r in out] == ["a", "b"]  # declaration order
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_check_expectations_rejects_duplicate_names(spark):
    with pytest.raises(ValueError, match="unique"):
        quality.check_expectations(
            _df(spark), [quality.not_null("x", "k"), quality.not_null("x", "cust")]
        )


def test_check_expectations_single_scan(spark):
    """k rules must cost one aggregate pass: exactly one scan of the
    input in the physical plan."""
    plan = (
        quality.check_expectations(
            _df(spark),
            [
                quality.UniqueRule("u", ("k",)),
                quality.not_null("n", "cust"),
                quality.RowRule("p", F.col("price") > 0),
            ],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 2


def test_quarantine_first_failing_rule_wins(spark):
    rules = [
        quality.not_null("cust_not_null", "cust"),
        quality.RowRule("price_positive", F.col("price") > 0),
        quality.in_set("status_domain", "status", ["O", "F"]),
    ]
    valid, invalid = quality.quarantine(_df(spark), rules)
    good = {r["k"] for r in valid.collect()}
    bad = {r["k"]: r["failed_rule"] for r in invalid.collect()}
    assert good == {1, 4}  # k=4 rows: ('X' row fails domain... see below)
    # row (4, 12, 'X') fails domain; (4, 13, 'O') is fine
    assert bad[3] == "cust_not_null"
    assert bad[2] == "price_positive"
    # k=5 has NULL price AND NULL status: first declared failure wins
    assert bad[5] == "price_positive"
    # duplicate keys are row-valid (uniqueness is a table-level rule)
    assert valid.count() + invalid.count() == 6


def test_quarantine_labels_domain_violation(spark):
    rules = [quality.in_set("status_domain", "status", ["O", "F"])]
    _, invalid = quality.quarantine(_df(spark), rules)
    got = {r["k"]: r["failed_rule"] for r in invalid.collect()}
    assert got == {4: "status_domain", 5: "status_domain"}


def test_thresholded_expectations(spark):
    out = {
        r["rule"]: (r["violation_rate"], r["passed"])
        for r in quality.check_expectations_with_thresholds(
            _df(spark),
            [
                (quality.not_null("cust_not_null", "cust"), 0.2),   # 1/6 ok
                (quality.RowRule("price_positive", F.col("price") > 0), 0.1),
            ],
        ).collect()
    }
    assert out["cust_not_null"] == (round(1 / 6, 6), True)
    assert out["price_positive"] == (round(2 / 6, 6), False)


def test_empty_rule_lists_raise(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="at least one rule"):
        quality.check_expectations(df, [])
    with pytest.raises(ValueError, match="at least one rule"):
        quality.quarantine(df, [])


def test_k_anonymity_report_flags_small_and_uniform_groups(spark):
    from sample_dms_s3_kinesis_spark.operators.quality import (
        k_anonymity_report,
    )

    rows = (
        [("a", "x", float(i)) for i in range(5)]       # k ok, l ok
        + [("b", "x", 1.0)] * 4                         # k viol, l viol
        + [("c", "x", 7.0)] * 6                         # k ok, l viol
        + [(None, "y", float(i)) for i in range(5)]     # NULL quasi ok
    )
    df = spark.createDataFrame(rows, "qa string, qb string, s double")
    out = {
        (r["qa"], r["qb"]): (r["n_rows"], r["n_sensitive"], r["violations"])
        for r in k_anonymity_report(
            df, ["qa", "qb"], k=5, sensitive_col="s", l=3
        ).collect()
    }
    assert out == {
        ("b", "x"): (4, 1, "k_anonymity,l_diversity"),
        ("c", "x"): (6, 1, "l_diversity"),
    }
    # k-only form
    only_k = {
        (r["qa"], r["qb"])
        for r in k_anonymity_report(df, ["qa", "qb"], k=5).collect()
    }
    assert only_k == {("b", "x")}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [], k=5)
    with _pytest.raises(ValueError, match="together"):
        k_anonymity_report(df, ["qa"], k=5, sensitive_col="s")
