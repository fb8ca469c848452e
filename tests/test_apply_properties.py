"""Property-based tests (hypothesis): the CDC apply fold against a
Python reference model, and envelope null/empty retention, over
randomized inputs — the edge cases the reference fixtures only sample
(duplicate inserts, update-after-delete, long op chains per PK)."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark import envelope
from sample_dms_s3_kinesis_spark.apply import apply_changes
from sample_dms_s3_kinesis_spark.catalog import (
    Catalog,
    REFERENCE_TABLE_DEFINITION,
)

_CATALOG = Catalog.from_external_table_definition(REFERENCE_TABLE_DEFINITION)
DEPT = _CATALOG.get("hr", "department")  # Id BIGINT pk, DepartmentName STRING


def _python_apply(initial: dict, ops: list) -> tuple[dict, dict]:
    """Reference model of apply_changes semantics (O24):
    - INSERT: sets the row; on existing key also counts an exception
      (duplicate key) but still overwrites (latest-wins).
    - UPDATE: sets the row only if the key exists; else exception.
    - DELETE: removes the row; on missing key counts an exception.
    Counts tally every op of each kind regardless of exceptions."""
    state = dict(initial)
    counts = {"inserts": 0, "updates": 0, "deletes": 0, "exceptions": 0}
    for _seq, op, pk, val in ops:
        if op == "INSERT":
            counts["inserts"] += 1
            if pk in state:
                counts["exceptions"] += 1
            state[pk] = val
        elif op == "UPDATE":
            counts["updates"] += 1
            if pk in state:
                state[pk] = val
            else:
                counts["exceptions"] += 1
        else:  # DELETE
            counts["deletes"] += 1
            if pk in state:
                del state[pk]
            else:
                counts["exceptions"] += 1
    return state, counts


op_strategy = st.tuples(
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(min_value=0, max_value=4),
    st.text(alphabet="abcXYZ ", min_size=0, max_size=8),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    initial=st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.text(alphabet="abc", min_size=1, max_size=5),
        max_size=3,
    ),
    raw_ops=st.lists(op_strategy, min_size=0, max_size=25),
)
def test_apply_changes_matches_python_model(spark, initial, raw_ops):
    ops = [(i + 1, op, pk, val) for i, (op, pk, val) in enumerate(raw_ops)]

    current = spark.createDataFrame(
        [(pk, val) for pk, val in initial.items()], DEPT.schema
    )
    changes = spark.createDataFrame(
        [(seq, op, pk, val) for seq, op, pk, val in ops],
        "seq long, op string, Id long, DepartmentName string",
    )
    result = apply_changes(spark, DEPT, current, changes)

    got_state = {r["Id"]: r["DepartmentName"] for r in result.new_state.collect()}
    c = result.counts.collect()[0]
    got_counts = {
        "inserts": c["inserts"],
        "updates": c["updates"],
        "deletes": c["deletes"],
        "exceptions": c["exceptions"],
    }
    exp_state, exp_counts = _python_apply(initial, ops)
    assert got_state == exp_state
    assert got_counts == exp_counts
    assert result.exceptions.count() == exp_counts["exceptions"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    name=st.one_of(
        st.none(), st.text(alphabet="ab \"\\é", min_size=0, max_size=10)
    )
)
def test_envelope_preserves_nulls_and_empties(spark, name):
    """include_null_and_empty=True (stack.py:122): the data object must
    carry nulls and empty strings explicitly, byte-faithfully."""
    df = spark.createDataFrame([(1, name)], DEPT.schema)
    ev = envelope.data_events(df, DEPT, "insert", event_time="2020-01-01T00:00:00Z")
    payload = json.loads(ev.select("event_json").collect()[0][0])
    assert "DepartmentName" in payload["data"]
    assert payload["data"]["DepartmentName"] == name
    assert payload["metadata"]["operation"] == "insert"
    assert payload["metadata"]["partition-value"] == "hr.department"


def test_scd2_history_versions_and_delete_closure(spark):
    from sample_dms_s3_kinesis_spark.apply import scd2_history

    rows = [
        # key 1: insert, update, delete (no current row afterward), re-insert
        (1, 1, "insert", "a"),
        (1, 3, "update", "b"),
        (1, 5, "delete", None),
        (1, 9, "insert", "c"),
        # key 2: single insert stays current
        (2, 2, "insert", "x"),
        # key 3: ends deleted
        (3, 4, "insert", "y"),
        (3, 6, "delete", None),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, op string, v string")
    out = scd2_history(
        df, key_cols=["k"], order_cols=["seq"], op_col="op"
    ).collect()
    got = {
        (r["k"], r["seq"]): (r["v"], r["valid_to_seq"], r["is_current"])
        for r in out
    }
    assert got == {
        (1, 1): ("a", 3, False),
        (1, 3): ("b", 5, False),   # closed by the delete
        (1, 9): ("c", None, True),  # re-insert after delete is current
        (2, 2): ("x", None, True),
        (3, 4): ("y", 6, False),   # ends deleted: no current row for key 3
    }
    # exactly one current row per live key, none for deleted keys
    current = [r for r in out if r["is_current"]]
    assert {r["k"] for r in current} == {1, 2}


def test_applied_counts_exclude_excepted_ops(spark):
    """DMS TableStatistics semantics: an op that excepts (e.g. DELETE of
    a never-inserted key) counts in ApplyExceptions, NOT in Applied*."""
    from sample_dms_s3_kinesis_spark.apply import apply_changes
    from sample_dms_s3_kinesis_spark.stats import StatsAccumulator
    from tests.conftest import REFERENCE_TABLE_DEFINITION
    from sample_dms_s3_kinesis_spark.catalog import Catalog

    catalog = Catalog.from_external_table_definition(REFERENCE_TABLE_DEFINITION)
    table = catalog.get("hr", "department")
    current = spark.createDataFrame([], table.schema)
    changes = spark.createDataFrame(
        [
            (1, "INSERT", 204, "Software"),
            (2, "DELETE", 301, "Ghost"),   # never inserted -> exception
            (3, "UPDATE", 999, "Ghost2"),  # never inserted -> exception
        ],
        "seq long, op string, Id int, DepartmentName string",
    )
    result = apply_changes(spark, table, current, changes)
    row = result.counts.collect()[0]
    assert row["inserts"] == 1 and row["applied_inserts"] == 1
    assert row["deletes"] == 1 and row["applied_deletes"] == 0
    assert row["updates"] == 1 and row["applied_updates"] == 0
    assert row["exceptions"] == 2
    result.unpersist()

    acc = StatsAccumulator()
    acc.add_apply_counts("hr", "department", row)
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in acc.to_dataframe(spark).collect()
    }
    s = stats[("hr", "department")]
    assert s["AppliedInserts"] == 1
    assert s["AppliedDeletes"] == 0
    assert s["AppliedUpdates"] == 0
    assert s["ApplyExceptions"] == 2


def test_time_travel_reads_superseded_versions(spark, tmp_path):
    """Every write keeps its v-dir; read_version serves any historical
    state and table_history lists them ascending."""
    import pytest

    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.catalog import (
        REFERENCE_TABLE_DEFINITION,
        Catalog,
    )

    catalog = Catalog.from_external_table_definition(
        REFERENCE_TABLE_DEFINITION
    )
    dept = next(t for t in catalog if t.name == "department")
    store = ParquetTargetStore(str(tmp_path / "t"))

    states = [
        [(1, "Eng")],
        [(1, "Eng"), (2, "Sales")],
        [(2, "Sales")],
    ]
    for rows in states:
        df = spark.createDataFrame(rows, dept.schema)
        store.write(dept.qualified_name, df)

    assert store.table_history(dept.qualified_name) == [1, 2, 3]
    for v, rows in zip((1, 2, 3), states):
        got = sorted(
            tuple(r) for r in store.read_version(spark, dept, v).collect()
        )
        assert got == sorted(rows), v
    # current read == latest version
    assert sorted(
        tuple(r) for r in store.read(spark, dept).collect()
    ) == sorted(states[-1])
    with pytest.raises(ValueError, match="does not exist"):
        store.read_version(spark, dept, 9)
    assert store.table_history("hr.never_written") == []
