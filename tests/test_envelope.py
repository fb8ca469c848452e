"""Envelope transform goldens (SURVEY §2.3, O12-O16; FIXTURES.md §3)."""

import json

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark import envelope

FIXED_TS = "2026-01-01T00:00:00.000Z"


def _employee_df(spark, catalog):
    emp = catalog.get("hr", "employee")
    return spark.createDataFrame(
        [(101, "Smith", "Bob", None, None), (102, "", "Bob", None, "LA")],
        emp.schema,
    ), emp


def test_data_event_envelope(spark, catalog):
    df, emp = _employee_df(spark, catalog)
    events = envelope.data_events(
        df, emp, "load", event_time=FIXED_TS, order_by=[F.col("Id")]
    )
    rows = {r["seq"]: r for r in events.collect()}
    assert set(rows) == {1, 2}
    first = rows[1]
    assert first["partition_key"] == "hr.employee"
    assert first["record_type"] == "data"
    assert first["operation"] == "load"

    payload = json.loads(first["event_json"])
    assert set(payload) == {"data", "metadata"}
    # include_null_and_empty=True (stack.py:122): nulls serialized.
    assert payload["data"] == {
        "Id": 101,
        "LastName": "Smith",
        "FirstName": "Bob",
        "HireDate": None,
        "OfficeLocation": None,
    }
    assert payload["metadata"] == {
        "timestamp": FIXED_TS,
        "record-type": "data",
        "operation": "load",
        "partition-key-type": "schema-table",
        "partition-value": "hr.employee",
        "schema-name": "hr",
        "table-name": "employee",
        "transaction-id": None,
    }
    # empty string retained too
    second = json.loads(rows[2]["event_json"])
    assert second["data"]["LastName"] == ""
    assert second["data"]["OfficeLocation"] == "LA"


def test_control_events(spark, catalog):
    events = envelope.control_events(
        spark, list(catalog), ["drop-table", "create-table"], event_time=FIXED_TS
    )
    rows = events.orderBy("seq").collect()
    assert len(rows) == 6
    assert [r["operation"] for r in rows] == [
        "drop-table",
        "create-table",
    ] * 3
    assert rows[0]["partition_key"] == "hr.employee"
    payload = json.loads(rows[0]["event_json"])
    assert payload["data"] is None
    assert payload["metadata"]["record-type"] == "control"
    assert payload["metadata"]["operation"] == "drop-table"


def test_assign_global_seq_is_dense_total_order(spark, catalog):
    df, emp = _employee_df(spark, catalog)
    ev = envelope.data_events(df, emp, "load", event_time=FIXED_TS)
    ev = envelope.assign_global_seq(ev, F.col("seq"))
    seqs = [r["seq"] for r in ev.orderBy("seq").collect()]
    assert seqs == [1, 2]


def test_per_key_seq(spark, catalog):
    emp = catalog.get("hr", "employee")
    dep = catalog.get("hr", "department")
    e1 = envelope.data_events(
        spark.createDataFrame([(1, "a", "b", None, None)], emp.schema),
        emp,
        "insert",
        event_time=FIXED_TS,
    )
    e2 = envelope.data_events(
        spark.createDataFrame([(2, "x"), (3, "y")], dep.schema),
        dep,
        "insert",
        event_time=FIXED_TS,
    )
    both = envelope.assign_per_key_seq(e1.unionByName(e2), "seq")
    out = {
        (r["partition_key"], r["seq"]) for r in both.collect()
    }
    assert out == {("hr.employee", 1), ("hr.department", 1), ("hr.department", 2)}
