"""Full-load task E2E — the 16-event golden (run.py:170, README.md:77)."""

import json

from sample_dms_s3_kinesis_spark.sinks import MemorySink
from sample_dms_s3_kinesis_spark.tasks import FullLoadTask

FIXED_TS = "2026-01-01T00:00:00.000Z"


def _run(spark, catalog, source_root):
    sink = MemorySink()
    task = FullLoadTask(
        spark, catalog, source_root, sink, event_time=FIXED_TS
    )
    assert task.status == "ready"
    task.start()
    return task, sink


def test_full_load_golden_16_events(spark, catalog, source_root):
    task, sink = _run(spark, catalog, source_root)
    # Task lifecycle: full load auto-transitions to stopped (run.py:169).
    assert task.status == "stopped"

    events = sink.events
    assert len(events) == 16  # run.py:170

    ops = [e["metadata"]["operation"] for e in events]
    # README.md:77 composition: 3 drop-table + 3 create-table + 10 loads.
    assert ops.count("drop-table") == 3
    assert ops.count("create-table") == 3
    assert ops.count("load") == 10

    # Per-table order: drop, create, then rows — employee first.
    assert ops[:3] == ["drop-table", "create-table", "load"]

    # Partition keys follow "{schema}.{table}" (run.py:135).
    keys = {r["partition_key"] for r in sink.records}
    assert keys == {"hr.employee", "hr.department", "hr.project"}


def test_full_load_data_fidelity(spark, catalog, source_root):
    _, sink = _run(spark, catalog, source_root)
    employee_loads = [
        e["data"]
        for e in sink.events
        if e["metadata"]["table-name"] == "employee"
        and e["metadata"]["operation"] == "load"
    ]
    assert len(employee_loads) == 4
    assert employee_loads[0] == {
        "Id": 101,
        "LastName": "Smith",
        "FirstName": "Bob",
        "HireDate": "2014-06-04T00:00:00.000Z",
        "OfficeLocation": "New York",
    }
    dep_loads = [
        e["data"]
        for e in sink.events
        if e["metadata"]["table-name"] == "department"
        and e["metadata"]["operation"] == "load"
    ]
    assert [d["DepartmentName"] for d in dep_loads] == ["HR", "IT", "Finance"]


def test_full_load_seq_is_total_order(spark, catalog, source_root):
    _, sink = _run(spark, catalog, source_root)
    seqs = [r["seq"] for r in sink.records]
    assert seqs == list(range(1, 17))


def test_full_load_statistics(spark, catalog, source_root):
    task, _ = _run(spark, catalog, source_root)
    stats = task.table_statistics(spark).collect()
    # Sorted by (SchemaName, TableName) (run.py:145-147).
    assert [(r["SchemaName"], r["TableName"]) for r in stats] == [
        ("hr", "department"),
        ("hr", "employee"),
        ("hr", "project"),
    ]
    by_table = {r["TableName"]: r for r in stats}
    assert by_table["employee"]["FullLoadRows"] == 4
    assert by_table["department"]["FullLoadRows"] == 3
    assert by_table["project"]["FullLoadRows"] == 3
    assert all(r["Ddls"] == 2 for r in stats)


def test_full_load_selection_rules(spark, catalog, source_root):
    sink = MemorySink()
    mappings = {
        "rules": [
            {
                "rule-type": "selection",
                "rule-id": "1",
                "rule-name": "emp-only",
                "object-locator": {"schema-name": "hr", "table-name": "employee"},
                "rule-action": "include",
            }
        ]
    }
    task = FullLoadTask(
        spark,
        catalog,
        source_root,
        sink,
        table_mappings=mappings,
        event_time=FIXED_TS,
    )
    task.start()
    # employee only: drop + create + 4 loads.
    assert len(sink.events) == 6
    assert {r["partition_key"] for r in sink.records} == {"hr.employee"}


def test_full_load_multisplit_file_preserves_line_order(spark, catalog, tmp_path):
    """r6 review: a LOAD file larger than one input split used to
    order lines by monotonic id alone, which is not comparable across
    splits — the (_src_file, _blk, _line_id) order is stable at any
    maxPartitionBytes."""
    import os

    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.sources.csv_source import read_table

    root = str(tmp_path / "src")
    os.makedirs(f"{root}/hr/department")
    n = 5000
    with open(f"{root}/hr/department/LOAD001.csv", "w") as f:
        for i in range(n):
            f.write(f"{i},name-{i:05d}\n")
    dept = next(t for t in catalog if t.name == "department")
    # force many tiny splits so the file genuinely spans several
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        df = read_table(spark, dept, root, with_order_columns=True)
        assert df.rdd.getNumPartitions() > 1   # multi-split achieved
        ordered = [
            r["Id"]
            for r in df.orderBy("_src_file", "_blk", "_line_id")
            .select("Id")
            .collect()
        ]
        assert ordered == list(range(n))
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
