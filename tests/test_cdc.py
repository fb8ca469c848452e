"""CDC task E2E — the 15-event golden (run.py:198, README.md:84), net
target state (lib/query.py:16-27), exceptions channel, lifecycle."""

import time

import pytest

from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
from sample_dms_s3_kinesis_spark.sinks import MemorySink
from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask
from tests.conftest import CDC_FILE_1, CDC_FILE_2, write_cdc_file

FIXED_TS = "2026-01-01T00:00:00.000Z"


def _task(spark, catalog, cdc_dir, tmp_path):
    sink = MemorySink()
    store = ParquetTargetStore(str(tmp_path / "target"))
    task = CdcTask(
        spark,
        catalog,
        cdc_dir,
        sink,
        store,
        event_time=FIXED_TS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    return task, sink, store


def test_cdc_golden_15_events_batch(spark, catalog, cdc_dir, tmp_path):
    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()
    assert task.status == "running"

    events = sink.events
    assert len(events) == 15  # run.py:198

    ops = [e["metadata"]["operation"] for e in events]
    # README.md:84: 4 create-table + 4 ins + 3 upd + 4 del.
    assert ops.count("create-table") == 4
    assert ops.count("insert") == 4
    assert ops.count("update") == 3
    assert ops.count("delete") == 4

    tables_with_create = {
        e["metadata"]["table-name"]
        for e in events
        if e["metadata"]["operation"] == "create-table"
    }
    assert tables_with_create == {
        "employee",
        "department",
        "project",
        "awsdms_apply_exceptions",
    }

    # Data events carry the row payload bound to declared columns.
    first_insert = next(
        e for e in events if e["metadata"]["operation"] == "insert"
    )
    assert first_insert["metadata"]["record-type"] == "data"
    assert first_insert["data"]["Id"] == 101

    task.stop()
    assert task.status == "stopped"


def test_cdc_net_target_state(spark, catalog, cdc_dir, tmp_path):
    """FIXTURES.md §2: employee empty, department={204,Software},
    project empty after both files."""
    task, _, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()

    emp = task.table_state(catalog.get("hr", "employee"))
    dep = task.table_state(catalog.get("hr", "department"))
    prj = task.table_state(catalog.get("hr", "project"))
    assert emp.count() == 0
    assert prj.count() == 0
    dep_rows = [(r["Id"], r["DepartmentName"]) for r in dep.collect()]
    assert dep_rows == [(204, "Software")]


def test_cdc_exceptions_channel(spark, catalog, cdc_dir, tmp_path):
    """DELETE of never-inserted department 301 (lib/query.py:25) must
    not fail and must land in awsdms_apply_exceptions (README.md:84)."""
    task, _, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()

    exc = task.exceptions_table().collect()
    assert len(exc) == 1
    assert exc[0]["TABLE_NAME"] == "department"
    assert exc[0]["OPERATION"] == "DELETE"


def test_cdc_sequential_batches_match_single_batch(
    spark, catalog, cdc_dir, tmp_path
):
    """File-at-a-time application (the streaming path's unit) must net
    the same state: apply file 1, then file 2 (O21 ordering)."""
    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    task.process_available()
    # After file 1: employee 101 was inserted, updated twice, deleted.
    assert task.table_state(catalog.get("hr", "employee")).count() == 0

    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    # Batch source re-reads everything; use a fresh task dir semantics:
    # process only the new file by filtering applied seqs is the stream
    # source's job — here we just re-apply file2 on a fresh task to
    # validate the per-file fold.
    task2, sink2, _ = _task(spark, catalog, str(cdc_dir), tmp_path / "t2")
    # remove file1 so only file2 applies on the fresh store
    import os

    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    task2.process_available()
    dep_rows = [
        (r["Id"], r["DepartmentName"])
        for r in task2.table_state(catalog.get("hr", "department")).collect()
    ]
    assert dep_rows == [(204, "Software")]
    # project: insert then delete within file 2 nets to empty, and is
    # NOT an exception (the insert existed when the delete applied).
    assert task2.table_state(catalog.get("hr", "project")).count() == 0
    exc_tables = {
        r["TABLE_NAME"] for r in task2.exceptions_table().collect()
    }
    assert exc_tables == {"department"}


@pytest.mark.slow
def test_cdc_streaming_mode(spark, catalog, cdc_dir, tmp_path):
    """True Structured Streaming path: task running before data exists
    (run.py:189-190), files discovered and applied in order."""
    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    task.start()
    assert task.status == "running"

    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)

    deadline = time.time() + 60
    while time.time() < deadline and len(sink.records) < 15:
        time.sleep(0.5)
    task.stop()
    assert task.status == "stopped"
    assert len(sink.records) == 15

    emp = task.table_state(catalog.get("hr", "employee"))
    dep = task.table_state(catalog.get("hr", "department"))
    assert emp.count() == 0
    assert [(r["Id"], r["DepartmentName"]) for r in dep.collect()] == [
        (204, "Software")
    ]


def test_cdc_cross_table_event_order_is_file_line_order(
    spark, catalog, cdc_dir, tmp_path
):
    """The reference's 1-shard stream preserves EXACT file line order
    across tables (CDC_FILE_2 interleaves department/employee/project);
    the emitted data events must reproduce that interleaving, not a
    per-table renumbering."""
    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()

    data = [
        e for e in sink.events if e["metadata"]["record-type"] == "data"
    ]
    got = [
        (e["metadata"]["table-name"], e["metadata"]["operation"])
        for e in data
    ]
    want = [
        # file 1, lines in order
        ("employee", "insert"),
        ("employee", "update"),
        ("employee", "update"),
        ("employee", "delete"),
        # file 2, lines in order (tables interleaved)
        ("department", "insert"),
        ("employee", "insert"),
        ("project", "insert"),
        ("project", "delete"),
        ("department", "delete"),
        ("employee", "update"),
        ("employee", "delete"),
    ]
    assert got == want

    # seq is unique and strictly increasing in emission order.
    seqs = [r["seq"] for r in sink.records]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_cdc_seq_resumes_after_restart(spark, catalog, cdc_dir, tmp_path):
    """A restarted task (same store root) must CONTINUE the emitted seq,
    not restart at 0 — duplicate seqs would make idempotent downstream
    dedup drop distinct events."""
    import os

    task1, sink1, store = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    task1.process_available()
    seqs1 = [r["seq"] for r in sink1.records]
    assert seqs1 and len(set(seqs1)) == len(seqs1)

    # Simulate restart: new task object over the SAME store root.
    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    sink2 = MemorySink()
    task2 = CdcTask(
        spark,
        catalog,
        cdc_dir,
        sink2,
        store,
        event_time=FIXED_TS,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task2.process_available()
    seqs2 = [r["seq"] for r in sink2.records]
    assert seqs2 and len(set(seqs2)) == len(seqs2)

    # No seq reuse across the restart.
    assert min(seqs2) > max(seqs1)
    assert not (set(seqs1) & set(seqs2))


def test_cdc_stats_cumulative_across_restart(spark, catalog, cdc_dir, tmp_path):
    """describe_table_statistics reports CUMULATIVE counters: a task
    resumed over the same store root continues the counts instead of
    restarting from zero."""
    import os

    task1, _, store = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    task1.process_available()
    s1 = {
        (r["SchemaName"], r["TableName"]): r
        for r in task1.table_statistics(spark).collect()
    }
    # file 1: employee insert+2 updates+delete
    emp1 = s1[("hr", "employee")]
    assert (emp1["Inserts"], emp1["Updates"], emp1["Deletes"]) == (1, 2, 1)

    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    task2, _, _ = _task(spark, catalog, cdc_dir, tmp_path)  # same store root
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task2.process_available()
    s2 = {
        (r["SchemaName"], r["TableName"]): r
        for r in task2.table_statistics(spark).collect()
    }
    emp2 = s2[("hr", "employee")]
    # file 2 adds 1 insert + 1 update + 1 delete on employee — counters
    # continue from file 1's totals.
    assert (emp2["Inserts"], emp2["Updates"], emp2["Deletes"]) == (2, 3, 2)


ALTER_FILE = """INSERT,department,hr,205,Design
ALTER,department,hr,rename-table,department_v2
ALTER,department,hr,add-column,Location
INSERT,department,hr,206,Research
ALTER,department,hr,drop-column,Location
ALTER,department,hr,truncate-table
ALTER,department,hr
ALTER,nosuch,hr,add-column,X"""


def test_cdc_table_alter_control_events(spark, catalog, cdc_dir, tmp_path):
    """include_table_alter_operations=True (stack.py:124): ALTER change
    lines become control events at their position in the stream;
    unsupported alter ops and unknown tables go to the exceptions
    channel; Ddls statistics count the alters."""
    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    write_cdc_file(cdc_dir, 1, ALTER_FILE)
    task.process_available()

    events = sink.events
    # 4 start controls + 2 inserts + 3 supported alters
    assert len(events) == 9

    # stream order: the alter controls interleave with the data events
    # exactly where they occurred in the file
    tail = [
        (e["metadata"]["record-type"], e["metadata"]["operation"])
        for e in events[4:]
    ]
    assert tail == [
        ("data", "insert"),
        ("control", "rename-table"),
        ("control", "add-column"),
        ("data", "insert"),
        ("control", "drop-column"),
    ]
    alter_ev = events[5]
    assert alter_ev["data"] is None
    assert alter_ev["metadata"]["table-name"] == "department"
    assert alter_ev["metadata"]["schema-name"] == "hr"

    # exceptions: unsupported alter op + unknown table + the payload-less
    # ALTER (NULL operation) — NULL must route to exceptions, not vanish
    # from both channels (NULL `isin` and NULL `~isin` are both NULL).
    exc_rows = task.exceptions_table().collect()
    exc = {(r["TABLE_NAME"], r["ERROR"]) for r in exc_rows}
    assert ("department", "unsupported-alter-operation") in exc
    assert ("nosuch", "table-not-in-selection") in exc
    null_op = [
        r for r in exc_rows
        if r["TABLE_NAME"] == "department" and r["OPERATION"] is None
    ]
    assert len(null_op) == 1
    assert null_op[0]["ERROR"] == "unsupported-alter-operation"
    assert len(exc_rows) == 3

    # Ddls statistics: 1 create-table (start) + 3 alter controls
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in task.table_statistics(spark).collect()
    }
    assert stats[("hr", "department")]["Ddls"] == 4
    assert stats[("hr", "department")]["Inserts"] == 2
    task.stop()


def test_cdc_table_alter_streaming_path(spark, catalog, cdc_dir, tmp_path):
    """Alters flow through the LIVE Structured Streaming path (start()/
    foreachBatch), not just the drain-and-return batch mode."""
    import time

    task, sink, _ = _task(spark, catalog, cdc_dir, tmp_path)
    task.start()
    write_cdc_file(
        cdc_dir,
        1,
        "INSERT,department,hr,207,Streaming\n"
        "ALTER,department,hr,add-column,Location",
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(sink.records) < 6:
        time.sleep(0.5)
    task.stop()
    ops = [e["metadata"]["operation"] for e in sink.events]
    assert ops[-2:] == ["insert", "add-column"]
    assert sink.events[-1]["metadata"]["record-type"] == "control"


def test_cdc_rejects_unorderable_file_names(spark, catalog, tmp_path):
    """r6 review: a file matching cdc*.csv but not cdc<digits>.csv got
    NULL seqs that sorted first and interleaved arbitrarily — the
    batch now fails loudly naming the contract."""
    import os

    import pytest

    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.sinks.memory import MemorySink
    from sample_dms_s3_kinesis_spark.sources.cdc_source import read_cdc_lines
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask

    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    with open(os.path.join(cdc_dir, "cdc_fix.csv"), "w") as f:
        f.write("INSERT,department,hr,401,Eng\n")
    task = CdcTask(
        spark, catalog, cdc_dir, MemorySink(),
        ParquetTargetStore(str(tmp_path / "t")),
        event_time="2026-01-01T00:00:00.000Z",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task._emit_start_controls()
    with pytest.raises(ValueError, match="cdc<digits>"):
        task._process_batch(read_cdc_lines(spark, cdc_dir), batch_id=-1)


def test_cdc_quoted_payload_commas(spark, catalog, tmp_path):
    """r6 review: a quoted payload value containing a comma used to
    shift every later positional column; the parse is now quote-aware
    like the full-load CSV reader."""
    from sample_dms_s3_kinesis_spark.sources.cdc_source import (
        parse_cdc_lines,
    )

    lines = spark.createDataFrame(
        [(1, 'INSERT,project,hr,301,"Migration, phase 2",desc')],
        "seq long, value string",
    )
    row = parse_cdc_lines(lines).collect()[0]
    assert row["payload"] == ["301", "Migration, phase 2", "desc"]
    # unquoted lines split byte-identically to the former plain split
    plain = spark.createDataFrame(
        [(2, "INSERT,employee,hr,101,Smith, J ,x")], "seq long, value string"
    )
    row2 = parse_cdc_lines(plain).collect()[0]
    assert row2["payload"] == ["101", "Smith", " J ", "x"]


def test_apply_unknown_op_surfaces_as_exception(spark, catalog):
    """r6 review: an op outside INSERT/UPDATE/DELETE used to vanish
    from state, counts, and exceptions."""
    from sample_dms_s3_kinesis_spark.apply import apply_changes

    table = next(t for t in catalog if t.name == "department")
    current = spark.createDataFrame([], table.schema)
    changes = spark.createDataFrame(
        [(1, "INSERT", 301, "Eng"), (2, "MERGE", 302, "Sales")],
        "seq long, op string, Id long, DepartmentName string",
    )
    res = apply_changes(spark, table, current, changes)
    assert {r["Id"] for r in res.new_state.collect()} == {301}
    exc = res.exceptions.collect()
    assert len(exc) == 1 and exc[0]["op"] == "MERGE" and exc[0]["seq"] == 2
    counts = res.counts.collect()[0]
    assert counts["exceptions"] == 1
    res.unpersist()


def test_process_available_is_repeat_safe(spark, catalog, tmp_path):
    """r6 review: a second drain used to re-read every file —
    re-emitting all events under NEW seqs and re-applying changes;
    the store's drained-files ledger consumes each file exactly once
    and picks up genuinely new files incrementally."""
    import os

    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.sinks.memory import MemorySink
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask

    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    sink = MemorySink()
    task = CdcTask(
        spark, catalog, cdc_dir, sink,
        ParquetTargetStore(str(tmp_path / "t")),
        event_time="2026-01-01T00:00:00.000Z",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    with open(os.path.join(cdc_dir, "cdc0000000001.csv"), "w") as f:
        f.write("INSERT,department,hr,401,Eng\n")
    task.process_available()
    n1 = len(sink.events)
    dept = next(t for t in catalog if t.name == "department")
    task.process_available()          # nothing new: full no-op
    assert len(sink.events) == n1
    assert task.table_state(dept).count() == 1
    assert task.exceptions_table().count() == 0   # no spurious re-INSERT
    with open(os.path.join(cdc_dir, "cdc0000000002.csv"), "w") as f:
        f.write("INSERT,department,hr,402,Sales\n")
    task.process_available()          # only the new file
    assert len(sink.events) == n1 + 1
    assert task.table_state(dept).count() == 2


def test_cdc_restart_requires_original_checkpoint(spark, catalog, tmp_path):
    import os

    import pytest

    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.sinks.memory import MemorySink
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask

    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    store = ParquetTargetStore(str(tmp_path / "t"))
    store.save_seq("cdc-task", 42)     # a prior session's high-water
    task = CdcTask(spark, catalog, cdc_dir, MemorySink(), store)
    with pytest.raises(ValueError, match="original checkpoint_dir"):
        task.start()
