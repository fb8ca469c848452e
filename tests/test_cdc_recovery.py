"""CDC restart/recovery: a new task over the same checkpoint + target
store must resume where the predecessor stopped — already-processed
files are not re-applied, and the durable store exposes the
predecessor's state."""

import time

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
from sample_dms_s3_kinesis_spark.sinks import MemorySink
from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask
from tests.conftest import write_cdc_file

FILE_1 = """INSERT,department,hr,401,Eng
INSERT,department,hr,402,Sales"""
FILE_2 = """UPDATE,department,hr,401,Platform
INSERT,department,hr,403,Legal"""


def _wait_for(sink, n, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline and len(sink.records) < n:
        time.sleep(0.5)
    return len(sink.records)


def test_replay_after_crash_restart_reuses_seq_range(
    spark, catalog, cdc_dir, tmp_path
):
    """Crash between save_seq and the streaming checkpoint commit makes
    Spark REPLAY the batch.  The replay must (a) re-emit the batch under
    the SAME seqs (idempotent downstream), (b) never collide with the
    seqs the restart's start-control events already consumed, and
    (c) count the batch's rows exactly once in the statistics."""
    from sample_dms_s3_kinesis_spark.sources.cdc_source import read_cdc_lines

    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, ParquetTargetStore(target),
        event_time=ts, checkpoint_dir=ckpt,
    )
    # Drive the streaming callbacks directly so the crash point is
    # deterministic: controls, then batch 0, then "crash" before the
    # checkpoint commit (i.e. we never ack batch 0).
    task1._emit_start_controls()
    n_controls = len(sink1.records)
    write_cdc_file(cdc_dir, 1, FILE_1)
    lines = read_cdc_lines(spark, cdc_dir)
    task1._process_batch(lines, batch_id=0)
    batch1_seqs = [r["seq"] for r in sink1.records[n_controls:]]
    assert batch1_seqs

    # Restart: fresh task over the same store + checkpoint.  start()
    # emits new control events (at-least-once), THEN Spark replays
    # batch 0.
    store2 = ParquetTargetStore(target)
    sink2 = MemorySink()
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2,
        event_time=ts, checkpoint_dir=ckpt,
    )
    task2._emit_start_controls()
    control2_seqs = [r["seq"] for r in sink2.records]
    assert min(control2_seqs) > max(batch1_seqs)  # controls continue the seq
    task2._process_batch(lines, batch_id=0)  # the replay
    replayed_seqs = [r["seq"] for r in sink2.records[len(control2_seqs):]]

    # (a) identical seq range — downstream seq-keyed dedup collapses
    # the duplicate emission.
    assert replayed_seqs == batch1_seqs
    # (b) restart controls and replayed data never share a seq.
    assert not (set(control2_seqs) & set(replayed_seqs))

    # The next batch must allocate PAST the restart controls — not
    # inside their range (the pre-fix bug: save_seq after the replay
    # landed at the old high-water, re-allocating the control seqs).
    import os

    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    write_cdc_file(cdc_dir, 2, FILE_2)
    lines2 = read_cdc_lines(spark, cdc_dir)
    task2._process_batch(lines2, batch_id=1)
    prior = len(control2_seqs) + len(replayed_seqs)
    batch2_seqs = [r["seq"] for r in sink2.records[prior:]]
    assert batch2_seqs
    assert min(batch2_seqs) > max(control2_seqs)
    assert not (set(batch2_seqs) & (set(control2_seqs) | set(replayed_seqs)))

    # (c) statistics: batch rows counted once; the restart's control
    # events are NOT lost by the rewind (4 tables × 2 start emissions).
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in task2.table_statistics(spark).collect()
    }
    dept = stats[("hr", "department")]
    assert dept["Inserts"] == 3  # 401, 402 (file 1, once) + 403 (file 2)
    assert dept["Updates"] == 1  # 401 (file 2)
    assert dept["Ddls"] == 2     # create-table from both task starts


def test_deferred_controls_avoid_in_batch_seq_collision(
    spark, catalog, cdc_dir, tmp_path
):
    """Crash landing BETWEEN save_batch_mark and the post-batch save_seq:
    load_seq returns the PRE-batch offset, so restart control events
    emitted eagerly would allocate seqs INSIDE the range the replayed
    batch then reuses.  _emit_or_defer_start_controls must postpone the
    controls until the batch resolves; they then continue PAST the
    replayed range."""
    from sample_dms_s3_kinesis_spark.sources.cdc_source import read_cdc_lines

    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    store1 = ParquetTargetStore(target)
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, store1,
        event_time=ts, checkpoint_dir=ckpt,
    )
    task1._emit_start_controls()
    n_controls = len(sink1.records)
    write_cdc_file(cdc_dir, 1, FILE_1)
    lines = read_cdc_lines(spark, cdc_dir)
    task1._process_batch(lines, batch_id=0)
    batch1_seqs = [r["seq"] for r in sink1.records[n_controls:]]
    assert batch1_seqs
    # Rewind the durable seq to the mark's pre-batch offset — exactly
    # the state a crash before the post-batch save_seq leaves behind.
    mark = store1.load_batch_mark(task1.identifier)
    store1.save_seq(task1.identifier, mark["offset"])

    store2 = ParquetTargetStore(target)
    sink2 = MemorySink()
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2,
        event_time=ts, checkpoint_dir=ckpt,
    )
    task2._emit_or_defer_start_controls()
    assert task2._pending_start_controls
    assert sink2.records == []  # deferred, not emitted
    task2._process_batch(lines, batch_id=0)  # the replay
    replayed = [r["seq"] for r in sink2.records[: len(batch1_seqs)]]
    control_seqs = [r["seq"] for r in sink2.records[len(batch1_seqs):]]
    # (a) idempotent re-emission under the SAME seqs
    assert replayed == batch1_seqs
    # (b) flushed controls allocate strictly past the replayed range
    assert control_seqs
    assert min(control_seqs) > max(batch1_seqs)
    assert not (set(control_seqs) & set(replayed))
    # (c) the next batch continues past the flushed controls
    import os

    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    write_cdc_file(cdc_dir, 2, FILE_2)
    lines2 = read_cdc_lines(spark, cdc_dir)
    task2._process_batch(lines2, batch_id=1)
    prior = len(replayed) + len(control_seqs)
    batch2_seqs = [r["seq"] for r in sink2.records[prior:]]
    assert batch2_seqs
    assert min(batch2_seqs) > max(control_seqs)


def test_stale_mark_from_other_checkpoint_is_ignored(
    spark, catalog, cdc_dir, tmp_path
):
    """A fresh checkpoint renumbers batches from 0 — a stale mark left
    by a DIFFERENT checkpoint must not trigger the replay rewind."""
    from sample_dms_s3_kinesis_spark.sources.cdc_source import read_cdc_lines

    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, ParquetTargetStore(target),
        event_time=ts, checkpoint_dir=str(tmp_path / "ckptA"),
    )
    task1._emit_start_controls()
    write_cdc_file(cdc_dir, 1, FILE_1)
    lines = read_cdc_lines(spark, cdc_dir)
    task1._process_batch(lines, batch_id=0)  # leaves a mark for batch 0
    seqs1 = [r["seq"] for r in sink1.records]

    # New task, DEFAULT (fresh uuid) checkpoint, same store root.  Its
    # first batch is also batch_id 0 but over different input — a
    # rewind here would reuse seqs against unrelated data.
    import os

    os.remove(os.path.join(cdc_dir, "cdc0000000001.csv"))
    sink2 = MemorySink()
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, ParquetTargetStore(target),
        event_time=ts,
    )
    task2._emit_start_controls()
    write_cdc_file(cdc_dir, 2, FILE_2)
    lines2 = read_cdc_lines(spark, cdc_dir)
    task2._process_batch(lines2, batch_id=0)
    seqs2 = [r["seq"] for r in sink2.records]

    # No rewind: every new event continues past the old high-water.
    assert min(seqs2) > max(seqs1)
    assert not (set(seqs1) & set(seqs2))


def test_rewind_versions_restricted_to_owned_tables(tmp_path):
    """Replay rewind must not roll back version pointers advanced by
    another writer sharing the store root."""
    store = ParquetTargetStore(str(tmp_path / "t"))
    store._versions = {"hr.department": 3, "hr.employee": 2, "other.tbl": 7}
    snapshot = {"hr.department": 1, "other.tbl": 5}
    store.rewind_versions(
        snapshot, owned=["hr.department", "hr.employee"]
    )
    assert store._versions["hr.department"] == 1   # rewound
    assert "hr.employee" not in store._versions    # created mid-batch → reset
    assert store._versions["other.tbl"] == 7       # foreign writer untouched


def test_restarted_task_resumes_from_checkpoint(spark, catalog, cdc_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    dept = catalog.get("hr", "department")

    sink1 = MemorySink()
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, ParquetTargetStore(target),
        event_time="2026-01-01T00:00:00.000Z", checkpoint_dir=ckpt,
    )
    task1.start()
    write_cdc_file(cdc_dir, 1, FILE_1)
    assert _wait_for(sink1, 4 + 2) >= 6  # 4 controls + 2 inserts
    task1.stop()

    # Fresh task objects over the SAME checkpoint and store root —
    # simulating a process restart.
    store2 = ParquetTargetStore(target)
    state_after_restart = {
        r["Id"]: r["DepartmentName"] for r in store2.read(spark, dept).collect()
    }
    assert state_after_restart == {401: "Eng", 402: "Sales"}

    sink2 = MemorySink()
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2,
        event_time="2026-01-01T00:00:00.000Z", checkpoint_dir=ckpt,
    )
    task2.start()
    write_cdc_file(cdc_dir, 2, FILE_2)
    assert _wait_for(sink2, 4 + 2) >= 6
    task2.stop()

    data_ops = [
        (e["metadata"]["operation"], e["data"]["Id"])
        for e in sink2.events
        if e["metadata"]["record-type"] == "data"
    ]
    # only file 2's changes — file 1 was not replayed
    assert sorted(data_ops) == [("insert", 403), ("update", 401)]

    final = {
        r["Id"]: r["DepartmentName"]
        for r in store2.read(spark, dept).collect()
    }
    assert final == {401: "Platform", 402: "Sales", 403: "Legal"}


def test_drain_crash_before_ledger_replays_same_seq_range(
    spark, catalog, cdc_dir, tmp_path
):
    """Crash between a drain's ``_process_batch`` and ``save_drained``:
    the drained-files ledger never records the files, so the next drain
    re-reads them.  The drain mark (r6 advice) must make that replay
    rewind — the files re-emit under the SAME seqs and their changes
    apply exactly once, even when new files arrived in between."""
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    store1 = ParquetTargetStore(target)
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, store1,
        event_time=ts, checkpoint_dir=ckpt,
    )
    write_cdc_file(cdc_dir, 1, FILE_1)

    def boom(*a, **k):
        raise RuntimeError("crash before ledger")

    store1.save_drained = boom  # crash in the exact hazard window
    try:
        task1.process_available()
    except RuntimeError:
        pass
    crashed_data_seqs = [
        r["seq"]
        for r, e in zip(sink1.records, sink1.events)
        if e["metadata"]["record-type"] == "data"
    ]
    assert len(crashed_data_seqs) == 2  # file 1 applied and emitted

    # Process restart: fresh task over the same store root; a new CDC
    # file arrived meanwhile, so the replay drain covers a SUPERSET.
    write_cdc_file(cdc_dir, 2, FILE_2)
    sink2 = MemorySink()
    store2 = ParquetTargetStore(target)
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2,
        event_time=ts, checkpoint_dir=ckpt,
    )
    task2.process_available()
    replay = [
        (r["seq"], e["metadata"]["record-type"],
         (e["data"] or {}).get("Id"), e["metadata"]["operation"])
        for r, e in zip(sink2.records, sink2.events)
    ]
    data = [x for x in replay if x[1] == "data"]
    controls = [x for x in replay if x[1] == "control"]
    # file 1's rows re-emitted under the SAME seqs (idempotent
    # downstream), file 2's rows continue after them
    assert [s for s, *_ in data[:2]] == crashed_data_seqs
    assert [(i, op) for _, _, i, op in data] == [
        (401, "insert"), (402, "insert"), (401, "update"), (403, "insert"),
    ]
    # restart controls never collide with replayed data seqs
    assert not {s for s, *_ in controls} & {s for s, *_ in data}
    all_seqs = [s for s, *_ in replay]
    assert len(all_seqs) == len(set(all_seqs))

    # applied exactly once: final state and statistics count file 1 once
    dept = next(t for t in catalog if t.name == "department")
    final = {
        r["Id"]: r["DepartmentName"]
        for r in store2.read(spark, dept).collect()
    }
    assert final == {401: "Platform", 402: "Sales", 403: "Legal"}
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in task2.table_statistics(spark).collect()
    }
    assert stats[("hr", "department")]["Inserts"] == 3
    assert stats[("hr", "department")]["Updates"] == 1

    # a committed drain clears the mark: one more drain is a no-op
    n = len(sink2.records)
    task2.process_available()
    assert len(sink2.records) == n

def test_drain_crash_replays_across_default_checkpoint_restart(
    spark, catalog, cdc_dir, tmp_path
):
    """Same interrupted-drain hazard, but the restarted task uses the
    DEFAULT (fresh-uuid) checkpoint.  Drain marks are identified by
    their file list, not a checkpoint-issued batch number, so the
    replay rewind must still fire — a dropped mark would re-emit the
    interrupted files under NEW seqs."""
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    store1 = ParquetTargetStore(target)
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, store1, event_time=ts,
    )
    write_cdc_file(cdc_dir, 1, FILE_1)

    def boom(*a, **k):
        raise RuntimeError("crash before ledger")

    store1.save_drained = boom
    try:
        task1.process_available()
    except RuntimeError:
        pass
    crashed_data_seqs = [
        r["seq"]
        for r, e in zip(sink1.records, sink1.events)
        if e["metadata"]["record-type"] == "data"
    ]
    assert len(crashed_data_seqs) == 2

    # restart with a DIFFERENT (fresh default) checkpoint over the same
    # store root — the surviving drain mark must not be discarded
    sink2 = MemorySink()
    store2 = ParquetTargetStore(target)
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2, event_time=ts,
    )
    task2.process_available()
    data = [
        (r["seq"], (e["data"] or {}).get("Id"), e["metadata"]["operation"])
        for r, e in zip(sink2.records, sink2.events)
        if e["metadata"]["record-type"] == "data"
    ]
    # file 1 re-emitted under the SAME seqs, not a fresh range
    assert [s for s, *_ in data] == crashed_data_seqs
    assert [(i, op) for _, i, op in data] == [
        (401, "insert"), (402, "insert"),
    ]
    all_seqs = [r["seq"] for r in sink2.records]
    assert len(all_seqs) == len(set(all_seqs))

    # applied exactly once
    dept = next(t for t in catalog if t.name == "department")
    final = {
        r["Id"]: r["DepartmentName"]
        for r in store2.read(spark, dept).collect()
    }
    assert final == {401: "Eng", 402: "Sales"}
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in task2.table_statistics(spark).collect()
    }
    assert stats[("hr", "department")]["Inserts"] == 2

def test_rewind_versions_persists_deletions_on_disk(tmp_path):
    """A mid-batch table creation reset to absent by the rewind must be
    absent for a FRESH store over the same root too — the merge-on-save
    must not resurrect the popped pointer from disk."""
    root = str(tmp_path / "t")
    store = ParquetTargetStore(root)
    store._versions = {"hr.department": 2, "awsdms_apply_exceptions": 1}
    store._dirty = set(store._versions)
    store._save_versions()  # both pointers now on disk
    store.rewind_versions(
        {"hr.department": 1},
        owned=["hr.department", "awsdms_apply_exceptions"],
    )
    fresh = ParquetTargetStore(root)
    assert fresh._versions == {"hr.department": 1}


def test_concurrent_store_saves_do_not_clobber_each_other(tmp_path):
    """Two live stores over one root: each save overlays only the keys
    that instance touched, so B's save cannot resurrect a pointer A
    deleted nor regress one A advanced after B loaded its snapshot."""
    root = str(tmp_path / "t")
    a = ParquetTargetStore(root)
    a._versions, a._dirty = {"hr.x": 1}, {"hr.x"}
    a._save_versions()

    b = ParquetTargetStore(root)  # loads {hr.x: 1}
    # A advances x and deletes nothing; then rewinds x away entirely
    a._versions, a._dirty = {"hr.x": 2}, {"hr.x"}
    a._save_versions()
    # B saves its own table: must keep A's advance
    b._versions["hr.y"] = 1
    b._dirty.add("hr.y")
    b._save_versions()
    assert ParquetTargetStore(root)._versions == {"hr.x": 2, "hr.y": 1}

    # A deletes x (rewind to absent); B saves again — x must STAY gone
    a.rewind_versions({}, owned=["hr.x"])
    b._versions["hr.y"] = 2
    b._save_versions()
    assert ParquetTargetStore(root)._versions == {"hr.y": 2}


def test_stream_start_replays_interrupted_drain_first(
    spark, catalog, cdc_dir, tmp_path
):
    """An unresolved drain mark must be REPLAYED at start(), before any
    stream epoch can clobber the single batch-mark slot with its own
    mark — otherwise the interrupted drain's files re-emit under new
    seqs on the next drain."""
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"

    sink1 = MemorySink()
    store1 = ParquetTargetStore(target)
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, store1, event_time=ts,
    )
    write_cdc_file(cdc_dir, 1, FILE_1)

    def boom(*a, **k):
        raise RuntimeError("crash before ledger")

    store1.save_drained = boom
    try:
        task1.process_available()
    except RuntimeError:
        pass
    crashed_seqs = [
        r["seq"]
        for r, e in zip(sink1.records, sink1.events)
        if e["metadata"]["record-type"] == "data"
    ]
    assert len(crashed_seqs) == 2

    # restart in STREAMING mode with a new file already waiting (an
    # explicit checkpoint: the default-checkpoint restart guard is a
    # separate contract)
    write_cdc_file(cdc_dir, 2, FILE_2)
    sink2 = MemorySink()
    store2 = ParquetTargetStore(target)
    task2 = CdcTask(
        spark, catalog, cdc_dir, sink2, store2, event_time=ts,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task2.start()
    try:
        _wait_for(sink2, 10)
    finally:
        task2.stop()
    data = [
        (r["seq"], (e["data"] or {}).get("Id"), e["metadata"]["operation"])
        for r, e in zip(sink2.records, sink2.events)
        if e["metadata"]["record-type"] == "data"
    ]
    # file 1 replayed under the SAME seqs; the stream (fresh
    # checkpoint, so it re-discovers file 1 too) must NOT re-deliver
    # the drained file — exactly one data event per change row
    replayed = [d for d in data if d[0] in set(crashed_seqs)]
    assert sorted(i for _, i, _ in replayed) == [401, 402]
    assert len(data) == 4  # 2 replayed + 2 from file 2, nothing twice
    all_seqs = [r["seq"] for r in sink2.records]
    assert len(all_seqs) == len(set(all_seqs))

    dept = next(t for t in catalog if t.name == "department")
    final = {
        r["Id"]: r["DepartmentName"]
        for r in store2.read(spark, dept).collect()
    }
    assert final == {401: "Platform", 402: "Sales", 403: "Legal"}
    stats = {
        (r["SchemaName"], r["TableName"]): r
        for r in task2.table_statistics(spark).collect()
    }
    assert stats[("hr", "department")]["Inserts"] == 3  # 401,402,403 once


def test_drain_refuses_unresolved_stream_mark(
    spark, catalog, cdc_dir, tmp_path
):
    """Converse of the stream-side guard: a drain arriving while an
    unresolved STREAMING batch mark is pending must refuse (saving the
    drain mark would clobber the stream mark's rewind info, and the
    drain would re-emit the stream-consumed files under new seqs)."""
    import pytest

    from sample_dms_s3_kinesis_spark.sources.cdc_source import read_cdc_lines

    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    ts = "2026-01-01T00:00:00.000Z"
    sink1 = MemorySink()
    task1 = CdcTask(
        spark, catalog, cdc_dir, sink1, ParquetTargetStore(target),
        event_time=ts, checkpoint_dir=ckpt,
    )
    task1._emit_start_controls()
    write_cdc_file(cdc_dir, 1, FILE_1)
    lines = read_cdc_lines(spark, cdc_dir)
    # "crash" before the checkpoint commit: the stream mark survives
    task1._process_batch(lines, batch_id=0)

    store2 = ParquetTargetStore(target)
    task2 = CdcTask(
        spark, catalog, cdc_dir, MemorySink(), store2,
        event_time=ts, checkpoint_dir=ckpt,
    )
    with pytest.raises(RuntimeError, match="unresolved streaming"):
        task2.process_available()
    # the mark's rewind info survived the refused drain
    mark = store2.load_batch_mark(task2.identifier)
    assert mark is not None and mark["batch_id"] == 0
