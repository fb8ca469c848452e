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
