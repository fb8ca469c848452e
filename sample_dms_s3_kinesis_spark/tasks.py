"""O26/O27: task lifecycle + the full-load replication task.

Reference parity:
- lifecycle strings and transitions: ``start_replication_task`` with
  ``StartReplicationTaskType="start-replication"`` (run.py:80-81),
  states ``starting → running → stopped`` (run.py:169,190,205-206),
  polled via ``describe_replication_tasks`` (run.py:97-104);
  full-load auto-transitions to ``stopped`` on completion (run.py:169).
- full-load event contract: per included table (selection rules
  stack.py:65-78) emit drop-table + create-table control events then one
  ``load`` data event per row — 16 events for the 3-table/10-row fixture
  (run.py:170, README.md:77).
- retry util (run.py:51-62) is harness-side; Spark task retries +
  checkpointing cover the engine side (SURVEY §2.7 O27).

Scale notes: each table's scan+envelope is an independent narrow
pipeline (no shuffle until the final ordering), so 1000 tables fan out
as 1000 parallel file-scan stages.  The only serializing step is the
single-shard global sequence (see envelope.assign_global_seq docstring);
with a multi-shard sink it becomes per-key and fully parallel.
"""

from __future__ import annotations

import enum
import time
from functools import reduce
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.catalog import ALL_TABLES_MAPPING, Catalog
from sample_dms_s3_kinesis_spark import envelope
from sample_dms_s3_kinesis_spark.sinks.base import EventSink
from sample_dms_s3_kinesis_spark.sources.csv_source import read_table
from sample_dms_s3_kinesis_spark.stats import StatsAccumulator


class TaskStatus(str, enum.Enum):
    """DMS replication task status strings (run.py:169,190)."""

    CREATING = "creating"
    READY = "ready"
    STARTING = "starting"
    RUNNING = "running"
    STOPPED = "stopped"
    FAILED = "failed"

    def __str__(self) -> str:  # poll output parity with run.py:101
        return self.value


class ReplicationTask:
    """Base task: status machine + polling, DMS-shaped."""

    def __init__(self, identifier: str) -> None:
        self.identifier = identifier
        self._status = TaskStatus.READY
        self.stats = StatsAccumulator()

    @property
    def status(self) -> str:
        return self._status.value

    def _set_status(self, status: TaskStatus) -> None:
        self._status = status

    def wait_for_status(
        self, expected: str, *, retries: int = 10, sleep: float = 1.0
    ) -> None:
        """run.py:93-104 polling contract (local budget 10×1s,
        run.py:21-22)."""
        for _ in range(retries):
            if self.status == expected:
                return
            time.sleep(sleep)
        raise AssertionError(
            f"task {self.identifier}: status {self.status!r} != {expected!r}"
        )

    def start(self) -> None:  # start-replication (run.py:80-84)
        raise NotImplementedError

    def stop(self) -> None:  # stop_replication_task (run.py:87-90)
        raise NotImplementedError

    def table_statistics(self, spark: SparkSession) -> DataFrame:
        """describe_table_statistics (run.py:141-148), sorted rows."""
        return self.stats.to_dataframe(spark)


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """O22: event-stream union.  ``unionByName`` over homogeneous
    event-log frames; reduce-tree shape is fine since every input shares
    one schema and Catalyst collapses adjacent unions."""
    if not frames:
        raise ValueError(
            "union_all: no frames to union (did the table selection "
            "rules match zero tables?)"
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


class FullLoadTask(ReplicationTask):
    """migration_type="full-load" (stack.py:92-100).

    ``start`` runs the batch pipeline to completion and flips to
    ``stopped`` — exactly the reference's observable lifecycle
    (run.py:166-170: start, then wait for ``stopped``).
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        source_root: str,
        sink: EventSink,
        *,
        identifier: str = "full-load-task",
        table_mappings: Mapping | None = None,
        event_time: str | None = None,
    ) -> None:
        super().__init__(identifier)
        self.spark = spark
        self.catalog = catalog.select(table_mappings or ALL_TABLES_MAPPING)
        self.source_root = source_root
        self.sink = sink
        self.event_time = event_time

    def build_events(self) -> DataFrame:
        """Assemble the full event log: per table (catalog order):
        drop-table, create-table (target prep = drop-and-create,
        README.md:77), then `load` data events in file/line order."""
        frames: list[DataFrame] = []
        for idx, table in enumerate(self.catalog):
            controls = envelope.control_events(
                self.spark,
                [table],
                ["drop-table", "create-table"],
                event_time=self.event_time,
            ).select("*", F.lit(idx).alias("_tbl"), F.lit(0).alias("_kind"))

            rows = read_table(
                self.spark, table, self.source_root, with_order_columns=True
            )
            data = envelope.data_events(
                rows,
                table,
                "load",
                event_time=self.event_time,
                order_by=[
                    F.col("_src_file"),
                    F.col("_blk"),
                    F.col("_line_id"),
                ],
            ).select("*", F.lit(idx).alias("_tbl"), F.lit(1).alias("_kind"))
            frames.append(controls)
            frames.append(data)

        events = union_all(frames)
        events = envelope.assign_global_seq(events, "_tbl", "_kind", "seq")
        return events.drop("_tbl", "_kind")

    def start(self) -> None:
        self._set_status(TaskStatus.STARTING)
        try:
            self._set_status(TaskStatus.RUNNING)
            # persisted: the sink write and the stats pass would
            # otherwise each re-run the whole scan + envelope + global
            # seq window (and re-derived monotonic ids are not
            # guaranteed identical across recomputations)
            events = self.build_events().persist()
            try:
                self.sink.write(events)
                self.stats.add_events(events)
            finally:
                events.unpersist()
        except Exception:
            self._set_status(TaskStatus.FAILED)
            raise
        # Full load auto-stops when every table finished (run.py:169).
        self._set_status(TaskStatus.STOPPED)

    def stop(self) -> None:
        self._set_status(TaskStatus.STOPPED)


def pin_checkpoint(
    marker_path: str,
    checkpoint_dir: str,
    *,
    populated: bool,
    what: str,
) -> None:
    """Enforce the streaming-checkpoint pin shared by every
    batch-partition store (corpus ingest, sketch metrics, aggregate
    view): stream epoch ids name batch directories, so a populated
    store must keep streaming under the checkpoint that wrote them —
    a different one would replay epoch 0 over existing partitions
    with overwrite semantics.

    Paths are compared by ``os.path.abspath`` (a trailing slash or a
    relative spelling must not false-raise, and an equal relative
    string resolved from a different cwd must not false-pass).  A
    populated store with NO marker (written before the pin existed)
    fails loudly rather than silently adopting — verify the original
    checkpoint and write it to the marker file to proceed."""
    import os

    cur = os.path.abspath(checkpoint_dir)
    if os.path.exists(marker_path):
        with open(marker_path) as f:
            prior = f.read().strip()
        if os.path.abspath(prior) != cur and populated:
            raise ValueError(
                f"{what} was streamed with checkpoint {prior}; "
                f"restarting with {checkpoint_dir} would replay epoch "
                "ids over existing batch partitions — reuse the "
                "original checkpoint_dir"
            )
    elif populated:
        raise ValueError(
            f"{what} has stream-written batches but no checkpoint "
            f"marker (it predates the pin); verify the original "
            f"checkpoint and write it to {marker_path} before "
            "streaming again"
        )
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(cur)
    os.replace(tmp, marker_path)
