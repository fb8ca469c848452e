"""CDC replication task — Structured Streaming micro-batch pipeline.

Reference parity (migration_type="cdc", stack.py:81-89):
- task starts *before* any change data exists and reaches ``running``
  (run.py:189-190); at start it emits create-table control events for
  every included table plus one for ``awsdms_apply_exceptions``
  (the 4 control events of the 15-event golden, README.md:84).
- the instance polls ``cdc_path`` for new files, processes each whole
  file in filename order (run.py:194-195), emits one data event per
  change row with the operation lowercased into metadata
  (lib/query.py:16 ``INSERT`` → metadata ``insert``), applies changes to
  per-table state (O24) and updates statistics (O17).
- ``stop`` = stop_replication_task (run.py:205-206).

DMS's S3-CDC polling loop *is* micro-batching, so Structured Streaming's
file source with ``maxFilesPerTrigger=1`` is the native fit (SURVEY §3
E2).  All per-batch logic lives in ``foreachBatch`` where the batch
frame is a plain DataFrame (windows allowed), and consists solely of
Catalyst expressions — parse, route, envelope, fold-merge.

Scale notes: state lives in parquet target tables (ParquetTargetStore →
Delta/Iceberg MERGE in production), not in driver memory; per-batch
driver traffic is O(#tables) count rows.  The checkpoint location gives
source-offset recovery; sink emission is at-least-once with the
deterministic ``seq`` enabling idempotent downstream dedup.
"""

from __future__ import annotations

import uuid
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore, apply_changes
from sample_dms_s3_kinesis_spark.catalog import ALL_TABLES_MAPPING, Catalog, TableDef
from sample_dms_s3_kinesis_spark import envelope
from sample_dms_s3_kinesis_spark.stats import StatsAccumulator
from sample_dms_s3_kinesis_spark.sinks.base import EventSink
from sample_dms_s3_kinesis_spark.sources.cdc_source import (
    parse_cdc_lines,
    read_cdc_lines,
    read_cdc_lines_stream,
    route_changes,
)
from sample_dms_s3_kinesis_spark.tasks import ReplicationTask, TaskStatus, union_all

EXCEPTIONS_TABLE = "awsdms_apply_exceptions"

EXCEPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("TASK_NAME", T.StringType()),
        T.StructField("TABLE_OWNER", T.StringType()),
        T.StructField("TABLE_NAME", T.StringType()),
        T.StructField("ERROR_SEQ", T.LongType()),
        T.StructField("OPERATION", T.StringType()),
        T.StructField("ERROR", T.StringType()),
    ]
)


def split_alter_rows(
    alters: DataFrame, catalog: Catalog, task_name: str
) -> tuple[DataFrame, DataFrame]:
    """Split parsed ALTER rows into (supported, exceptions).

    ``supported``: rows for catalog tables whose first payload token is
    a supported alter op — columns (seq, schema_name, table_name,
    operation), ready for ``envelope.alter_control_events``.
    ``exceptions``: EXCEPTIONS_SCHEMA-shaped rows for unknown tables
    and unsupported operations.  Every predicate is null-safe: garbage
    lines (NULL table/schema, and NULL operation from a payload-less
    'ALTER,<table>,<schema>' line, where both ``isin`` and ``~isin``
    evaluate to NULL) always land in exceptions — rows are conserved,
    never silently dropped from both channels (the property
    tests/test_cdc_parse_properties.py pins)."""
    known_pred = F.lit(False)
    for t in catalog:
        known_pred = known_pred | (
            (F.col("schema_name") == t.owner)
            & (F.col("table_name") == t.name)
        )
    known_pred = F.coalesce(known_pred, F.lit(False))
    alter_rows = alters.filter(known_pred).select(
        "seq",
        "schema_name",
        "table_name",
        # the alter op is the first payload token, validated against the
        # supported set; anything else routes to the exceptions channel
        F.lower(F.trim(F.get(F.col("payload"), 0))).alias("operation"),
    )
    is_supported = F.coalesce(
        F.col("operation").isin(list(envelope.ALTER_OPERATIONS)),
        F.lit(False),
    )
    supported = alter_rows.filter(is_supported)
    exc_unsupported = alter_rows.filter(~is_supported).select(
        F.lit(task_name).alias("TASK_NAME"),
        F.col("schema_name").alias("TABLE_OWNER"),
        F.col("table_name").alias("TABLE_NAME"),
        F.col("seq").alias("ERROR_SEQ"),
        F.col("operation").alias("OPERATION"),
        F.lit("unsupported-alter-operation").alias("ERROR"),
    )
    exc_unknown = alters.filter(~known_pred).select(
        F.lit(task_name).alias("TASK_NAME"),
        F.col("schema_name").alias("TABLE_OWNER"),
        F.col("table_name").alias("TABLE_NAME"),
        F.col("seq").alias("ERROR_SEQ"),
        F.col("op").alias("OPERATION"),
        F.lit("table-not-in-selection").alias("ERROR"),
    )
    return supported, exc_unsupported.unionByName(exc_unknown)


class CdcTask(ReplicationTask):
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        cdc_dir: str,
        sink: EventSink,
        store: ParquetTargetStore,
        *,
        identifier: str = "cdc-task",
        table_mappings: Mapping | None = None,
        event_time: str | None = None,
        checkpoint_dir: str | None = None,
    ) -> None:
        super().__init__(identifier)
        self.spark = spark
        self.catalog = catalog.select(table_mappings or ALL_TABLES_MAPPING)
        self.cdc_dir = cdc_dir
        self.sink = sink
        self.store = store
        self.event_time = event_time
        self._default_checkpoint = checkpoint_dir is None
        self.checkpoint_dir = checkpoint_dir or f"/tmp/cdc-checkpoint-{uuid.uuid4()}"
        self._query = None
        # Recover the emitted-seq high-water mark alongside the store:
        # a restarted task must continue the sequence, not restart at 0
        # (duplicate seqs would break downstream idempotent dedup).
        self._seq_offset = store.load_seq(identifier)
        # Likewise table statistics: describe_table_statistics reports
        # cumulative counters across restarts, not batch-local ones.
        self.stats = StatsAccumulator.from_mapping(store.load_stats(identifier))
        # A STREAMING batch mark belonging to a DIFFERENT checkpoint can
        # never be a genuine replay of ours (fresh checkpoints renumber
        # batches from 0, so batch_id alone could spuriously match) —
        # drop it.  DRAIN marks (batch_id == -1) are exempt: their batch
        # identity is the recorded FILE LIST, which is store-scoped, not
        # checkpoint-scoped — dropping one here would let a restarted
        # default-checkpoint task re-emit the interrupted drain's files
        # under NEW seqs, the exact duplicate-seq hazard the mark closes.
        mark = store.load_batch_mark(identifier)
        if (
            mark is not None
            and mark.get("batch_id") != -1
            and mark.get("checkpoint") != self.checkpoint_dir
        ):
            store.clear_batch_mark(identifier)
        # Set when start-of-task control emission must wait for an
        # in-flight batch to resolve (see _emit_or_defer_start_controls).
        self._pending_start_controls = False

    # -- lifecycle -----------------------------------------------------

    def start(self) -> None:
        """start-replication: emit start-of-task control events, then
        begin tailing ``cdc_dir``; status reaches ``running`` before any
        change file exists (run.py:189-190)."""
        if self._default_checkpoint and self._seq_offset > 0:
            raise ValueError(
                "restarting CdcTask over a persistent store (seq "
                f"high-water {self._seq_offset}) with a fresh default "
                "checkpoint would re-deliver every cdc file as new "
                "batches and re-emit/re-apply all history — pass the "
                "original checkpoint_dir"
            )
        self._set_status(TaskStatus.STARTING)
        # Resolve a surviving interrupted-drain mark BEFORE the stream
        # runs: the batch-mark slot holds ONE mark, so a stream epoch
        # saving its own mark over an unresolved drain would orphan
        # the drain's replay and let its files re-emit under new seqs.
        self._maybe_replay_interrupted_drain()
        self._emit_or_defer_start_controls()
        self._query = (
            read_cdc_lines_stream(self.spark, self.cdc_dir)
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )
        self._set_status(TaskStatus.RUNNING)

    def stop(self) -> None:
        if self._query is not None:
            # Drain in-flight work before interrupting: stopping mid-
            # foreachBatch would abort the batch's trailing writes and
            # interrupt driver-side py4j calls (observed: Spark's
            # isInterruptionException regex stack-overflows on the huge
            # interrupted-py4j message). Checkpointing would replay the
            # batch on restart either way; graceful drain keeps local
            # stop() semantics clean.
            try:
                self._query.processAllAvailable()
            except Exception:
                pass
            self._query.stop()
            try:
                self._query.awaitTermination(30)
            except Exception:
                pass
        # Deferred start controls with no batch ever arriving (the
        # marked batch had actually committed and no new file landed):
        # flush now so the at-least-once control contract holds.
        if self._pending_start_controls:
            self._pending_start_controls = False
            self._emit_start_controls()
        self._set_status(TaskStatus.STOPPED)

    def process_available(self) -> None:
        """Drain-and-return batch mode (``Trigger.AvailableNow``
        equivalent, SURVEY §4 'micro-batch pipelining'): used by tests
        and by callers that want deterministic one-shot application.
        Processes every pending file as ONE logical batch — ordering
        across files is preserved by the (file_seq, line_no) sequence
        so the fold-merge sees the identical total order the
        one-file-per-trigger stream would produce."""
        if self.status == TaskStatus.READY.value:
            self._set_status(TaskStatus.STARTING)
            self._emit_or_defer_start_controls()
            self._set_status(TaskStatus.RUNNING)
        # Consume each file exactly ONCE across repeated drains (the
        # store keeps the ledger): re-reading a consumed file would
        # re-emit its events under NEW seqs — duplicates downstream
        # seq-keyed dedup cannot drop — and re-apply its changes.
        import os as _os
        import re as _re

        drained = set(self.store.load_drained(self.identifier))
        pending = sorted(
            _os.path.join(self.cdc_dir, n)
            for n in _os.listdir(self.cdc_dir)
            if _re.fullmatch(r"cdc.*\.csv", n)
            and _os.path.join(self.cdc_dir, n) not in drained
        )
        if not pending:
            return
        # Drain replay mark: _process_batch advances seqs, stats and
        # version pointers, but save_drained below is what records the
        # files as consumed — a crash in that window would re-process
        # the same files on the next drain under NEW seqs (the exact
        # hazard the streaming path's batch mark closes).  Drains have
        # no checkpoint-issued batch number, so the marked FILE LIST is
        # the batch identity: a surviving mark whose files are still
        # un-drained is an interrupted drain.  The replay rewinds to
        # the recorded pre-drain state and re-processes EXACTLY the
        # marked files — never a superset: files that arrived after the
        # crash would allocate seqs past the replayed range, colliding
        # with any start controls a restart emitted there.  They drain
        # as a fresh marked batch on the second loop pass instead.
        mark = self.store.load_batch_mark(self.identifier)
        while pending:
            # No checkpoint match required: the drain mark's identity is
            # its file list (store-scoped), so a restarted task with a
            # fresh default checkpoint still replays the interrupted
            # drain instead of re-emitting its files under new seqs.
            if (
                mark is not None
                and mark.get("batch_id") == -1
                and set(mark.get("drain_files") or []) <= set(pending)
            ):
                self._replay_drain(mark)
                drained = set(self.store.load_drained(self.identifier))
            else:
                if (
                    mark is not None
                    and int(mark.get("batch_id", -1)) >= 0
                    and mark.get("checkpoint") == self.checkpoint_dir
                ):
                    # Converse of the stream-side guard below: saving
                    # the drain mark here would clobber an unresolved
                    # STREAMING batch mark left by a crash mid-batch —
                    # its rewind info (versions/offset/stats) would be
                    # lost, and the drain would re-read the stream-
                    # consumed files (never in the drained ledger),
                    # re-emitting their events under new seqs.
                    raise RuntimeError(
                        "drain requested while an unresolved streaming "
                        "batch mark is pending — restart the stream so "
                        "its checkpoint replays the interrupted batch "
                        "before draining"
                    )
                batch_files = pending
                self.store.save_batch_mark(
                    self.identifier,
                    -1,
                    self._seq_offset,
                    self.stats.to_mapping(),
                    checkpoint=self.checkpoint_dir,
                    drain_files=batch_files,
                )
                lines = read_cdc_lines(
                    self.spark, self.cdc_dir, paths=batch_files
                )
                self._process_batch(lines, batch_id=-1)
                drained |= set(batch_files)
                self.store.save_drained(self.identifier, sorted(drained))
                self.store.clear_batch_mark(self.identifier)
            mark = None
            pending = [p for p in pending if p not in drained]

    def _replay_drain(self, mark) -> None:
        """Re-run an interrupted drain from its mark: rewind to the
        recorded pre-drain state, re-process EXACTLY the marked files
        under the SAME seq range (never a superset — later files drain
        as a fresh marked batch), then record them drained."""
        batch_files = sorted(mark["drain_files"])
        self._seq_offset = mark["offset"]
        self.stats = StatsAccumulator.from_mapping(mark["stats"])
        self.store.rewind_versions(
            mark["versions"], owned=self._owned_table_names()
        )
        lines = read_cdc_lines(self.spark, self.cdc_dir, paths=batch_files)
        self._process_batch(lines, batch_id=-1)
        # Same floor the streaming replay applies: a restart after the
        # interrupted drain's save_seq emits start controls ABOVE the
        # drained range (folded into the mark as restart_seq_high);
        # the next allocation must land past them, never inside.
        floor = int(mark.get("restart_seq_high") or 0)
        if floor > self._seq_offset:
            self._seq_offset = floor
            self.store.save_seq(self.identifier, self._seq_offset)
        drained = set(self.store.load_drained(self.identifier)) | set(
            batch_files
        )
        self.store.save_drained(self.identifier, sorted(drained))
        self.store.clear_batch_mark(self.identifier)

    def _maybe_replay_interrupted_drain(self) -> None:
        """Resolve a surviving interrupted-drain mark at start():
        either replay it (files still present, not yet in the drained
        ledger) or clear a mark that survived a crash between
        save_drained and clear_batch_mark."""
        import os as _os

        mark = self.store.load_batch_mark(self.identifier)
        if mark is None or mark.get("batch_id") != -1:
            return
        files = sorted(mark.get("drain_files") or [])
        drained = set(self.store.load_drained(self.identifier))
        if not files or set(files) <= drained:
            self.store.clear_batch_mark(self.identifier)
            return
        if all(_os.path.exists(f) for f in files):
            self._replay_drain(mark)

    # -- internals -----------------------------------------------------

    def _owned_table_names(self) -> list[str]:
        """Store keys this task writes: its selected tables plus the
        exceptions side-table.  A replay rewind is restricted to these —
        versions advanced by other writers sharing the store root are
        left untouched."""
        return [t.qualified_name for t in self.catalog] + [EXCEPTIONS_TABLE]

    def _emit_or_defer_start_controls(self) -> None:
        """Emit start-of-task control events now — unless an in-flight
        batch mark shows its post-emit ``save_seq`` never landed
        (``mark.offset == load_seq``).  In that case the batch will
        REPLAY and re-emit its events starting exactly at the loaded
        offset, so allocating control seqs here would land INSIDE the
        replayed range — distinct events with duplicate seqs, defeating
        downstream idempotent dedup.  Defer emission until the batch
        resolves; ``_process_batch`` flushes at batch end (seqs then
        continue past the replayed range) and ``stop()`` flushes if no
        batch ever arrives."""
        mark = self.store.load_batch_mark(self.identifier)
        if mark is not None and mark.get("offset") == self._seq_offset:
            self._pending_start_controls = True
        else:
            self._emit_start_controls()

    def _emit_start_controls(self) -> None:
        tables = list(self.catalog) + [("hr", EXCEPTIONS_TABLE)]
        # CDC target prep emits create-table per included table plus the
        # exceptions pseudo-table (README.md:84: 4 create-table events).
        controls = envelope.control_events(
            self.spark, tables, ["create-table"], event_time=self.event_time
        )
        controls = envelope.assign_global_seq(controls, "seq")
        controls = controls.withColumn("seq", F.col("seq") + F.lit(self._seq_offset))
        self.sink.write(controls)
        self.stats.add_events(controls)
        self._seq_offset += controls.count()
        self.store.save_seq(self.identifier, self._seq_offset)
        self.store.save_stats(self.identifier, self.stats.to_mapping())
        mark = self.store.load_batch_mark(self.identifier)
        if mark is not None:
            # Crash-restart with a batch still in flight: its replay
            # will rewind seq/stats to the mark, which predates THESE
            # control events.  Fold them into the mark so the rewind
            # neither re-allocates their seq range (distinct events
            # with duplicate seqs would defeat downstream idempotent
            # dedup) nor loses their stats counts.
            marked = StatsAccumulator.from_mapping(mark["stats"])
            marked.add_events(controls)
            self.store.update_batch_mark(
                self.identifier,
                stats=marked.to_mapping(),
                restart_seq_high=self._seq_offset,
            )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Files already consumed by a DRAIN must not re-enter through
        # the stream: a restart with a fresh (explicit) checkpoint
        # re-discovers every file in the directory, and without this
        # gate the drained files' events would re-emit under NEW seqs
        # and re-apply (double-counting statistics).  The ledger holds
        # paths; stream rows carry the source path as ``_file`` —
        # compare by basename (cdc file names are unique by the
        # sequence-naming contract).  The drained list is bounded by
        # the drain history; at table-format scale this gate is the
        # format's own file-level commit log.
        if batch_id >= 0 and "_file" in batch_df.columns:
            import os as _os

            drained_names = [
                _os.path.basename(p)
                for p in self.store.load_drained(self.identifier)
            ]
            if drained_names:
                batch_df = batch_df.filter(
                    ~F.element_at(
                        F.split(F.col("_file"), "/"), -1
                    ).isin(drained_names)
                )
        # ONE action materializes the persisted parse AND answers every
        # head question: any rows? any ALTERs? how many rows per
        # catalog table? any unroutable rows?  The former separate
        # batch_df.take(1) + alters.take(1) + per-table changes.take(1)
        # + exceptions.take(1) probes each cost an extra Spark job per
        # micro-batch; the per-table predicates here mirror
        # route_changes exactly (same non-ALTER filter, same null-safe
        # known/unknown complement) so a zero count is a safe skip.
        parsed = parse_cdc_lines(batch_df).persist()
        non_alter = F.col("op") != F.lit("ALTER")
        head_aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("op") == F.lit("ALTER"), F.lit(1))).alias(
                "n_alters"
            ),
            # a file matching cdc*.csv but not cdc<digits>.csv yields
            # NULL file_seq -> NULL line seqs that would sort first and
            # interleave arbitrarily; that is an operational error the
            # batch must fail LOUDLY on, not apply out of order
            F.count(F.when(F.col("seq").isNull(), F.lit(1))).alias(
                "n_null_seq"
            ),
        ]
        known_pred = F.lit(False)
        for i, t in enumerate(self.catalog):
            match = (F.col("schema_name") == t.owner) & (
                F.col("table_name") == t.name
            )
            known_pred = known_pred | match
            head_aggs.append(
                F.count(F.when(non_alter & match, F.lit(1))).alias(f"_t{i}")
            )
        head_aggs.append(
            F.count(
                F.when(
                    non_alter & ~F.coalesce(known_pred, F.lit(False)),
                    F.lit(1),
                )
            ).alias("n_unknown")
        )
        head = parsed.agg(*head_aggs).collect()[0]
        if head["n_rows"] == 0:
            parsed.unpersist()
            return
        if head["n_null_seq"] > 0:
            parsed.unpersist()
            raise ValueError(
                f"{head['n_null_seq']} CDC line(s) carry a NULL seq: "
                "change files must be named cdc<digits>.csv (a file "
                "matching the cdc*.csv glob but not the sequence "
                "pattern cannot be ordered)"
            )
        # Floor for the post-batch seq high-water: a crash-restart's
        # start-control events may already hold seqs ABOVE the rewound
        # range (folded into the mark as restart_seq_high) — the next
        # batch must allocate past them, never inside them.  This floor
        # covers only controls emitted AFTER the batch's save_seq landed;
        # the crash-BEFORE-save_seq window (controls would allocate
        # inside the range the replay then reuses) is closed upstream by
        # _emit_or_defer_start_controls, which postpones control
        # emission until the in-flight batch resolves.
        replay_seq_floor = 0
        if batch_id >= 0:  # streaming path (process_available passes -1)
            mark = self.store.load_batch_mark(self.identifier)
            if (
                mark is not None
                and mark["batch_id"] == batch_id
                and mark.get("checkpoint") == self.checkpoint_dir
            ):
                # Replay of a batch whose post-emit save_seq may already
                # have landed (crash before checkpoint commit): rewind to
                # the recorded pre-batch offset, stats, and state-version
                # pointers so re-emission reuses the SAME seq range and
                # re-derives the same state — idempotent downstream.
                # (The mark's stats already include any restart-control
                # counts via update_batch_mark in _emit_start_controls.)
                self._seq_offset = mark["offset"]
                self.stats = StatsAccumulator.from_mapping(mark["stats"])
                self.store.rewind_versions(
                    mark["versions"], owned=self._owned_table_names()
                )
                replay_seq_floor = int(mark.get("restart_seq_high") or 0)
            else:
                if mark is not None and mark.get("batch_id") == -1:
                    drained = set(self.store.load_drained(self.identifier))
                    if not set(mark.get("drain_files") or []) <= drained:
                        # defense in depth: start() replays unresolved
                        # drain marks before streaming; clobbering one
                        # here would re-emit its files under new seqs
                        raise RuntimeError(
                            "stream batch arrived while an interrupted "
                            "drain mark is unresolved — do not mix "
                            "drain and stream processing mid-flight"
                        )
                self.store.save_batch_mark(
                    self.identifier,
                    batch_id,
                    self._seq_offset,
                    self.stats.to_mapping(),
                    checkpoint=self.checkpoint_dir,
                )
        # Table-alter DDL (include_table_alter_operations=True,
        # stack.py:124): ``ALTER,<table>,<schema>,<alter-op>[,detail]``
        # lines become control events at their stream position; they
        # never reach the data-apply path.
        is_alter = F.col("op") == F.lit("ALTER")
        alters = parsed.filter(is_alter)
        routed, unknown = route_changes(parsed.filter(~is_alter), self.catalog)

        event_frames: list[DataFrame] = []
        exception_frames: list[DataFrame] = []
        apply_results = []
        # True iff the exceptions union below is known non-empty —
        # derived from counts already collected (head aggregate +
        # per-table apply counts), replacing the exceptions.take(1)
        # probe job.  ALTER batches pay one small count() on the
        # alters-derived split; they are rare by construction.
        any_exceptions = int(head["n_unknown"]) > 0

        if head["n_alters"] > 0:
            supported, alter_exceptions = split_alter_rows(
                alters, self.catalog, self.identifier
            )
            event_frames.append(
                envelope.alter_control_events(
                    supported, event_time=self.event_time
                )
            )
            exception_frames.append(alter_exceptions)
            any_exceptions = any_exceptions or alter_exceptions.count() > 0

        for i, (table, changes) in enumerate(routed.items()):
            if int(head[f"_t{i}"]) == 0:
                continue
            changes = changes.persist()
            # Data events: one per change row, operation lowercased
            # (O15).  The original (file_seq, line) seq passes through
            # UNCHANGED (O21): it is the global order across tables, so
            # the post-union assign_global_seq reproduces the exact
            # cross-table interleaving of the reference's 1-shard
            # stream (a table-local renumber here would sort every
            # table's event #1 before any table's event #2).
            events = envelope.data_events(
                changes,
                table,
                F.lower(F.col("op")),
                event_time=self.event_time,
                seq_col="seq",
            )
            event_frames.append(events)

            # Apply to target state (O24) + collect apply exceptions.
            current = self.store.read(self.spark, table)
            result = apply_changes(self.spark, table, current, changes)
            apply_results.append(result)
            self.store.write(table.qualified_name, result.new_state)
            counts_row = result.counts.collect()[0]
            self.stats.add_apply_counts(table.owner, table.name, counts_row)
            any_exceptions = (
                any_exceptions
                or (counts_row["exceptions"] or 0) > 0
                or (counts_row["unkeyed_exceptions"] or 0) > 0
            )
            exception_frames.append(
                result.exceptions.select(
                    F.lit(self.identifier).alias("TASK_NAME"),
                    F.lit(table.owner).alias("TABLE_OWNER"),
                    F.lit(table.name).alias("TABLE_NAME"),
                    F.col("seq").alias("ERROR_SEQ"),
                    F.col("op").alias("OPERATION"),
                    F.col("error").alias("ERROR"),
                )
            )
            changes.unpersist()

        # Unknown (schema, table) rows: exceptions channel only (O25).
        exception_frames.append(
            unknown.select(
                F.lit(self.identifier).alias("TASK_NAME"),
                F.col("schema_name").alias("TABLE_OWNER"),
                F.col("table_name").alias("TABLE_NAME"),
                F.col("seq").alias("ERROR_SEQ"),
                F.col("op").alias("OPERATION"),
                F.lit("table-not-in-selection").alias("ERROR"),
            )
        )

        if any_exceptions:
            exceptions = union_all(exception_frames)
            existing = self.store.read_by_name(
                self.spark, EXCEPTIONS_TABLE, EXCEPTIONS_SCHEMA
            )
            self.store.write(
                EXCEPTIONS_TABLE, existing.unionByName(exceptions)
            )

        # Emit to the event stream LAST: once a batch's events are
        # visible in the sink, its state/exceptions writes are complete
        # — consumers (and graceful stop) can rely on that ordering.
        if event_frames:
            events = union_all(event_frames)
            events = envelope.assign_global_seq(events, "seq")
            events = events.withColumn("seq", F.col("seq") + F.lit(self._seq_offset))
            # one computation for the sink write, the stats pass and
            # the seq advance — unpersisted the batch re-runs the whole
            # union + global-seq window three times (and the window
            # over a recomputed union is the kind of thing that should
            # never be given a second chance to differ)
            events = events.persist()
            self.sink.write(events)
            self.stats.add_events(events)
            self._seq_offset += events.count()
            events.unpersist()
        # On replay, jump past any seqs the restart's control events
        # already consumed (replay_seq_floor ≥ rewound offset + batch).
        self._seq_offset = max(self._seq_offset, replay_seq_floor)
        self.store.save_seq(self.identifier, self._seq_offset)
        self.store.save_stats(self.identifier, self.stats.to_mapping())
        # Start controls deferred at start() because this batch might
        # replay into the loaded seq range: the range is resolved now, so
        # the controls allocate strictly past it — no seq collision.
        if self._pending_start_controls:
            self._pending_start_controls = False
            self._emit_start_controls()
        # Release per-table fold caches only after the exceptions union
        # and event emission above have materialized every consumer —
        # a streaming task would otherwise accumulate one cached frame
        # per table per micro-batch for its whole lifetime.
        for r in apply_results:
            r.unpersist()
        parsed.unpersist()

    def exceptions_table(self) -> DataFrame:
        return self.store.read_by_name(self.spark, EXCEPTIONS_TABLE, EXCEPTIONS_SCHEMA)

    def table_state(self, table: TableDef) -> DataFrame:
        return self.store.read(self.spark, table)
