"""O24/O25: CDC apply — latest-wins merge into keyed target tables plus
the ``awsdms_apply_exceptions`` side-channel.

Reference parity:
- PKs declared via ``ColumnIsPk: "true"`` (stack.py:139,152,162).
- net state after lib/query.py:16-19 (INSERT→UPDATE→UPDATE→DELETE of PK
  101) is "row absent"; update/delete of non-existent rows must not fail
  but surface as exceptions (lib/query.py:25 deletes department 301
  which was never inserted) — README.md:84's 15th CDC event is the
  ``awsdms_apply_exceptions`` create-table control record.

Semantics (DMS-shaped):
- INSERT  → upsert; inserting over an existing PK applies (replace) but
  records an exception.
- UPDATE  → replace iff the PK exists, else no-op + exception.
- DELETE  → remove iff the PK exists, else no-op + exception.
- ops for one PK apply strictly in ``seq`` order *through* intermediate
  states (an INSERT→DELETE inside one batch nets to absent with no
  exception — pure last-writer-wins compaction would get this wrong).

Implementation: per PK we ``collect_list(struct(seq, op, row))``,
``sort_array`` (sorts by leading ``seq``), and fold with
``F.aggregate`` — an ordered per-key reduce expressed entirely in
Catalyst expressions, so the whole merge is one shuffle on the PK and
stays JVM-side with no Python in the row path.  Per-PK op lists are
small (bounded by batch size), so the fold state is tiny.

Scale notes: this is the classic "CDC compaction then MERGE" shape. The
single shuffle is on the PK — the same key the target table would be
bucketed/clustered on, so on a real deployment (Delta/Iceberg MERGE)
the co-location is free. Skewed hot keys are bounded by micro-batch
size; AQE skew-join handles the store-side join.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.catalog import TableDef

# Result of applying one batch of changes to one table.
@dataclass
class ApplyResult:
    table: TableDef
    new_state: DataFrame          # full post-apply table contents
    exceptions: DataFrame         # seq, op, error for failed applies
    counts: DataFrame             # single row: inserts, updates, deletes, applied_*, exceptions
    cached: DataFrame | None = None  # persisted fold frame shared by the
    # three outputs; callers MUST unpersist() it once new_state /
    # exceptions / counts are materialized (a long-running streaming
    # task would otherwise leak one cached frame per table per batch)

    def unpersist(self) -> None:
        if self.cached is not None:
            self.cached.unpersist()


def _fold_merge(ops_col: Column, init: Column) -> Column:
    """Ordered fold over one PK's ops.  State:
    (exists, row, ins, upd, del, exc, exc_ins, exc_upd, exc_del,
    exc_seqs).  Per-op exception counters let Applied* report only ops
    that actually applied — DMS TableStatistics applied counters
    exclude excepted operations (e.g. a DELETE of a never-inserted row
    counts in ApplyExceptions, not AppliedDeletes)."""

    def step(state: Column, x: Column) -> Column:
        is_ins = x["op"] == F.lit("INSERT")
        is_upd = x["op"] == F.lit("UPDATE")
        is_del = x["op"] == F.lit("DELETE")
        # an op outside the DMS trio (null-safe: a NULL op is unknown
        # too) is an exception — it used to vanish from state, counts,
        # AND exc_seqs, violating the surface-as-exceptions contract
        is_unknown = ~F.coalesce(is_ins | is_upd | is_del, F.lit(False))
        exists = state["exists"]
        is_exc = (
            (is_ins & exists)
            | (is_upd & ~exists)
            | (is_del & ~exists)
            | is_unknown
        )
        new_exists = F.when(is_del, F.lit(False)).otherwise(
            F.when(is_ins | is_upd, F.lit(True)).otherwise(exists)
        )
        # UPDATE of a missing row does NOT create it (exception instead).
        new_exists = F.when(is_upd & ~exists, F.lit(False)).otherwise(new_exists)
        new_row = (
            F.when(is_ins | (is_upd & exists), x["row"]).otherwise(state["row"])
        )
        return F.struct(
            new_exists.alias("exists"),
            new_row.alias("row"),
            (state["ins"] + is_ins.cast("long")).alias("ins"),
            (state["upd"] + is_upd.cast("long")).alias("upd"),
            (state["del"] + is_del.cast("long")).alias("del"),
            (state["exc"] + is_exc.cast("long")).alias("exc"),
            (state["exc_ins"] + (is_ins & is_exc).cast("long")).alias("exc_ins"),
            (state["exc_upd"] + (is_upd & is_exc).cast("long")).alias("exc_upd"),
            (state["exc_del"] + (is_del & is_exc).cast("long")).alias("exc_del"),
            F.when(
                is_exc, F.array_append(state["exc_seqs"], F.struct(x["seq"], x["op"]))
            )
            .otherwise(state["exc_seqs"])
            .alias("exc_seqs"),
        )

    return F.aggregate(ops_col, init, step)


def apply_changes(
    spark: SparkSession,
    table: TableDef,
    current: DataFrame,
    changes: DataFrame,
) -> ApplyResult:
    """Merge ``changes`` (columns: seq, op, <table columns>) into
    ``current`` (the table's present contents, typed with
    ``table.schema``), latest-wins in ``seq`` order (O24)."""
    pk = table.pk_columns
    if not pk:
        raise ValueError(f"table {table.qualified_name} has no primary key")
    data_cols = table.column_names

    # Rows whose PK failed to parse can't be keyed — straight to exceptions.
    pk_null = F.lit(False)
    for c in pk:
        pk_null = pk_null | F.col(c).isNull()
    unkeyed = changes.filter(pk_null).select(
        "seq", "op", F.lit("unparseable-primary-key").alias("error")
    )
    keyed = changes.filter(~pk_null)

    ops_per_pk = keyed.groupBy(*pk).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("seq"),
                    F.col("op"),
                    F.struct(*[F.col(c) for c in data_cols]).alias("row"),
                )
            )
        ).alias("ops")
    )

    cur = current.select(
        *[F.col(c).alias(f"_cur_{c}") for c in pk],
        F.struct(*[F.col(c) for c in data_cols]).alias("_cur_row"),
    )
    joined = cur.join(
        ops_per_pk,
        on=[F.col(f"_cur_{c}") == F.col(c) for c in pk],
        how="full_outer",
    )

    exc_seq_type = "array<struct<seq:long,op:string>>"
    init = F.struct(
        F.col("_cur_row").isNotNull().alias("exists"),
        F.col("_cur_row").alias("row"),
        F.lit(0).cast("long").alias("ins"),
        F.lit(0).cast("long").alias("upd"),
        F.lit(0).cast("long").alias("del"),
        F.lit(0).cast("long").alias("exc"),
        F.lit(0).cast("long").alias("exc_ins"),
        F.lit(0).cast("long").alias("exc_upd"),
        F.lit(0).cast("long").alias("exc_del"),
        F.array().cast(exc_seq_type).alias("exc_seqs"),
    )

    folded = joined.select(
        F.when(F.col("ops").isNull(), init)
        .otherwise(_fold_merge(F.col("ops"), init))
        .alias("s")
    )
    folded = folded.persist()

    new_state = folded.filter(F.col("s.exists")).select(
        *[F.col(f"s.row.{c}").alias(c) for c in data_cols]
    )
    apply_exceptions = folded.select(
        F.explode(F.col("s.exc_seqs")).alias("e")
    ).select(
        F.col("e.seq").alias("seq"),
        F.col("e.op").alias("op"),
        F.lit("row-not-found-or-duplicate-key").alias("error"),
    )
    exceptions = apply_exceptions.unionByName(unkeyed)
    counts = (
        folded.agg(
            F.sum("s.ins").alias("inserts"),
            F.sum("s.upd").alias("updates"),
            F.sum("s.del").alias("deletes"),
            F.sum("s.exc").alias("exceptions"),
            # Applied* exclude excepted ops (DMS TableStatistics
            # semantics).
            F.sum(F.col("s.ins") - F.col("s.exc_ins")).alias(
                "applied_inserts"
            ),
            F.sum(F.col("s.upd") - F.col("s.exc_upd")).alias(
                "applied_updates"
            ),
            F.sum(F.col("s.del") - F.col("s.exc_del")).alias(
                "applied_deletes"
            ),
        )
        # 1-row × 1-row: collecting counts answers "did this table
        # produce ANY exception row (applied or unparseable-PK)?" in
        # the same single action — CdcTask uses it to skip the
        # exceptions-table merge without a take(1) probe per batch.
        .crossJoin(
            unkeyed.agg(
                F.count(F.lit(1)).cast("long").alias("unkeyed_exceptions")
            )
        )
        .na.fill(0)
    )
    return ApplyResult(
        table=table,
        new_state=new_state,
        exceptions=exceptions,
        counts=counts,
        cached=folded,
    )


class ParquetTargetStore:
    """Materialized target tables as versioned parquet directories with
    copy-on-write swaps — the local stand-in for a Delta/Iceberg MERGE
    target.  Each ``apply_changes`` output is written to a fresh
    ``v{N}`` dir and the pointer advances; readers always see a complete
    consistent version.  At 100 TB you would replace this class with
    ``MERGE INTO`` on a table format; the engine's apply logic is
    unchanged (same compacted upsert frame)."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")
        self._versions: dict[str, int] = self._load_versions()
        # Keys THIS instance has written or rewound.  The merge-on-save
        # overlays only these onto the on-disk map: overlaying the whole
        # snapshot would resurrect pointers another live instance
        # deleted and regress ones it advanced after our load.
        self._dirty: set[str] = set()

    def _versions_file(self) -> str:
        return f"{self.root}/_VERSIONS.json"

    def _load_versions(self) -> dict[str, int]:
        """Version pointers survive process restarts (a resumed CDC task
        constructs a fresh store over the same root and must see the
        state its predecessor applied — the local analog of a table
        format's transaction log)."""
        import json
        import os

        try:
            with open(self._versions_file()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            return {}

    def _save_versions(self) -> None:
        import json
        import os

        os.makedirs(self.root, exist_ok=True)
        # merge-on-save under an advisory lock: reload the on-disk map
        # and overlay ONLY the keys this instance has touched
        # (``self._dirty``) — a concurrent writer sharing the store
        # root (the case rewind_versions explicitly supports) would
        # otherwise have its pointers erased (or deleted ones
        # resurrected, or advanced ones regressed) by our stale
        # snapshot; without the lock two writers could still interleave
        # load/replace and lose each other's pointers.  A dirty key
        # absent from ``self._versions`` is a deliberate deletion (a
        # rewind's reset-to-absent) and is removed from disk.  A
        # single-host flock is the right scope for this local parquet
        # stand-in; a table format's transaction log replaces it at
        # scale.
        lock_path = self._versions_file() + ".lock"
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            try:
                import fcntl

                fcntl.flock(lock_fd, fcntl.LOCK_EX)
            except (ImportError, OSError):
                # non-POSIX or a filesystem without flock (e.g. some
                # network mounts): best-effort, no lock
                pass
            on_disk: dict = {}
            if os.path.exists(self._versions_file()):
                try:
                    with open(self._versions_file()) as f:
                        on_disk = json.load(f)
                except (OSError, ValueError):
                    # unreadable (NOT merely absent) file: fall back to
                    # this instance's snapshot as the floor — with the
                    # dirty-only overlay, an empty fallback would
                    # silently DELETE every pointer this instance never
                    # touched (a concurrent writer's advance may regress
                    # in this rare window, but nothing vanishes)
                    on_disk = dict(self._versions)
            merged = dict(on_disk)
            for name in self._dirty:
                if name in self._versions:
                    merged[name] = self._versions[name]
                else:
                    merged.pop(name, None)
            tmp = self._versions_file() + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(merged, f)
            os.replace(tmp, self._versions_file())
        finally:
            os.close(lock_fd)

    def _dir(self, name: str, version: int) -> str:
        return f"{self.root}/{name}/v{version:06d}"

    def read(self, spark: SparkSession, table: TableDef) -> DataFrame:
        v = self._versions.get(table.qualified_name)
        if v is None:
            return spark.createDataFrame([], table.schema)
        return spark.read.schema(table.schema).parquet(
            self._dir(table.qualified_name, v)
        )

    def write(self, table_name: str, df: DataFrame) -> None:
        v = self._versions.get(table_name, 0) + 1
        df.write.mode("overwrite").parquet(self._dir(table_name, v))
        self._versions[table_name] = v
        self._dirty.add(table_name)
        self._save_versions()

    def read_by_name(
        self, spark: SparkSession, table_name: str, schema: T.StructType
    ) -> DataFrame:
        v = self._versions.get(table_name)
        if v is None:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(self._dir(table_name, v))

    # -- time travel ---------------------------------------------------
    # Every write lands in its own v-dir and only the POINTER advances,
    # so superseded versions stay readable — the local analog of a
    # table format's snapshot history (at scale the version dirs are
    # the format's snapshots and vacuum policy decides retention).

    def table_history(self, table_name: str) -> list[int]:
        """Version numbers present on disk for ``table_name``,
        ascending.  The current pointer is ``max`` unless a rewind
        moved it back; versions above the pointer are superseded
        replay leftovers and still listed (they exist on disk)."""
        import os
        import re

        root = f"{self.root}/{table_name}"
        if not os.path.isdir(root):
            return []
        out = []
        for name in os.listdir(root):
            # :06d is a MINIMUM width — version 1,000,000 writes
            # v1000000 (7 digits), so match any digit run
            m = re.fullmatch(r"v(\d+)", name)
            if m and os.path.isdir(os.path.join(root, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def read_version(
        self,
        spark: SparkSession,
        table: TableDef,
        version: int,
    ) -> DataFrame:
        """The table's state AS OF ``version`` (time travel).  Raises
        on a version that never landed — a silent empty frame would
        read as 'the table was empty then', which is a different
        fact."""
        if version not in self.table_history(table.qualified_name):
            raise ValueError(
                f"version {version} of {table.qualified_name} does not "
                f"exist; on disk: {self.table_history(table.qualified_name)}"
            )
        return spark.read.schema(table.schema).parquet(
            self._dir(table.qualified_name, version)
        )

    # -- sequence high-water marks ------------------------------------
    # The emitted event seq must survive task restarts: the documented
    # recovery path (checkpointLocation) rebuilds the task object, and a
    # seq restarting at 0 would reuse values already emitted for other
    # events — downstream idempotent dedup would then DROP distinct
    # events.  The mark lives next to _VERSIONS.json so state and seq
    # recover from the same root.

    def _sidecar_load(self, path: str) -> dict:
        import json

        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _sidecar_save(self, path: str, data: dict) -> None:
        import json
        import os

        os.makedirs(self.root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    def _seq_file(self) -> str:
        return f"{self.root}/_SEQ.json"

    def load_seq(self, task_id: str) -> int:
        return int(self._sidecar_load(self._seq_file()).get(task_id, 0))

    def save_seq(self, task_id: str, value: int) -> None:
        marks = self._sidecar_load(self._seq_file())
        marks[task_id] = int(value)
        self._sidecar_save(self._seq_file(), marks)

    # Batch replay marks: foreachBatch offers at-least-once delivery, so
    # a crash between save_seq and the streaming checkpoint commit makes
    # Spark REPLAY the batch.  Without a mark the replay would re-emit
    # the same events under new, higher seqs — duplicates with DISTINCT
    # seqs, which seq-keyed idempotent dedup downstream cannot drop.
    # Recording (batch_id, pre-batch seq offset, pre-batch stats, and
    # the pre-batch VERSION POINTERS — copy-on-write means the old v-dirs
    # are still on disk) lets a replayed batch rewind completely and
    # re-produce the identical seq range and state transitions.

    def load_batch_mark(self, task_id: str) -> dict | None:
        return self._sidecar_load(self._seq_file()).get(f"{task_id}#batch")

    def save_batch_mark(
        self,
        task_id: str,
        batch_id: int,
        offset: int,
        stats: dict,
        *,
        checkpoint: str | None = None,
        drain_files: list[str] | None = None,
    ) -> None:
        marks = self._sidecar_load(self._seq_file())
        mark = {
            "batch_id": int(batch_id),
            "offset": int(offset),
            "stats": stats,
            "versions": dict(self._versions),
            # The owning checkpoint: replay detection must only fire for
            # a genuine Structured Streaming replay of the SAME
            # checkpoint — a fresh checkpoint restarts batch numbering
            # at 0 and could otherwise spuriously match a stale mark.
            "checkpoint": checkpoint,
        }
        if drain_files is not None:
            # batch_id=-1 drain marks: the file list is the batch's
            # identity (drains have no checkpoint-issued batch number)
            mark["drain_files"] = sorted(drain_files)
        marks[f"{task_id}#batch"] = mark
        self._sidecar_save(self._seq_file(), marks)

    def update_batch_mark(self, task_id: str, **fields) -> None:
        """Merge fields into an existing batch mark (no-op if absent).
        Used by a crash-restarted task to fold its start-control seq
        range and stats into the pending mark before the replay."""
        marks = self._sidecar_load(self._seq_file())
        key = f"{task_id}#batch"
        if key in marks:
            marks[key].update(fields)
            self._sidecar_save(self._seq_file(), marks)

    def clear_batch_mark(self, task_id: str) -> None:
        marks = self._sidecar_load(self._seq_file())
        if marks.pop(f"{task_id}#batch", None) is not None:
            self._sidecar_save(self._seq_file(), marks)

    def rewind_versions(
        self,
        versions: Mapping[str, int],
        owned: Iterable[str] | None = None,
    ) -> None:
        """Reset table-version pointers to a batch mark's snapshot
        (replay path).  The superseded v-dirs are simply re-written.

        ``owned`` restricts the rewind to the replaying task's own
        tables: a version advanced by ANOTHER writer sharing the store
        root between mark save and replay must not be rolled back with
        them.  A table the task owns that is absent from the snapshot
        (created mid-batch) is reset to absent."""
        if owned is None:
            # every key of old ∪ new is touched: keys reset to absent
            # become dirty-deletions the merge-on-save removes on disk
            self._dirty.update(self._versions)
            self._dirty.update(versions)
            self._versions = {k: int(v) for k, v in versions.items()}
        else:
            for name in owned:
                if name in versions:
                    self._versions[name] = int(versions[name])
                else:
                    self._versions.pop(name, None)
                self._dirty.add(name)
        self._save_versions()

    # -- replication statistics ---------------------------------------
    # describe_table_statistics must survive restarts like the seq mark
    # (a resumed task reports cumulative counters, not batch-local ones).

    def _stats_file(self) -> str:
        return f"{self.root}/_STATS.json"

    # drained-files ledger: CdcTask.process_available consumes files
    # exactly once across repeated drains (re-reading a consumed file
    # would re-emit its events under NEW seqs — duplicates downstream
    # seq-keyed dedup cannot drop — and re-apply its changes).

    def _drained_file(self) -> str:
        return f"{self.root}/_DRAINED.json"

    def load_drained(self, task_id: str) -> list[str]:
        return list(self._sidecar_load(self._drained_file()).get(task_id, []))

    def save_drained(self, task_id: str, files: list[str]) -> None:
        marks = self._sidecar_load(self._drained_file())
        marks[task_id] = sorted(set(files))
        self._sidecar_save(self._drained_file(), marks)

    def load_stats(self, task_id: str) -> dict:
        return self._sidecar_load(self._stats_file()).get(task_id, {})

    def save_stats(self, task_id: str, data: dict) -> None:
        all_stats = self._sidecar_load(self._stats_file())
        all_stats[task_id] = data
        self._sidecar_save(self._stats_file(), all_stats)


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Type-2 history from an ordered change stream — the
    slowly-changing-dimension extension of the type-1 latest-wins merge
    (O24, `apply_changes`): instead of keeping only each key's final
    state, every non-delete change becomes a version row with its
    validity interval.

    Input: one row per change with ``op_col``, ``key_cols``, the payload
    columns, and ``order_cols`` (the total per-key order — seq, ts).
    Output: the input's non-delete rows plus ``valid_to_<first order
    col>`` (the next change's order value, null while current) and
    ``is_current``.  A delete closes the prior version's interval and
    emits nothing — a key whose last change is a delete has no current
    row, matching the reference's delete semantics.

    One window over (key, order) — a single hash shuffle on the key,
    no self-join; history for different keys never co-locates, so this
    scales with the change volume, not the key count.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    lead_col = f"valid_to_{order_cols[0]}"
    with_lead = changes.withColumn(lead_col, F.lead(F.col(order_cols[0])).over(w))
    return (
        with_lead.filter(F.col(op_col) != F.lit(delete_op))
        .withColumn("is_current", F.col(lead_col).isNull())
    )
