"""O17/O19: per-(schema, table) replication statistics.

Reference parity: ``describe_table_statistics`` shape + sort order —
/root/reference/run.py:141-148 (sorted by (SchemaName, TableName) at
run.py:145-147); golden compositions README.md:77 (full load) and
README.md:84 (CDC).  Field names follow the public DMS
``TableStatistics`` API surface.

Two forms:
- :func:`table_statistics` — declarative conditional aggregation over an
  event log (map-side partial aggregation; one shuffle on the tiny
  (schema, table) key space).
- :class:`StatsAccumulator` — incremental driver-side accumulation for
  streaming ``foreachBatch`` (the per-batch aggregate collapses to
  #tables rows before collect, so driver traffic is O(#tables), not
  O(rows), at any scale).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_COLUMNS = [
    "SchemaName",
    "TableName",
    "FullLoadRows",
    "Inserts",
    "Updates",
    "Deletes",
    "Ddls",
    "AppliedInserts",
    "AppliedUpdates",
    "AppliedDeletes",
    "ApplyExceptions",
]


def _op_count(op: str):
    return F.sum(F.when(F.col("operation") == op, 1).otherwise(0)).cast("long")


def table_statistics(events: DataFrame) -> DataFrame:
    """Aggregate an event log (canonical EVENT_COLUMNS frame) into DMS
    TableStatistics rows, sorted by (SchemaName, TableName)."""
    return (
        events.groupBy(
            F.col("schema_name").alias("SchemaName"),
            F.col("table_name").alias("TableName"),
        )
        .agg(
            _op_count("load").alias("FullLoadRows"),
            _op_count("insert").alias("Inserts"),
            _op_count("update").alias("Updates"),
            _op_count("delete").alias("Deletes"),
            F.sum(F.when(F.col("record_type") == "control", 1).otherwise(0))
            .cast("long")
            .alias("Ddls"),
        )
        .orderBy("SchemaName", "TableName")
    )


@dataclass
class _Counters:
    full_load_rows: int = 0
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    ddls: int = 0
    applied_inserts: int = 0
    applied_updates: int = 0
    applied_deletes: int = 0
    apply_exceptions: int = 0


class StatsAccumulator:
    """Incremental stats over micro-batches.  ``add_events`` ingests the
    batch's event-log aggregate; ``add_apply_counts`` folds in the apply
    outcome (applied vs exception) from :func:`apply.apply_changes`."""

    def __init__(self) -> None:
        self._stats: dict[tuple[str, str], _Counters] = defaultdict(_Counters)

    def add_events(self, events: DataFrame) -> None:
        rows = (
            events.groupBy("schema_name", "table_name", "record_type", "operation")
            .count()
            .collect()
        )
        for r in rows:
            c = self._stats[(r["schema_name"], r["table_name"])]
            if r["record_type"] == "control":
                c.ddls += r["count"]
            elif r["operation"] == "load":
                c.full_load_rows += r["count"]
            elif r["operation"] == "insert":
                c.inserts += r["count"]
            elif r["operation"] == "update":
                c.updates += r["count"]
            elif r["operation"] == "delete":
                c.deletes += r["count"]

    def add_apply_counts(
        self, schema_name: str, table_name: str, counts_row
    ) -> None:
        c = self._stats[(schema_name, table_name)]
        c.apply_exceptions += counts_row["exceptions"] or 0
        # Applied* exclude excepted ops (DMS TableStatistics semantics):
        # the fold tracks per-op exception counters, so an excepted op
        # counts in ApplyExceptions only, never in Applied*.
        row = counts_row.asDict() if hasattr(counts_row, "asDict") else dict(counts_row)
        c.applied_inserts += row.get("applied_inserts", row.get("inserts", 0)) or 0
        c.applied_updates += row.get("applied_updates", row.get("updates", 0)) or 0
        c.applied_deletes += row.get("applied_deletes", row.get("deletes", 0)) or 0

    # -- persistence ---------------------------------------------------
    # DMS's describe_table_statistics survives instance restarts; the
    # accumulator serializes to a plain mapping so CdcTask can persist
    # it next to the target store and reload on construction.

    def to_mapping(self) -> dict[str, dict[str, int]]:
        return {
            f"{schema}.{table}": vars(c).copy()
            for (schema, table), c in self._stats.items()
        }

    @classmethod
    def from_mapping(cls, data: dict[str, dict[str, int]]) -> "StatsAccumulator":
        acc = cls()
        known = set(vars(_Counters()))
        for key, fields in data.items():
            # rpartition: the TABLE name follows the LAST dot, so a
            # dotted schema ('hr.eu') round-trips; unknown counter
            # fields from a newer format are dropped instead of
            # raising TypeError and bricking task construction
            schema, _, table = key.rpartition(".")
            acc._stats[(schema, table)] = _Counters(
                **{k: v for k, v in fields.items() if k in known}
            )
        return acc

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                schema,
                table,
                c.full_load_rows,
                c.inserts,
                c.updates,
                c.deletes,
                c.ddls,
                c.applied_inserts,
                c.applied_updates,
                c.applied_deletes,
                c.apply_exceptions,
            )
            for (schema, table), c in sorted(self._stats.items())
        ]
        schema = ", ".join(
            f"{name} {'string' if i < 2 else 'long'}"
            for i, name in enumerate(STATS_COLUMNS)
        )
        return spark.createDataFrame(rows, schema)
