"""Row → DMS-shaped JSON event transform (SURVEY §2.3, O13-O16).

Reference parity:
- ``message_format="json"`` envelope with ``data`` + ``metadata`` objects:
  /root/reference/dms_sample/stack.py:119, parsed at run.py:135.
- partition key ``"{schema}.{table}"``: stack.py:126, run.py:135 (O14).
- metadata fields pinned by the enabled Kinesis settings
  (stack.py:121-126): record-type, operation, timestamp,
  partition-key-type, partition-value, schema-name, table-name,
  transaction-id.
- nulls and empty strings retained in ``data``
  (``include_null_and_empty=True``, stack.py:122) → Spark
  ``to_json(..., ignoreNullFields=false)`` (O12).
- control records (create-table / drop-table) enabled by
  ``include_control_details=True`` (stack.py:121) (O16).

Design note (scale): the whole transform is a single ``select`` of
Catalyst expressions — ``struct``/``to_json``/``concat_ws``/``lit`` — so
it stays inside WholeStageCodegen with zero Python in the row path.
Serialization happens *per table before union*, so the unioned event log
has one homogeneous schema regardless of per-table column types.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.catalog import TableDef

# Canonical internal event-log schema. ``event_json`` is the wire payload
# (what a Kinesis record's Data would hold); the flat columns exist for
# ordering (seq), routing (partition_key) and statistics without
# re-parsing JSON.
EVENT_COLUMNS = [
    "seq",
    "partition_key",
    "schema_name",
    "table_name",
    "record_type",
    "operation",
    "event_json",
]

PARTITION_KEY_TYPE = "schema-table"  # partition_include_schema_table=True, stack.py:126

DATA_OPERATIONS = ("load", "insert", "update", "delete")
CONTROL_OPERATIONS = ("create-table", "drop-table")

# ISO-8601 with milliseconds, the format DMS stamps into metadata.timestamp.
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def partition_key(schema_col: Column, table_col: Column) -> Column:
    """O14: partition key = ``concat(schema, '.', table)`` (run.py:135)."""
    return F.concat_ws(".", schema_col, table_col)


def event_timestamp(fixed: str | None = None) -> Column:
    """Event metadata timestamp column; pass ``fixed`` to inject a
    deterministic clock in tests (SURVEY §7 'deterministic metadata')."""
    if fixed is not None:
        return F.lit(fixed)
    # render in UTC regardless of the session time zone: the format
    # appends a literal 'Z', so stamping session-local wall time would
    # claim a wrong UTC instant on any non-UTC session
    return F.date_format(
        F.to_utc_timestamp(F.current_timestamp(), F.current_timezone()),
        _TS_FORMAT,
    )


def _metadata_struct(
    *,
    record_type: Column,
    operation: Column,
    schema_name: Column,
    table_name: Column,
    event_time: Column,
    txn_id: Column,
) -> Column:
    pk = partition_key(schema_name, table_name)
    return F.struct(
        event_time.alias("timestamp"),
        record_type.alias("record-type"),
        operation.alias("operation"),
        F.lit(PARTITION_KEY_TYPE).alias("partition-key-type"),
        pk.alias("partition-value"),  # include_partition_value=True, stack.py:123
        schema_name.alias("schema-name"),
        table_name.alias("table-name"),
        txn_id.alias("transaction-id"),  # include_transaction_details=True, stack.py:125
    )


def data_events(
    df: DataFrame,
    table: TableDef,
    operation: str | Column,
    *,
    event_time: str | None = None,
    txn_id: Column | None = None,
    order_by: Sequence[Column | str] | None = None,
    seq_col: str | Column | None = None,
) -> DataFrame:
    """Wrap each row of ``df`` (typed with ``table.schema`` columns) as a
    DMS data event (O13+O15).  ``operation`` is either a literal
    ('load' for full load) or a Column (lowercased CDC op).

    ``seq_col``: pass an EXISTING total-order column through as ``seq``
    unchanged.  The CDC path must use this: its (file_seq, line) seq is
    a global order across tables, and renumbering it table-locally
    before the union would lose the cross-table interleaving the
    reference's single-shard stream preserves (department/employee/
    project changes interleave in file line order).

    ``order_by``: optional within-table ordering expressions renumbered
    into a table-LOCAL ``seq`` (O21) — only correct when a later
    :func:`assign_global_seq` orders by table-major keys, as the
    full-load path does with ``(_tbl, _kind, seq)``.
    """
    op_col = F.lit(operation) if isinstance(operation, str) else operation
    schema_name = F.lit(table.owner)
    table_name = F.lit(table.name)
    txn = txn_id if txn_id is not None else F.lit(None).cast("long")

    data_struct = F.struct(*[F.col(c.name) for c in table.columns]).alias("data")
    meta = _metadata_struct(
        record_type=F.lit("data"),
        operation=op_col,
        schema_name=schema_name,
        table_name=table_name,
        event_time=event_timestamp(event_time),
        txn_id=txn,
    ).alias("metadata")

    if seq_col is not None:
        seq = (F.col(seq_col) if isinstance(seq_col, str) else seq_col).cast("long")
    elif order_by is not None:
        w = Window.orderBy(*order_by)
        seq = F.row_number().over(w).cast("long")
    else:
        seq = F.monotonically_increasing_id()

    return df.select(
        seq.alias("seq"),
        partition_key(schema_name, table_name).alias("partition_key"),
        schema_name.alias("schema_name"),
        table_name.alias("table_name"),
        F.lit("data").alias("record_type"),
        op_col.alias("operation"),
        F.to_json(
            F.struct(data_struct, meta), {"ignoreNullFields": "false"}
        ).alias("event_json"),
    )


def control_events(
    spark: SparkSession,
    tables: Iterable[TableDef | tuple[str, str]],
    operations: Sequence[str],
    *,
    event_time: str | None = None,
) -> DataFrame:
    """O16: per-table DDL control events, in (table-order × operations)
    order.  Full-load target prep = drop-table then create-table per
    table (3+3 of the 16 golden events, run.py:170 / README.md:77);
    CDC start = create-table per table plus one for
    ``awsdms_apply_exceptions`` (4 of the 15, run.py:198 / README.md:84).

    ``tables`` accepts TableDefs or raw ``(owner, name)`` pairs (the
    exceptions pseudo-table has no TableDef).

    Control events have ``data: null`` and no transaction-id; the
    driver-side row construction is O(#tables × #ops) — negligible at
    any scale.
    """
    rows = []
    seq = 0
    for t in tables:
        owner, name = (t.owner, t.name) if isinstance(t, TableDef) else t
        for op in operations:
            seq += 1
            rows.append((seq, owner, name, op))
    df = spark.createDataFrame(
        rows, "seq long, schema_name string, table_name string, operation string"
    )
    return _control_select(df, event_time=event_time)


def _control_select(df: DataFrame, *, event_time: str | None = None) -> DataFrame:
    """Envelope projection for control records: input frame with
    ``(seq, schema_name, table_name, operation)`` → canonical event
    columns with ``data: null`` and no transaction-id."""
    meta = _metadata_struct(
        record_type=F.lit("control"),
        operation=F.col("operation"),
        schema_name=F.col("schema_name"),
        table_name=F.col("table_name"),
        event_time=event_timestamp(event_time),
        txn_id=F.lit(None).cast("long"),
    ).alias("metadata")
    data_null = F.lit(None).cast("string").alias("data")
    return df.select(
        F.col("seq"),
        partition_key(F.col("schema_name"), F.col("table_name")).alias("partition_key"),
        "schema_name",
        "table_name",
        F.lit("control").alias("record_type"),
        "operation",
        F.to_json(
            F.struct(data_null, meta), {"ignoreNullFields": "false"}
        ).alias("event_json"),
    )


ALTER_OPERATIONS = ("rename-table", "add-column", "drop-column")


def alter_control_events(
    alters: DataFrame, *, event_time: str | None = None
) -> DataFrame:
    """Table-alter control events (``include_table_alter_operations=
    True``, /root/reference/dms_sample/stack.py:124): DDL changes on the
    source are REPLICATED to the event stream as control records with
    the alter operation (rename-table / add-column / drop-column) in
    metadata, interleaved at their position in the change stream.

    Input: parsed CDC rows with ``(seq, schema_name, table_name,
    operation)`` where operation is already the lowercased alter op
    (the first payload token of an ``ALTER,...`` change line).  The
    original ``seq`` passes through so the post-union global renumber
    places the DDL exactly where it occurred relative to data changes.

    Scope note (documented boundary): the engine replicates alter DDL
    to the stream — the reference's observable contract, whose fixtures
    never exercise ALTER — but does not evolve the target table schema;
    a rename's subsequent rows route by the new name only if the
    catalog's table mappings are updated, matching DMS's static
    table-mapping behavior."""
    return _control_select(alters, event_time=event_time)


def assign_global_seq(events: DataFrame, *order_cols: Column | str) -> DataFrame:
    """Re-number ``seq`` as a dense global sequence following
    ``order_cols``.

    This reproduces the reference's single-shard total order
    (shard_count=1, stack.py:268): a 1-shard stream IS a global order,
    so *some* single-partition pass is semantically unavoidable.  The
    events here are envelope strings (small), and the window runs after
    all heavy per-table work, so the single-reducer stage is the
    cheapest possible place to serialize.  For a multi-shard sink use
    :func:`assign_per_key_seq` instead — order is then only guaranteed
    per partition key, exactly like Kinesis with N shards.
    """
    w = Window.orderBy(*order_cols)
    return events.withColumn("seq", F.row_number().over(w).cast("long"))


def assign_per_key_seq(events: DataFrame, *order_cols: Column | str) -> DataFrame:
    """Scale path: FIFO per partition key (per-shard ordering), fully
    parallel across keys — matches Kinesis semantics with >1 shard
    (partition key routing, stack.py:126)."""
    w = Window.partitionBy("partition_key").orderBy(*order_cols)
    return events.withColumn("seq", F.row_number().over(w).cast("long"))
