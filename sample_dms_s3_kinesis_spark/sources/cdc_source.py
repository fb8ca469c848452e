"""O2/O9/O21/O23: CDC file-stream scan, record parse, table routing.

Reference parity:
- CDC files land under ``cdc_path`` (stack.py:181) with monotonically
  increasing names ``cdc0000000001.csv`` … (run.py:194-195); files apply
  in ascending filename order, lines in file order (O21).
- record format ``operation, table, schema, <positional payload…>`` with
  ``operation ∈ {INSERT, UPDATE, DELETE}`` (lib/query.py:16-27); rows
  are *variable-arity* (payload width depends on the routed table), so
  we read whole lines (``text`` source) and split, then bind payload per
  routed table (SURVEY §7 'variable-arity CDC rows').

Scale notes:
- Each CDC file below ``spark.sql.files.maxPartitionBytes`` is a single
  split, so ``monotonically_increasing_id`` is line-ordered within it;
  the per-file ``row_number`` window partitions by file (parallel across
  files, no global shuffle).  DMS-style CDC drops are bounded-size by
  construction; for oversized files raise ``maxPartitionBytes`` or
  pre-split upstream.
- Routing is a plan-time loop over catalog tables producing per-table
  filtered projections off one shared scan — Catalyst caches nothing
  here but the text scan is cheap and each branch pushes its
  ``table/schema`` equality filter down.
- ``try_cast`` (never ANSI-throwing ``cast``) keeps malformed payloads
  flowing to the exceptions channel instead of failing the task.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.catalog import Catalog, TableDef

CDC_FILE_PATTERN = "cdc*.csv"
# seq = file_seq * 1e9 + line_no: total order across (file, line) without
# a global shuffle; supports 1e9 lines per file.
_LINES_PER_FILE = 1_000_000_000


def read_cdc_lines(
    spark: SparkSession, cdc_dir: str, *, paths: list[str] | None = None
) -> DataFrame:
    """Batch read of all pending CDC files → (value, file_seq, line_no).
    ``paths`` restricts the read to an explicit file list (the drain
    path's not-yet-consumed subset)."""
    reader = spark.read.format("text").option(
        "pathGlobFilter", CDC_FILE_PATTERN
    )
    loaded = reader.load(paths) if paths else reader.load(cdc_dir)
    lines = loaded.select(
        "value",
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_blk"),
    )
    return _with_order(lines)


def read_cdc_lines_stream(spark: SparkSession, cdc_dir: str) -> DataFrame:
    """Streaming read: one file per micro-batch preserves file-sequence
    order (O2; run.py:194-195 naming contract).  ``latestFirst=false``
    keeps oldest-first discovery.  Line ordering is re-derived inside
    ``foreachBatch`` via :func:`parse_cdc_lines` (windows over
    non-streaming frames)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .option("pathGlobFilter", CDC_FILE_PATTERN)
        .load(cdc_dir)
        # Materialize the source file path (and split offset, see
        # _with_order) as plain columns now: inside foreachBatch the
        # frame is a LogicalRDD and input_file_name()/_metadata are no
        # longer resolvable.
        .select(
            "value",
            F.col("_metadata.file_path").alias("_file"),
            F.col("_metadata.file_block_start").alias("_blk"),
        )
    )


def _with_order(lines: DataFrame) -> DataFrame:
    if "_file" not in lines.columns:
        lines = lines.withColumn("_file", F.input_file_name())
    if "_blk" not in lines.columns:
        # Callers constructing line frames by hand (tests) have no split
        # metadata; a single-split assumption is then explicit, not
        # silent.
        lines = lines.withColumn("_blk", F.lit(0).cast("long"))
    # try_cast: a file matching the glob but not the seq pattern
    # extracts '' — the plain cast would abort with a cryptic ANSI
    # CAST error; NULL instead, which CdcTask._process_batch rejects
    # loudly with the naming contract
    lines = lines.withColumn(
        "file_seq",
        F.regexp_extract(F.col("_file"), r"cdc(\d+)\.csv$", 1).try_cast(
            "long"
        ),
    )
    # monotonically_increasing_id is line-ordered only WITHIN one input
    # split; a file larger than spark.sql.files.maxPartitionBytes spans
    # several splits whose ids are not comparable.  Ordering by the
    # split's byte offset (_metadata.file_block_start) first restores a
    # correct total line order for any file size — splits sort by their
    # position in the file, lines sort within each split.
    w = Window.partitionBy("_file").orderBy(
        F.col("_blk"), F.monotonically_increasing_id()
    )
    return lines.withColumn(
        "seq",
        (F.col("file_seq") * F.lit(_LINES_PER_FILE) + F.row_number().over(w)).cast(
            "long"
        ),
    )


def parse_cdc_lines(lines: DataFrame) -> DataFrame:
    """O9: split the leading ``op, table, schema`` control columns from
    the positional payload.  Input needs ``value`` (+ ``_file`` if order
    columns are not yet derived).  Output:
    ``seq, op, table_name, schema_name, payload array<string>``.
    """
    if "seq" not in lines.columns:
        lines = _with_order(lines)
    # Quote-aware split (the full-load path reads with Spark's real CSV
    # reader, so the two ingest paths must agree on the dialect): commas
    # inside double-quoted fields do not split, and an exactly-quoted
    # field is unquoted with "" -> " unescaping.  Unquoted lines (the
    # reference's entire fixture dialect) split byte-identically to the
    # former plain comma split.
    raw = F.split(F.col("value"), r',(?=(?:[^"]*"[^"]*")*[^"]*$)')
    parts = F.transform(
        raw,
        lambda x: F.when(
            x.rlike('^".*"$'),
            F.regexp_replace(
                x.substr(F.lit(2), F.length(x) - 2), '""', '"'
            ),
        ).otherwise(x),
    )
    # F.get (not getItem/element_at): ANSI mode throws on out-of-bounds
    # for short/garbage lines; get returns null, which routes the row to
    # the exceptions channel instead of failing the task.
    return lines.select(
        "seq",
        F.upper(F.trim(F.get(parts, 0))).alias("op"),
        F.trim(F.get(parts, 1)).alias("table_name"),
        F.trim(F.get(parts, 2)).alias("schema_name"),
        F.slice(parts, 4, F.greatest(F.size(parts) - 3, F.lit(0))).alias("payload"),
    )


def bind_payload(changes: DataFrame, table: TableDef) -> DataFrame:
    """Bind the positional payload of rows routed to ``table`` to its
    declared columns with declared-type casts (O7+O8).  ``try_cast``
    turns malformed values into nulls; a null PK downstream marks the
    row for the exceptions channel rather than failing the task."""
    cols = [
        F.get(F.col("payload"), i).try_cast(spec.spark_type).alias(spec.name)
        for i, spec in enumerate(table.columns)
    ]
    return changes.select("seq", "op", *cols)


def route_changes(
    parsed: DataFrame, catalog: Catalog
) -> tuple[dict[TableDef, DataFrame], DataFrame]:
    """O23: catalog routing.  Returns ``{table: typed_changes}`` for
    catalog tables plus the unmatched remainder (unknown (schema, table)
    pairs → exceptions channel, O25).

    The known/unknown split is expressed as literal predicates over the
    (tiny) catalog rather than a join: the catalog is driver-side
    metadata, so each branch is a pushed-down filter — the moral
    broadcast-semi-join of SURVEY §2.6 O23 without materializing a
    second side."""
    routed: dict[TableDef, DataFrame] = {}
    known_pred = F.lit(False)
    for t in catalog:
        pred = (F.col("schema_name") == t.owner) & (F.col("table_name") == t.name)
        known_pred = known_pred | pred
        routed[t] = bind_payload(parsed.filter(pred), t)
    # Null-safe complement: garbage lines yield a NULL predicate, and
    # filter(NULL) would silently drop them from BOTH channels.
    unknown = parsed.filter(~F.coalesce(known_pred, F.lit(False)))
    return routed, unknown
