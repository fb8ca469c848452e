"""O1: full-load table scan — headerless CSV objects under the table's
storage prefix, schema bound positionally from the declaration.

Reference parity: S3 source endpoint with external table definition
(/root/reference/dms_sample/stack.py:176-182); data layout
``{bucket_folder}/{TablePath}/LOADnnn.csv`` (run.py:162-164); columns
bound in declaration order (O7, stack.py:138-145); declared-type casts
(O8, stack.py:139-143).

Scale notes: ``spark.read.schema(...).csv`` gives parallel splits per
object, schema-on-read without inference (never ``inferSchema`` — one
pass, fixed contract), and Catalyst column pruning for downstream
projections.  Many small LOAD files parallelize naturally (one task per
file); huge files split at ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.catalog import TableDef


def read_table(
    spark: SparkSession,
    table: TableDef,
    root: str,
    *,
    with_order_columns: bool = False,
) -> DataFrame:
    """Read one declared table: all CSV under ``{root}/{table.path}``.

    ``with_order_columns`` adds ``_src_file`` (input file), ``_blk``
    (the split's byte offset within the file) and ``_line_id``
    (monotonic per-partition id) so callers can establish a
    deterministic within-table event order before any shuffle (O21).
    The ``_blk`` column matters for files larger than one input split:
    monotonically_increasing_id is line-ordered only WITHIN a split,
    and cross-split id order follows Spark's size-descending split
    packing, not the file's byte order — the same hazard
    cdc_source._with_order guards (order by ``(_src_file, _blk,
    _line_id)``).
    """
    df = (
        spark.read.schema(table.schema)
        .option("header", "false")
        # DMS S3 source default CSV dialect: comma delimiter, newline rows.
        .option("delimiter", ",")
        .option("timestampFormat", "yyyy-MM-dd[ HH:mm:ss]")
        .csv(table.data_path(root))
    )
    if with_order_columns:
        df = (
            df.select("*", "_metadata.file_block_start")
            .withColumnRenamed("file_block_start", "_blk")
            .withColumn("_src_file", F.input_file_name())
            .withColumn("_line_id", F.monotonically_increasing_id())
        )
    return df
