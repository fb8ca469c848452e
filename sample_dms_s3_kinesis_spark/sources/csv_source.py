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

    ``with_order_columns`` adds ``_src_file`` (input file) and
    ``_line_id`` (monotonic per-partition id) so callers can establish a
    deterministic within-table event order before any shuffle (O21).
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
        df = df.withColumn("_src_file", F.input_file_name()).withColumn(
            "_line_id", F.monotonically_increasing_id()
        )
    return df
