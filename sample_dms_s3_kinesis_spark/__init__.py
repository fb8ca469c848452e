"""sample_dms_s3_kinesis_spark — a PySpark-native full-load + CDC
replication/ETL engine with the observable contract of the reference
LocalStack DMS sample (S3 CSV source → DMS-shaped JSON event stream →
Kinesis-like ordered sink), generalized to a relational + LLM-data-pipeline
operator surface designed for 100 TB scale.

Layout
------
- ``catalog``    : external table definitions → Spark schemas; selection rules
- ``envelope``   : row → DMS-shaped JSON event transform
- ``stats``      : per-(schema, table) replication statistics
- ``tasks``      : task lifecycle (full-load batch task, CDC streaming task)
- ``apply``      : latest-wins CDC merge + exceptions side-channel
- ``sources``    : CSV full-load scan, CDC file-stream scan
- ``sinks``      : ordered event sinks (memory / file / Kinesis via boto3)
- ``streaming``  : Structured Streaming CDC pipeline
- ``operators``  : dedup, similarity search, text analysis, multimodal
- ``plans``      : generalized relational query surface (bench/oracle queries)

Everything is declarative DataFrame code: Catalyst handles pushdown, pruning
and join strategy; the only imperative pieces are driver-side task lifecycle
and the foreachBatch sink adapters.
"""

from sample_dms_s3_kinesis_spark.catalog import Catalog, TableDef, SelectionRule

__all__ = ["Catalog", "TableDef", "SelectionRule"]
__version__ = "0.1.0"
