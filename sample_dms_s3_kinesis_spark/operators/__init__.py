"""LLM-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal column plumbing — all
designed Spark-first for 100 TB scale (built-in functions in the hot
path; Pandas UDFs only where Catalyst genuinely can't express the op)."""

from sample_dms_s3_kinesis_spark.operators import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
