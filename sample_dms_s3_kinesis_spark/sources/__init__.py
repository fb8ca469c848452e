from sample_dms_s3_kinesis_spark.sources.csv_source import read_table
from sample_dms_s3_kinesis_spark.sources.cdc_source import (
    CDC_FILE_PATTERN,
    read_cdc_lines,
    read_cdc_lines_stream,
    parse_cdc_lines,
    route_changes,
)

__all__ = [
    "read_table",
    "CDC_FILE_PATTERN",
    "read_cdc_lines",
    "read_cdc_lines_stream",
    "parse_cdc_lines",
    "route_changes",
]
