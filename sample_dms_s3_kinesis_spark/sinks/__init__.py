from sample_dms_s3_kinesis_spark.sinks.base import EventSink, ordered_for_emit
from sample_dms_s3_kinesis_spark.sinks.memory import MemorySink
from sample_dms_s3_kinesis_spark.sinks.file import JsonFileSink
from sample_dms_s3_kinesis_spark.sinks.kinesis import KinesisSink

__all__ = ["EventSink", "ordered_for_emit", "MemorySink", "JsonFileSink", "KinesisSink"]
