"""JSON-lines file sink — durable local stand-in for the Kinesis stream;
one output file per shard per batch, records in shard order."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.sinks.base import EventSink, ordered_for_emit


class JsonFileSink(EventSink):
    def __init__(self, path: str, num_shards: int = 1) -> None:
        self.path = path
        self.num_shards = num_shards

    def write(self, events: DataFrame) -> None:
        out = ordered_for_emit(events, self.num_shards).select(
            F.to_json(
                F.struct("seq", "partition_key", F.col("event_json").alias("data"))
            ).alias("value")
        )
        out.write.mode("append").text(self.path)
