"""In-memory sink for tests — the stand-in for the drained Kinesis shard
(the reference's consumer collects records into a list, run.py:107-138).
Collect is acceptable here by design: tests only."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from sample_dms_s3_kinesis_spark.sinks.base import EventSink, ordered_for_emit


class MemorySink(EventSink):
    def __init__(self) -> None:
        self.records: list[dict] = []  # {"partition_key", "seq", "data"}

    def write(self, events: DataFrame) -> None:
        for row in ordered_for_emit(events, 1).toLocalIterator():
            self.records.append(
                {
                    "partition_key": row["partition_key"],
                    "seq": row["seq"],
                    "data": row["event_json"],
                }
            )

    @property
    def events(self) -> list[dict]:
        """Parsed event payloads, in emit order (run.py:133-138 parse)."""
        return [json.loads(r["data"]) for r in self.records]
