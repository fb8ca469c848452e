"""Event sinks: the Kinesis-shaped boundary (O3).

A sink consumes the canonical event-log frame (envelope.EVENT_COLUMNS)
and must preserve per-shard FIFO: the reference stream has one shard
(stack.py:268) ⇒ total order; with N shards order holds only per
partition key (stack.py:126 routing).  ``ordered_for_emit`` reproduces
exactly that: hash-partition by partition_key into ``num_shards``
output partitions, sort by ``seq`` within each — fully parallel across
shards, no global sort unless num_shards == 1.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_for_emit(events: DataFrame, num_shards: int = 1) -> DataFrame:
    if num_shards == 1:
        return events.coalesce(1).sortWithinPartitions("seq")
    return events.repartition(num_shards, F.col("partition_key")).sortWithinPartitions(
        "seq"
    )


class EventSink(abc.ABC):
    """Write a batch of events, preserving per-shard order."""

    num_shards: int = 1

    @abc.abstractmethod
    def write(self, events: DataFrame) -> None:
        ...
