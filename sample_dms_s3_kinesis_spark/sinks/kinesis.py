"""O3: real Kinesis sink via boto3 ``put_records`` inside
``foreachPartition`` — each output partition is one shard's ordered
record sequence (see sinks.base.ordered_for_emit).

Reference parity: Kinesis target endpoint (stack.py:111-128), 1-shard
stream (stack.py:266-272); the consumer contract (TRIM_HORIZON, 50-record
pages) lives on the reader side (run.py:107-138) and is provided by
:func:`drain_stream` for test harnesses.

boto3 is optional in this environment — the class raises at
construction if it is unavailable, and everything else in the engine
uses the memory/file sinks.  ``put_records`` caps at 500 records per
call (public Kinesis API limit); failed records are retried in order to
preserve FIFO (at-least-once ⇒ downstream dedup by the deterministic
``seq`` carried in every envelope, SURVEY §4 'exactly-once' row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sample_dms_s3_kinesis_spark.sinks.base import EventSink, ordered_for_emit

try:  # pragma: no cover - optional dependency
    import boto3  # type: ignore

    _HAS_BOTO3 = True
except Exception:  # pragma: no cover
    boto3 = None
    _HAS_BOTO3 = False

_MAX_PER_PUT = 500  # Kinesis PutRecords API limit


def _emit_partition(rows, stream_name: str, client_factory):
    """Emit one ordered partition.  ``client_factory`` builds the Kinesis
    client on the executor (a boto3 client is not picklable); tests
    inject a fake factory to exercise batching/retry without AWS."""
    import time

    client = client_factory()
    batch: list[dict] = []

    def flush():
        nonlocal batch
        pending = batch
        batch = []
        attempts = 0
        while pending:
            resp = client.put_records(StreamName=stream_name, Records=pending)
            if resp.get("FailedRecordCount", 0) == 0:
                return
            # FIFO-preserving retry: re-send from the FIRST failed
            # index onward.  Retrying only the failed subset would
            # land a throttled record AFTER later records that already
            # reached the shard — reordering, which seq-keyed dedup
            # downstream cannot repair (duplicates from re-sending the
            # successful tail are the documented at-least-once cost
            # and ARE repairable).
            first_fail = next(
                i
                for i, res in enumerate(resp["Records"])
                if "ErrorCode" in res
            )
            pending = pending[first_fail:]
            attempts += 1
            if attempts > 10:
                raise RuntimeError(
                    f"kinesis put_records: {len(pending)} records still failing"
                )
            time.sleep(min(0.1 * attempts, 1.0))

    for row in rows:
        batch.append(
            {
                "Data": row["event_json"].encode("utf-8"),
                "PartitionKey": row["partition_key"],
            }
        )
        if len(batch) >= _MAX_PER_PUT:
            flush()
    flush()


class KinesisSink(EventSink):
    def __init__(
        self,
        stream_name: str,
        *,
        num_shards: int = 1,
        endpoint_url: str | None = None,
        region: str = "us-east-1",
        client_factory=None,
    ) -> None:
        if not _HAS_BOTO3 and client_factory is None:
            raise ImportError(
                "boto3 is required for KinesisSink; use MemorySink/JsonFileSink instead"
            )
        self.client_factory = client_factory
        self.stream_name = stream_name
        self.num_shards = num_shards
        self.endpoint_url = endpoint_url
        self.region = region

    def write(self, events: DataFrame) -> None:
        stream, endpoint, region = self.stream_name, self.endpoint_url, self.region
        factory = self.client_factory or (
            lambda: boto3.client("kinesis", endpoint_url=endpoint, region_name=region)
        )
        ordered_for_emit(events, self.num_shards).foreachPartition(
            lambda rows: _emit_partition(rows, stream, factory)
        )


def drain_stream(
    client,
    stream_name: str,
    *,
    page_limit: int = 50,
    min_arrival_ts: float | None = None,
) -> list[dict]:
    """Consumer-side contract (O4/O11/O20): TRIM_HORIZON iterator,
    ``Limit=50`` pages (run.py:122), keep records with approximate
    arrival time strictly greater than ``min_arrival_ts`` (run.py:126)."""
    shards = client.describe_stream(StreamName=stream_name)["StreamDescription"][
        "Shards"
    ]
    out: list[dict] = []
    for shard in shards:
        it = client.get_shard_iterator(
            StreamName=stream_name,
            ShardId=shard["ShardId"],
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        while it:
            resp = client.get_records(ShardIterator=it, Limit=page_limit)
            for rec in resp["Records"]:
                ts = rec["ApproximateArrivalTimestamp"].timestamp()
                if min_arrival_ts is None or ts > min_arrival_ts:
                    out.append(
                        {
                            "partition_key": rec["PartitionKey"],
                            "data": rec["Data"].decode("utf-8"),
                            "arrival_ts": ts,
                        }
                    )
            it = resp.get("NextShardIterator")
            # Stop only on an EMPTY page while caught up: a server may
            # report MillisBehindLatest == 0 on a page that still left
            # records behind it (one page per get_records call), and
            # breaking there silently drops the tail of the shard.
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                break
    return out
