"""Kinesis sink/consumer contract without AWS: a fake client exercises
put_records batching (500-record API cap), in-order retry of the failed
tail, and the TRIM_HORIZON/50-page/arrival-filter consumer semantics
(run.py:107-138)."""

import datetime

from sample_dms_s3_kinesis_spark.sinks.kinesis import _emit_partition, drain_stream


class FakeKinesis:
    def __init__(self, fail_plan=None):
        self.records = []
        self.calls = []
        # fail_plan: list of per-call sets of indices to fail
        self.fail_plan = list(fail_plan or [])

    def put_records(self, StreamName, Records):
        self.calls.append(len(Records))
        fails = self.fail_plan.pop(0) if self.fail_plan else set()
        results = []
        for i, rec in enumerate(Records):
            if i in fails:
                results.append({"ErrorCode": "ProvisionedThroughputExceededException"})
            else:
                self.records.append(rec)
                results.append({"SequenceNumber": str(len(self.records))})
        return {"FailedRecordCount": len(fails), "Records": results}

    # consumer side -----------------------------------------------------
    def describe_stream(self, StreamName):
        return {"StreamDescription": {"Shards": [{"ShardId": "shardId-0"}]}}

    def get_shard_iterator(self, StreamName, ShardId, ShardIteratorType):
        assert ShardIteratorType == "TRIM_HORIZON"
        return {"ShardIterator": "0"}

    def get_records(self, ShardIterator, Limit):
        start = int(ShardIterator)
        page = self.records[start : start + Limit]
        nxt = start + len(page)
        base = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
        return {
            "Records": [
                {
                    "PartitionKey": r["PartitionKey"],
                    "Data": r["Data"],
                    "ApproximateArrivalTimestamp": base
                    + datetime.timedelta(seconds=start + i),
                }
                for i, r in enumerate(page)
            ],
            "NextShardIterator": str(nxt),
            "MillisBehindLatest": 0 if nxt >= len(self.records) else 1,
        }


def _rows(n):
    return [
        {"event_json": f'{{"seq": {i}}}', "partition_key": "hr.employee"}
        for i in range(n)
    ]


def test_batching_respects_put_records_cap():
    client = FakeKinesis()
    _emit_partition(_rows(1203), "s", lambda: client)
    assert client.calls == [500, 500, 203]
    assert len(client.records) == 1203
    # FIFO preserved
    assert [r["Data"].decode() for r in client.records] == [
        f'{{"seq": {i}}}' for i in range(1203)
    ]


def test_partial_failure_retries_from_first_failed_index():
    """r6 review: retrying only the failed SUBSET left a throttled
    record stranded after later records with no way to recover order.
    Retrying from the first failed index re-sends the whole tail
    (at-least-once duplicates), so the stream's LAST occurrence of
    every seq is in correct order — keep-last-per-seq dedup recovers
    exact FIFO, which the subset retry could never do."""
    client = FakeKinesis(fail_plan=[{2, 3}])
    _emit_partition(_rows(5), "s", lambda: client)
    assert client.calls == [5, 3]           # tail 2,3,4 re-sent whole
    datas = [r["Data"].decode() for r in client.records]
    assert datas == [
        '{"seq": 0}', '{"seq": 1}', '{"seq": 4}',   # first call's landings
        '{"seq": 2}', '{"seq": 3}', '{"seq": 4}',   # contiguous retried tail
    ]
    # keep-LAST occurrence per seq = exact original order
    last_pos = {d: i for i, d in enumerate(datas)}
    recovered = sorted(last_pos, key=last_pos.get)
    assert recovered == [f'{{"seq": {i}}}' for i in range(5)]


def test_drain_stream_pages_and_arrival_filter():
    client = FakeKinesis()
    _emit_partition(_rows(120), "s", lambda: client)
    got = drain_stream(client, "s", page_limit=50)
    assert len(got) == 120
    assert got[0]["partition_key"] == "hr.employee"
    # strictly-greater arrival threshold (run.py:126)
    t10 = got[10]["arrival_ts"]
    later = drain_stream(client, "s", page_limit=50, min_arrival_ts=t10)
    assert len(later) == 109
