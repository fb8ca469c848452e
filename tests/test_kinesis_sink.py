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


def test_failed_tail_retried_in_order():
    # first call fails records 2 and 3; retry call succeeds
    client = FakeKinesis(fail_plan=[{2, 3}])
    _emit_partition(_rows(5), "s", lambda: client)
    assert client.calls == [5, 2]
    assert [r["Data"].decode() for r in client.records] == [
        '{"seq": 0}', '{"seq": 1}', '{"seq": 4}', '{"seq": 2}', '{"seq": 3}',
    ]


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
