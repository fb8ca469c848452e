"""Opt-in LIVE LocalStack integration: the reference's own CI shape
(.github/workflows/ci.yml:52-58 deploys against LocalStack and runs
run.py end-to-end).  These tests drive FullLoadTask and CdcTask through
a REAL Kinesis shard on an external LocalStack (or AWS-compatible)
endpoint and assert the 16/15-event goldens off the drained stream —
closing the moto-vs-wire gap the in-repo tests leave.

Run with a LocalStack container up::

    docker run -d -p 4566:4566 localstack/localstack
    LOCALSTACK_ENDPOINT_URL=http://localhost:4566 \
        python -m pytest tests/test_localstack_live.py -v

Skipped cleanly when the endpoint variable is unset (CI default here:
no container in this environment; the moto HTTP tests in
test_kinesis_moto.py cover the same executor-side wire path)."""

import json
import os
import uuid

import pytest

ENDPOINT = os.environ.get("LOCALSTACK_ENDPOINT_URL") or os.environ.get(
    "AWS_ENDPOINT_URL"
)

pytestmark = pytest.mark.skipif(
    not ENDPOINT,
    reason="set LOCALSTACK_ENDPOINT_URL (or AWS_ENDPOINT_URL) to run "
    "live-LocalStack integration tests",
)

if ENDPOINT:  # boto3 import gated with the skip
    import boto3

STREAM_PREFIX = "dms-live"


def _client(service):
    return boto3.client(
        service,
        endpoint_url=ENDPOINT,
        region_name=os.environ.get("AWS_DEFAULT_REGION", "us-east-1"),
        aws_access_key_id=os.environ.get("AWS_ACCESS_KEY_ID", "test"),
        aws_secret_access_key=os.environ.get(
            "AWS_SECRET_ACCESS_KEY", "test"
        ),
    )


@pytest.fixture()
def live_stream():
    """A fresh single-shard stream per test (the reference's shape:
    stack.py:268, ShardCount=1), deleted afterwards."""
    client = _client("kinesis")
    name = f"{STREAM_PREFIX}-{uuid.uuid4().hex[:8]}"
    client.create_stream(StreamName=name, ShardCount=1)
    waiter = client.get_waiter("stream_exists")
    waiter.wait(StreamName=name, WaiterConfig={"Delay": 1, "MaxAttempts": 60})
    yield client, name
    try:
        client.delete_stream(StreamName=name, EnforceConsumerDeletion=True)
    except Exception:
        pass


def _sink(name):
    from sample_dms_s3_kinesis_spark.sinks.kinesis import KinesisSink

    # client_factory runs INSIDE Spark's Python workers: env-derived
    # wiring only, nothing driver-pickled beyond the endpoint string.
    endpoint = ENDPOINT
    return KinesisSink(
        name,
        client_factory=lambda: boto3.client(
            "kinesis",
            endpoint_url=endpoint,
            region_name="us-east-1",
            aws_access_key_id=os.environ.get("AWS_ACCESS_KEY_ID", "test"),
            aws_secret_access_key=os.environ.get(
                "AWS_SECRET_ACCESS_KEY", "test"
            ),
        ),
    )


def test_full_load_golden_over_live_shard(
    spark, catalog, source_root, live_stream
):
    """run.py:169-176: full load emits exactly 16 events (3 drop-table
    + 3 create-table + 10 load) through the live shard, in order."""
    from sample_dms_s3_kinesis_spark.sinks.kinesis import drain_stream
    from sample_dms_s3_kinesis_spark.tasks import FullLoadTask

    client, name = live_stream
    task = FullLoadTask(spark, catalog, source_root, _sink(name))
    task.start()
    assert task.status == "stopped"

    records = drain_stream(client, name)
    assert len(records) == 16  # run.py:170 golden
    events = [json.loads(r["data"]) for r in records]
    ops = [e["metadata"]["operation"] for e in events]
    assert ops.count("drop-table") == 3
    assert ops.count("create-table") == 3
    assert ops.count("load") == 10
    # single shard: drained order IS emit order — controls per table
    # precede its loads
    assert ops[0] == "drop-table"
    assert {r["partition_key"] for r in records} == {
        "hr.employee",
        "hr.department",
        "hr.project",
    }


def test_cdc_golden_over_live_shard(
    spark, catalog, cdc_dir, live_stream, tmp_path
):
    """run.py:178-206: the CDC drive emits the 15-event golden through
    the live shard (4 create-table + 4 insert + 3 update + 4 delete)."""
    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.sinks.kinesis import drain_stream
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask
    from tests.conftest import CDC_FILE_1, CDC_FILE_2, write_cdc_file

    client, name = live_stream
    task = CdcTask(
        spark,
        catalog,
        cdc_dir,
        _sink(name),
        ParquetTargetStore(str(tmp_path / "target")),
        event_time="2026-01-01T00:00:00.000Z",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()
    task.stop()

    records = drain_stream(client, name)
    assert len(records) == 15  # run.py:198 golden
    events = [json.loads(r["data"]) for r in records]
    ops = [e["metadata"]["operation"] for e in events]
    assert ops.count("create-table") == 4
    assert ops.count("insert") == 4
    assert ops.count("update") == 3
    assert ops.count("delete") == 4
    assert ops[:4] == ["create-table"] * 4


def test_secret_resolution_live():
    """run.py:69-72: engine config resolves from a real Secrets
    Manager secret (the CDK stack writes it at stack.py:286-295)."""
    from sample_dms_s3_kinesis_spark.catalog import SourceConfig

    client = _client("secretsmanager")
    secret_id = f"dms-live-{uuid.uuid4().hex[:8]}"
    client.create_secret(
        Name=secret_id,
        SecretString=json.dumps(
            {
                "bucket_name": "dms-bucket",
                "bucket_folder": "sourceData",
                "change_data": "changedata",
            }
        ),
    )
    try:
        cfg = SourceConfig.from_secrets_manager(client, secret_id)
        assert cfg.source_root == "s3a://dms-bucket/sourceData"
        assert cfg.cdc_dir == "s3a://dms-bucket/changedata"
    finally:
        client.delete_secret(
            SecretId=secret_id, ForceDeleteWithoutRecovery=True
        )


@pytest.fixture()
def live_stream_2shard():
    """A 2-shard stream: the scale-out shape (stack.py:126 routing —
    per-key FIFO only, no total order)."""
    client = _client("kinesis")
    name = f"{STREAM_PREFIX}-m-{uuid.uuid4().hex[:8]}"
    client.create_stream(StreamName=name, ShardCount=2)
    waiter = client.get_waiter("stream_exists")
    waiter.wait(StreamName=name, WaiterConfig={"Delay": 1, "MaxAttempts": 60})
    yield client, name
    try:
        client.delete_stream(StreamName=name, EnforceConsumerDeletion=True)
    except Exception:
        pass


def test_multishard_live_per_key_fifo(spark, live_stream_2shard):
    """The moto twin (test_multishard_ordering.py) through a REAL
    2-shard endpoint: every event exactly once, each partition key
    wholly in one Kinesis shard (MD5 key routing), and seq order
    preserved PER KEY in each shard's drained order — the per-key FIFO
    contract that replaces total order beyond one shard."""
    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.sinks.kinesis import (
        KinesisSink,
        drain_stream,
    )

    client, name = live_stream_2shard
    ev = spark.range(1, 201).select(
        F.col("id").alias("seq"),
        F.concat(
            F.lit("hr.t"), (F.col("id") % 7).cast("string")
        ).alias("partition_key"),
        F.to_json(F.struct(F.col("id").alias("seq"))).alias("event_json"),
    )
    sink = _sink(name)
    KinesisSink(
        name, num_shards=2, client_factory=sink.client_factory
    ).write(ev)

    records = drain_stream(client, name)
    seqs = sorted(json.loads(r["data"])["seq"] for r in records)
    assert seqs == list(range(1, 201))  # exactly once, none lost

    # walk each shard directly to attribute records to shards (the
    # drain helper concatenates shards without exposing boundaries)
    shard_of = {}
    last_seq = {}
    shards = client.describe_stream(StreamName=name)[
        "StreamDescription"
    ]["Shards"]
    for shard in shards:
        it = client.get_shard_iterator(
            StreamName=name,
            ShardId=shard["ShardId"],
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        while it:
            resp = client.get_records(ShardIterator=it, Limit=50)
            for rec in resp["Records"]:
                key = rec["PartitionKey"]
                seq = json.loads(rec["Data"].decode("utf-8"))["seq"]
                # a key never spans shards (MD5 routing is per key)
                assert shard_of.setdefault(key, shard["ShardId"]) == (
                    shard["ShardId"]
                ), key
                # per-key FIFO within the shard's order
                assert last_seq.get(key, 0) < seq, (key, seq)
                last_seq[key] = seq
            it = resp.get("NextShardIterator")
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                break
    assert len(shard_of) == 7  # all keys observed
