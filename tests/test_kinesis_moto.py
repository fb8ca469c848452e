"""Live-ish Kinesis sink test: a real boto3 client against a moto
HTTP server (in-process mock servers don't cross into Spark's Python
worker processes; the HTTP server does).  Exercises the genuine
executor-side path — ``foreachPartition`` → ``put_records`` over the
wire — plus the consumer contract (``drain_stream``), which the
fake-client tests in test_kinesis_sink.py cannot.

Reference parity: the reference E2E drives a real (LocalStack) Kinesis
shard end-to-end (/root/reference/run.py:107-138); this is the closest
equivalent available in this container."""

import json

import pytest

try:  # moto[server] needs flask; gate the whole module on it
    import boto3
    from moto.server import ThreadedMotoServer

    _HAVE_MOTO = True
except Exception:  # pragma: no cover
    _HAVE_MOTO = False

pytestmark = pytest.mark.skipif(
    not _HAVE_MOTO, reason="moto server / boto3 not importable"
)

from sample_dms_s3_kinesis_spark import envelope
from sample_dms_s3_kinesis_spark.sinks.kinesis import KinesisSink, drain_stream

STREAM = "dms-events"


@pytest.fixture(scope="module")
def moto_kinesis():
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    url = f"http://{host}:{port}"
    kw = dict(
        endpoint_url=url,
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    client = boto3.client("kinesis", **kw)
    client.create_stream(StreamName=STREAM, ShardCount=1)
    yield client, kw
    server.stop()


def test_kinesis_sink_put_records_roundtrip(spark, moto_kinesis):
    client, kw = moto_kinesis
    # >500 events forces the PutRecords 500-record batch split inside
    # one partition emit.
    events = envelope.control_events(
        spark,
        [("hr", f"t{i:04d}") for i in range(260)],
        ["drop-table", "create-table"],
    )
    sink = KinesisSink(
        STREAM,
        client_factory=lambda: boto3.client("kinesis", **kw),
    )
    sink.write(events)

    records = drain_stream(client, STREAM)
    assert len(records) == 520
    # FIFO within the single shard: seqs arrive in emitted order.
    payloads = [json.loads(r["data"]) for r in records]
    # control envelope: data null, metadata carries the operation
    assert payloads[0]["data"] is None
    ops = [p["metadata"]["operation"] for p in payloads]
    assert ops[:2] == ["drop-table", "create-table"]
    tables = [p["metadata"]["table-name"] for p in payloads]
    assert tables[0] == "t0000" and tables[-1] == "t0259"
    # partition key convention "{schema}.{table}"
    assert records[0]["partition_key"] == "hr.t0000"


def test_kinesis_arrival_ts_filter(spark, moto_kinesis):
    """O11: the consumer keeps records with arrival time strictly
    greater than the cutoff — records already in the stream from the
    previous test are filtered out by a now() cutoff."""
    import time

    client, kw = moto_kinesis
    cutoff = time.time()
    time.sleep(1.1)  # moto arrival timestamps have 1s granularity
    events = envelope.control_events(spark, [("hr", "late")], ["create-table"])
    KinesisSink(
        STREAM, client_factory=lambda: boto3.client("kinesis", **kw)
    ).write(events)
    records = drain_stream(client, STREAM, min_arrival_ts=cutoff)
    names = {json.loads(r["data"])["metadata"]["table-name"] for r in records}
    assert names == {"late"}


def test_multi_shard_sink_preserves_per_key_order(spark, moto_kinesis):
    """num_shards>1: total order is NOT guaranteed, but records for one
    partition key must arrive FIFO within their shard — exactly the
    N-shard Kinesis contract (the reference uses 1 shard; the engine
    generalizes)."""
    client, kw = moto_kinesis
    client.create_stream(StreamName="dms-multi", ShardCount=2)
    events = envelope.control_events(
        spark,
        [("hr", f"m{i:03d}") for i in range(40)],
        ["drop-table", "create-table"],
    )
    sink = KinesisSink(
        "dms-multi",
        num_shards=2,
        client_factory=lambda: boto3.client("kinesis", **kw),
    )
    sink.write(events)
    records = drain_stream(client, "dms-multi")
    assert len(records) == 80
    # per partition key, the (drop-table, create-table) pair arrives in
    # seq order within its shard's record sequence
    seen = {}
    for i, r in enumerate(records):
        seen.setdefault(r["partition_key"], []).append(
            json.loads(r["data"])["metadata"]["operation"]
        )
    assert set(len(v) for v in seen.values()) == {2}
    for key, ops in seen.items():
        assert ops == ["drop-table", "create-table"], key


def test_cdc_task_to_kinesis_end_to_end(spark, moto_kinesis, catalog, cdc_dir, tmp_path):
    """The reference's full E2E shape (run.py:178-206): CDC task →
    Kinesis stream → consumer drain, here with the engine's CdcTask
    writing through a real boto3 client to a moto shard and the
    15-event golden asserted off the DRAINED stream, not a test sink."""
    from sample_dms_s3_kinesis_spark.apply import ParquetTargetStore
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask
    from tests.conftest import CDC_FILE_1, CDC_FILE_2, write_cdc_file

    client, kw = moto_kinesis
    client.create_stream(StreamName="dms-cdc-e2e", ShardCount=1)
    sink = KinesisSink(
        "dms-cdc-e2e",
        client_factory=lambda: boto3.client("kinesis", **kw),
    )
    task = CdcTask(
        spark,
        catalog,
        cdc_dir,
        sink,
        ParquetTargetStore(str(tmp_path / "target")),
        event_time="2026-01-01T00:00:00.000Z",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    write_cdc_file(cdc_dir, 1, CDC_FILE_1)
    write_cdc_file(cdc_dir, 2, CDC_FILE_2)
    task.process_available()
    task.stop()

    records = drain_stream(client, "dms-cdc-e2e")
    assert len(records) == 15  # run.py:198 golden
    events = [json.loads(r["data"]) for r in records]
    ops = [e["metadata"]["operation"] for e in events]
    assert ops.count("create-table") == 4
    assert ops.count("insert") == 4
    assert ops.count("update") == 3
    assert ops.count("delete") == 4
    # single shard ⇒ the drained order IS the task's emit order: all
    # start controls first, then data events in (file, line) order
    assert ops[:4] == ["create-table"] * 4
    # partition keys follow the {schema}.{table} routing convention
    assert {r["partition_key"] for r in records} <= {
        "hr.employee", "hr.department", "hr.project",
        "hr.awsdms_apply_exceptions",
    }


def test_source_config_from_secrets_manager(moto_kinesis):
    """O6 over the wire: SourceConfig resolves from a real (moto)
    Secrets Manager secret — the reference's run.py:69-72 read of the
    stack-written secret (stack.py:286-295)."""
    from sample_dms_s3_kinesis_spark.catalog import SourceConfig

    _, kw = moto_kinesis
    sm = boto3.client("secretsmanager", **kw)
    sm.create_secret(
        Name="dms-source",
        SecretString=json.dumps(
            {
                "bucket_name": "dms-bucket",
                "bucket_folder": "sourceData",
                "change_data": "changedata",
            }
        ),
    )
    cfg = SourceConfig.from_secrets_manager(sm, "dms-source")
    assert cfg.source_root == "s3a://dms-bucket/sourceData"
    assert cfg.cdc_dir == "s3a://dms-bucket/changedata"
