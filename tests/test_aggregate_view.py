"""AggregateViewTask: merged view == direct aggregation of all events;
drains are manifest-idempotent; crash-replay of a batch does not
double-merge."""

import json
import os

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.streaming.aggregates import AggregateViewTask

D1 = [
    '{"event_id": 1, "ts": "2026-03-01T01:00:00Z", "user_id": 10, "event_type": "click", "value": 2.0}',
    '{"event_id": 2, "ts": "2026-03-01T02:00:00Z", "user_id": 11, "event_type": "click", "value": 4.0}',
    '{"event_id": 3, "ts": "2026-03-01T03:00:00Z", "user_id": 12, "event_type": "view", "value": null}',
    '{"event_id": 4, "ts": null, "user_id": 13, "event_type": "view", "value": 9.0}',
]
D2 = [
    '{"event_id": 5, "ts": "2026-03-02T01:00:00Z", "user_id": 11, "event_type": "click", "value": 6.0}',
    '{"event_id": 6, "ts": "2026-03-01T04:00:00Z", "user_id": 14, "event_type": "click", "value": 0.0}',
]

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _drop(path, name, lines):
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _mk(spark, tmp_path, **kw):
    drop = str(tmp_path / "drop")
    os.makedirs(drop, exist_ok=True)
    return (
        AggregateViewTask(
            spark,
            drop,
            str(tmp_path / "store"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            **kw,
        ),
        drop,
    )


def test_view_equals_direct_aggregation(spark, tmp_path):
    task, drop = _mk(spark, tmp_path)
    _drop(drop, "d1.jsonl", D1)
    task.process_available()
    _drop(drop, "d2.jsonl", D2)
    task.process_available()

    got = {
        (str(r["day"]), r["event_type"]): (
            r["cnt"], r["cnt_value"], r["sum_value"],
            r["min_value"], r["max_value"], r["avg_value"],
        )
        for r in task.view().collect()
    }
    assert got == {
        ("2026-03-01", "click"): (3, 3, 6.0, 0.0, 4.0, 2.0),
        ("2026-03-01", "view"): (1, 0, None, None, None, None),
        ("2026-03-02", "click"): (1, 1, 6.0, 6.0, 6.0, 6.0),
    }

    # repeated drain with no new files: no change
    task.process_available()
    assert {
        (str(r["day"]), r["event_type"]): r["cnt"]
        for r in task.view().collect()
    } == {k: v[0] for k, v in got.items()}


def test_crash_replay_does_not_double_merge(spark, tmp_path):
    task, drop = _mk(spark, tmp_path)
    _drop(drop, "d1.jsonl", D1)
    task.process_available()

    # simulate a crash AFTER the batch partition landed but BEFORE the
    # file manifest recorded it: wipe the manifest, leave _PENDING
    store = task.store_dir
    os.remove(f"{store}/_FILES.json")
    ids = task._batch_ids()
    with open(f"{store}/_PENDING.json", "w") as f:
        json.dump(
            {"id": ids[-1], "files": [os.path.join(drop, "d1.jsonl")]}, f
        )

    task2, _ = _mk(spark, tmp_path)
    task2.process_available()  # rolls back the orphan, re-drains d1
    got = {
        (str(r["day"]), r["event_type"]): (r["cnt"], r["sum_value"])
        for r in task2.view().collect()
    }
    assert got == {
        ("2026-03-01", "click"): (2, 6.0),
        ("2026-03-01", "view"): (1, None),
    }


def test_param_mismatch_rejected(spark, tmp_path):
    import pytest

    task, drop = _mk(spark, tmp_path)
    _drop(drop, "d1.jsonl", D1)
    task.process_available()
    with pytest.raises(ValueError, match="built with"):
        AggregateViewTask(
            spark,
            drop,
            task.store_dir,
            value_col="user_id",
            checkpoint_dir=task.checkpoint_dir,
        )


def test_live_stream_matches_drain(spark, tmp_path):
    task, drop = _mk(spark, tmp_path)
    _drop(drop, "d1.jsonl", D1)
    _drop(drop, "d2.jsonl", D2)
    task.start()
    try:
        task._query.processAllAvailable()
    finally:
        task.stop()
    total = task.view().agg(F.sum("cnt")).first()[0]
    assert total == 5  # all rows with a timestamp


def test_empty_view_schema_matches_populated(spark, tmp_path):
    task, drop = _mk(spark, tmp_path)
    empty_schema = task.view().schema
    _drop(drop, "d1.jsonl", D1)
    task.process_available()
    assert task.view().schema == empty_schema


def test_stream_restart_skips_drain_consumed_files(spark, tmp_path):
    """Same drained-file gate as the sketch store: a fresh-checkpoint
    stream restart must not re-aggregate drained files."""
    task, drop = _mk(spark, tmp_path)
    _drop(drop, "d1.jsonl", D1)
    task.process_available()
    before = {
        (str(r["day"]), r["event_type"]): r["cnt"]
        for r in task.view().collect()
    }

    task2 = AggregateViewTask(
        spark,
        drop,
        task.store_dir,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    task2.start()
    try:
        task2._query.processAllAvailable()
    finally:
        task2.stop()
    after = {
        (str(r["day"]), r["event_type"]): r["cnt"]
        for r in task2.view().collect()
    }
    assert after == before


def test_quantile_store_merges_across_batches(spark, tmp_path):
    """quantiles=True maintains per-batch bottom-k samples; the merged
    estimates equal a direct quantile over all events (k above the
    data size -> the sample is the full distribution)."""
    task, drop = _mk(spark, tmp_path, quantiles=True, q_k=64)
    _drop(drop, "d1.jsonl", D1)
    task.process_available()
    _drop(drop, "d2.jsonl", D2)
    task.process_available()

    got = {
        (str(r["day"]), r["event_type"], r["q"]): r["est"]
        for r in task.quantile_view(qs=(0.5, 0.9)).collect()
    }
    # day1 click values [0, 2, 4]: q0.5 -> v_ceil(1.5)=v2=2, q0.9 -> v3=4
    # day1 view has no non-null values -> absent; day2 click [6]
    assert got == {
        ("2026-03-01", "click", 0.5): 2.0,
        ("2026-03-01", "click", 0.9): 4.0,
        ("2026-03-02", "click", 0.5): 6.0,
        ("2026-03-02", "click", 0.9): 6.0,
    }
    # empty store: schema-stable
    t2, _ = _mk(
        spark, tmp_path / "fresh", quantiles=True, q_k=64
    )
    shape = lambda df: [(f.name, f.dataType) for f in df.schema.fields]
    assert shape(t2.quantile_view()) == shape(task.quantile_view())

    import pytest

    with pytest.raises(ValueError, match="quantiles=True"):
        _mk(spark, tmp_path / "noq")[0].quantile_view()
