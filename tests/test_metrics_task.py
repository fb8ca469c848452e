"""Streaming sketch-metrics task: per-batch sketch stores merged at
read time — estimates equal direct batch computation, replay is
idempotent, restarts see the stored state."""

import json
import math
import os
import time

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import sketches
from sample_dms_s3_kinesis_spark.streaming.metrics import (
    EVENT_SCHEMA,
    SketchMetricsTask,
)


def _drop(drop_dir, name, events):
    os.makedirs(drop_dir, exist_ok=True)
    path = os.path.join(drop_dir, name)
    with open(path + ".tmp", "w") as f:
        for eid, ts, uid, et in events:
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid,
                     "event_type": et}
                ) + "\n"
            )
    os.replace(path + ".tmp", path)


def _events(day, base_eid, n, n_users, types=("view", "click")):
    return [
        (base_eid + i, f"2024-03-{day:02d}T0{i % 10}:00:00.000Z",
         (base_eid + i) % n_users, types[i % len(types)])
        for i in range(n)
    ]


def test_metrics_task_estimates_match_direct(spark, tmp_path):
    drop = str(tmp_path / "drop")
    task = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=256, depth=5, k=128,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ev1 = _events(1, 0, 300, 90)
    ev2 = _events(2, 1000, 400, 120)  # <k so per-day AND union stay exact
    _drop(drop, "e1.json", ev1)
    task.process_available()
    for f in os.listdir(drop):
        os.remove(os.path.join(drop, f))
    _drop(drop, "e2.json", ev2)
    task.process_available()

    allrows = ev1 + ev2
    # frequency estimates across the whole range: never undercount,
    # bounded overcount
    from collections import Counter

    exact = Counter(et for _, _, _, et in allrows)
    probes = spark.createDataFrame(
        [("view",), ("click",), ("ghost",)], "event_type string"
    )
    est = {
        r["event_type"]: r["est_count"]
        for r in task.freq_estimate(probes).collect()
    }
    n = len(allrows)
    eps = math.e / 256
    for k_, c in exact.items():
        assert est[k_] >= c, k_
        assert est[k_] <= c + 3 * eps * n, k_
    assert est["ghost"] <= 3 * eps * n

    # per-day distinct estimates: small cardinalities are EXACT
    # (under-full sketches), the all-days row unions correctly
    got = {
        (str(r["day"]) if r["day"] else None): r["est_distinct"]
        for r in task.distinct_estimate().collect()
    }
    d1 = len({u for _, _, u, _ in ev1})
    d2 = len({u for _, _, u, _ in ev2})
    dall = len({u for _, _, u, _ in allrows})
    assert got["2024-03-01"] == float(d1)
    assert got["2024-03-02"] == float(d2)
    assert got[None] == float(dall)

    # merged CMS equals a direct build over the union of events
    direct = sketches.cms_table(
        spark.createDataFrame(
            [(et,) for _, _, _, et in allrows], "event_type string"
        ),
        "event_type", width=256, depth=5,
    )
    a = {(r["d"], r["b"]): r["cnt"] for r in task.cms(day=None).drop("day").groupBy("d","b").agg(F.sum("cnt").alias("cnt")).collect()}
    b = {(r["d"], r["b"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_metrics_task_replay_idempotent(spark, tmp_path):
    drop = str(tmp_path / "drop")
    task = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=128, depth=4, k=64,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "e1.json", _events(5, 0, 200, 60))
    df = spark.read.schema(EVENT_SCHEMA).json(drop)
    task._process_batch(df, 0)
    first = {
        (str(r["day"]), r["d"], r["b"]): r["cnt"]
        for r in task.cms().collect()
    }
    task._process_batch(df, 0)   # the replay
    again = {
        (str(r["day"]), r["d"], r["b"]): r["cnt"]
        for r in task.cms().collect()
    }
    assert again == first        # counters not double-merged

    # a SECOND task over the same store (restart) reads the same state
    task2 = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=128, depth=4, k=64,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert {
        (str(r["day"]), r["d"], r["b"]): r["cnt"]
        for r in task2.cms().collect()
    } == first


def test_metrics_task_streaming_path(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    task = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=128, depth=4, k=64,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    task.start()
    assert task.status == "running"
    _drop(drop, "e1.json", _events(7, 0, 150, 40))
    deadline = time.time() + 90
    while time.time() < deadline and not task._batch_ids():
        time.sleep(0.5)
    task.stop()
    assert task.status == "stopped"
    assert task._batch_ids()
    got = {
        (str(r["day"]) if r["day"] else None): r["est_distinct"]
        for r in task.distinct_estimate().collect()
    }
    assert got["2024-03-07"] == 40.0


def test_metrics_store_params_are_pinned(spark, tmp_path):
    """Sketches under different parameters cannot be merged and there
    are no raw events to rebuild from — a restart with different
    width/depth/k must fail fast, not silently mis-estimate."""
    import pytest

    store = str(tmp_path / "store")
    SketchMetricsTask(
        spark, str(tmp_path / "drop"), store,
        width=256, depth=5, k=128,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # same params: fine
    SketchMetricsTask(
        spark, str(tmp_path / "drop"), store,
        width=256, depth=5, k=128,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(ValueError, match="cannot be merged"):
        SketchMetricsTask(
            spark, str(tmp_path / "drop"), store,
            width=1024, depth=5, k=128,
            checkpoint_dir=str(tmp_path / "ckpt3"),
        )


def test_kmv_ungrouped_plans_as_take_ordered(spark):
    """The ungrouped bottom-k must be TakeOrderedAndProject (per-
    partition bottom-k + tiny merge), never a single-partition global
    sort window over the corpus-cardinality distinct frame."""
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "x string"
    )
    sk = sketches.kmv_table(df, "x", k=32)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_process_available_is_repeat_safe_without_file_deletion(spark, tmp_path):
    """Repeated drains must not double-merge counters (r6 review
    finding): the file manifest skips already-sketched files, and a
    second drop is picked up incrementally."""
    drop = str(tmp_path / "drop")
    task = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=128, depth=4, k=64,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "e1.json", _events(3, 0, 100, 30))
    task.process_available()
    first = {
        (str(r["day"]), r["d"], r["b"]): r["cnt"]
        for r in task.cms().collect()
    }
    task.process_available()          # nothing new: no-op
    assert {
        (str(r["day"]), r["d"], r["b"]): r["cnt"]
        for r in task.cms().collect()
    } == first
    _drop(drop, "e2.json", _events(4, 500, 100, 30))  # e1 still present
    task.process_available()
    probes = spark.createDataFrame([("view",), ("click",)], "event_type string")
    est = {
        r["event_type"]: r["est_count"]
        for r in task.freq_estimate(probes).collect()
    }
    # 200 events total, never double-merged: estimates bounded by
    # exact + collision slack, NOT ~2x the exact count
    assert est["view"] + est["click"] <= 220, est


def test_cms_estimate_drops_null_probes(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "x string"
    )
    cms = sketches.cms_table(df.filter(F.col("x").isNotNull()), "x", width=32, depth=3)
    probes = spark.createDataFrame([("a",), (None,)], "x string")
    rows = sketches.cms_estimate(cms, probes, "x", width=32, depth=3).collect()
    got = {r["x"]: r["est_count"] for r in rows}
    assert len(rows) == 1 and got["a"] >= 2  # one row per non-null probe


def test_drain_crash_before_manifest_does_not_double_merge(spark, tmp_path):
    """Crash between the sketch-batch write and the _FILES.json manifest
    update (r6 advice): the next drain would re-sketch the same files
    under a NEW batch id, silently double-merging CMS counters.  The
    in-flight marker written before processing lets the next drain roll
    the uncommitted batch's partitions back and re-drain exactly once."""
    drop = str(tmp_path / "drop")
    task = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=256, depth=5, k=128,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    _drop(drop, "e1.json", _events(3, 0, 100, 30))
    task.process_available()  # committed baseline drain

    # Second drain crashes AFTER the sketches land, BEFORE the manifest
    # records the files: fail only the manifest's os.replace.
    _drop(drop, "e2.json", _events(4, 500, 100, 30))
    mf = f"{task.store_dir}/_FILES.json"
    real_replace = os.replace

    def crash_on_manifest(src, dst):
        if dst == mf:
            raise RuntimeError("crash before manifest")
        return real_replace(src, dst)

    import sample_dms_s3_kinesis_spark.streaming.metrics as metrics_mod
    metrics_mod.os.replace = crash_on_manifest
    try:
        task.process_available()
        raised = False
    except RuntimeError:
        raised = True
    finally:
        metrics_mod.os.replace = real_replace
    assert raised

    # Restarted task over the same store: reconcile + re-drain e2 once.
    task2 = SketchMetricsTask(
        spark, drop, str(tmp_path / "store"),
        width=256, depth=5, k=128,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    task2.process_available()
    probes = spark.createDataFrame(
        [("view",), ("click",)], "event_type string"
    )
    est = {
        r["event_type"]: r["est_count"]
        for r in task2.freq_estimate(probes).collect()
    }
    # 200 events total; a double merge of e2 would push this to ~300
    assert est["view"] + est["click"] <= 220, est
    # marker consumed; a further drain is a no-op
    assert not os.path.exists(f"{task.store_dir}/_PENDING.json")
    ids = task2._batch_ids()
    task2.process_available()
    assert task2._batch_ids() == ids


def test_stream_restart_skips_drain_consumed_files(spark, tmp_path):
    """A stream restart under a different checkpoint re-discovers every
    drop file; files already consumed by a drain (the _FILES manifest)
    must not re-merge into the sketch store."""
    import os
    import time

    from sample_dms_s3_kinesis_spark.streaming.metrics import (
        SketchMetricsTask,
    )

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    t1 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck1")
    )
    with open(os.path.join(drop, "d1.jsonl"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2026-03-01T01:00:00Z", '
            '"user_id": 10, "event_type": "click"}\n'
        )
    t1.process_available()
    probe = spark.createDataFrame([("click",)], "event_type string")
    assert t1.freq_estimate(probe).collect()[0]["est_count"] == 1

    t2 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck2")
    )
    t2.start()
    try:
        t2._query.processAllAvailable()
    finally:
        t2.stop()
    assert t2.freq_estimate(probe).collect()[0]["est_count"] == 1


def test_stream_checkpoint_pinned_against_epoch_replay(spark, tmp_path):
    """A store with STREAM-written batches refuses a different
    checkpoint (epoch ids would replay over existing partitions);
    drain-only stores are unaffected (drain ids are manifest-keyed)."""
    import os

    import pytest

    from sample_dms_s3_kinesis_spark.streaming.metrics import (
        SketchMetricsTask,
    )

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    with open(os.path.join(drop, "d1.jsonl"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2026-03-01T01:00:00Z", '
            '"user_id": 10, "event_type": "click"}\n'
        )
    t1 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck1")
    )
    t1.start()
    try:
        t1._query.processAllAvailable()
    finally:
        t1.stop()
    assert any(b < 1_000_000_000 for b in t1._batch_ids())

    t2 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck2")
    )
    with pytest.raises(ValueError, match="was streamed with"):
        t2.start()
    # same checkpoint restarts fine
    t3 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck1")
    )
    t3.start()
    try:
        t3._query.processAllAvailable()
    finally:
        t3.stop()


def test_drain_skips_stream_consumed_files(spark, tmp_path):
    """The reverse direction of the drained-file gate: files the STREAM
    already processed are recorded in the manifest, so a later drain
    must not re-sketch them."""
    import os

    from sample_dms_s3_kinesis_spark.streaming.metrics import (
        SketchMetricsTask,
    )

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    store = str(tmp_path / "store")
    t1 = SketchMetricsTask(
        spark, drop, store, checkpoint_dir=str(tmp_path / "ck1")
    )
    with open(os.path.join(drop, "d1.jsonl"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2026-03-01T01:00:00Z", '
            '"user_id": 10, "event_type": "click"}\n'
        )
    t1.start()
    try:
        t1._query.processAllAvailable()
    finally:
        t1.stop()
    probe = spark.createDataFrame([("click",)], "event_type string")
    assert t1.freq_estimate(probe).collect()[0]["est_count"] == 1

    t1.process_available()  # must be a no-op for the streamed file
    assert t1.freq_estimate(probe).collect()[0]["est_count"] == 1
