"""Multi-shard emission: with N shards, order must hold per partition
key (stack.py:126 routing semantics), each key must land wholly in one
shard, and all events must be emitted exactly once — the scale-out path
for the reference's single-shard FIFO (SURVEY §4)."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.sinks.base import ordered_for_emit


def _events(spark, n=600):
    return spark.range(1, n + 1).select(
        F.col("id").alias("seq"),
        F.concat(F.lit("hr.t"), (F.col("id") % 7)).alias("partition_key"),
        F.concat(F.lit("{}"), F.lit("")).alias("event_json"),
    )


def test_single_shard_total_order(spark):
    ev = _events(spark)
    out = ordered_for_emit(ev, 1)
    assert out.rdd.getNumPartitions() == 1
    seqs = [r["seq"] for r in out.toLocalIterator()]
    assert seqs == sorted(seqs) and len(seqs) == 600


def test_multishard_per_key_fifo_and_exactly_once(spark):
    ev = _events(spark)
    out = ordered_for_emit(ev, 4)

    def tag(idx, rows):
        return [(idx, r["seq"], r["partition_key"]) for r in rows]

    per_shard = out.rdd.mapPartitionsWithIndex(tag).collect()

    # exactly-once: every seq appears once
    assert sorted(s for _, s, _ in per_shard) == list(range(1, 601))
    # each key entirely within one shard
    key_shards = {}
    for shard, _, key in per_shard:
        key_shards.setdefault(key, set()).add(shard)
    assert all(len(s) == 1 for s in key_shards.values())
    # per-key FIFO within each shard's emission order
    seen = {}
    for shard, seq, key in per_shard:
        assert seen.get(key, 0) < seq
        seen[key] = seq
