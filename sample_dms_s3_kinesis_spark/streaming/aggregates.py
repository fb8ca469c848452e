"""Incrementally-maintained EXACT aggregates — the materialized-view
story next to the sketch metrics store.

``SketchMetricsTask`` keeps approximate synopses current;
``AggregateViewTask`` does the same for the exact algebraic aggregates
(count / sum / min / max, avg derived at read) a dashboard or training
run actually joins against.  Same incremental-apply pattern as the
reference driver (`/root/reference/run.py:193-198`: new data lands,
derived state updates incrementally) and the same durability contract
as the other batch-partition stores:

- each micro-batch writes its OWN per-group partial-aggregate table
  under ``_agg/batch_id=N`` with overwrite semantics — a crash-replay
  of batch N overwrites the same directory, so totals are never
  double-merged;
- MERGING happens at read time and is sound precisely because the
  aggregates are algebraic: count/sum merge by summation, min/max by
  re-min/re-max — indifferent to how the inputs were batched; avg is
  derived (sum/count) only after the merge, never stored (stored
  averages do not merge);
- at 100 TB the per-batch directories become a table format's
  transaction log and the read-time merge is a partition-pruned
  re-aggregation over |groups| rows per batch — raw events are never
  rescanned.

Drain-mode idempotence (file manifest + interrupted-drain rollback
marker) and checkpoint discipline come from
:class:`~sample_dms_s3_kinesis_spark.streaming.metrics.BatchPartitionStoreTask`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.streaming.metrics import (
    BatchPartitionStoreTask,
)

EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class AggregateViewTask(BatchPartitionStoreTask):
    """Tail ``drop_dir`` for JSON-lines events and maintain an exact
    per-``group_cols`` aggregate view of ``value_col`` under
    ``store_dir`` (rows with a NULL timestamp are dropped like the
    sketch task; NULL values count rows but contribute no sum/min/
    max, matching SQL aggregate semantics on both engines).

    ``quantiles=True`` additionally maintains a mergeable bottom-k
    quantile sample per group (``operators.sketches.quantile_sketch``
    keyed by ``id_col``): each batch lands its own <=k-row sample and
    :meth:`quantile_view` merges at read by pool + re-keep — the
    quantile column algebraic aggregates cannot provide, in the same
    store with the same durability contract."""

    INPUT_SCHEMA = EVENT_VALUE_SCHEMA

    def __init__(
        self,
        spark: SparkSession,
        drop_dir: str,
        store_dir: str,
        *,
        identifier: str = "aggregate-view",
        group_cols: Sequence[str] = ("day", "event_type"),
        value_col: str = "value",
        ts_col: str = "ts",
        quantiles: bool = False,
        q_k: int = 128,
        id_col: str = "event_id",
        hash_family: str = "xxhash64",
        checkpoint_dir: str | None = None,
    ) -> None:
        self.group_cols = tuple(group_cols)
        self.value_col = value_col
        self.ts_col = ts_col
        self.quantiles = quantiles
        self.q_k = q_k
        self.id_col = id_col
        self.hash_family = hash_family
        super().__init__(
            spark,
            drop_dir,
            store_dir,
            identifier=identifier,
            checkpoint_dir=checkpoint_dir,
        )

    def _params(self) -> dict:
        p = {
            "group_cols": list(self.group_cols),
            "value_col": self.value_col,
            "ts_col": self.ts_col,
        }
        if self.quantiles:
            # sketch geometry is part of the store identity: samples
            # kept under one k cannot merge under a larger one
            p.update(
                quantiles=True,
                q_k=self.q_k,
                id_col=self.id_col,
                hash_family=self.hash_family,
            )
        return p

    def _agg_dir(self) -> str:
        return f"{self.store_dir}/_agg"

    def _qsk_dir(self) -> str:
        return f"{self.store_dir}/_qsk"

    def _store_dirs(self) -> tuple[str, ...]:
        if self.quantiles:
            return (self._agg_dir(), self._qsk_dir())
        return (self._agg_dir(),)

    def _empty_view(self, measures: str) -> DataFrame:
        """Schema-stable empty frame: group columns at their input
        types (day is the derived DATE) + the given measure columns —
        shared by view() and quantile_view() so the two cannot
        drift."""
        by_name = {
            f.name: f.dataType.simpleString()
            for f in self.INPUT_SCHEMA.fields
        }
        by_name["day"] = "date"
        fields = ", ".join(
            f"{g} {by_name.get(g, 'string')}" for g in self.group_cols
        )
        return self.spark.createDataFrame([], f"{fields}, {measures}")

    def _with_day(self, df: DataFrame) -> DataFrame:
        if "day" in self.group_cols:
            df = df.withColumn(
                "day", F.date_trunc("day", F.col(self.ts_col)).cast("date")
            )
        return df

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # persisted: the emptiness probe and the aggregate write would
        # otherwise each re-read and re-parse the JSON source (same
        # reason SketchMetricsTask persists its batch)
        ev = self._with_day(
            batch_df.filter(F.col(self.ts_col).isNotNull())
        ).persist()
        try:
            if len(ev.take(1)) == 0:
                return
            v = F.col(self.value_col)
            part = ev.groupBy(*[F.col(g) for g in self.group_cols]).agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count(v).alias("cnt_value"),
                F.sum(v).alias("sum_value"),
                F.min(v).alias("min_value"),
                F.max(v).alias("max_value"),
            )
            dst = f"{self._agg_dir()}/batch_id={batch_id}"
            part.write.mode("overwrite").parquet(dst)
            self.spark.catalog.refreshByPath(dst)
            if self.quantiles:
                from sample_dms_s3_kinesis_spark.operators.sketches import (
                    quantile_sketch,
                )

                qdst = f"{self._qsk_dir()}/batch_id={batch_id}"
                quantile_sketch(
                    ev,
                    self.value_col,
                    id_col=self.id_col,
                    k=self.q_k,
                    group_cols=self.group_cols,
                    hash_family=self.hash_family,
                ).write.mode("overwrite").parquet(qdst)
                self.spark.catalog.refreshByPath(qdst)
        finally:
            ev.unpersist()

    def quantile_view(self, qs: Sequence[float] = (0.5, 0.9, 0.99)) -> DataFrame:
        """Quantile estimates from the merged per-batch samples:
        (*group_cols, q, est).  Merge = pool + re-keep bottom-q_k per
        group (valid: every batch sample was kept under the same k),
        then the type-1 empirical quantile."""
        if not self.quantiles:
            raise ValueError("quantile_view requires quantiles=True")
        from sample_dms_s3_kinesis_spark.operators.sketches import (
            quantile_estimate,
            quantile_merge,
        )

        raw = self._read(self._qsk_dir())
        if raw is None:
            return self._empty_view("q double, est double")
        merged = quantile_merge(
            raw.drop("batch_id"), k=self.q_k, group_cols=self.group_cols
        )
        return quantile_estimate(
            merged, qs=qs, group_cols=list(self.group_cols)
        )

    # -- reads (merge at query time) -----------------------------------

    def view(self) -> DataFrame:
        """The merged exact aggregate view: (*group_cols, cnt,
        cnt_value, sum_value, min_value, max_value, avg_value)."""
        raw = self._read(self._agg_dir())
        if raw is None:
            return self._empty_view(
                "cnt long, cnt_value long, sum_value double, "
                "min_value double, max_value double, avg_value double"
            )
        merged = raw.groupBy(*[F.col(g) for g in self.group_cols]).agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("cnt_value").cast("long").alias("cnt_value"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        return merged.withColumn(
            "avg_value",
            F.when(
                F.col("cnt_value") > 0,
                F.col("sum_value") / F.col("cnt_value"),
            ),
        )
