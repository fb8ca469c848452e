"""Event-time streaming operators: watermarked tumbling/sliding windows,
session windows, and a custom stateful operator via
``applyInPandasWithState``.

The reference itself has no event-time semantics (SURVEY §2.7: its only
"late data" notion is the processing-time arrival filter O11) — these
are the north-star extensions a training-data/event pipeline needs, kept
as thin declarative wrappers so the SAME function works on a batch
DataFrame and on a streaming DataFrame (Structured Streaming's
unified-API contract; the batch twins are oracle-checked as
``q_tumbling_window_events`` / ``q_sessionize_events``).

Scale notes:
- Watermarks bound state: without one, a streaming windowed agg keeps
  every window open forever.  The watermark delay is the state-size ×
  completeness dial.
- Windowed aggregation shuffles on (window, keys); Spark stores partial
  aggregates in the state store keyed the same way — partition count =
  ``spark.sql.shuffle.partitions`` at first run (fixed thereafter by
  the checkpoint), so size it for the target scale up front.
- ``applyInPandasWithState`` state lives per group in the state store;
  keep per-group state bounded (here: one row of counters/last-seen,
  never an unbounded collection).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    keys: Iterable[str] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time windowed aggregation with a watermark.

    Output: (window_start, window_end, *keys, n[, sum_value]).  On a
    batch frame the watermark is a no-op and results equal the
    date_trunc batch twin; on a stream it bounds state and drops data
    later than ``watermark``.
    """
    keys = list(keys)  # a generator would be exhausted by groupBy and
    # silently DROP the key columns from the select below
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(18,4)")), 4).alias(
                "sum_value"
            )
        )
    win = F.window(F.col(ts_col), window)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *[c for c in (["n"] + (["sum_value"] if value_col else []))],
        )
    )


def sliding_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    keys: Iterable[str] = ("event_type",),
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding (hopping) windowed counts — each event lands in
    window/slide overlapping windows."""
    keys = list(keys)  # generator-safety: see tumbling_counts
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session-window aggregation: a session closes after ``gap`` of
    inactivity per key.  Batch twin: the window-cumsum sessionization
    (``q_sessionize_events``) assigns the same event→session grouping.
    Output: (user_id/key, session_start, session_end, n_events)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------
# Custom stateful operator: streaming first-occurrence dedup
# ---------------------------------------------------------------------

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("n_duplicates", T.LongType()),
    ]
)

FIRST_SEEN_STATE = T.StructType(
    [
        T.StructField("first_event_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-fingerprint state: (first_event_id, n_seen).  Emits the
    current totals each time the group receives data — downstream reads
    the latest row per fingerprint.  State is one fixed-width row per
    key: bounded, checkpointable, no unbounded collections."""
    first_id, n_seen = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_min = int(pdf["event_id"].min())
        first_id = batch_min if first_id is None else min(first_id, batch_min)
        n_seen += len(pdf)
    state.update((first_id, n_seen))
    yield pd.DataFrame(
        {
            "fingerprint": [key[0]],
            "first_event_id": [first_id],
            "n_duplicates": [n_seen - 1],
        }
    )


def streaming_first_seen(
    df: DataFrame,
    *,
    fingerprint_col: str = "fingerprint",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming first-occurrence dedup over a fingerprint column via
    ``applyInPandasWithState`` — the custom-stateful-operator escape
    hatch (SURVEY §2.7 note): per key keep (first id, seen count),
    emit updated totals per micro-batch.

    Input needs (fingerprint, event_id) columns; output one row per
    touched fingerprint per batch with its canonical first id and the
    duplicate count so far."""
    return (
        df.select(
            F.col(fingerprint_col).alias("fingerprint"),
            F.col(id_col).cast("long").alias("event_id"),
        )
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT,
            stateStructType=FIRST_SEEN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    df: DataFrame,
    *,
    keys: Iterable[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact first-occurrence dedup on a live stream — the streaming
    twin of ``operators.dedup.dedup_exact`` for ingest-time filtering
    (drop exact re-crawls/replays before they reach storage).

    Streaming input: ``dropDuplicatesWithinWatermark`` keeps one row
    per key and expires each key's state once the watermark passes its
    event time, so state is bounded by (key cardinality within the
    watermark horizon), not by stream length — the property that keeps
    this runnable forever at ingest scale.  Late duplicates beyond the
    watermark delay are the accepted trade (they'd re-emit); batch
    compaction downstream (``dedup_exact``) is the backstop.

    Batch input: plain ``dropDuplicates`` — same key semantics, so the
    stream result is checkable against the batch twin on equal data.
    """
    key_list = list(keys)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_list
        )
    return df.dropDuplicates(key_list)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded to ``right_ts`` within
    [left_ts - lookback, left_ts] — e.g. purchases joined to the clicks
    of the preceding half hour.

    Both sides carry watermarks so Spark can expire buffered state: the
    join buffers each side until the other's watermark passes the time
    bound; an unbounded stream-stream join without them would grow state
    forever.  The same function works on batch frames (watermarks no-op)
    — the batch twin is an inequality join Catalyst executes directly.
    Column names must be disjoint apart from ``by``.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{by}"))


# ---------------------------------------------------------------------
# Custom stateful operator: streaming ordered-funnel progress
# ---------------------------------------------------------------------

FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("first_micros", T.LongType()),
        T.StructField("last_micros", T.LongType()),
    ]
)

FUNNEL_STATE = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("t", T.LongType()),
        T.StructField("t0", T.LongType()),
    ]
)

_FUNNEL_NEG_INF = -(2**62)


def streaming_funnel(
    df: DataFrame,
    *,
    steps: Iterable[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``operators.analytics.user_funnel_depth``:
    per-user greedy ordered-funnel progress maintained as three scalars
    of state (current step, last matched micros, first matched micros)
    — bounded per key forever, the property that keeps a live funnel
    dashboard runnable on an unbounded stream.

    Within a micro-batch events fold in (event-time, type) order —
    identical to the batch fold's sorted array — so on in-order
    arrival the stream converges to exactly the batch answer (the
    equality the test asserts).  Events arriving across batches out of
    event-time order fold in arrival order: a late step-1 event cannot
    retroactively improve a user already past step 1 (the accepted
    streaming trade; re-run the batch operator for the exact answer).

    Output (update mode): one row per touched user per batch with the
    latest (depth, first_micros, last_micros); depth-0 users emit
    nothing.
    """
    step_list = list(steps)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        step, t, t0 = (
            state.get if state.exists else (0, _FUNNEL_NEG_INF, None)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["_t", "_y"], kind="mergesort")
            for _t, _y in zip(batch["_t"], batch["_y"]):
                if step < len(step_list) and _y == step_list[step] and _t > t:
                    step += 1
                    t = int(_t)
                    if t0 is None:
                        t0 = int(_t)
        state.update((step, t, t0))
        if step >= 1:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "depth": [step],
                    "first_micros": [t0],
                    "last_micros": [t],
                }
            )

    return (
        df.filter(F.col(type_col).isin(step_list))
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("_t"),
            F.col(type_col).alias("_y"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
