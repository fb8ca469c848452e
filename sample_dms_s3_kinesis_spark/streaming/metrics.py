"""Streaming sketch-metrics maintenance — the metrics-store story
wired into Structured Streaming.

``q_hll_daily_union`` / ``q_cms_daily_freq`` / ``q_kmv_user_overlap``
show the BATCH shape of mergeable synopses; this task keeps them
CURRENT as events arrive, with the same incremental-apply pattern the
reference's driver exercises (`/root/reference/run.py:193-198`: new
data lands, derived state updates incrementally) and the same
durability contract as ``CorpusIngestTask``:

- each micro-batch writes its OWN per-day sketch tables under
  ``_cms/batch_id=N`` and ``_kmv/batch_id=N`` with overwrite
  semantics — a crash-replay of batch N overwrites the same
  directories, so counters are never double-merged;
- MERGING happens at read time, which is sound precisely because the
  sketches are relational: CMS merge is a counter re-aggregation
  (``cms_merge``), KMV merge is pool-distinct-rekeep (``kmv_union``)
  — both indifferent to how the inputs were batched;
- at 100 TB the per-batch directories become a table format's
  transaction log and the read-time merge is a partition-pruned
  aggregate over d·w (CMS) or k (KMV) rows per batch-day — the raw
  events are never rescanned.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.operators.sketches import (
    cms_table,
    kmv_table,
)
from sample_dms_s3_kinesis_spark.tasks import (
    ReplicationTask,
    TaskStatus,
    pin_checkpoint,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


class BatchPartitionStoreTask(ReplicationTask):
    """Shared skeleton for tasks that tail a JSON-lines drop directory
    and maintain per-batch overwrite-idempotent parquet partitions
    under a store: the streaming lifecycle, the drain-mode file
    manifest with its interrupted-drain rollback marker, and the
    store-parameter pinning.  Subclasses implement ``_store_dirs()``
    (the partitioned table roots to roll back), ``_params()`` (the
    store's identity) and ``_process_batch``.

    Streaming restarts MUST reuse the same ``checkpoint_dir`` for a
    given store (the standard Structured Streaming contract): epoch
    ids name the batch directories, so a fresh checkpoint would
    replay epoch 0 over a different batch's partitions.  Drain-mode
    (:meth:`process_available`) batches are file-manifest-tracked and
    live in a separate id range, so drains are repeat-safe and never
    collide with stream epochs."""

    INPUT_SCHEMA = EVENT_SCHEMA

    def __init__(
        self,
        spark: SparkSession,
        drop_dir: str,
        store_dir: str,
        *,
        identifier: str,
        checkpoint_dir: str | None = None,
    ) -> None:
        super().__init__(identifier)
        self.spark = spark
        self.drop_dir = drop_dir
        self.store_dir = store_dir.rstrip("/")
        self.checkpoint_dir = (
            checkpoint_dir or f"/tmp/{identifier}-checkpoint-{uuid.uuid4()}"
        )
        self._query = None
        os.makedirs(self.store_dir, exist_ok=True)
        # Store parameters are part of the STORE's identity — there
        # are no raw events to recompute from, so a mismatch is an
        # error, not a fallback (same hazard
        # CorpusIngestTask._sig_params_ok guards).
        self._check_or_write_params()

    def _store_dirs(self) -> tuple[str, ...]:
        raise NotImplementedError

    def _params(self) -> dict:
        raise NotImplementedError

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        raise NotImplementedError

    def _params_file(self) -> str:
        return f"{self.store_dir}/_PARAMS.json"

    def _check_or_write_params(self) -> None:
        import json as _json

        pf = self._params_file()
        if os.path.exists(pf):
            with open(pf) as f:
                stored = _json.load(f)
            if stored != self._params():
                raise ValueError(
                    f"store {self.store_dir} was built with "
                    f"{stored}; this task was configured with "
                    f"{self._params()} — partitions written under "
                    "different parameters cannot be merged and there "
                    "are no raw events to rebuild from"
                )
        else:
            tmp = pf + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(self._params(), f)
            os.replace(tmp, pf)

    # -- lifecycle -----------------------------------------------------

    def _checkpoint_marker(self) -> str:
        return f"{self.store_dir}/_CHECKPOINT"

    def start(self) -> None:
        self._set_status(TaskStatus.STARTING)
        try:
            self._start_stream()
        except Exception:
            # a refused start (checkpoint pin) must not strand the
            # status at STARTING — pollers watch for terminal states
            self._set_status(TaskStatus.FAILED)
            raise
        self._set_status(TaskStatus.RUNNING)

    def _start_stream(self) -> None:
        # Stream epoch ids name the batch directories, so restarting a
        # populated store with a DIFFERENT checkpoint would replay
        # epoch 0 over another batch's partitions (mode=overwrite
        # clobbers them).  Pin the checkpoint the store was streamed
        # with — shared enforcement with CorpusIngestTask; DRAIN
        # batches (ids >= 1e9) are manifest-keyed and unaffected.
        pin_checkpoint(
            self._checkpoint_marker(),
            self.checkpoint_dir,
            populated=any(b < 1_000_000_000 for b in self._batch_ids()),
            what=f"store {self.store_dir}",
        )
        src = (
            self.spark.readStream.schema(self.INPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(self.drop_dir)
            # the source file path rides along so the batch callback
            # can drop rows from drain-consumed files (resolved here:
            # inside foreachBatch the frame is a LogicalRDD and
            # _metadata no longer binds)
            .withColumn("_src_file", F.col("_metadata.file_path"))
        )

        def _gated_batch(df: DataFrame, batch_id: int) -> None:
            # Files consumed by a DRAIN must not re-enter through the
            # stream: a restart under a different checkpoint
            # re-discovers every drop file, and these stores have no
            # content dedup — re-sketching/re-aggregating a drained
            # file silently double-merges it.  The manifest holds
            # paths; compare by basename (drop-file names are unique
            # in one directory).
            import json as _json
            import os as _os

            mf = f"{self.store_dir}/_FILES.json"
            seen: list = []
            if _os.path.exists(mf):
                with open(mf) as f:
                    seen = _json.load(f)
            names = {_os.path.basename(p) for p in seen}
            # the epoch's file set: tiny (maxFilesPerTrigger=1) and
            # needed twice — to gate, and to record below so a later
            # DRAIN cannot re-consume stream-processed files (the
            # manifest is the unified consumed-files ledger for BOTH
            # paths; re-recording on a crash-replayed epoch is a
            # set-union no-op, and the overwrite-idempotent partition
            # write keeps the data correct either way)
            batch_files = [
                r[0] for r in df.select("_src_file").distinct().collect()
            ]
            fresh = [
                p for p in batch_files
                if _os.path.basename(p) not in names
            ]
            if names and len(fresh) < len(batch_files):
                df = df.filter(
                    ~F.element_at(
                        F.split(F.col("_src_file"), "/"), -1
                    ).isin(sorted(names))
                )
            self._process_batch(df.drop("_src_file"), batch_id)
            if fresh:
                tmp = mf + ".tmp"
                with open(tmp, "w") as f:
                    _json.dump(seen + sorted(fresh), f)
                _os.replace(tmp, mf)

        self._query = (
            src.writeStream.foreachBatch(_gated_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def stop(self) -> None:
        if self._query is not None:
            try:
                self._query.processAllAvailable()
            except Exception:
                pass
            self._query.stop()
            try:
                self._query.awaitTermination(30)
            except Exception:
                pass
        self._set_status(TaskStatus.STOPPED)

    def process_available(self) -> None:
        """Drain-and-return: every NOT-YET-PROCESSED drop file as one
        batch.  A file manifest makes repeated drains idempotent —
        unlike the admission-gated ingest task, sketch counters have
        no content dedup, so re-reading an already-sketched file would
        silently double-merge it.  Drain batch ids live in a high
        range (1e9+) so they can never collide with the streaming
        path's checkpoint epoch ids (which ``mode=overwrite`` would
        otherwise clobber)."""
        import json as _json

        import shutil as _shutil

        if self.status == TaskStatus.READY.value:
            self._set_status(TaskStatus.RUNNING)
        mf = f"{self.store_dir}/_FILES.json"
        seen: list[str] = []
        if os.path.exists(mf):
            with open(mf) as f:
                seen = _json.load(f)
        # Reconcile an interrupted drain: _process_batch writes the
        # sketch partitions BEFORE the manifest update below records
        # the files as seen, so a crash in that window would re-sketch
        # the same files on the next drain under a NEW batch id —
        # silently double-merging counters (sketches have no content
        # dedup to catch it).  The in-flight marker written before
        # processing makes the window detectable: if its files never
        # reached the manifest, the drain did not commit — roll its
        # (possibly partial) sketch partitions back and let the files
        # re-drain; if they did, only the marker removal was lost.
        pf = f"{self.store_dir}/_PENDING.json"
        if os.path.exists(pf):
            try:
                with open(pf) as f:
                    inflight = _json.load(f)
            except (OSError, ValueError):
                inflight = None
            # basename comparison throughout: drains record local
            # paths while the stream gate records source URIs
            # (file:/...); the two spellings must read as one ledger
            seen_names = {os.path.basename(p) for p in seen}
            if inflight and not {
                os.path.basename(p) for p in inflight.get("files", [])
            } <= seen_names:
                for d in self._store_dirs():
                    part = f"{d}/batch_id={int(inflight['id'])}"
                    _shutil.rmtree(part, ignore_errors=True)
                    # A partially-failed rollback (e.g. EACCES on one
                    # partition) must KEEP the marker — removing it
                    # would forget the surviving partitions and double-
                    # merge them once the files re-drain.  Fail loudly;
                    # the next drain retries the rollback.
                    if os.path.exists(part):
                        raise OSError(
                            f"interrupted-drain rollback could not "
                            f"remove {part}; keeping _PENDING marker "
                            f"for retry"
                        )
            os.remove(pf)
        consumed = {os.path.basename(p) for p in seen}
        pending = sorted(
            os.path.join(self.drop_dir, n)
            for n in os.listdir(self.drop_dir)
            if not n.endswith(".tmp") and n not in consumed
        )
        if not pending:
            return
        next_id = (
            max((b for b in self._batch_ids() if b >= 1_000_000_000),
                default=999_999_999)
            + 1
        )
        tmp = pf + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"id": next_id, "files": pending}, f)
        os.replace(tmp, pf)
        df = self.spark.read.schema(self.INPUT_SCHEMA).json(pending)
        self._process_batch(df, next_id)
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(seen + pending, f)
        os.replace(tmp, mf)
        try:
            os.remove(pf)
        except OSError:
            pass

    # -- store ---------------------------------------------------------

    def _batch_ids(self) -> list[int]:
        ids = set()
        for d in self._store_dirs():
            if os.path.isdir(d):
                for name in os.listdir(d):
                    if name.startswith("batch_id="):
                        ids.add(int(name.split("=", 1)[1]))
        return sorted(ids)

    def _read(self, root: str) -> DataFrame | None:
        ids = [
            b
            for b in self._batch_ids()
            if os.path.isdir(f"{root}/batch_id={b}")
        ]
        if not ids:
            return None
        return self.spark.read.option("basePath", root).parquet(
            *[f"{root}/batch_id={b}" for b in ids]
        )


class SketchMetricsTask(BatchPartitionStoreTask):
    """Tail ``drop_dir`` for JSON-lines events and maintain per-day
    frequency (CMS over ``freq_col``) and distinct (KMV over
    ``distinct_col``) sketch stores under ``store_dir``.  Sketch
    parameters are pinned as the store's identity: counters bucketed
    mod one width are meaningless under another, and a KMV threshold
    moves with k."""

    def __init__(
        self,
        spark: SparkSession,
        drop_dir: str,
        store_dir: str,
        *,
        identifier: str = "sketch-metrics",
        freq_col: str = "event_type",
        distinct_col: str = "user_id",
        ts_col: str = "ts",
        width: int = 1024,
        depth: int = 5,
        k: int = 256,
        checkpoint_dir: str | None = None,
    ) -> None:
        # subclass attrs land BEFORE super().__init__: the base
        # constructor validates _params() against the store
        self.freq_col = freq_col
        self.distinct_col = distinct_col
        self.ts_col = ts_col
        self.width = width
        self.depth = depth
        self.k = k
        super().__init__(
            spark,
            drop_dir,
            store_dir,
            identifier=identifier,
            checkpoint_dir=checkpoint_dir,
        )

    def _params(self) -> dict:
        return {
            "width": self.width,
            "depth": self.depth,
            "k": self.k,
            "freq_col": self.freq_col,
            "distinct_col": self.distinct_col,
        }

    def _cms_dir(self) -> str:
        return f"{self.store_dir}/_cms"

    def _kmv_dir(self) -> str:
        return f"{self.store_dir}/_kmv"

    def _store_dirs(self) -> tuple[str, ...]:
        return (self._cms_dir(), self._kmv_dir())

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # persisted: the head probe + the CMS and KMV writes would
        # otherwise each re-read and re-parse the JSON source (the
        # same reason cdc_task persists its parse and ingest persists
        # its admitted frame)
        ev = batch_df.filter(
            F.col(self.ts_col).isNotNull()
        ).withColumn(
            "day", F.date_trunc("day", F.col(self.ts_col)).cast("date")
        ).persist()
        if len(ev.take(1)) == 0:
            ev.unpersist()
            return
        (
            cms_table(
                ev,
                self.freq_col,
                width=self.width,
                depth=self.depth,
                group_cols=("day",),
            )
            .write.mode("overwrite")
            .parquet(f"{self._cms_dir()}/batch_id={batch_id}")
        )
        (
            kmv_table(
                ev, self.distinct_col, k=self.k, group_cols=("day",)
            )
            .drop("rn")
            .write.mode("overwrite")
            .parquet(f"{self._kmv_dir()}/batch_id={batch_id}")
        )
        for p in (
            f"{self._cms_dir()}/batch_id={batch_id}",
            f"{self._kmv_dir()}/batch_id={batch_id}",
        ):
            self.spark.catalog.refreshByPath(p)
        ev.unpersist()

    # -- reads (merge at query time) -----------------------------------

    def cms(self, *, day=None) -> DataFrame:
        """The merged CMS counter table — per day (default) or for one
        ``day``: (day?, d, b, cnt)."""
        raw = self._read(self._cms_dir())
        if raw is None:
            return self.spark.createDataFrame(
                [], "day date, d int, b int, cnt long"
            )
        if day is not None:
            return (
                raw.filter(F.col("day") == F.lit(day))
                .groupBy("d", "b")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        return raw.groupBy("day", "d", "b").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    def freq_estimate(self, probes: DataFrame) -> DataFrame:
        """Range (all-days) frequency estimates for the probe values:
        (freq_col, est_count)."""
        from sample_dms_s3_kinesis_spark.operators.sketches import (
            cms_estimate,
        )

        raw = self._read(self._cms_dir())
        if raw is None:
            return probes.select(self.freq_col).distinct().select(
                F.col(self.freq_col),
                F.lit(0).cast("long").alias("est_count"),
            ).filter(F.lit(False))
        merged = raw.groupBy("d", "b").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        return cms_estimate(
            merged, probes, self.freq_col,
            width=self.width, depth=self.depth,
        )

    def distinct_estimate(self) -> DataFrame:
        """Per-day distinct estimates from the merged KMV stores plus
        one all-days row (day NULL) — the q_hll_daily_union shape
        served from incrementally-maintained synopses:
        (day, est_distinct)."""
        from sample_dms_s3_kinesis_spark.operators.sketches import (
            _bottom_k,
            kmv_estimate,
        )

        raw = self._read(self._kmv_dir())
        if raw is None:
            return self.spark.createDataFrame(
                [], "day date, est_distinct double"
            )
        per_day = _bottom_k(
            raw.select("day", "h").distinct(),
            k=self.k,
            group_cols=("day",),
        )
        days = kmv_estimate(per_day, k=self.k)
        overall = _bottom_k(raw.select("h").distinct(), k=self.k)
        total = kmv_estimate(overall, k=self.k).select(
            F.lit(None).cast("date").alias("day"), "est_distinct"
        )
        return days.unionByName(total)
