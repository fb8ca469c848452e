"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode kernels are
STUBBED (deterministic fakes clearly marked below) — but everything
Spark-side is real and tested: schemas, batch iteration, partition
sizing, UDF signatures, and the metadata contract.  Swapping a stub for
Pillow/torchaudio changes one inner function, not the plan.

Scale notes: media blobs dominate row size, so
- keep blobs out of shuffles: derive features first, then join/agg the
  small feature frames;
- size partitions by bytes not rows (``spark.sql.files.maxPartitionBytes``);
- mapInPandas streams Arrow batches — bound batch memory with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows are wide.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata contract for a multimodal asset column.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("resized_width", T.IntegerType(), True),
        T.StructField("resized_height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB: real impl would be PIL.Image.open(io.BytesIO(content)).size.

    Deterministic fake derived from content bytes so tests are stable.
    Raises for empty content the way a real decoder raises for corrupt
    files — exercising the error path the plumbing must survive."""
    if not content:
        raise ValueError("empty media content")
    h = hashlib.sha256(content).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _feature_stub(content: bytes, dim: int = 8) -> list[float]:
    """STUB: real impl = vision encoder forward pass. Deterministic
    hash-derived pseudo-embedding with the correct shape/dtype."""
    h = hashlib.sha256(content).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_image_features(
    df: DataFrame,
    *,
    target_size: tuple[int, int] = (224, 224),
    on_error: str = "null",
) -> DataFrame:
    """Decode + resize + featurize image assets with mapInPandas.

    ``on_error='null'`` keeps corrupt rows (feature columns null) so the
    pipeline can route them to an exceptions channel instead of failing
    the job — same philosophy as the CDC try_cast path."""
    tw, th = target_size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": [],
                "content_sha256": [],
                "n_bytes": [],
                "resized_width": [],
                "resized_height": [],
                "feature": [],
            }
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                out["asset_id"].append(asset_id)
                try:
                    blob = bytes(content) if content is not None else b""
                    w, h = _decode_image_stub(blob)
                    out["content_sha256"].append(hashlib.sha256(blob).hexdigest())
                    out["n_bytes"].append(len(blob))
                    out["resized_width"].append(min(w, tw))
                    out["resized_height"].append(min(h, th))
                    out["feature"].append(_feature_stub(blob))
                except Exception:
                    if on_error != "null":
                        raise
                    out["content_sha256"].append(None)
                    out["n_bytes"].append(None)
                    out["resized_width"].append(None)
                    out["resized_height"].append(None)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return df.select("asset_id", "content").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (asset, frame_ts)
    — the Spark-side fan-out is real (sequence+explode, no Python); the
    per-frame decode would plug into extract_image_features.  Raises
    NotImplementedError only in the decode kernel, not the plan."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_assets(spark, n: int = 16) -> DataFrame:
    """Deterministic fake asset table for tests (binary payloads derived
    from the id)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(str(i).encode()).digest() * 4
        media = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                media,
                bytearray(content if i % 5 != 0 or i == 0 else b""),
                None,
                None,
                16000 if media == "audio" else None,
                3000 if media == "video" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("resampled_rate", T.IntegerType(), True),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_audio_features(
    df: DataFrame,
    *,
    target_rate: int = 16_000,
    window_ms: int = 25,
    on_error: str = "null",
) -> DataFrame:
    """Resample + windowed featurization for audio assets via
    mapInPandas.  The decode/resample kernel is a STUB (real impl:
    torchaudio/librosa load + resample); the batch plumbing, window
    count arithmetic, and error channel are real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": [],
                "n_bytes": [],
                "resampled_rate": [],
                "n_windows": [],
                "feature": [],
            }
            for asset_id, content, rate, dur in zip(
                pdf["asset_id"], pdf["content"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                out["asset_id"].append(asset_id)
                try:
                    blob = bytes(content) if content is not None else b""
                    if not blob:
                        raise ValueError("empty media content")
                    # STUB decode: duration from metadata when present,
                    # else proportional to payload size.
                    duration_ms = int(dur) if dur is not None and not pd.isna(dur) else len(blob)
                    n_windows = max(duration_ms // window_ms, 1)
                    out["n_bytes"].append(len(blob))
                    out["resampled_rate"].append(target_rate)
                    out["n_windows"].append(int(n_windows))
                    out["feature"].append(_feature_stub(blob))
                except Exception:
                    if on_error != "null":
                        raise
                    out["n_bytes"].append(None)
                    out["resampled_rate"].append(None)
                    out["n_windows"].append(None)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return df.select("asset_id", "content", "sample_rate", "duration_ms").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )
