"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The container has no image/audio libraries, so the decode kernels are
STUBBED: `decode_image` raises NotImplementedError unless `fake=True`, in
which case a deterministic fake decoder (seeded by the byte content) stands
in. Everything Spark-side — schema, batching, partition sizing, UDF
signatures — is real and tested; swapping the kernel body for PIL/ffmpeg is
a one-function change.

Scale notes: binary payloads dominate partition size, so `media_table`
repartitions by a size-aware key and the mapInPandas batch size is bounded
by `spark.sql.execution.arrow.maxRecordsPerBatch` (payload bytes, not row
count, is what OOMs executors — keep partitions ≤ maxPartitionBytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives (w, h, hash)
    from the bytes. Replace with PIL `Image.open(io.BytesIO(payload))`.
    The arithmetic is deliberately SQL-expressible (octet_length + md5) so
    the oracle can verify the whole mapInPandas plumbing end-to-end."""
    import hashlib

    n = len(payload or b"")
    h = hashlib.md5(payload or b"").hexdigest()
    return (n % 2048 + 1, (n * 7 + 13) % 2048 + 1, h)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real deployments put the decode library import inside the worker
    function (executors import it once per python worker, not per row).
    """
    if not fake:
        raise NotImplementedError(
            "image/audio decode libraries are not available in this container; "
            "call with fake=True for the deterministic stand-in kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, fh = zip(*(_fake_decode(p) for p in pdf["payload"])) if len(pdf) else ((), (), ())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "width": list(w),
                    "height": list(h),
                    "feature_hash": list(fh),
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (the decode itself is the stubbed kernel).
    Shows the explode-shaped plumbing: rows fan out before the heavy UDF so
    Spark parallelizes per frame, not per video."""
    n_frames = F.coalesce(
        F.get_json_object("meta_json", "$.n_frames").cast("int"), F.lit(0)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_idx"
        ),
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("frame_hash", StringType(), True),
    ]
)


def extract_frames(media: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Video frame sampling + per-frame decode, single map-only pass.

    Scale shape: the frame fan-out is an in-flight `explode` BEFORE the
    Arrow kernel — each video row becomes one row per sampled frame
    without any shuffle (payload duplication happens inside the task, and
    column pruning keeps non-video rows out of the scan entirely). The
    alternative — a metadata plan joined back to payloads — shuffles
    every payload once per sampled frame; at 100 TB of video that join IS
    the job. Downstream, frames are independent rows: resize/caption/
    embed kernels parallelize per frame, not per video.

    The decode kernel is stubbed like extract_features: fake=True derives
    the frame fingerprint as md5(payload ++ ':' ++ frame_idx) — real
    ffmpeg frame extraction replaces one function body.
    """
    if not fake:
        raise NotImplementedError(
            "video decode libraries are not available in this container; "
            "call with fake=True for the deterministic stand-in kernel"
        )
    n_frames = F.coalesce(
        F.get_json_object("meta_json", "$.n_frames").cast("int"), F.lit(0)
    )
    fanned = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not len(pdf):
                continue
            hashes = [
                hashlib.md5((p or b"") + b":" + str(i).encode()).hexdigest()
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "frame_hash": hashes,
                }
            )

    return fanned.mapInPandas(kernel, FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated id bytes)."""
    rows = [
        (
            f"m{i:04d}",
            ("image", "audio", "video")[i % 3],
            ("image/png", "audio/wav", "video/mp4")[i % 3],
            bytes([i % 256]) * (100 + i),
            '{"n_frames": %d}' % (30 + i) if i % 3 == 2 else None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
