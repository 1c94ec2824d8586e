"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

Decode status by format:
- UNCOMPRESSED formats decode for REAL: BMP 24-bit and WAV PCM16 via the
  pure-numpy parsers in functions/codecs.py (header/chunk walking, row
  stride, channel order — the real thing, no libraries needed).
- COMPRESSED formats (PNG/JPEG/MP4) are STUBBED: the container has no
  image/audio libraries, so their decode raises NotImplementedError
  unless `fake=True`, in which case a deterministic fake decoder (seeded
  by the byte content) stands in. Everything Spark-side — schema,
  batching, partition sizing, UDF signatures — is identical between the
  real and fake kernels; swapping in PIL/ffmpeg is a one-function change.

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
    LongType,
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
        StructField("px_sum", LongType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("amp_sum", LongType(), True),
        StructField("data_md5", StringType(), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, "object"]:
    """Real image decode dispatch: BMP decodes via the pure-numpy parser;
    compressed formats stay stubbed until a decode library exists."""
    p = payload or b""
    if p[:2] == b"BM":
        from .codecs import decode_bmp

        return decode_bmp(p)
    if p[:2] == b"P6":
        from .codecs import decode_ppm

        return decode_ppm(p)
    if p[:8] == b"\x89PNG\r\n\x1a\n" or p[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "PNG/JPEG decode needs an image library not present in this "
            "container; only uncompressed BMP/TGA decode for real"
        )
    # TGA has no magic: validate the header shape (type-2 true-color,
    # no colormap, 24bpp) before trusting it
    if len(p) >= 18 and p[1] == 0 and p[2] == 2 and p[16] == 24:
        from .codecs import decode_tga

        return decode_tga(p)
    raise ValueError("unrecognized image payload")


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

    `fake=False` runs the REAL decoder (BMP via functions/codecs.py):
    width/height come from the parsed header, `px_sum` is the sum over the
    DECODED pixel array (invariant to the decoder's row-flip/BGR→RGB
    normalization, so the SQL oracle can verify it byte-wise), and
    `feature_hash` is md5 over the stored pixel-array region (padding
    excluded). Compressed formats raise NotImplementedError — pass
    `fake=True` for the deterministic stand-in kernel.

    Real deployments put any decode library import inside the worker
    function (executors import it once per python worker, not per row).
    """

    def fake_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, fh = zip(*(_fake_decode(p) for p in pdf["payload"])) if len(pdf) else ((), (), ())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "width": list(w),
                    "height": list(h),
                    "px_sum": pdf["payload"].map(
                        lambda b: int(sum(b)) if b is not None else 0
                    ),
                    "feature_hash": list(fh),
                }
            )

    def real_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .codecs import image_stored_pixel_bytes

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "n_bytes", "width", "height",
                    "px_sum", "feature_hash")}
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, px = decode_image(p)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(p or b""))
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(px.sum(dtype="int64")))
                out["feature_hash"].append(
                    hashlib.md5(image_stored_pixel_bytes(p)).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fake_kernel if fake else real_kernel, FEATURES_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode via the RIFF chunk walker (functions/codecs.py):
    rate/channels from the parsed `fmt ` chunk, `amp_sum` = Σ|sample| over
    the decoded int16 array, `data_md5` = md5 of the `data` chunk bytes
    actually consumed (trailing odd byte excluded). Map-only Arrow pass —
    same 100 TB shape as every other media kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from .codecs import decode_wav

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_channels", "n_samples",
                    "amp_sum", "data_md5")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, _, samples = decode_wav(p)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_samples"].append(len(samples))
                out["amp_sum"].append(int(np.abs(samples.astype(np.int64)).sum()))
                out["data_md5"].append(
                    hashlib.md5(samples.astype("<i2").tobytes()).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def bmp_media_from_text(docs: DataFrame, width: int = 4) -> DataFrame:
    """Test-payload builder: each document's text bytes become the pixel
    array of a REAL bottom-up 24bpp BMP (height = ⌊bytes/(3·width)⌋; the
    default width 4 gives stride 12, no padding, so the stored pixel
    region is exactly a text prefix — which keeps every decoded feature
    SQL-expressible for the oracle)."""
    row_bytes = width * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads, ids = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                h = len(data) // row_bytes
                data = data[: h * row_bytes]
                off = 54
                header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
                info = struct.pack(
                    "<IiiHHIIiiII", 40, width, h, 1, 24, 0,
                    len(data), 2835, 2835, 0, 0,
                )
                payloads.append(header + info + data)
                ids.append(str(mid))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/bmp",
                    "payload": payloads,
                    "meta_json": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, MEDIA_SCHEMA)


def tga_media_from_text(docs: DataFrame, width: int = 4) -> DataFrame:
    """Test-payload builder, TGA edition: each document's text bytes
    become the pixel region of a REAL bottom-up type-2 24bpp TGA (18-byte
    header, no row padding, so the stored region is exactly a text
    prefix and every decoded feature stays SQL-expressible)."""
    row_bytes = width * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads, ids = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                h = len(data) // row_bytes
                data = data[: h * row_bytes]
                header = struct.pack(
                    "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, width, h, 24, 0
                )
                payloads.append(header + data)
                ids.append(str(mid))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/x-tga",
                    "payload": payloads,
                    "meta_json": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, MEDIA_SCHEMA)


def ppm_media_from_text(docs: DataFrame, width: int = 4) -> DataFrame:
    """Test-payload builder, netpbm edition: text bytes become the RGB
    raster of a REAL binary P6 PPM whose header carries a comment line,
    so decoding exercises the whitespace/comment tokenizer. The raster
    is exactly a text prefix — every decoded feature stays
    SQL-expressible (the TGA/BMP scheme)."""
    row_bytes = width * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ids = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                h = len(data) // row_bytes
                data = data[: h * row_bytes]
                header = f"P6\n# t\n{width} {h}\n255\n".encode("ascii")
                payloads.append(header + data)
                ids.append(str(mid))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "mime": "image/x-portable-pixmap",
                    "payload": payloads,
                    "meta_json": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, MEDIA_SCHEMA)


def wav_media_from_text(docs: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Test-payload builder: text bytes (truncated to even length) become
    the PCM16 `data` chunk of a real RIFF/WAVE file, with a junk `LIST`
    chunk before `fmt ` so decoding requires an actual chunk walk."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import encode_wav

        for pdf in batches:
            payloads, ids = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
                payloads.append(
                    encode_wav(samples, sample_rate,
                               extra_chunks=[(b"LIST", b"INFOjunk!")])
                )
                ids.append(str(mid))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "mime": "audio/wav",
                    "payload": payloads,
                    "meta_json": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, MEDIA_SCHEMA)


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


def avi_media_from_text(docs: DataFrame, width: int = 4, frame_rows: int = 2) -> DataFrame:
    """Test-payload builder: each document's text bytes become the stored
    frame bytes of a REAL uncompressed AVI (functions/codecs.encode_avi).
    width 4 ⇒ stride 12, no padding; frame_rows 2 ⇒ 24 stored bytes per
    frame, so frame f's stored region is exactly text[24f : 24f+24] and
    every decoded feature stays SQL-expressible. Pixels are pre-flipped
    (row order + BGR) so the ENCODER's bottom-up BGR storage lands the
    raw text bytes in the file."""
    row_bytes = width * 3
    frame_bytes = row_bytes * frame_rows

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import encode_avi

        for pdf in batches:
            payloads, ids = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                n = len(data) // frame_bytes
                arr = np.frombuffer(data, np.uint8, n * frame_bytes).reshape(
                    n, frame_rows, width, 3
                )
                # stored = pixels[::-1 rows][:, ::-1 channels]; invert both
                px = arr[:, ::-1, :, ::-1]
                payloads.append(encode_avi(px, fps=10))
                ids.append(str(mid))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "video",
                    "mime": "video/x-msvideo",
                    "payload": payloads,
                    "meta_json": None,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(kernel, MEDIA_SCHEMA)


def extract_video_features(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video decode (uncompressed AVI via functions/codecs.py): one
    map-only Arrow pass decodes each payload ONCE and emits a row per
    sampled frame — width/height from the parsed strf header, px_sum over
    the decoded frame, frame_hash over the stored frame bytes (padding
    excluded, normalization-invariant).

    Shape note vs extract_frames: there the frame fan-out explodes BEFORE
    the kernel (right when frames decode independently — keyframe seeks);
    a container whose frames interleave in one stream decodes once per
    video, so the fan-out happens INSIDE the kernel (mapInPandas may emit
    more rows than it consumes) — still map-only, no payload duplication,
    no shuffle. Compressed fourccs raise NotImplementedError (honest
    stub; no ffmpeg in this container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .codecs import avi_stored_frame_bytes, decode_avi

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "width", "height",
                    "px_sum", "frame_hash")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = decode_avi(p)
                for fi in range(0, len(frames), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["px_sum"].append(int(frames[fi].sum(dtype="int64")))
                    out["frame_hash"].append(
                        hashlib.md5(avi_stored_frame_bytes(p, fi)).hexdigest()
                    )
            yield pd.DataFrame(out)

    schema = ("media_id string, frame_idx int, width int, height int, "
              "px_sum long, frame_hash string")
    return media.filter(F.col("kind") == "video").mapInPandas(kernel, schema)
