"""Multimodal columns (SURVEY.md §2.C C5): image/audio/video as opaque
``binary`` columns with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. The actual media decoding is STUBBED
(image/audio libraries are not in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake feature extractor runs through the identical
``mapInPandas`` path, proving the distributed plumbing end-to-end.

Design for 100 TB of media:
- bytes live in a ``binary`` column next to a ``meta`` struct, so
  metadata-only queries prune the (huge) bytes column at the parquet
  reader — verified via ReadSchema;
- decode/feature-extract is an Arrow-batched ``mapInPandas`` (one
  Python worker round-trip per batch, not per row);
- ``content_hash`` gives a stable partition/bucket key so re-ingestion
  dedups at the storage layer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("uri", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
        T.StructField("content_hash", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media(
    df: DataFrame, id_col: str, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap an existing column's bytes as a multimodal media column with
    typed metadata + content hash (synthetic-payload path for tests:
    any binary/string column works as the payload)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("uri"),
        payload.alias("bytes"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(f"{media_type}/x-synthetic").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
        F.sha2(payload, 256).alias("content_hash"),
    )


def _fake_feature(data: bytes, dim: int) -> list[float]:
    """Deterministic fake 'embedding': bytes → sha256 stream → floats in
    [0,1). Stands in for a real image/audio encoder. The counter suffix
    is ASCII (``data + b"0"``, ``+ b"1"``, ...) so the stream is
    replayable in engines whose sha256 takes strings (DuckDB oracle)."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(data + str(counter).encode()).digest()
        out.extend(int.from_bytes(h[i : i + 4], "big") / 2**32 for i in range(0, 32, 4))
        counter += 1
    return out[:dim]


def _pil_image():
    """Runtime probe for a real image decoder. Returns PIL.Image or
    None — checked inside the task (executor environments may differ
    from the driver's)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _pil_feature(Image, data: bytes, dim: int) -> list[float]:
    """Real image feature: decode, grayscale, resize to the smallest
    square covering ``dim`` pixels, emit the first ``dim`` pixel
    intensities in [0,1) — a deterministic, dependency-light visual
    signature (average-hash family)."""
    import io
    import math

    side = max(1, math.isqrt(dim - 1) + 1) if dim > 1 else 1
    img = Image.open(io.BytesIO(data)).convert("L").resize((side, side))
    px = list(img.getdata())
    return [p / 256.0 for p in px[:dim]] + [0.0] * max(0, dim - len(px))


def decode_media(df: DataFrame, dim: int = 16, fake: bool = False, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract media rows via Arrow-batched mapInPandas.

    With ``fake=True`` a deterministic stand-in featurizer runs through
    the full distributed path. With ``fake=False`` the task probes for a
    real decoder at runtime (PIL for images) and uses it when present;
    without one it raises ``NotImplementedError`` — honestly, rather
    than silently degrading to the fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else _pil_image()
        for pdf in batches:
            if not fake and Image is None:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg; "
                    "install PIL or run with fake=True for the deterministic stand-in"
                )
            feat = (
                (lambda b: _fake_feature(b, dim))
                if fake
                else (lambda b: _pil_feature(Image, b, dim))
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": [m["media_type"] if m is not None else None for m in pdf["meta"]],
                    "feature": [feat(bytes(b) if b is not None else b"") for b in pdf["bytes"]],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["bytes"]],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, format: str = "PNG") -> DataFrame:
    """Resize image bytes via Arrow-batched mapInPandas when PIL is
    available (bytes in → re-encoded bytes out, meta.width/height/
    n_bytes and content_hash updated); raises ``NotImplementedError``
    at task runtime without a decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil_image()
        for pdf in batches:
            if Image is None:
                raise NotImplementedError(
                    "image resize requires PIL; not available in this environment"
                )
            out_bytes, metas, hashes = [], [], []
            for b, m in zip(pdf["bytes"], pdf["meta"]):
                img = Image.open(io.BytesIO(bytes(b))).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format=format)
                data = buf.getvalue()
                meta = dict(m) if m is not None else {}
                meta.update(
                    {
                        "width": width,
                        "height": height,
                        "n_bytes": len(data),
                        "mime": f"image/{format.lower()}",
                    }
                )
                out_bytes.append(data)
                metas.append(meta)
                hashes.append(hashlib.sha256(data).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "uri": pdf["uri"],
                    "bytes": out_bytes,
                    "meta": metas,
                    "content_hash": hashes,
                }
            )

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """STUB: video frame sampling (no ffmpeg in container)."""
    raise NotImplementedError("frame sampling requires ffmpeg; not available in this container")


def frame_sample_plan(media: DataFrame, k: int = 4, fps: int = 24) -> DataFrame:
    """Uniform frame-sampling PLAN for video media (r8): per clip, the
    ``k`` frame indices a decoder would extract — frame_idx(i) =
    i·total_frames div k, the standard uniform sampler of video
    training pipelines. This is the metadata/plumbing half (all-Catalyst
    explode, integer-exact); the pixel extraction itself is the
    env-gated ffmpeg stub (:func:`sample_frames`). Duration derives
    deterministically from the payload size when the meta carries none
    (synthetic fixtures), so the plan is hash-checkable end-to-end.

    Scale shape: reads meta only (bytes pruned at the scan), one narrow
    explode to k rows per clip — no shuffle at all until a consumer
    aggregates."""
    dur_ms = F.coalesce(
        F.col("meta.duration_ms"),
        (F.lit(1000) + (F.col("meta.n_bytes") % 120) * 1000).cast("long"),
    )
    # integer DIV throughout — float division would last-ulp-wobble the
    # truncation cross-engine
    return (
        media.select("media_id", dur_ms.alias("duration_ms"))
        .select(
            "media_id",
            "duration_ms",
            F.greatest(
                F.expr(f"(duration_ms * {int(fps)}) DIV 1000"), F.lit(1)
            ).alias("total_frames"),
        )
        .select(
            "media_id",
            "total_frames",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("frame_no"),
        )
        .select(
            "media_id",
            "frame_no",
            F.expr(f"(frame_no * total_frames) DIV {int(k)}").alias("frame_idx"),
            "total_frames",
        )
        .orderBy("media_id", "frame_no")
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — reads meta/content_hash, prunes bytes
    at the parquet scan (the 100 TB-friendly access path)."""
    return (
        df.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.countDistinct("content_hash").alias("distinct_content"),
        )
        .orderBy("media_type")
    )
