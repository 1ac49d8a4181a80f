"""Content-addressed media pipeline (SURVEY.md §2.1 S15/S16).

Reference semantics:
- media keyed sha1(url), stored with checksum, re-fetch skipped while
  fresh (< EXPIRES days) (/root/reference/crawler/pipelines/
  file.py:170-264, freshness 225-256, key 258-264).
- image variant with thumbnail sizes (/root/reference/crawler/
  pipelines/image.py:41-64,103-139; IMAGES_THUMBS settings.py:356-359).

Spark rebuild: media spans → candidate media URLs → freshness
left-anti join against the media table → fetch-batch emit → media
append (content-addressed, idempotent). Decode/thumbnail is a
deterministic STUB behind mapInPandas (no image libs in-sandbox) with
real Spark plumbing: binary columns, Arrow batches, typed schema.
"""

from __future__ import annotations

import hashlib
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_EXPIRES_DAYS = 90  # FILES_EXPIRES / IMAGES_EXPIRES default


def media_candidates(documents: DataFrame) -> DataFrame:
    """documents.spans → one row per media span, in document order:
    (doc_id, media_ref, kind, media_url, media_key)."""
    rows = documents.select(
        "doc_id", "url", F.explode("spans").alias("span")
    ).filter(F.col("span.kind").isin("image", "file"))
    media_url = F.concat(
        F.lit("http://media.example/"), F.col("span.media_ref")
    )
    return rows.select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
        media_url.alias("media_url"),
        F.sha1(media_url).alias("media_key"),  # file.py:258-264
        F.col("span.offset").alias("offset"),
    )


def needs_fetch(
    candidates: DataFrame,
    media: DataFrame | None,
    now_expr=None,
    expires_days: int = MEDIA_EXPIRES_DAYS,
) -> DataFrame:
    """Freshness gate (file.py:225-256): fetch a media key only if it is
    absent or stale. left join + filter (J4)."""
    if media is None:
        return candidates.dropDuplicates(["media_key"])
    now_expr = now_expr if now_expr is not None else F.current_timestamp()
    fresh = media.filter(
        F.col("fetched_at") > F.date_sub(now_expr.cast("date"), expires_days)
    ).select("media_key")
    return candidates.join(fresh, "media_key", "left_anti").dropDuplicates(
        ["media_key"]
    )


def fetch_media_stub(batch: DataFrame, round_id: int) -> DataFrame:
    """Simulated media fetch + decode over mapInPandas: payload bytes
    are a deterministic function of the key (the real downloader plugs
    in here); checksum mirrors the GridFS md5 (file.py:241-247)."""

    def fetch(batches):
        for pdf in batches:
            payloads = [
                zlib.compress(k.encode(), 1) for k in pdf["media_key"]
            ]
            yield pd.DataFrame(
                {
                    "media_key": pdf["media_key"],
                    "url": pdf["media_url"],
                    "content_type": [
                        "image/fake" if k == "image" else "application/fake"
                        for k in pdf["kind"]
                    ],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "payload": payloads,
                }
            )

    out = batch.select("media_key", "media_url", "kind").mapInPandas(
        fetch,
        schema="media_key string, url string, content_type string, "
        "checksum string, payload binary",
    )
    return out.withColumn("fetched_round", F.lit(round_id)).withColumn(
        "fetched_at", F.current_timestamp()
    )


IMAGES_THUMBS = {"small": (270, 270), "big": (970, 970)}  # settings.py:356-359


def with_thumb_dims(
    df: DataFrame,
    src_w: str = "src_w",
    src_h: str = "src_h",
    box_w: str = "box_w",
    box_h: str = "box_h",
) -> DataFrame:
    """Aspect-fit thumbnail box computation (image.py:103-139 →
    PIL Image.thumbnail semantics) as REAL integer column expressions:
    never upscale; otherwise fit the box preserving aspect ratio with
    floor division; dimensions never collapse below 1. Exact integer
    arithmetic — identical in DuckDB with `//`."""
    y1 = f"(({box_w} * {src_h}) DIV {src_w})"
    x2 = f"(({box_h} * {src_w}) DIV {src_h})"
    out_w = (
        f"CASE WHEN {src_w} <= {box_w} AND {src_h} <= {box_h} THEN {src_w} "
        f"WHEN {y1} > {box_h} THEN greatest(1, {x2}) ELSE {box_w} END"
    )
    out_h = (
        f"CASE WHEN {src_w} <= {box_w} AND {src_h} <= {box_h} THEN {src_h} "
        f"WHEN {y1} > {box_h} THEN {box_h} ELSE greatest(1, {y1}) END"
    )
    return df.withColumn("out_w", F.expr(out_w).cast("int")).withColumn(
        "out_h", F.expr(out_h).cast("int")
    )


def thumbnail_plan(media: DataFrame, sizes: dict[str, tuple[int, int]] | None = None) -> DataFrame:
    """IMAGES_THUMBS semantics (settings.py:356-359): one output row per
    (image, size-name) with the real aspect-fit output dimensions.
    Source dims are a deterministic function of the key (the codec that
    would read them from the payload is the only stubbed piece); the
    resize payload is a deterministic fake (truncation) behind real
    schema/plumbing."""
    sizes = sizes or IMAGES_THUMBS
    size_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("size_name"),
                F.lit(w).alias("box_w"),
                F.lit(h).alias("box_h"),
            )
            for name, (w, h) in sizes.items()
        ]
    )
    h60 = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    imgs = (
        media.filter(F.col("content_type").startswith("image/"))
        .withColumn(
            "src_w",
            (F.lit(100) + F.pmod(h60(F.concat(F.col("media_key"), F.lit("_w"))), F.lit(1900))).cast("int"),
        )
        .withColumn(
            "src_h",
            (F.lit(100) + F.pmod(h60(F.concat(F.col("media_key"), F.lit("_h"))), F.lit(1900))).cast("int"),
        )
    )
    sized = imgs.select(
        "media_key", "src_w", "src_h", F.explode(size_rows).alias("s"), "payload"
    ).select(
        "media_key", "src_w", "src_h",
        F.col("s.size_name").alias("size_name"),
        F.col("s.box_w").alias("box_w"),
        F.col("s.box_h").alias("box_h"),
        "payload",
    )
    return with_thumb_dims(sized).select(
        "media_key", "size_name", "src_w", "src_h", "out_w", "out_h",
        F.substring("payload", 1, 64).alias("thumb_payload"),
    )


# backwards-compatible alias (round-1 name)
thumbnail_stub = thumbnail_plan


# --- audio/video frame sampling (multimodal plumbing) ------------------------
K_FRAMES_DEFAULT = 4
AV_FPS_CHOICES = (24, 25, 30)


def av_metadata(av: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Typed container metadata for opaque audio/video binaries. In
    production these come from the container header (ffprobe-style);
    in-sandbox they derive deterministically from the media ref (the
    header read is the only stubbed piece). duration 1-120s, fps from
    the broadcast-standard set — exact integer arithmetic, identical
    in DuckDB."""
    h60 = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    dur = F.lit(1000) + F.pmod(
        h60(F.concat(F.col(ref_col), F.lit(":dur"))), F.lit(119001)
    )
    fps_idx = F.pmod(h60(F.concat(F.col(ref_col), F.lit(":fps"))), F.lit(3))
    fps = F.element_at(
        F.array(*[F.lit(x) for x in AV_FPS_CHOICES]), (fps_idx + 1).cast("int")
    )
    return av.withColumn("duration_ms", dur.cast("long")).withColumn(
        "fps", fps.cast("int")
    )


def frame_sample_plan(av: DataFrame, k: int = K_FRAMES_DEFAULT) -> DataFrame:
    """Uniform k-frame sampling plan over (media_ref, duration_ms, fps):
    frame_idx i → ts_ms = floor(i*duration/k), frame_no =
    floor(ts_ms*fps/1000). Pure narrow column work (explode of a
    k-element sequence — no shuffle); the decode of the chosen frames
    is `decode_frames_stub` below. At 100 TB this plan stage emits
    k rows per video into the decode mapInPandas without moving the
    binary payload anywhere."""
    out = av.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("frame_idx")
    )
    ts = F.floor(F.col("frame_idx") * F.col("duration_ms") / F.lit(k))
    return out.withColumn("ts_ms", ts.cast("long")).withColumn(
        "frame_no", F.floor(F.col("ts_ms") * F.col("fps") / F.lit(1000)).cast("long")
    )


def decode_frames_stub(frames: DataFrame) -> DataFrame:
    """Frame decode behind mapInPandas — REAL Arrow-batch plumbing
    (schema, batching, vectorized pandas ops), stubbed codec (no
    av/ffmpeg libs in-sandbox): the frame payload is a deterministic
    64-byte function of (media_ref, frame_no) with a crc32 the tests
    assert. Swap the body for the real decoder on a fleet; the Spark
    side (partitioning, batch shape, output schema) is what this
    function locks down."""
    schema = (
        "media_ref string, frame_idx int, ts_ms long, frame_no long, "
        "frame_bytes binary, frame_crc long"
    )

    def decode(batches):
        for pdf in batches:
            payloads = [
                hashlib.sha256(f"{r}:{n}".encode()).digest()[:32] * 2
                for r, n in zip(pdf["media_ref"], pdf["frame_no"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "ts_ms": pdf["ts_ms"].astype("int64"),
                    "frame_no": pdf["frame_no"].astype("int64"),
                    "frame_bytes": payloads,
                    "frame_crc": [zlib.crc32(p) for p in payloads],
                }
            )

    cols = ["media_ref", "frame_idx", "ts_ms", "frame_no"]
    return frames.select(*cols).mapInPandas(decode, schema=schema)
