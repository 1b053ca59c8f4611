"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode/resize/frame-sample as mapInPandas kernels.

The decode step is STUBBED (this container ships no image/audio libs): the
kernels run real Spark plumbing — schema, Arrow batching, partitioning —
and apply a deterministic fake "decoder" so tests exercise the full path.
Swap `_decode_image_stub` for a PIL/libvips call in production; nothing
else changes.

Crawl-side tie-in: media spans in the documents table carry media_ref; the
media table is keyed by media_ref so span-level joins are equi-joins.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def ref_index(ref: str) -> int:
    """Deterministic integer per media_ref: the first digit run in the ref
    (so an ANSI-SQL oracle can recompute it with regexp_extract), else a
    byte-sum fallback for digit-free refs."""
    m = re.search(r"\d+", ref)
    if m:
        return int(m.group(0))
    return sum(ref.encode("utf-8")) % 100003


def synth_media_table(spark, media_refs: list[str], seed: int = 42) -> DataFrame:
    """Deterministic fake media rows for the given refs. Payload bytes are
    pure arithmetic in the ref's index (payload[j] = (idx + j) % 256) so the
    decoded stub features are recomputable in plain SQL — the oracle for the
    multimodal plumbing gate."""
    rows = []
    for ref in media_refs:
        idx = ref_index(ref)
        kind = "image" if ref.endswith((".jpg", ".png")) else "video" if ref.endswith(".mp4") else "audio"
        rows.append(
            {
                "media_ref": ref, "kind": kind,
                "payload": bytes((idx + j) % 256 for j in range(64)),
                "width": 64 + (idx * 3) % 192 if kind == "image" else None,
                "height": 64 + (idx * 5) % 192 if kind == "image" else None,
                "duration_ms": (1000 + (idx % 256) * 100) if kind != "image" else None,
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic 8-dim 'feature' from payload bytes.
    Production: PIL.Image.open + resize + channel stats. Raises on None to
    mirror real decode failures."""
    if payload is None:
        raise NotImplementedError("no payload: real decoder required")
    arr = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.float32)
    if arr.size < 64:
        arr = np.pad(arr, (0, 64 - arr.size))
    return arr.reshape(8, 8).mean(axis=1) / 255.0


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction — the Arrow batch shape and schema are
    the real contract; only the decode body is a stub."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append([float(x) for x in _decode_image_stub(payload)])
                    ok.append(True)
                except NotImplementedError:
                    feats.append([0.0] * 8)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoded": ok,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled timestamp (the decode of
    the actual frame is the same stub). Native explode on a JVM-computed
    sequence — the expensive part (per-frame decode) stays in Arrow batches
    downstream."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_media(media: DataFrame, scale: int = 2) -> DataFrame:
    """Resize plumbing (images): payload + dimensions cross the Arrow
    boundary, the kernel emits the downsampled payload and scaled dims. The
    resample body is the STUB (every `scale`-th byte — deterministic and
    SQL-recomputable); production swaps in a real resampler, the Spark
    contract (schema, batching, binary in/out) is unchanged."""

    out_schema = T.StructType([
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                payloads.append(bytes(payload[::scale]) if payload is not None else None)
                ws.append(int(w) // scale if pd.notna(w) else None)
                hs.append(int(h) // scale if pd.notna(h) else None)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"], "width": ws, "height": hs,
                "payload": payloads,
            })

    return media.filter(F.col("kind") == "image").mapInPandas(kernel, out_schema)


def media_span_join(documents: DataFrame, media_features: DataFrame) -> DataFrame:
    """documents(doc_id, spans) ⋈ media features on media_ref — the
    interleaved-corpus join pattern (span explode is the only shuffle)."""
    media_refs = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"))
    )
    return media_refs.join(media_features, "media_ref", "left")
