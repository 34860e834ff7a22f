"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. The decode libraries (PIL/ffmpeg/etc.)
are NOT in this container, so the actual byte→pixels step is stubbed: by
default it raises ``NotImplementedError``; tests run the deterministic fake
decoder (hash-seeded), which keeps the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — real and tested.

Scale notes: payload columns are pruned unless a stage needs them; the
mapInPandas stages are narrow (no shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep per-batch memory
proportional to payload size, not row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "n_bytes long, digest string"
)

FEATURES_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_frames int, feature array<float>"
)


def wrap_binary(df: DataFrame, id_col: str, payload_col, media_type: str) -> DataFrame:
    """Attach typed metadata to an opaque payload column."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col).cast("binary")).alias("digest"),
    )


def real_decode(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Byte→pixels/samples decode. Requires PIL / soundfile / av — not in
    this container. Wire a real decoder here on a cluster image."""
    raise NotImplementedError(
        "media decode needs PIL/soundfile/av; use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: dimensions and a feature vector are
    derived from the payload digest — stable across runs and engines."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    width = 16 + h[8] % 64
    height = 16 + h[9] % 64
    n_frames = 1 if media_type == "image" else 1 + h[10] % 32
    feature = rng.standard_normal(8).astype(np.float32)
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "feature": feature.tolist(),
    }


def extract_features(media: DataFrame, decoder=None) -> DataFrame:
    """media(media_id, payload, media_type, ...) → decoded feature rows.
    ``decoder=None`` uses the stub (raises); pass ``fake_decode`` in tests."""
    fn = decoder or real_decode

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                d = fn(bytes(row.payload), row.media_type)
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "width", "height",
                    "n_frames", "feature",
                ],
            )

    return media.select(
        "media_id", "payload", "media_type"
    ).mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8, decoder=None) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index.
    (media_id, frame_idx) — real pixel extraction happens in the decoder."""
    fn = decoder or real_decode

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                d = fn(bytes(row.payload), row.media_type)
                for i in range(0, d["n_frames"], every_n):
                    out.append({"media_id": row.media_id, "frame_idx": i})
            yield pd.DataFrame(out, columns=["media_id", "frame_idx"])

    return media.select("media_id", "payload", "media_type").mapInPandas(
        run, schema="media_id long, frame_idx int"
    )
