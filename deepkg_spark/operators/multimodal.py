"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched mapInPandas stages. The actual codec libraries (PIL/ffmpeg/...)
are NOT in this container, so the codec call is isolated behind
``_codec_decode`` which raises NotImplementedError; every test and default
path uses the deterministic fake decoder (payload-hash-derived stats), so the
Spark-side plumbing — schema, batch shape, partitioning, UDF signatures — is
real and fully exercised.

MEDIA_SCHEMA:
    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text, kind/meta derived from doc_id."""
    return docs.selectExpr(
        "doc_id AS media_id",
        "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS kind",
        "CAST(text AS BINARY) AS payload",
        "named_struct('width', CAST(32 + doc_id % 64 AS INT), "
        "'height', CAST(32 + doc_id % 48 AS INT), "
        "'sample_rate', CAST(16000 AS INT), "
        "'n_frames', CAST(1 + doc_id % 30 AS INT)) AS meta",
    )


def _codec_decode(payload: bytes, kind: str):
    """The real decoder seam. Codec libs are not shipped in this image."""
    raise NotImplementedError(
        "image/audio/video codecs are not available in this environment; "
        "use fake=True (deterministic hash-derived decode) or ship PIL/ffmpeg "
        "via --py-files/--archives on a real cluster"
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: tile the sha256 digest to [h, w] uint8."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8)
    return np.resize(arr, (h, w))


def media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, feature array<float>): FEATURE_DIM rolling byte stats.

    One narrow Arrow stage; each batch vectorizes over its payloads. The
    feature is a function of (payload bytes, meta) only -> deterministic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if not fake:
                    _codec_decode(bytes(payload), kind)  # raises: no codecs here
                px = _fake_pixels(bytes(payload), int(meta["width"]), int(meta["height"]))
                chunks = np.array_split(px.astype(np.float64).ravel(), FEATURE_DIM)
                feats.append([round(float(c.mean()), 6) for c in chunks])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(
        run, schema=f"media_id long, kind string, feature array<double>"
    )


def media_resize(media: DataFrame, w: int, h: int, fake: bool = True) -> DataFrame:
    """(media_id, payload binary, meta): resized fake raster re-encoded as
    bytes; meta updated. Demonstrates binary-out UDF plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if not fake:
                    _codec_decode(bytes(payload), "image")
                px = _fake_pixels(bytes(payload), int(meta["width"]), int(meta["height"]))
                res = np.resize(px, (h, w))
                outs.append(res.tobytes())
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": int(meta["sample_rate"]),
                        "n_frames": int(meta["n_frames"]),
                    }
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": outs, "meta": metas}
            )

    return media.mapInPandas(
        run,
        schema="media_id long, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )


def frame_sample(media: DataFrame, every: int = 10, fake: bool = True) -> DataFrame:
    """(media_id, frame_no, frame binary): UDTF-shaped sampler — one input
    video row -> n_frames/every output rows (explode inside the Arrow batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if not fake:
                    _codec_decode(bytes(payload), "video")
                for fno in range(0, int(meta["n_frames"]), every):
                    frame = hashlib.sha256(bytes(payload) + fno.to_bytes(4, "big")).digest()
                    rows["media_id"].append(media_id)
                    rows["frame_no"].append(fno)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema="media_id long, frame_no int, frame binary"
    )


def media_features_exploded(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, dim int, value double): driver-canonicalizable shape
    of media_features — one row per feature dimension (arrays are not
    sortable/hashable by the driver's canonicalizer, scalars are)."""
    return media_features(media, fake=fake).selectExpr(
        "media_id", "kind", "posexplode(feature) AS (dim, value)"
    )


def media_features_duck_sql(docs_rel: str = "documents") -> str:
    """Exact DuckDB oracle for media_features_exploded over synth_media(docs).

    The fake decode is pure arithmetic over the sha256 digest: np.resize
    tiles the 32 digest bytes cyclically to width*height elements, and
    np.array_split(.., 16) puts the first (n % 16) chunks at size n//16 + 1
    and the rest at n//16. All byte sums are exact in float64, so avg()
    matches numpy's mean bit-for-bit.
    """
    return f"""
WITH med AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         sha256(text) AS hex,
         (32 + doc_id % 64) * (32 + doc_id % 48) AS n
  FROM {docs_rel}
),
b AS (
  SELECT media_id, kind, n, n // 16 AS q, n % 16 AS r,
         list_transform(range(32),
           i -> CAST(('0x' || substr(hex, CAST(i * 2 + 1 AS INT), 2))::INT AS DOUBLE)
         ) AS bytes
  FROM med
),
pos AS (
  SELECT media_id, kind, q, r, bytes, unnest(range(n)) AS p FROM b
),
chunk AS (
  SELECT media_id, kind,
         CASE WHEN p < r * (q + 1) THEN p // (q + 1)
              ELSE r + (p - r * (q + 1)) // q END AS dim,
         bytes[CAST(p % 32 AS INT) + 1] AS v
  FROM pos
)
SELECT media_id, kind, CAST(dim AS INT) AS dim, round(avg(v), 6) AS value
FROM chunk
GROUP BY media_id, kind, dim
""".strip()
