"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched mapInPandas stages. The real-decode branch (``fake=False``)
has three tiers: PIL when present (probed at import), a VENDORED minimal
netpbm (binary PGM/PPM) decoder for P5/P6 payloads — so the real branch is
executable and tested even in codec-less containers like this one — and
NotImplementedError for anything else (audio/video stay stubbed without
ffmpeg). The default/contract paths use the deterministic fake decoder
(payload-hash-derived stats) so results stay oracle-checkable; the
Spark-side plumbing (schema, batch shape, partitioning, UDF signatures) is
identical either way.

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


# import-time probe: when PIL ships (real cluster via --archives, or a
# fatter image), the real image path activates; this sandbox has no codecs
# and every contract/test path uses the deterministic fake decode
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PIL_Image  # type: ignore

    HAS_PIL = True
except ImportError:
    _PIL_Image = None
    HAS_PIL = False


def _netpbm_header(data: bytes) -> tuple[list[int], int]:
    """Parse the three whitespace-separated header integers after the magic
    ('#' comments run to end-of-line), returning (ints, pixel_data_offset).
    The pixel block starts one whitespace byte after the maxval token."""
    vals: list[int] = []
    i = 2  # past the 2-byte magic
    n = len(data)
    while len(vals) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte separates header/pixels


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Vendored minimal REAL image decoder: binary PGM (P5, grayscale) and
    PPM (P6, RGB), maxval <= 255 — a from-scratch reader of the public
    Netpbm format so the real-codec branch of the seam is executable (and
    tested) even in containers without PIL. P6 RGB converts to luma with
    PIL's documented ITU-R 601-2 integer formula
    (L = (299 R + 587 G + 114 B) // 1000), matching `convert("L")`."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload (magic {magic!r})")
    (w, h, maxval), off = _netpbm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported by the vendored decoder")
    if magic == b"P5":
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off)
        return px.reshape(h, w).copy()
    rgb = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    rgb = rgb.reshape(h, w, 3).astype(np.uint32)
    luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    return luma.astype(np.uint8)


def encode_pgm(arr: np.ndarray) -> bytes:
    """Binary PGM (P5) writer for a uint8 [h, w] raster — the fixture
    counterpart of decode_netpbm."""
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _codec_decode(payload: bytes, kind: str) -> np.ndarray:
    """The real decoder seam: PIL for images when available (probed at
    import), the vendored netpbm reader for P5/P6 payloads otherwise, and
    NotImplementedError for everything else. Audio/video codecs (ffmpeg)
    are never shipped here — their decode stays stubbed on any image."""
    if kind == "image":
        if HAS_PIL:
            import io

            img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.uint8)
        if payload[:2] in (b"P5", b"P6"):
            return decode_netpbm(payload)
    raise NotImplementedError(
        "codec for kind=" + kind + " not available in this environment; "
        "use fake=True (deterministic hash-derived decode), encode images as "
        "binary PGM/PPM for the vendored decoder, or ship PIL/ffmpeg "
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
                if fake:
                    px = _fake_pixels(
                        bytes(payload), int(meta["width"]), int(meta["height"])
                    )
                else:
                    px = _codec_decode(bytes(payload), kind)  # PIL, or raises
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
                if fake:
                    px = _fake_pixels(
                        bytes(payload), int(meta["width"]), int(meta["height"])
                    )
                else:
                    px = _codec_decode(bytes(payload), "image")
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
                    # fake frame = sha256(payload || ':' || ascii frame_no):
                    # bytes-safe on real payloads, VARCHAR-expressible in the
                    # oracle (DuckDB's sha256 accepts VARCHAR only)
                    frame = hashlib.sha256(
                        bytes(payload) + b":" + str(fno).encode()
                    ).digest()
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


def frame_sample_hex(media: DataFrame, every: int = 10, fake: bool = True) -> DataFrame:
    """frame_sample with the frame bytes hex-encoded — the driver- and
    oracle-comparable shape (binary columns pass the rows-only check only;
    lowercase hex strings hash identically in both engines)."""
    return frame_sample(media, every=every, fake=fake).selectExpr(
        "media_id", "frame_no", "lower(hex(frame)) AS frame_hex"
    )


def frame_sample_duck_sql(docs_rel: str = "documents", every: int = 10) -> str:
    """Exact DuckDB oracle for frame_sample_hex over synth_media(docs):
    frame = sha256(payload || ':' || frame_no), video rows (doc_id % 3 = 2)
    only, frame_no in range(0, n_frames, every)."""
    return f"""
WITH med AS (
  SELECT doc_id AS media_id, text AS pay,
         1 + doc_id % 30 AS n_frames
  FROM {docs_rel} WHERE doc_id % 3 = 2
),
f AS (
  SELECT media_id, pay,
         CAST(unnest(range(0, n_frames, {every})) AS INT) AS frame_no
  FROM med
)
SELECT media_id, frame_no,
       sha256(pay || ':' || CAST(frame_no AS VARCHAR)) AS frame_hex
FROM f
""".strip()


def media_resize_hex(media: DataFrame, w: int, h: int, fake: bool = True) -> DataFrame:
    """media_resize with the payload hex-encoded and meta flattened to
    scalars — the exact-oracle shape."""
    return media_resize(media, w=w, h=h, fake=fake).selectExpr(
        "media_id",
        "lower(hex(payload)) AS payload_hex",
        "meta.width AS width",
        "meta.height AS height",
        "meta.sample_rate AS sample_rate",
        "meta.n_frames AS n_frames",
    )


def media_resize_duck_sql(docs_rel: str = "documents", w: int = 16, h: int = 16) -> str:
    """Exact DuckDB oracle for media_resize_hex over synth_media(docs).

    The fake raster is the sha256 digest tiled to the ORIGINAL w0*h0, then
    np.resize re-tiles it to h*w: byte[i] = digest[(i % (w0*h0)) % 32] —
    pure modular arithmetic over the digest hex pairs."""
    return f"""
WITH med AS (
  SELECT doc_id AS media_id, sha256(text) AS hex,
         (32 + doc_id % 64) * (32 + doc_id % 48) AS n0
  FROM {docs_rel}
),
b AS (
  SELECT media_id, n0,
         list_transform(range(32), i -> substr(hex, CAST(i * 2 + 1 AS INT), 2)) AS hx
  FROM med
)
SELECT media_id,
       array_to_string(
         list_transform(range({h * w}),
           i -> hx[CAST((i % n0) % 32 AS INT) + 1]), '') AS payload_hex,
       CAST({w} AS INT) AS width, CAST({h} AS INT) AS height,
       CAST(16000 AS INT) AS sample_rate,
       CAST(1 + media_id % 30 AS INT) AS n_frames
FROM b
""".strip()


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
