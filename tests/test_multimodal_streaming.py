"""Multimodal binary plumbing + structured-streaming ingestion."""

import shutil
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F

from deepkg_spark.operators.multimodal import (
    frame_sample,
    media_features,
    media_resize,
    synth_media,
)
from deepkg_spark.operators.relations import triples_frame
from deepkg_spark.sources.corpus import load_corpus
from deepkg_spark.streaming.pipeline import stream_triples, windowed_event_counts


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return synth_media(spark, docs)


def test_media_features_deterministic(spark, sf_dir):
    m = _media(spark, sf_dir)
    a = {r["media_id"]: tuple(r["feature"]) for r in media_features(m).collect()}
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in media_features(m.repartition(7)).collect()
    }
    assert a == b and len(a) > 0
    assert all(len(v) == 16 for v in a.values())


def test_media_resize_schema(spark, sf_dir):
    out = media_resize(_media(spark, sf_dir), 8, 8).collect()
    assert all(len(bytes(r["payload"])) == 64 for r in out)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 8 for r in out)


def test_frame_sample_udtf_shape(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = frame_sample(m, every=10).collect()
    vids = m.filter(F.col("kind") == "video").collect()
    expect = sum(len(range(0, r["meta"]["n_frames"], 10)) for r in vids)
    assert len(out) == expect > 0
    assert all(len(bytes(r["frame"])) == 32 for r in out)


def test_codec_stub_raises(spark, sf_dir):
    m = _media(spark, sf_dir).limit(1)
    with pytest.raises(Exception) as ei:
        media_features(m, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_stream_triples_equals_batch(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    in_dir, out_dir, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        corpus.repartition(6).write.mode("overwrite").parquet(in_dir)
        q = stream_triples(spark, in_dir, f"{out_dir}/t", f"{ckpt}/c")
        q.processAllAvailable()
        q.stop()
        got = Counter(
            tuple(r)
            for r in spark.read.parquet(f"{out_dir}/t")
            .drop("epoch_id")
            .collect()
        )
        want = Counter(tuple(r) for r in triples_frame(corpus).collect())
        assert got == want
    finally:
        for d in (in_dir, out_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_exact_across_batches(spark, sf_dir):
    """Duplicates arriving in LATER micro-batches are still suppressed —
    state survives across batches (applyInPandasWithState)."""
    import pyspark.sql.types as T

    from deepkg_spark.streaming.pipeline import stream_dedup_exact

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    in_dir, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        # batch 1: originals; batch 2 (separate file, maxFilesPerTrigger=1):
        # the same texts under new doc_ids
        docs.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/b1")
        docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{in_dir}/b2")
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/b*")
        )
        q = (
            stream_dedup_exact(src)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sdedup")
            .option("checkpointLocation", f"{ckpt}/c")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql("SELECT * FROM sdedup").collect()
        # one row per distinct text; all emitted doc_ids are originals (<50)
        n_distinct = docs.select("text").distinct().count()
        assert len(out) == n_distinct
        assert all(r["doc_id"] < 50 for r in out)
    finally:
        for d in (in_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_windowed_event_counts(spark, sf_dir):
    """Drive the watermarked streaming agg with the events table as a
    one-shot file stream; compare to the equivalent batch window agg."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        events.write.mode("overwrite").parquet(in_dir)
        src = (
            spark.readStream.schema(events.schema).parquet(in_dir)
        )
        agg = windowed_event_counts(src)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("wincounts")
            .option("checkpointLocation", f"{ckpt}/c")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r["window"]["start"], r["event_type"]): (r["n"], round(r["v"], 6))
            for r in spark.sql("SELECT * FROM wincounts").collect()
        }
        want = {
            (r["window"]["start"], r["event_type"]): (r["n"], round(r["v"], 6))
            for r in events.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "5 minutes", "1 minute"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        for d in (in_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join result == the equivalent batch join over
    the same rows (event_type match, view within 10 minutes before click)."""
    import tempfile

    from deepkg_spark.streaming.pipeline import stream_interval_join

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("ts", "event_type", "value")
        .limit(400)
        .cache()
    )
    with tempfile.TemporaryDirectory() as tmp:
        events.write.parquet(f"{tmp}/clicks")
        events.write.parquet(f"{tmp}/views")
        cs = spark.readStream.schema(events.schema).parquet(f"{tmp}/clicks")
        vs = spark.readStream.schema(events.schema).parquet(f"{tmp}/views")
        q = (
            stream_interval_join(cs, vs)
            .writeStream.format("memory")
            .queryName("ivj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql("SELECT * FROM ivj").collect()}

    batch = (
        events.selectExpr("ts AS click_ts", "event_type", "value AS click_value")
        .join(
            events.selectExpr(
                "ts AS view_ts", "event_type AS v_event_type", "value AS view_value"
            ),
            F.expr(
                "event_type = v_event_type AND view_ts <= click_ts "
                "AND view_ts >= click_ts - INTERVAL 10 minutes"
            ),
        )
        .select("event_type", "view_ts", "click_ts", "view_value", "click_value")
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_codec_stub_or_pil_path(spark, sf_dir):
    """The codec seam: without PIL the non-fake path raises the documented
    NotImplementedError; with PIL present the SAME contract runs on real
    JPEG bytes (conditional — this container ships no codecs)."""
    import pytest

    from deepkg_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(4)
    media = mm.synth_media(spark, docs)
    if not mm.HAS_PIL:
        with pytest.raises(Exception) as ei:
            mm.media_features(media, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
        return
    # PIL available: build tiny real PNGs and run the real decode path
    import io

    import numpy as np
    from PIL import Image

    bufs = []
    for i in range(3):
        arr = (np.arange(64, dtype=np.uint8).reshape(8, 8) + i) % 256
        buf = io.BytesIO()
        Image.fromarray(arr, mode="L").save(buf, format="PNG")
        bufs.append(buf.getvalue())
    rows = [(i, "image", b, {"width": 8, "height": 8, "sample_rate": 0, "n_frames": 1})
            for i, b in enumerate(bufs)]
    real = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.media_features(real, fake=False).collect()
    assert len(out) == 3 and all(len(r["feature"]) == mm.FEATURE_DIM for r in out)


# ------------------- vendored real decoder (netpbm P5/P6) ------------------

def test_decode_netpbm_pgm_roundtrip():
    """The vendored REAL decoder: encode -> decode is the identity for P5,
    header comments and multi-digit dims parse, bad magic raises."""
    import numpy as np

    from deepkg_spark.operators.multimodal import decode_netpbm, encode_pgm

    # note: uint8 * 7 % 256 silently promotes to int16 under NumPy 2 —
    # cast back to uint8 so tobytes() emits 1-byte pixels
    arr = ((np.arange(16 * 12).reshape(12, 16) * 7) % 256).astype(np.uint8)
    assert np.array_equal(decode_netpbm(encode_pgm(arr)), arr)
    # comment line + extra whitespace in the header
    withc = b"P5\n# a comment\n 16  12 \n255\n" + arr.tobytes()
    assert np.array_equal(decode_netpbm(withc), arr)
    with pytest.raises(ValueError):
        decode_netpbm(b"P2\n1 1\n255\n0")  # ASCII PGM unsupported on purpose


def test_decode_netpbm_ppm_luma_formula():
    """P6 RGB decodes through PIL's documented ITU-R 601-2 integer luma
    (L = (299R + 587G + 114B) // 1000)."""
    import numpy as np

    from deepkg_spark.operators.multimodal import decode_netpbm

    rgb = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    payload = b"P6\n2 2\n255\n" + rgb.tobytes()
    out = decode_netpbm(payload)
    expect = np.array([[299 * 255 // 1000, 587 * 255 // 1000],
                       [114 * 255 // 1000,
                        (299 * 10 + 587 * 20 + 114 * 30) // 1000]],
                      dtype=np.uint8)
    assert np.array_equal(out, expect)


def test_media_features_real_decode_branch(spark):
    """The REAL-decode branch of media_features/media_resize executes end to
    end in THIS container via the vendored netpbm decoder: features equal
    numpy chunk means of the decoded raster (not the fake hash raster)."""
    import numpy as np

    from deepkg_spark.operators import multimodal as mm

    rng = np.random.RandomState(5)
    rasters = [rng.randint(0, 256, size=(9, 11), dtype=np.uint8)
               for _ in range(3)]
    rows = [
        (i, "image", mm.encode_pgm(a),
         {"width": 11, "height": 9, "sample_rate": 0, "n_frames": 1})
        for i, a in enumerate(rasters)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r["feature"]
           for r in mm.media_features(media, fake=False).collect()}
    assert len(out) == 3
    for i, a in enumerate(rasters):
        chunks = np.array_split(a.astype(np.float64).ravel(), mm.FEATURE_DIM)
        expect = [round(float(c.mean()), 6) for c in chunks]
        assert out[i] == expect
    # resize on the real branch: np.resize of the DECODED raster
    res = {r["media_id"]: r for r in
           mm.media_resize(media, w=4, h=3, fake=False).collect()}
    for i, a in enumerate(rasters):
        assert bytes(res[i]["payload"]) == np.resize(a, (3, 4)).tobytes()
        assert res[i]["meta"]["width"] == 4 and res[i]["meta"]["height"] == 3


def test_non_netpbm_payload_still_raises_without_pil(spark, sf_dir):
    """Payloads that are neither PIL-decodable nor netpbm keep the honest
    NotImplementedError (the synth corpus payloads are utf-8 text)."""
    from deepkg_spark.operators import multimodal as mm

    if mm.HAS_PIL:
        pytest.skip("PIL present: text payloads raise inside PIL instead")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").limit(2)
    with pytest.raises(Exception) as ei:
        mm.media_features(mm.synth_media(spark, docs), fake=False).collect()
    assert "NotImplementedError" in str(ei.value)
