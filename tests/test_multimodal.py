"""Multimodal binary-column plumbing (SURVEY.md §2.1 S3, §2.10 X2/X5):
schema, Arrow batch round-trips, stub codecs, frame explode shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bob_vector_db_spark.operators import multimodal as MM


def _media_df(spark, *blobs):
    rows = [(i, "image", b) for i, b in enumerate(blobs)]
    return spark.createDataFrame(rows, "media_id long, media_type string, content binary")


def test_binary_stats_roundtrip(spark):
    df = spark.createDataFrame([(0, b"hello"), (1, b"")],
                               "doc_id long, content binary")
    got = {r["id"]: r for r in MM.binary_stats(df).collect()}
    assert got[0]["n_bytes"] == 5
    assert got[0]["first_byte"] == ord("h")
    assert got[0]["sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert got[1]["n_bytes"] == 0 and got[1]["first_byte"] is None


def test_decode_fake_images(spark):
    img = MM.fake_image(4, 3, 3, seed=7)
    df = _media_df(spark, img)
    row = MM.decode_images(df).first()
    assert (row["width"], row["height"], row["channels"]) == (4, 3, 3)
    pixels = img[7:]
    assert abs(row["mean_pixel"] - sum(pixels) / len(pixels)) < 1e-9


def test_decode_real_codec_unavailable_raises(spark):
    df = _media_df(spark, b"\x89PNG\r\n fake png header")
    try:
        MM.decode_images(df).collect()
        raise AssertionError("expected decode failure for non-FIMG blob")
    except Exception as exc:  # Py4J wraps the NotImplementedError
        assert "NotImplementedError" in str(exc) or "FIMG" in str(exc)


def test_byte_histogram_shape_and_norm(spark):
    df = spark.createDataFrame([(0, bytes(range(256)))], "doc_id long, content binary")
    vec = df.select(MM.byte_histogram_udf(16)(F.col("content")).alias("v")).first()["v"]
    assert len(vec) == 16
    assert abs(sum(vec) - 1.0) < 1e-9
    assert all(abs(x - 1 / 16) < 1e-9 for x in vec)  # uniform bytes


def test_sample_frames_every_other(spark):
    vid = MM.fake_video(5, 2, 2)
    df = _media_df(spark, vid)
    frames = MM.sample_frames(df, every_k=2).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    f0 = sorted(frames, key=lambda r: r["frame_idx"])[0]
    assert bytes(f0["frame"]) == MM.fake_image(2, 2, 3, seed=0)


def test_resize_images_nearest_neighbor(spark):
    img = MM.fake_image(4, 4, 1, seed=0)  # pixels = (31*i) % 256 row-major
    df = _media_df(spark, img)
    out = MM.resize_images(df, 2, 2).first()
    b = bytes(out["content"])
    assert b[:4] == MM.FIMG_MAGIC and (b[4], b[5], b[6]) == (2, 2, 1)
    src = img[7:]
    # out(x,y) = src(x*4//2, y*4//2) = src(2x, 2y)
    expect = bytes(src[(2 * y) * 4 + (2 * x)] for y in range(2) for x in range(2))
    assert b[7:] == expect
    # resized output feeds the decoder unchanged
    dec = MM.decode_images(MM.resize_images(df, 2, 2), id_col="id").first()
    assert (dec["width"], dec["height"]) == (2, 2)


def test_decode_audio_features(spark):
    aud = MM.fake_audio(100, sample_rate=8000, seed=3)
    df = spark.createDataFrame([(0, aud)], "media_id long, content binary")
    row = MM.decode_audio(df).first()
    assert row["sample_rate"] == 8000 and row["n_samples"] == 100
    assert abs(row["duration_sec"] - 100 / 8000) < 1e-9
    pcm = [(3 + 17 * i) % 256 for i in range(100)]
    pcm = [s - 256 if s > 127 else s for s in pcm]
    assert abs(row["rms"] - (sum(s * s for s in pcm) / 100) ** 0.5) < 1e-9


def test_attach_media_overrides_images(spark):
    """qdrant_embedder.py:83-86: a media list wins over message-supplied
    images, and the collision is flagged; empty media is falsy."""
    rows = [
        (0, ["msg.png"], ["topic.png"]),   # both → media wins, flagged
        (1, ["msg.png"], None),            # no media → images kept
        (2, None, ["topic.png"]),          # only media → adopted, no flag
        (3, ["msg.png"], []),              # empty media is falsy → images kept
    ]
    df = spark.createDataFrame(
        rows, "id long, images array<string>, media array<string>")
    got = {r["id"]: r for r in MM.attach_media(df).collect()}
    assert got[0]["images"] == ["topic.png"] and got[0]["images_overridden"]
    assert got[1]["images"] == ["msg.png"] and not got[1]["images_overridden"]
    assert got[2]["images"] == ["topic.png"] and not got[2]["images_overridden"]
    assert got[3]["images"] == ["msg.png"] and not got[3]["images_overridden"]


def test_binaryfile_source_decodes(spark):
    """S3: the registered binaryFile-source query reads FIMG blobs off disk
    and decodes them — 8 deterministic files, stable dims."""
    from bob_vector_db_spark.queries import REGISTRY

    rows = {r["id"]: r for r in
            REGISTRY["mm_binaryfile_source"].fn(spark, "").collect()}
    assert len(rows) == 8
    assert (rows[0]["width"], rows[0]["height"]) == (8, 6)
    assert (rows[7]["width"], rows[7]["height"]) == (15, 13)


def test_frames_feed_image_decoder(spark):
    """Video → frames → decode: the composed pipeline shape."""
    vid = MM.fake_video(3, 2, 2)
    df = _media_df(spark, vid)
    frames = MM.sample_frames(df, every_k=1).withColumnRenamed("frame", "content")
    decoded = MM.decode_images(frames, id_col="frame_idx")
    assert decoded.count() == 3
    assert {(r["width"], r["height"]) for r in decoded.collect()} == {(2, 2)}


def test_byte_histogram_non_divisor_bins(spark):
    """bins that don't divide 256 must still emit exactly `bins` buckets with
    byte 255 clipped into the last one (ADVICE r3)."""
    df = spark.createDataFrame([(bytes([0, 128, 255]),)], "content binary")
    vec = df.select(MM.byte_histogram_udf(10)(F.col("content")).alias("v")
                    ).first()["v"]
    assert len(vec) == 10 and abs(sum(vec) - 1.0) < 1e-9


def test_byte_histogram_rejects_bad_bins():
    import pytest
    with pytest.raises(ValueError, match="bins"):
        MM.byte_histogram_udf(0)
    with pytest.raises(ValueError, match="bins"):
        MM.byte_histogram_udf(257)


def test_resize_rejects_malformed_fimg(spark):
    import pytest
    # header claims 4x4x1 but payload carries 3 bytes
    bad = MM.FIMG_MAGIC + bytes([4, 4, 1]) + bytes([1, 2, 3])
    df = spark.createDataFrame([(1, bad)], "media_id long, content binary")
    with pytest.raises(Exception, match="malformed FIMG"):
        MM.resize_images(df, 2, 2).collect()
