"""Streaming and multimodal extension tests."""

import pytest
from pyspark.sql import functions as F


def test_streaming_running_count_matches_batch(spark, sf_dir):
    from padawan_spark.queries.registry import load
    from padawan_spark.streaming import running_count_per_user
    got = {r["user_id"]: r["n_events"]
           for r in running_count_per_user(spark, sf_dir).collect()}
    want = {r["user_id"]: r["n"]
            for r in load(spark, sf_dir, "events")
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_multimodal_stubs_raise_without_libs(spark, sf_dir):
    from padawan_spark.functions import decode_image, sample_video_frames
    from padawan_spark.queries.registry import load
    d = load(spark, sf_dir, "documents").limit(5).select(
        "doc_id", F.expr("cast(text as binary)").alias("payload"))
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; stub path not reachable")
    except ImportError:
        pass
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        decode_image(d).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_fake_decode_batch_shape(spark, sf_dir):
    from padawan_spark.functions import fake_decode_image
    from padawan_spark.queries.registry import load
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr("cast(text as binary)").alias("payload"))
    out = fake_decode_image(d)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,channels:int,"
        "n_bytes:bigint>")
    rows = out.collect()
    assert len(rows) == d.count()
    assert all(64 <= r["width"] < 255 for r in rows)
