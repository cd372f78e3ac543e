"""Streaming pipeline (AvailableNow exactly-once) + multimodal
binary plumbing."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ocr_compare_spark import synth
from ocr_compare_spark.operators.multimodal import extract_media_features, media_metadata
from ocr_compare_spark.streaming.jobs import (
    extraction_stream,
    sessionize_stream,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def pages_path(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pages_stream"))
    synth.pages_from_documents(spark, sf_dir).limit(60).write.mode("overwrite").parquet(p)
    return p


def test_extraction_stream_availablenow(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q = extraction_stream(spark, pages_path, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    n1 = got.count()
    assert n1 > 0
    # rerun with same checkpoint: no new input -> no duplicates
    q2 = extraction_stream(spark, pages_path, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1
    # results match the batch pipeline byte-for-byte
    from ocr_compare_spark.operators.extract import run_engines_fused

    batch = run_engines_fused(spark.read.parquet(pages_path), with_spans=False)
    diff = got.select("url", "engine", "doc_text").exceptAll(
        batch.select("url", "engine", "doc_text")
    )
    assert diff.count() == 0


def test_windowed_counts_batch_equivalence(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(events)
    rows = out.collect()
    assert rows and all(r.n > 0 for r in rows)
    assert sum(r.n for r in rows) == events.count()


def test_sessionize_stream_shape(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sessionize_stream(events).collect()
    assert out and all(r.n_events > 0 for r in out)


def test_media_metadata_native(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    meta = media_metadata(pages)
    rows = meta.collect()
    mimes = {r.mime for r in rows}
    assert "text/html" in mimes and "application/pdf" in mimes
    assert all(r.n_bytes > 0 for r in rows)


def test_media_features_deterministic(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    f1 = {r.url: r.feature for r in extract_media_features(pages).collect()}
    f2 = {r.url: r.feature for r in extract_media_features(pages.repartition(7)).collect()}
    assert f1 == f2  # stable across partitionings/processes
    dims = {len(v) for v in f1.values() if v is not None}
    assert dims == {16}
    # null payload -> error row, not a crash
    null_df = spark.createDataFrame([("u", None)], "url string, html binary")
    r = extract_media_features(null_df).collect()[0]
    assert r.decode_error == "null_payload"


def test_decode_stub_raises():
    from ocr_compare_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
