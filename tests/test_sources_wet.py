"""WET source (Common Crawl's pre-extracted text tier)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ocr_compare_spark.sources.wet import build_wet, wet_text, wet_text_stream

RECORDS = [
    ("https://a.example.com/1", datetime(2025, 3, 1, 12, 0, 0), "hello world\nsecond line"),
    ("https://b.example.com/2", datetime(2025, 3, 2, 9, 30, 0), "unicode é世界 text"),
    ("https://c.example.com/3", datetime(2025, 3, 3, 0, 0, 0), ""),
]


def _write(tmp_path, name, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(tmp_path)


def test_wet_roundtrip_plain_and_gzip(spark, tmp_path):
    _write(tmp_path, "seg.warc.wet", build_wet(RECORDS))
    _write(tmp_path, "seg2.warc.wet.gz", build_wet(RECORDS, gzip_members=True))
    rows = wet_text(spark, str(tmp_path)).orderBy("url", "warc_ts").collect()
    # both files carry the same 3 conversion records (warcinfo skipped)
    assert len(rows) == 6
    got = {(r["url"], r["text"]) for r in rows}
    assert got == {(u, t) for u, _, t in RECORDS}
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://a.example.com/1"]["warc_ts"] == RECORDS[0][1]


def test_wet_skips_malformed_and_non_conversion(spark, tmp_path):
    data = build_wet(RECORDS[:1])
    # splice garbage + a response-type record + a truncated tail
    from ocr_compare_spark.sources.warc import build_warc

    resp = build_warc(
        [("https://resp.example.com/x", RECORDS[0][1], b"<p>html</p>", "text/html")],
        with_warcinfo=False,
    )
    blob = b"garbage-bytes" + data + resp + build_wet(RECORDS[1:2])[:40]
    _write(tmp_path, "mixed.warc.wet", blob)
    rows = wet_text(spark, str(tmp_path)).collect()
    assert [r["url"] for r in rows] == ["https://a.example.com/1"]


def test_wet_feeds_text_operators(spark, tmp_path):
    """The WET tier's whole point: text rows go straight into the
    curation operators with no extraction stage."""
    from ocr_compare_spark.operators import lm, textstats

    _write(tmp_path, "seg.warc.wet", build_wet(RECORDS))
    docs = wet_text(spark, str(tmp_path)).withColumn("doc_id", F.xxhash64("url"))
    stats = textstats.with_text_stats(docs, "text")
    counts = {r["url"]: r["word_count"] for r in stats.collect()}
    assert counts["https://a.example.com/1"] == 4
    assert counts["https://b.example.com/2"] == 3
    model = lm.train_unigram_lm(docs.filter(F.length("text") > 0), "text")
    scored = lm.perplexity_scores(
        docs.filter(F.length("text") > 0), model, "doc_id", "text", method="data"
    )
    assert scored.count() == 2


def test_wet_stream_equals_batch(spark, tmp_path):
    _write(tmp_path, "seg.warc.wet.gz", build_wet(RECORDS, gzip_members=True))
    batch = {(r["url"], r["text"]) for r in wet_text(spark, str(tmp_path)).collect()}
    out = (
        wet_text_stream(spark, str(tmp_path))
        .writeStream.format("memory")
        .queryName("wet_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    stream = {
        (r["url"], r["text"])
        for r in spark.sql("SELECT * FROM wet_stream_test").collect()
    }
    assert stream == batch == {(u, t) for u, _, t in RECORDS}
