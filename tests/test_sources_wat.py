"""WAT source (Common Crawl metadata/link tier)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ocr_compare_spark.sources.wat import build_wat, wat_links, wat_links_stream

TS = datetime(2025, 4, 1, 8, 0, 0)
RECORDS = [
    ("https://a.example.com/", TS, [("https://b.example.com/x", "to b"),
                                    ("/rel/path", "rel")]),
    ("https://b.example.com/x", TS, []),
    ("https://c.example.com/", TS, [("https://a.example.com/", "back to a")]),
]


def test_wat_roundtrip_and_link_extraction(spark, tmp_path):
    (tmp_path / "seg.warc.wat").write_bytes(build_wat(RECORDS))
    (tmp_path / "seg2.warc.wat.gz").write_bytes(build_wat(RECORDS, gzip_members=True))
    rows = wat_links(spark, str(tmp_path)).collect()
    assert len(rows) == 6  # both files
    got = {(r["url"], tuple((l["href"], l["text"]) for l in r["links"])) for r in rows}
    assert got == {(u, tuple(ls)) for u, _, ls in RECORDS}
    assert all(r["warc_ts"] == TS for r in rows)


def test_wat_malformed_json_yields_empty_links(spark, tmp_path):
    body = b"{not json"
    rec = (
        (
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: https://bad.example.com/\r\n"
            "WARC-Date: 2025-04-01T08:00:00Z\r\n"
            "Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        + body
        + b"\r\n\r\n"
    )
    (tmp_path / "bad.warc.wat").write_bytes(rec + build_wat(RECORDS[:1]))
    rows = {r["url"]: r["links"] for r in wat_links(spark, str(tmp_path)).collect()}
    assert rows["https://bad.example.com/"] == []  # row kept, links empty
    assert len(rows["https://a.example.com/"]) == 2


def test_wat_feeds_inbound_anchors(spark, tmp_path):
    """The WAT tier's point: a link graph with no HTML parsing.
    Explode (src, links) edges into links.py's inbound aggregation."""
    from ocr_compare_spark.operators.links import inbound_anchors

    (tmp_path / "seg.warc.wat").write_bytes(build_wat(RECORDS))
    w = wat_links(spark, str(tmp_path))
    edges = w.select(
        F.col("url").alias("src"), F.explode("links").alias("l")
    ).select("src", F.col("l.href").alias("dst"), F.col("l.text").alias("anchor_text"))
    inb = {r["dst"]: (r["n_inbound"], list(r["anchor_texts"]))
           for r in inbound_anchors(edges).collect()}
    assert inb["https://b.example.com/x"] == (1, ["to b"])
    assert inb["https://a.example.com/"] == (1, ["back to a"])


def test_wat_stream_equals_batch(spark, tmp_path):
    (tmp_path / "seg.warc.wat.gz").write_bytes(build_wat(RECORDS, gzip_members=True))
    batch = {(r["url"], len(r["links"])) for r in wat_links(spark, str(tmp_path)).collect()}
    q = (
        wat_links_stream(spark, str(tmp_path))
        .writeStream.format("memory")
        .queryName("wat_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["url"], len(r["links"]))
        for r in spark.sql("SELECT * FROM wat_stream_test").collect()
    }
    assert stream == batch and len(batch) == 3
