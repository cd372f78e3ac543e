"""WARC source (sources/warc.py): framing roundtrip + Spark read
matching the synth pages table byte-for-byte."""

from __future__ import annotations

import gzip
from datetime import datetime, timedelta

import pytest

from ocr_compare_spark import synth
from ocr_compare_spark.sources.warc import (
    build_warc,
    gunzip_members,
    http_body,
    iter_warc_records,
    parse_warc_date,
    warc_pages,
)

T0 = datetime(2025, 1, 1)


def _recs(n=5):
    return [
        (f"https://h{i}.example.com/p/{i}", T0 + timedelta(minutes=i),
         f"<p>body {i}</p>".encode(), "text/html")
        for i in range(n)
    ]


def _responses(data: bytes):
    return [
        (h, p) for h, p in iter_warc_records(data)
        if h.get("warc-type") == "response"
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = _recs()
    data = build_warc(recs, gzip_members=gz)
    got = _responses(data)
    assert len(got) == len(recs)
    for (url, ts, body, _), (h, payload) in zip(recs, got):
        assert h["warc-target-uri"] == url
        assert parse_warc_date(h["warc-date"]) == ts
        assert http_body(payload) == body
    # warcinfo record present and skipped by the response filter
    assert any(h.get("warc-type") == "warcinfo" for h, _ in iter_warc_records(data))


def test_warc_tolerates_garbage_and_truncation():
    recs = _recs(3)
    data = build_warc(recs, with_warcinfo=False)
    # garbage between records
    one = build_warc(recs[:1], with_warcinfo=False)
    littered = b"JUNK" + one + b"\x00\x00garbage" + build_warc(recs[1:], with_warcinfo=False)
    assert [h["warc-target-uri"] for h, _ in _responses(littered)] == [r[0] for r in recs]
    # truncated final record: the complete prefix still parses
    assert len(_responses(data[: len(data) - 40])) == 2
    # unparseable Content-Length resyncs on the next record
    bad = one.replace(b"Content-Length: ", b"Content-Length: x", 1) + build_warc(
        recs[1:2], with_warcinfo=False
    )
    assert [h["warc-target-uri"] for h, _ in _responses(bad)] == [recs[1][0]]
    # truncated gzip stream: never raises, complete members survive
    # (cutting only the trailer may still yield the final payload)
    gz = build_warc(recs, gzip_members=True, with_warcinfo=False)
    assert 1 <= len(_responses(gz[: len(gz) // 2])) < 3
    assert 2 <= len(_responses(gz[: len(gz) - 10])) <= 3


def test_gunzip_members_matches_stdlib():
    recs = _recs(4)
    gz = build_warc(recs, gzip_members=True)
    assert gunzip_members(gz) == gzip.decompress(gz) == build_warc(recs)


def test_warc_pages_matches_synth_pages(spark, sf_dir, tmp_path):
    """WARC files built from the synth corpus read back into exactly
    the pages_from_documents rows (same url -> same bytes), and the
    extraction downstream is byte-identical."""
    import duckdb

    from ocr_compare_spark.operators.extract import run_engines_fused

    rows = duckdb.sql(
        f"select doc_id, text from '{sf_dir}/documents.parquet' order by doc_id limit 100"
    ).fetchall()
    recs = []
    for doc_id, text in rows:
        payload = synth.build_pdf(doc_id, text) if synth.is_pdf_doc(doc_id) else synth.build_html(doc_id, text)
        ts = datetime.utcfromtimestamp(synth.EPOCH_2025 + (doc_id % synth.TS_SPAN_MIN) * 60)
        ctype = "application/pdf" if synth.is_pdf_doc(doc_id) else "text/html"
        recs.append((synth.url_of(doc_id), ts, payload, ctype))
    # two files, one plain + one per-member-gzipped (Common Crawl layout)
    (tmp_path / "a.warc").write_bytes(build_warc(recs[:50]))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(recs[50:], gzip_members=True))

    pages = warc_pages(spark, str(tmp_path) + "/*.warc*")
    got = {r["url"]: r for r in pages.collect()}
    assert len(got) == len(recs)
    for url, ts, payload, _ in recs:
        assert bytes(got[url]["html"]) == payload
        assert got[url]["warc_ts"] == ts

    # downstream byte-identity on a handful of docs
    res = run_engines_fused(pages.withColumn("lang", pages.url.substr(0, 0))).collect()
    texts = {d: t for d, t in rows}
    import re

    checked = 0
    for r in res[:60]:
        doc_id = int(re.findall(r"\d+", r["url"])[-1])
        exp = {
            "dom": synth.expected_dom_text,
            "density": synth.expected_density_text,
            "pdf": synth.expected_pdf_text,
        }[r["engine"]](texts[doc_id], doc_id)
        assert r["doc_text"] == exp
        checked += 1
    assert checked


def test_warc_pages_stream_matches_batch(spark, tmp_path):
    """Streaming WARC ingest (AvailableNow) produces exactly the
    batch read's rows."""
    recs = _recs(6)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.warc").write_bytes(build_warc(recs[:3]))
    (tmp_path / "in" / "b.warc.gz").write_bytes(build_warc(recs[3:], gzip_members=True))
    from ocr_compare_spark.sources.warc import warc_pages_stream

    q = (
        warc_pages_stream(spark, str(tmp_path / "in"))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    batch = {r["url"]: r for r in warc_pages(spark, str(tmp_path / "in")).collect()}
    assert set(got) == set(batch) == {r[0] for r in recs}
    for url in got:
        assert bytes(got[url]["html"]) == bytes(batch[url]["html"])
        assert got[url]["warc_ts"] == batch[url]["warc_ts"]


def test_write_warc_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    """Distributed WARC sink: synth pages -> archives -> warc_pages
    reads back the identical (url, ts, html) set; reruns produce
    byte-identical file sets; manifest counts match."""
    import glob
    import hashlib as _hl

    from ocr_compare_spark import synth
    from ocr_compare_spark.sources.warc import warc_pages, write_warc

    pages = synth.pages_from_documents(spark, sf_dir).select("url", "warc_ts", "html")
    out1 = str(tmp_path / "w1")
    m = write_warc(pages, out1, num_files=4).collect()
    assert sum(r.n_records for r in m) == pages.count()
    files = sorted(glob.glob(f"{out1}/part-*.warc.gz"))
    assert len(files) == len(m) <= 4

    back = warc_pages(spark, f"{out1}/part-*.warc.gz")
    want = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.collect()}
    got = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert got == want

    # rerun: identical file names AND bytes (gzip mtime pinned,
    # content-derived names, sorted partitions)
    out2 = str(tmp_path / "w2")
    write_warc(pages, out2, num_files=4).collect()
    def digest(d):
        return {
            p.split("/")[-1]: _hl.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{d}/part-*")
        }
    assert digest(out1) == digest(out2)

    # pdf payloads carry the pdf content type in the http envelope
    from ocr_compare_spark.sources.warc import iter_warc_records
    ctypes = set()
    for p in files:
        for headers, payload in iter_warc_records(open(p, "rb").read()):
            if headers.get("warc-type") == "response":
                head = payload.split(b"\r\n\r\n", 1)[0].decode()
                ctypes.add("pdf" if "application/pdf" in head else "html")
    assert ctypes == {"pdf", "html"}
