"""WET source: Common Crawl's pre-extracted plain-text tier.

Common Crawl publishes three artifact tiers per crawl: WARC (raw
responses — sources/warc.py), WAT (metadata JSON) and WET
(``*.warc.wet.gz``: one ``WARC-Type: conversion`` record per page
whose payload is the UTF-8 plain text already extracted from the
HTML). C4, CCNet and most public pretraining corpora consumed the
WET tier directly — so a curation pipeline needs a WET reader that
skips this engine's own extraction stage and feeds the text
operators (textstats / lm / dedup / sampling) as-is.

WET files ARE WARC files (ISO 28500 framing, per-record gzip
members), so this module is a thin routing layer over
sources/warc.py's tolerant record iterator — same per-file
``binaryFile`` parallelism, same one-``mapInPandas`` framing, same
malformed-record skipping. Output shape is the documents-table
analog ``(url, warc_ts, text)`` with text decoded as UTF-8
(replacement characters for invalid bytes — a crawl source never
fails the task on one bad record).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_compare_spark.sources.warc import iter_warc_records, parse_warc_date

WET_SCHEMA = "url string, warc_ts timestamp, text string"


def frame_wet_files(files: DataFrame) -> DataFrame:
    """(content binary) file rows -> conversion-record text rows.
    Works on batch and streaming DataFrames (same mapInPandas plan,
    mirroring warc.frame_warc_files)."""
    files = files.select("content")

    def gen(batches):
        for pdf in batches:
            urls: list[str] = []
            tss: list = []
            texts: list[str] = []
            for content in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(content)):
                    if headers.get("warc-type") != "conversion":
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    urls.append(url)
                    tss.append(parse_warc_date(headers.get("warc-date")))
                    texts.append(payload.decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "text": texts},
                columns=["url", "warc_ts", "text"],
            )

    return files.mapInPandas(gen, WET_SCHEMA)


def wet_text(spark: SparkSession, path: str) -> DataFrame:
    """Read WET file(s) at ``path`` (glob ok) into ``(url, warc_ts,
    text)``. Only ``WARC-Type: conversion`` records with a target URI
    become rows; warcinfo/metadata records and malformed entries are
    skipped."""
    return frame_wet_files(spark.read.format("binaryFile").load(path))


def wet_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin (file-source exactly-once, one WET file per
    micro-batch) — compose with the text operators + writeStream."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return frame_wet_files(files)


def build_wet(records, gzip_members: bool = False, with_warcinfo: bool = True) -> bytes:
    """Serialize (url, ts, text) tuples as a WET byte stream — the
    deterministic test twin of ``wet_text`` (conversion records, bare
    UTF-8 payload, optional per-record gzip members like the real
    Common Crawl layout)."""
    import gzip as _gzip

    chunks: list[bytes] = []

    def emit(rec: bytes) -> None:
        chunks.append(_gzip.compress(rec, mtime=0) if gzip_members else rec)

    if with_warcinfo:
        info = b"software: ocr_compare_spark synth\r\n"
        emit(
            (
                "WARC/1.0\r\n"
                "WARC-Type: warcinfo\r\n"
                "WARC-Date: 2025-01-01T00:00:00Z\r\n"
                "Content-Type: application/warc-fields\r\n"
                f"Content-Length: {len(info)}\r\n\r\n"
            ).encode()
            + info
            + b"\r\n\r\n"
        )
    for url, ts, text in records:
        body = text.encode("utf-8")
        emit(
            (
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            + body
            + b"\r\n\r\n"
        )
    return b"".join(chunks)
