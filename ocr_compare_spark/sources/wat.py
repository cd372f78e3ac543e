"""WAT source: Common Crawl's per-page metadata/link tier.

The third Common Crawl artifact tier (with WARC = raw responses and
WET = extracted text): ``*.warc.wat.gz`` files carry one
``WARC-Type: metadata`` record per crawled page whose payload is a
JSON envelope; the part a link-graph pipeline wants is
``Envelope / Payload-Metadata / HTTP-Response-Metadata /
HTML-Metadata / Links`` — the page's outlinks as parsed by the
crawler, so a WAT-fed link graph needs no HTML parsing at all.

Spark-first split of work:
- record FRAMING (WARC iteration, gzip members, tolerant skipping)
  happens once in the same ``mapInPandas`` shape as warc.py/wet.py,
  emitting the raw JSON payload as a string column;
- JSON PARSING stays JVM-side via ``from_json`` with a partial
  schema (only the fields we read — Spark's JSON parser prunes the
  rest), so the per-record work in Python is zero beyond framing.

Output: ``(url, warc_ts, links array<struct<href,text>>)`` — feed
``operators/links.py::inbound_anchors`` or resolve/canonicalize with
``functions/url.py`` exactly like links extracted from raw HTML.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_compare_spark.sources.warc import iter_warc_records, parse_warc_date

_RAW_SCHEMA = "url string, warc_ts timestamp, payload string"

#: Partial schema of the WAT JSON envelope — only the link list.
#: Field names with dashes are legal struct field names.
WAT_JSON_SCHEMA = (
    "STRUCT<Envelope: STRUCT<`Payload-Metadata`: STRUCT<"
    "`HTTP-Response-Metadata`: STRUCT<`HTML-Metadata`: STRUCT<"
    "Links: ARRAY<STRUCT<url: STRING, text: STRING>>>>>>>"
)


def frame_wat_files(files: DataFrame) -> DataFrame:
    """(content binary) file rows -> one row per metadata record with
    the raw JSON payload; works on batch and streaming inputs."""
    files = files.select("content")

    def gen(batches):
        for pdf in batches:
            urls: list[str] = []
            tss: list = []
            payloads: list[str] = []
            for content in pdf["content"]:
                for headers, payload in iter_warc_records(bytes(content)):
                    if headers.get("warc-type") != "metadata":
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    urls.append(url)
                    tss.append(parse_warc_date(headers.get("warc-date")))
                    payloads.append(payload.decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "payload": payloads},
                columns=["url", "warc_ts", "payload"],
            )

    return files.mapInPandas(gen, _RAW_SCHEMA)


def _extract_links(df: DataFrame) -> DataFrame:
    parsed = F.from_json(F.col("payload"), WAT_JSON_SCHEMA)
    links = (
        parsed["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]["Links"]
    )
    # normalize field names to the links.py contract (href, text);
    # records without an HTML-Metadata.Links section (non-HTML pages,
    # malformed JSON) yield an empty array, not a dropped row
    norm = F.transform(
        links, lambda l: F.struct(l["url"].alias("href"), l["text"].alias("text"))
    )
    return df.select(
        "url",
        "warc_ts",
        F.coalesce(norm, F.array().cast("array<struct<href:string,text:string>>")).alias(
            "links"
        ),
    )


def wat_links(spark: SparkSession, path: str) -> DataFrame:
    """Read WAT file(s) at ``path`` (glob ok) into
    ``(url, warc_ts, links)``. Only ``WARC-Type: metadata`` records
    with a target URI become rows."""
    return _extract_links(frame_wat_files(spark.read.format("binaryFile").load(path)))


def wat_links_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin (file-source exactly-once semantics)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return _extract_links(frame_wat_files(files))


def build_wat(records, gzip_members: bool = False) -> bytes:
    """Serialize (url, ts, [(href, text), ...]) tuples as a WAT byte
    stream — the deterministic test twin of ``wat_links``."""
    import gzip as _gzip
    import json

    chunks: list[bytes] = []
    for url, ts, links in records:
        env = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "A@/href", "url": h, "text": t}
                                for h, t in links
                            ]
                        }
                    }
                }
            }
        }
        body = json.dumps(env, sort_keys=True).encode("utf-8")
        rec = (
            (
                "WARC/1.0\r\n"
                "WARC-Type: metadata\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                "Content-Type: application/json\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            + body
            + b"\r\n\r\n"
        )
        chunks.append(_gzip.compress(rec, mtime=0) if gzip_members else rec)
    return b"".join(chunks)
