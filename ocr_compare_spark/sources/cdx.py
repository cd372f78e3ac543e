"""CDX(J) source: Common Crawl's per-capture URL index tier.

The fourth Common Crawl artifact tier (with WARC = raw responses,
WAT = metadata JSON, WET = extracted text): ``cdx-*.gz`` shards of
the per-crawl URL index, one text line per capture::

    <urlkey> <14-digit timestamp> {"url": ..., "mime": ..., ...}

where ``urlkey`` is the SURT sort key (functions/url.surt_key), the
timestamp is ``yyyyMMddHHmmss``, and the JSON carries the capture
record: original url, mime, HTTP status, SHA-1 payload ``digest``,
and the (``filename``, ``offset``, ``length``) triple locating the
record inside its WARC file. Numeric fields are JSON *strings* in
the real index; this reader casts them.

Why a pipeline wants the index BEFORE touching any WARC byte:

- crawl-delta planning: join this crawl's digests against the cache
  to find which payloads actually changed (plans/incremental.py) —
  unchanged pages are skipped without downloading their WARC range;
- snapshot selection: ``dedup.latest_snapshot`` over (urlkey, ts)
  picks the newest capture per page across stacked crawls;
- corpus scoping: status/mime/language filters prune the fetch list
  to e.g. ``status=200 AND mime='text/html'``.

Spark-first: the tier is LINE-ORIENTED text, so — unlike the
WARC/WAT/WET readers, which need a Python framing pass — this one is
100% JVM-side: ``spark.read.text`` (splittable for plain shards,
per-file for ``.gz``) + one regexp split + ``from_json`` with a
partial schema. Zero Python anywhere; malformed lines are dropped
(an index line without a parseable key locates nothing).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Partial schema of the CDXJ JSON — only the fields the pipeline
#: reads (Spark's JSON parser prunes the rest). All strings in the
#: real index; casts happen in _parse_lines.
CDX_JSON_SCHEMA = (
    "STRUCT<url: STRING, mime: STRING, `mime-detected`: STRING, status: STRING,"
    " digest: STRING, length: STRING, offset: STRING, filename: STRING,"
    " languages: STRING, charset: STRING>"
)

def _parse_lines(lines: DataFrame) -> DataFrame:
    # ONE pass per line: a 3-way space split (the urlkey and the
    # 14-digit timestamp cannot contain spaces; the JSON remainder
    # keeps its spaces under the split limit) — a 3-group regexp
    # would re-run the anchored scan once per extracted group
    parts = F.split(F.col("value"), " ", 3)
    # F.get is null-on-missing (element_at would raise under ANSI on
    # a line with fewer than two spaces)
    framed = lines.select(
        F.get(parts, 0).alias("urlkey"),
        F.get(parts, 1).alias("_ts"),
        F.get(parts, 2).alias("_json"),
        F.size(parts).alias("_n"),
    ).filter(
        # a line that doesn't frame (no key / bad timestamp / no JSON
        # object) locates nothing — dropped, unlike the WARC-tier
        # readers where a kept row still carries the page identity
        (F.col("_n") == 3)
        & (F.col("urlkey") != "")
        & F.col("_ts").rlike(r"^\d{14}$")
        & F.col("_json").startswith("{")
    )
    j = F.from_json(F.col("_json"), CDX_JSON_SCHEMA)
    return framed.select(
        "urlkey",
        F.to_timestamp(F.col("_ts"), "yyyyMMddHHmmss").alias("ts"),
        j["url"].alias("url"),
        F.coalesce(j["mime-detected"], j["mime"]).alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
        j["languages"].alias("languages"),
    ).filter(F.col("url").isNotNull())


def cdx_entries(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ shard(s) at ``path`` (glob ok, ``.gz`` transparent)
    into one row per capture:
    ``(urlkey, ts, url, mime, status, digest, length, offset,
    filename, languages)``."""
    return _parse_lines(spark.read.text(path))


def cdx_entries_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin (file-source exactly-once, one shard per
    micro-batch) — e.g. feed ``latest_snapshot``-style upserts as new
    crawl indexes land."""
    return _parse_lines(spark.readStream.text(path))


# ---------------------------------------------------------------------------
# Deterministic test twin

# compiled from the canonical list so the mirror cannot drift from
# the Spark expression (functions/url.py owns the pattern)
from ocr_compare_spark.functions.url import TRACKING_PARAM_PATTERN

_TRACKING_RE = re.compile(TRACKING_PARAM_PATTERN)


def surt_key_py(url: str) -> str:
    """Pure-Python mirror of functions/url.surt_key (same contract,
    documented there) — used by build_cdxj and pinned equal to the
    Spark expression in tests/test_sources_cdx.py."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$", url, re.S)
    if not m:
        return url
    scheme = m.group(1).lower()
    rest = m.group(2)
    am = re.match(r"^([^/?#]*)(.*)$", rest, re.S)
    authority, tail = am.group(1), am.group(2)
    tail = tail.split("#", 1)[0]
    host = authority.split("@", 1)[1] if "@" in authority else authority
    port = ""
    if host.startswith("["):
        hm = re.match(r"^(\[[^\]]*\])(?::(\d+))?$", host)
        if hm:
            host, port = hm.group(1), hm.group(2) or ""
    elif ":" in host:
        h, p = host.rsplit(":", 1)
        if p.isdigit():
            host, port = h, p
    host = host.lower()
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    path, _, query = tail.partition("?")
    if path == "":
        path = "/"
    query_part = ""
    if query:
        kept = sorted(p for p in query.split("&") if p and not _TRACKING_RE.match(p))
        if kept:
            query_part = "?" + "&".join(kept)
    h2 = re.sub(r"^www\d*\.(?=[^.]+\.)", "", host)
    if re.match(r"^\d+\.\d+\.\d+\.\d+$", h2) or h2.startswith("["):
        rev = h2
    else:
        rev = ",".join(reversed(h2.split(".")))
    return rev + (":" + port if port else "") + ")" + (path + query_part).lower()


def build_cdxj(records, gzip_file: bool = False) -> bytes:
    """Serialize (url, ts, fields-dict) tuples as a CDXJ shard — the
    deterministic twin of ``cdx_entries``. ``fields`` are the JSON
    extras (mime/status/digest/length/offset/filename/languages, as
    strings like the real index); the urlkey is computed with
    surt_key_py."""
    import gzip as _gzip

    lines = []
    for url, ts, fields in records:
        payload = {"url": url, **fields}
        lines.append(
            f"{surt_key_py(url)} {ts.strftime('%Y%m%d%H%M%S')} "
            f"{json.dumps(payload, sort_keys=True)}\n"
        )
    data = "".join(lines).encode("utf-8")
    return _gzip.compress(data, mtime=0) if gzip_file else data
