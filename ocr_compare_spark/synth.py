"""Deterministic synthetic web-page corpus.

Derives the BASELINE.json ``input_hint`` table
``(url, warc_ts, html binary, text, lang)`` from the driver-generated
``documents.parquet`` table (doc_id, text, lang, source, n_chars) —
no external data, fully deterministic, so that:

- the Spark pipeline and the DuckDB oracle SQL share one ground truth
  (``documents.text`` is the embedded main content), and
- the expected extractor outputs are *closed-form* functions of
  ``documents.text`` (see expected_* helpers below), expressible in
  ANSI SQL for the correctness gate.

Layout contract (the single source of truth — engines and oracles
both depend on these constants):

- tokens         = text.split(' ')
  (CONTRACT: documents.text contains no non-space whitespace — the
  engines tokenize on ALL whitespace while this contract and every
  oracle split on ' ' only, so a '\\n' or '\\t' inside a token would
  silently diverge. tests/test_property.py asserts the invariant
  over the driver testdata at every SF.)
- paragraphs     = consecutive chunks of PARA_WORDS tokens
- HTML documents = single page; blocks = [promo] + paragraphs,
  wrapped in nav/header/aside/footer boilerplate that the DOM engine
  must strip; the promo block is link-dense so the density engine
  must additionally drop it.
- PDF documents  (doc_id % 10 == PDF_MOD) = PAGE_PARAS paragraphs per
  page, one uncompressed content stream per page, one Tj per
  paragraph.
- host skew      : 50% of urls land on one hot host (doc_id % 2 == 0)
  to exercise salting (north_rule "skew handled explicitly").

Reference analog: examples/basic_usage.py:32-33 reads raw bytes from
disk; here the corpus is a table with an ``html: binary`` column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

PARA_WORDS = 32  # tokens per paragraph
LINE_WORDS = 8  # tokens per line (structural only; line/para seps are both ' ')
PAGE_PARAS = 3  # paragraphs per PDF page
PDF_MOD = 7  # doc_id % 10 == PDF_MOD -> PDF payload
PROMO_TEXT = "promo offer click now"
EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z
TS_SPAN_MIN = 4320  # warc_ts spread over 3 synthetic crawl days


def chunk(seq: list, n: int) -> list[list]:
    return [seq[i : i + n] for i in range(0, len(seq), n)]


def tokens_of(text: str) -> list[str]:
    return text.split(" ") if text else []


def paragraphs_of(text: str) -> list[str]:
    return [" ".join(c) for c in chunk(tokens_of(text), PARA_WORDS)]


def host_of(doc_id: int) -> str:
    if doc_id % 2 == 0:
        return "hot.example.com"
    if doc_id % 4 == 1:
        return "warm.example.com"
    return f"tail{doc_id % 37}.example.com"


def url_of(doc_id: int) -> str:
    return f"https://{host_of(doc_id)}/doc/{doc_id}"


def is_pdf_doc(doc_id: int) -> bool:
    return doc_id % 10 == PDF_MOD


# ---------------------------------------------------------------- HTML


def build_html(doc_id: int, text: str) -> bytes:
    """Boilerplate-wrapped page; main content = paragraphs of `text`."""
    paras = paragraphs_of(text)
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    promo_words = PROMO_TEXT.split(" ")
    promo = (
        f'<div class="promo"><a href="/buy"><b>{promo_words[0]}</b> '
        + " ".join(promo_words[1:])
        + "</a></div>"
    )
    html = f"""<html><head><title>Doc {doc_id}</title><meta charset="utf-8"/>
<style>body {{ margin: 0; }}</style>
<script>var tracker = {doc_id};</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<header><h1>Example Site</h1></header>
<aside><ul><li>Related link one</li><li>Related link two</li></ul></aside>
{promo}
<article>
{body}
</article>
<footer><p>Copyright 2025 Example Corp. All rights reserved.</p></footer>
</body></html>"""
    return html.encode("utf-8")


# ----------------------------------------------------------------- PDF


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(doc_id: int, text: str) -> bytes:
    """Minimal valid PDF 1.4 with uncompressed text content streams.

    One page object + one content stream per PAGE_PARAS paragraphs;
    one ``(para) Tj`` per paragraph. The PDF engine must recover the
    paragraph texts and page structure byte-exactly.
    """
    paras = paragraphs_of(text)
    pages = chunk(paras, PAGE_PARAS) or [[]]
    n = len(pages)
    objs: list[bytes] = []
    # obj 1: catalog, obj 2: pages, obj 3: font,
    # objs 4..4+n-1: page objects, objs 4+n..: content streams
    kids = " ".join(f"{4 + i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + n + i} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
    streams: list[bytes] = []
    for page in pages:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, para in enumerate(page):
            if j > 0:
                ops.append("0 -40 Td")
            ops.append(f"({_pdf_escape(para)}) Tj")
        ops.append("ET")
        streams.append("\n".join(ops).encode("utf-8"))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for idx, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{idx} 0 obj\n".encode() + body + b"\nendobj\n"
    for k, s in enumerate(streams):
        idx = 4 + n + k
        offsets.append(len(out))
        out += (
            f"{idx} 0 obj\n<< /Length {len(s)} >>\nstream\n".encode()
            + s
            + b"\nendstream\nendobj\n"
        )
    xref_at = len(out)
    total = len(objs) + len(streams) + 1
    out += f"xref\n0 {total}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {total} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------- expected outputs


DENSITY_MIN_TOKENS = 3  # engines/density.py MIN_TOKENS — keep in sync


def expected_density_text(text: str) -> str:
    """Density engine keeps only the main paragraphs (single page,
    blocks joined by the page-level '\\n\\n' separator); a trailing
    chunk shorter than DENSITY_MIN_TOKENS is dropped by the
    minimum-length rule."""
    paras = [p for p in paragraphs_of(text) if len(p.split(" ")) >= DENSITY_MIN_TOKENS]
    return "\n\n".join(paras)


def expected_dom_text(text: str) -> str:
    """DOM engine keeps promo + paragraphs (boilerplate stripped)."""
    return "\n\n".join([PROMO_TEXT] + paragraphs_of(text))


def expected_pdf_text(text: str) -> str:
    """PDF engine: pages joined by '\\n=====\\n', blocks by '\\n\\n'."""
    paras = paragraphs_of(text)
    pages = chunk(paras, PAGE_PARAS) or [[]]
    return "\n=====\n".join("\n\n".join(p) for p in pages)


# -------------------------------------------------- Spark generation

_BUILD_SCHEMA = T.BinaryType()


@F.pandas_udf(_BUILD_SCHEMA)
def _build_payload_udf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
    out = []
    for d, t in zip(doc_id, text):
        d = int(d)
        t = t or ""
        out.append(build_pdf(d, t) if is_pdf_doc(d) else build_html(d, t))
    return pd.Series(out)


def pages_from_documents(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """documents.parquet -> input_hint pages table.

    url/warc_ts/lang are pure native expressions (oracle-mirrorable);
    only the payload bytes use an Arrow-batched UDF. ``replicate``
    unions k deterministic copies (url suffixed) for bench scaling.
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        F.col("lang"),
    )
    if replicate > 1:
        base = base.withColumn(
            "copy_no", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        )
    else:
        base = base.withColumn("copy_no", F.lit(0))
    host = (
        F.when(F.col("doc_id") % 2 == 0, F.lit("hot.example.com"))
        .when(F.col("doc_id") % 4 == 1, F.lit("warm.example.com"))
        .otherwise(F.concat(F.lit("tail"), (F.col("doc_id") % 37).cast("string"), F.lit(".example.com")))
    )
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("copy_no") > 0, F.concat(F.lit("?copy="), F.col("copy_no").cast("string"))).otherwise(F.lit("")),
    )
    warc_ts = F.timestamp_seconds(F.lit(EPOCH_2025) + (F.col("doc_id") % TS_SPAN_MIN) * 60)
    return base.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        _build_payload_udf(F.col("doc_id"), F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# SQL fragments the oracle queries reuse (DuckDB dialect-safe ANSI).
SQL_URL = (
    "concat('https://', CASE WHEN doc_id % 2 = 0 THEN 'hot.example.com' "
    "WHEN doc_id % 4 = 1 THEN 'warm.example.com' "
    "ELSE concat('tail', CAST(doc_id % 37 AS VARCHAR), '.example.com') END, "
    "'/doc/', CAST(doc_id AS VARCHAR))"
)
SQL_IS_PDF = f"(doc_id % 10 = {PDF_MOD})"
