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

# Recursive layout (reference ocr_schema.py:130-167 Block.elements is
# List[Table|Paragraph|Block]): docs with doc_id % 10 == NEST_MOD_REM
# and >= NEST_MIN_PARAS paragraphs wrap paragraphs 1 and 2 in
# <section><p>p1</p><blockquote><p>p2</p></blockquote></section> —
# a depth-2 block-in-block. Because the block separator is '\n' at
# EVERY nesting level (ocr_schema.py:147), the only byte-level effect
# on dom text is that p1 and p2 join with '\n' instead of the
# page-level '\n\n'. The density engine flattens structure (it is a
# boilerplate stripper, like trafilatura's flat text output), so its
# text is unchanged.
NEST_MOD_REM = 2  # doc_id % 10 == 2 -> nested (disjoint from PDF_MOD)
NEST_MIN_PARAS = 3

# Tables (reference ocr_schema.py:215-339): docs with doc_id % 10 ==
# TABLE_MOD_REM and >= 4 tokens get a trailing 2x2 <table> whose
# cells are the doc's first four tokens. Header row uses <th>
# (detected, not assumed); docs with doc_id % 20 == HEADERLESS_REM
# omit the header row entirely (Table.header is Optional).
TABLE_MOD_REM = 4  # doc_id % 10 == 4 -> has table
HEADERLESS_REM = 14  # doc_id % 20 == 14 -> that table has no header row
TABLE_HEADER = ("k", "v")

# Cell.blocks (reference ocr_schema.py:215-238: a cell holds whole
# Blocks, including nested tables): table docs with doc_id % 40 ==
# CELLNEST_REM put STRUCTURE inside their first body row — cell (1,0)
# wraps its token in <blockquote><p>…</p></blockquote> (a block
# inside the cell) and cell (1,1) holds a 1x1 INNER TABLE of its
# token. The rendered bytes are IDENTICAL to the flat bucket (in-cell
# structure flattens with ' ' at the one-line markdown/TSV framing,
# and each cell still contains exactly its one token), so every
# byte-level oracle is untouched; the structure is carried in the
# span table's cell_path column and proven by the tree round-trip
# (tree_paths n_cell_nested / max_cell_depth).
CELLNEST_REM = 24  # doc_id % 40 == 24 (subset of table docs, header present)


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


def is_nested_doc(doc_id: int, text: str) -> bool:
    return doc_id % 10 == NEST_MOD_REM and len(paragraphs_of(text)) >= NEST_MIN_PARAS


def has_table_doc(doc_id: int, text: str) -> bool:
    return doc_id % 10 == TABLE_MOD_REM and len(tokens_of(text)) >= 4


def table_has_header(doc_id: int) -> bool:
    return doc_id % 20 != HEADERLESS_REM


def has_cellnest_doc(doc_id: int, text: str) -> bool:
    return doc_id % 40 == CELLNEST_REM and has_table_doc(doc_id, text)


def table_rows_of(doc_id: int, text: str) -> list[list[str]]:
    """Closed-form table content: optional header + first four tokens
    as a 2x2 body."""
    t = tokens_of(text)
    body = [[t[0], t[1]], [t[2], t[3]]]
    return ([list(TABLE_HEADER)] if table_has_header(doc_id) else []) + body


# ---------------------------------------------------------------- HTML


def build_html(doc_id: int, text: str) -> bytes:
    """Boilerplate-wrapped page; main content = paragraphs of `text`.

    Nested docs wrap paragraphs 1-2 in section/blockquote (block
    recursion); table docs append a trailing 2x2 table (header via
    <th>, omitted entirely for headerless docs)."""
    paras = paragraphs_of(text)
    if is_nested_doc(doc_id, text):
        parts = [f"<p>{paras[0]}</p>"]
        parts.append(
            f"<section><p>{paras[1]}</p>"
            f"<blockquote><p>{paras[2]}</p></blockquote></section>"
        )
        parts.extend(f"<p>{p}</p>" for p in paras[3:])
        body = "\n".join(parts)
    else:
        body = "\n".join(f"<p>{p}</p>" for p in paras)
    if has_table_doc(doc_id, text):
        t = tokens_of(text)
        tbl = ["<table>"]
        if table_has_header(doc_id):
            tbl.append("<tr>" + "".join(f"<th>{h}</th>" for h in TABLE_HEADER) + "</tr>")
        if has_cellnest_doc(doc_id, text):
            # Cell.blocks: a block in cell (1,0), an inner table in
            # cell (1,1) — same tokens, so the rendered bytes match
            # the flat form exactly (see CELLNEST_REM note)
            tbl.append(
                f"<tr><td><blockquote><p>{t[0]}</p></blockquote></td>"
                f"<td><table><tr><td>{t[1]}</td></tr></table></td></tr>"
            )
        else:
            tbl.append(f"<tr><td>{t[0]}</td><td>{t[1]}</td></tr>")
        tbl.append(f"<tr><td>{t[2]}</td><td>{t[3]}</td></tr>")
        tbl.append("</table>")
        body += "\n" + "".join(tbl)
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


def expected_table_markdown(doc_id: int, text: str) -> str:
    """Markdown-lite render of the synthetic table (matches
    operators.extract.table_markdown: '---' separator row only when a
    header row is present)."""
    rows = table_rows_of(doc_id, text)
    out = []
    if table_has_header(doc_id):
        out.append("| " + " | ".join(rows[0]) + " |")
        out.append("| " + " | ".join("---" for _ in rows[0]) + " |")
        rows = rows[1:]
    for r in rows:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def expected_density_text(text: str, doc_id: int | None = None) -> str:
    """Density engine keeps only the main paragraphs (single page,
    blocks joined by the page-level '\\n\\n' separator); a trailing
    chunk shorter than DENSITY_MIN_TOKENS is dropped by the
    minimum-length rule. Structure is flattened (nested sections do
    NOT change density output); tables are kept as trailing blocks."""
    paras = [p for p in paragraphs_of(text) if len(p.split(" ")) >= DENSITY_MIN_TOKENS]
    if doc_id is not None and has_table_doc(doc_id, text):
        paras = paras + [expected_table_markdown(doc_id, text)]
    return "\n\n".join(paras)


def expected_dom_text(text: str, doc_id: int | None = None) -> str:
    """DOM engine keeps promo + paragraphs (boilerplate stripped).
    Nested docs: paragraphs 1-2 merge into one section block (joined
    by the block-level '\\n'); table docs append the markdown table
    block."""
    paras = paragraphs_of(text)
    if doc_id is not None and is_nested_doc(doc_id, text):
        paras = [paras[0], paras[1] + "\n" + paras[2]] + paras[3:]
    blocks = [PROMO_TEXT] + paras
    if doc_id is not None and has_table_doc(doc_id, text):
        blocks.append(expected_table_markdown(doc_id, text))
    return "\n\n".join(blocks)


def expected_pdf_text(text: str, doc_id: int | None = None) -> str:
    """PDF engine: pages joined by '\\n=====\\n', blocks by '\\n\\n'.
    (doc_id accepted for signature symmetry; PDFs never nest or
    carry tables in the synthetic corpus.)"""
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


def host_expr(doc_id_col: str = "doc_id") -> F.Column:
    """Column twin of host_of() — the corpus's host-assignment rule."""
    d = F.col(doc_id_col)
    return (
        F.when(d % 2 == 0, F.lit("hot.example.com"))
        .when(d % 4 == 1, F.lit("warm.example.com"))
        .otherwise(
            F.concat(F.lit("tail"), (d % 37).cast("string"), F.lit(".example.com"))
        )
    )


def url_expr(doc_id_col: str = "doc_id") -> F.Column:
    """Column twin of url_of() (SQL twin: SQL_URL)."""
    return F.concat(
        F.lit("https://"),
        host_expr(doc_id_col),
        F.lit("/doc/"),
        F.col(doc_id_col).cast("string"),
    )


def pages_from_documents(
    spark: SparkSession, sf_dir: str, replicate: int = 1, num_partitions: int | None = None
) -> DataFrame:
    """documents.parquet -> input_hint pages table.

    url/warc_ts/lang are pure native expressions (oracle-mirrorable);
    only the payload bytes use an Arrow-batched UDF. ``replicate``
    unions k deterministic copies (url suffixed) for bench scaling.
    ``num_partitions`` repartitions the INPUT rows before the payload
    UDF — the small parquet reads as 1-2 splits, so without it the
    byte building runs nearly single-threaded (callers that repartition
    the OUTPUT put the exchange above the UDF and don't fix that).
    r6: the default is now scale-adaptive — when ``num_partitions``
    is None the input spreads to the session's defaultParallelism
    (the parquet reads as 1-2 splits at every gate sf, so the payload
    UDF used to run serially on the critical path of every consumer
    that did not pass the hint; output VALUES are unchanged).
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if num_partitions:
        docs = docs.repartition(num_partitions)
    # payload bytes depend only on (doc_id, text) — build them BELOW
    # the replicate explode so each doc's payload is computed once and
    # the Generate duplicates the bytes (r6: at replicate=k the UDF
    # used to run k times per doc; values byte-identical, the Project
    # under the Generate evaluates once per input row)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        F.col("lang"),
        _build_payload_udf(F.col("doc_id"), F.col("text")).alias("html"),
    )
    if replicate > 1:
        base = base.withColumn(
            "copy_no", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        )
    else:
        base = base.withColumn("copy_no", F.lit(0))
    url = F.concat(
        url_expr(),
        F.when(F.col("copy_no") > 0, F.concat(F.lit("?copy="), F.col("copy_no").cast("string"))).otherwise(F.lit("")),
    )
    warc_ts = F.timestamp_seconds(F.lit(EPOCH_2025) + (F.col("doc_id") % TS_SPAN_MIN) * 60)
    return base.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.col("html"),
        F.col("text"),
        F.col("lang"),
    )


# ---- synthetic media payloads (REAL uncompressed images) ----------
# Per doc: a constant-fill image whose pixel stats are CLOSED FORM in
# doc_id, so the DuckDB oracle recomputes mean/size without decoding:
#   w = 5 + doc_id % 4   (5..8 — w % 4 != 0 exercises BMP row padding)
#   h = 4 + doc_id % 3   (4..6)
#   even doc_id -> P5 graymap, fill v = (doc_id * 37) % 256
#                  n_bytes = 11 + w*h   (header "P5\n{w} {h}\n255\n",
#                  single-digit dims)
#   odd  doc_id -> 24-bit BMP, fill v = (doc_id * 53) % 256 (all ch)
#                  n_bytes = 54 + h * ((3*w + 3) // 4 * 4)
# Decoded pixel mean == v exactly (constant fill), but ONLY if the
# decoder gets the stride/offset right — padding bytes are zero, so a
# stride bug drags the mean and the oracle catches it.


def media_dims(doc_id: int) -> tuple[int, int]:
    return 5 + doc_id % 4, 4 + doc_id % 3


def media_fill(doc_id: int) -> int:
    return (doc_id * 37) % 256 if doc_id % 2 == 0 else (doc_id * 53) % 256


def media_payload_bytes(doc_id: int) -> bytes:
    import numpy as np

    from ocr_compare_spark.operators.multimodal import encode_bmp, encode_pnm

    w, h = media_dims(doc_id)
    v = media_fill(doc_id)
    if doc_id % 2 == 0:
        return encode_pnm(np.full((h, w), v, dtype=np.uint8))
    return encode_bmp(np.full((h, w, 3), v, dtype=np.uint8))


@F.pandas_udf(T.BinaryType())
def _media_payload_udf(doc_id: pd.Series) -> pd.Series:
    return pd.Series([media_payload_bytes(int(d)) for d in doc_id])


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (url, payload) media table of real
    uncompressed image bytes (the multimodal analog of
    pages_from_documents)."""
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    url = url_expr()
    return docs.select(
        url.alias("url"), _media_payload_udf(F.col("doc_id").cast("long")).alias("payload")
    )


# ---- synthetic scan photos (document quad on a dark background) ---
# Per doc: a 96x72 P5 graymap "photo" — bright document quadrilateral
# (fill 204) on a dark background (32) with dark text stripes (64)
# inside. The four corners are CLOSED FORM in doc_id and each corner
# is confined to its own corner box, so (a) the quad is convex, and
# (b) each corner UNIQUELY extremizes the reference _order_points
# functional (min/max of x+y and y-x) over the bright mask — the
# edges leaving tl/br have |slope| < 1 toward tr/bl and the near-
# vertical edges have |inverse slope| < 1, so no other quad pixel
# ties the extreme. scanner.find_document_quad therefore recovers
# the planted corners EXACTLY, and the warp output dims
# (int(max(side norms))) are closed form too — both oracle-able in
# ANSI SQL. Stripes sit on an inner polygon (vertices pulled 22%
# toward the centroid) so corners stay bright.

SCAN_W, SCAN_H = 96, 72
SCAN_BG, SCAN_FILL, SCAN_INK = 32, 204, 64


def scan_corners(doc_id: int) -> list[tuple[int, int]]:
    """[tl, tr, br, bl] in (x, y) pixel coords, closed form in doc_id
    (mirrored by the media_suite scan-arm oracle SQL)."""
    d = doc_id
    return [
        (8 + d % 5, 6 + (d * 3) % 5),
        (SCAN_W - 9 - (d * 2) % 5, 7 + (d * 7) % 5),
        (SCAN_W - 8 - (d * 3) % 5, SCAN_H - 8 - (d * 5) % 5),
        (9 + (d * 7) % 4, SCAN_H - 9 - (d * 2) % 5),
    ]


def _quad_mask(w: int, h: int, pts) -> "np.ndarray":
    """Inclusive rasterization of a convex quad given [tl,tr,br,bl]:
    half-plane test per edge with cross >= 0 (corner pixels land ON
    two edges and are kept)."""
    import numpy as np

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    m = np.ones((h, w), dtype=bool)
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        m &= (x1 - x0) * (ys - y0) - (y1 - y0) * (xs - x0) >= 0
    return m


def scan_payload_bytes(doc_id: int) -> bytes:
    import numpy as np

    from ocr_compare_spark.operators.multimodal import encode_pnm

    pts = scan_corners(doc_id)
    canvas = np.full((SCAN_H, SCAN_W), SCAN_BG, dtype=np.uint8)
    canvas[_quad_mask(SCAN_W, SCAN_H, pts)] = SCAN_FILL
    cx = sum(p[0] for p in pts) / 4.0
    cy = sum(p[1] for p in pts) / 4.0
    inner = [(cx + 0.78 * (x - cx), cy + 0.78 * (y - cy)) for x, y in pts]
    ys = np.arange(SCAN_H)[:, None]
    stripes = _quad_mask(SCAN_W, SCAN_H, inner) & ((ys % 8 == 4) | (ys % 8 == 5))
    canvas[stripes] = SCAN_INK
    return encode_pnm(canvas)


@F.pandas_udf(T.BinaryType())
def _scan_payload_udf(doc_id: pd.Series) -> pd.Series:
    return pd.Series([scan_payload_bytes(int(d)) for d in doc_id])


def scans_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (url, payload) table of synthetic scan
    photos (same url scheme as media_from_documents)."""
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    url = url_expr()
    return docs.select(
        url.alias("url"), _scan_payload_udf(F.col("doc_id").cast("long")).alias("payload")
    )


# SQL fragments the oracle queries reuse (DuckDB dialect-safe ANSI).
SQL_URL = (
    "concat('https://', CASE WHEN doc_id % 2 = 0 THEN 'hot.example.com' "
    "WHEN doc_id % 4 = 1 THEN 'warm.example.com' "
    "ELSE concat('tail', CAST(doc_id % 37 AS VARCHAR), '.example.com') END, "
    "'/doc/', CAST(doc_id AS VARCHAR))"
)
SQL_IS_PDF = f"(doc_id % 10 = {PDF_MOD})"
# These two assume a `t` column holding string_split(text, ' ').
SQL_IS_NESTED = (
    f"(doc_id % 10 = {NEST_MOD_REM} AND ceil(len(t)/{PARA_WORDS}.0) >= {NEST_MIN_PARAS})"
)
SQL_HAS_TABLE = f"(doc_id % 10 = {TABLE_MOD_REM} AND len(t) >= 4)"
SQL_TABLE_HEADER = f"(doc_id % 20 != {HEADERLESS_REM})"
SQL_HAS_CELLNEST = f"({SQL_HAS_TABLE} AND doc_id % 40 = {CELLNEST_REM})"
