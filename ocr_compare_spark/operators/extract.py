"""Extraction operator: pages table -> per-(url, engine) canonical results.

This is the Spark lifecycle equivalent of the reference's
``execute_ocr`` orchestration (/root/reference/src/ocrtool/
ocr_impls/ocr_executor.py:122-183): route by payload type (native
column predicate — the %PDF magic check of page_count.py:6-16), then
one Arrow-vectorized pandas UDF per engine (the only Python boundary,
≈ the reference's process/network boundary to tesseract/GDAI), then
flatten.

Text assembly here follows the reference separators EXACTLY
(ocr_schema.py:85,102,119,147,182,198) and records char offsets per
word span while assembling, so the span table can rebuild the
document text byte-identically (operators/assemble.py proves it).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ocr_compare_spark.engines.base import EngineSpec, ParsedDoc, create_engine
from ocr_compare_spark.schema import (
    EXTRACT_RESULT_TYPE,
    SEP_BLOCK,
    SEP_DOCUMENT,
    SEP_PAGE,
    SPAN_FIELDS,
)
from ocr_compare_spark.synth import LINE_WORDS

# Native predicate: payload is a PDF (≈ is_pdf, page_count.py:6-16).
# Stays JVM-side — no UDF for routing. coalesce(.., false) so NULL
# payloads route to the HTML engines (which quarantine them as
# null_payload error rows) instead of silently vanishing.
IS_PDF_EXPR = "coalesce(substring(html, 1, 4) = X'25504446', false)"


def _cell_flat(cell) -> str:
    """One-line rendering of a cell for row framing: '\\n' between
    paragraph runs flattens to ' ' (a '\\n' inside a one-line framed
    row would be ill-formed); structured run-list cells (Cell.blocks
    — in-cell blocks / inner tables, see engines.html_tree.RawBlock)
    flatten their runs with the same ' '."""
    if isinstance(cell, str):
        return cell.replace("\n", " ")
    return " ".join(txt for _path, _kind, txt in cell)


def _cell_runs(cell) -> list[tuple]:
    """Normalize a cell to its ordered run list
    [(cell_path | None, kind | None, run_text)] — plain string cells
    split on '\\n' (paragraph runs), structured cells pass through."""
    if isinstance(cell, str):
        return [(None, None, cp) for cp in (cell.split("\n") if cell else [""])]
    return cell if cell else [(None, None, "")]


def table_markdown(rows: list[list[str]], has_header: bool = True) -> str:
    """Markdown-lite table rendering.

    The reference renders tables via pandas ``to_markdown``
    (ocr_schema.py:315-322, needs tabulate which this environment
    lacks), with a TSV ``raw_text`` fallback (ocr_schema.py:324-334).
    We define our own fixed markdown-lite format — deterministic and
    library-free. Row 0 renders as header (with a '---' separator
    row) ONLY when ``has_header`` — reference ``Table.header`` is
    Optional (ocr_schema.py:280-339); a headerless table is all body
    rows. Multi-paragraph cells (Cell.blocks) flatten with ' ' so
    the one-line-per-row markdown contract holds.
    """
    if not rows:
        return ""
    flat = [[_cell_flat(c) for c in r] for r in rows]
    out = []
    body = flat
    if has_header:
        header, body = flat[0], flat[1:]
        out.append("| " + " | ".join(header) + " |")
        out.append("| " + " | ".join("---" for _ in header) + " |")
    for r in body:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def word_confidence(base: float, i: int) -> float:
    """Deterministic per-word confidence: the engine base minus a
    cyclic penalty on the document-global word ordinal ``i``.
    Synthetic stand-in for the reference's per-word ``conf / 100``
    (tesseract_executor.py:183) — varies per node but stays a
    closed-form function of (engine, ordinal) so the SQL oracle can
    recompute every level of the hierarchy."""
    return base - (i % 10) / 100.0


def _cyc_prefix(i: int) -> int:
    """sum of (k % 10) for k in [0, i)."""
    q, m = divmod(i, 10)
    return 45 * q + m * (m - 1) // 2


def line_confidence(base: float, start: int, n: int) -> float:
    """Mean word confidence of a line of ``n`` words starting at
    document-global ordinal ``start`` — closed form
    base - sum(ordinal % 10) / (100 * n). The integer sum is exact,
    so this is both O(1) per line (no per-word Python on the hot
    path) and float-stable (single division; the SQL oracle computes
    the bit-identical expression)."""
    return base - (_cyc_prefix(start + n) - _cyc_prefix(start)) / (100.0 * n)


def _mean(xs: list[float]) -> float | None:
    return sum(xs) / len(xs) if xs else None


def table_raw_text(rows: list[list[str]]) -> str:
    """TSV fallback rendering — the reference's ``raw_text`` variant
    (ocr_schema.py:324-334: cells joined by '\\t', rows by '\\n'),
    used when the markdown renderer is unavailable. Multi-paragraph
    cells flatten with ' ' (a '\\n' inside a cell would corrupt the
    row framing)."""
    return "\n".join("\t".join(_cell_flat(c) for c in r) for r in rows)


def _dfs_paras(blk) -> list[list[str]]:
    """Leaf paragraphs of a block subtree in DFS element order (used
    to size the uniform char width for PDF word boxes; PDF blocks are
    flat single-para, but the recursion keeps the math honest for
    nested blocks too)."""
    out: list[list[str]] = []
    for kind, payload in blk.iter_elements():
        if kind == "para":
            out.append(payload)
        elif kind == "block":
            out.extend(_dfs_paras(payload))
    return out


def doc_to_result(parsed: ParsedDoc, base_conf: float, with_spans: bool = True) -> dict:
    """ParsedDoc -> one EXTRACT_RESULT_TYPE row (doc_text + span rows).

    Renders the RECURSIVE element tree (reference Block.elements:
    List[Table|Paragraph|Block], ocr_schema.py:130-167): a block's
    elements join with SEP_BLOCK at every nesting level, paragraphs
    render word-by-word with char offsets, tables render markdown.
    Span rows carry `elem_path` (element-ordinal path from the page
    to the word's paragraph) so the flattened table round-trips the
    recursion (see schema.py).

    Confidence is aggregated exactly like the reference: line = mean
    of word confs, paragraph = mean of lines, block = mean of its
    ELEMENTS (recursively — a nested block contributes its own mean),
    page = mean of blocks, document = mean of pages
    (tesseract_executor.py:210-325 mean-of-means, not a flat mean).
    Pages with no words contribute nothing (reference skips empty
    pages when averaging)."""
    if parsed.error is not None:
        return {
            "doc_text": None, "n_pages": 0, "n_blocks": 0, "n_tables": 0,
            "n_words": 0, "confidence": None, "spans": [] if with_spans else None,
            "pages_meta": None, "native_json": None, "error": parsed.error,
        }
    parts: list[str] = []
    spans: list[dict] = []
    off = widx = n_blocks = n_tables = n_words = 0

    def emit(s: str) -> None:
        nonlocal off
        parts.append(s)
        off += len(s)

    def render_table(rows, has_header, path, page_no, bbox, extra):
        """Emit spans for one table element, return its confidence
        contribution (a single pseudo-line over its words). row_type
        marks HeaderRow vs BodyRow (ocr_schema.py:280-339); cell
        paragraph runs (split on '\\n' — Cell.blocks) get para_no
        WITHIN the cell. ``extra`` rides on the element's FIRST span
        only (a per-node property bag duplicated onto every word is
        pure Arrow weight)."""
        nonlocal n_tables, n_words, widx
        n_tables += 1
        tno = n_tables - 1
        tbl_start, tbl_words = widx, 0
        first = True
        first_idx = len(spans)
        for ri, row in enumerate(rows):
            rtype = "HEADER" if (has_header and ri == 0) else "BODY"
            for ci, cell in enumerate(row):
                for cpi, (cpath, ckind, cp) in enumerate(_cell_runs(cell)):
                    words = cp.split()
                    if not words:
                        # Empty cell: placeholder span so the
                        # assemble cascade keeps the column and
                        # sizes the '---' separator row from the
                        # true header width (byte-identical
                        # round-trip for <td></td>).
                        words = [""]
                    for wi, w in enumerate(words):
                        wc = word_confidence(base_conf, widx) if w else None
                        if w:
                            n_words += 1
                            widx += 1
                            tbl_words += 1
                        if with_spans:
                            e = extra if first else None
                            if ckind is not None and wi == 0:
                                # mark the run's first span with the
                                # in-cell item kind so the tree can
                                # tell an inner TABLE from an in-cell
                                # block (cell_path alone is ambiguous)
                                e = dict(e or {})
                                e["cell_item"] = ckind
                            spans.append({
                                "page_no": page_no, "block_no": path[0], "block_type": "TABLE",
                                "elem_path": path,
                                "para_no": cpi, "line_no": ri, "word_no": wi, "text": w,
                                "char_start": None, "char_end": None, "bbox": bbox,
                                "confidence": wc, "row_no": ri, "column_no": ci,
                                "table_no": tno, "row_type": rtype,
                                "cell_path": list(cpath) if cpath is not None else None,
                                "extra": e,
                            })
                            first = False
        conf = line_confidence(base_conf, tbl_start, tbl_words) if tbl_words else None
        if with_spans and conf is not None and len(spans) > first_idx:
            # the table ELEMENT's exact confidence rides the first
            # span's extra bag (repr round-trips the double exactly,
            # so the nested tree recovers it bit-for-bit — a float
            # mean over the stored word confs would differ in ulps
            # from this closed form)
            e0 = dict(spans[first_idx]["extra"] or {})
            e0["elem_conf"] = repr(conf)
            spans[first_idx]["extra"] = e0
        return conf

    def render_para(tokens, path, page_no, block_type, bbox, char_w, block_start, extra):
        nonlocal n_words, widx, off
        lines = [tokens[i : i + LINE_WORDS] for i in range(0, len(tokens), LINE_WORDS)]
        line_confs: list[float] = []
        depth = len(path) - 1
        para_no = path[-1]
        block_no = path[0]
        # flat TEXT spans store NULL elem_path — it is derivably
        # [block_no, para_no] (see schema.py / with_elem_path), and
        # storing a per-word array for the overwhelmingly-flat web is
        # pure Arrow/shuffle weight
        stored_path = path if depth > 1 else None
        # hot loop: local aliases beat closure-cell access per word
        parts_append = parts.append
        spans_append = spans.append
        _off, _widx = off, widx
        for li, line in enumerate(lines):
            if li > 0:
                parts_append(" ")  # SEP_PARAGRAPH == SEP_LINE == ' '
                _off += 1
            lc = None
            if line:
                lc = line_confidence(base_conf, _widx, len(line))
                line_confs.append(lc)
            if with_spans:
                for wi, w in enumerate(line):
                    if wi > 0:
                        parts_append(" ")
                        _off += 1
                    wb = bbox
                    if bbox is not None:
                        wb = {
                            "left": bbox["left"] + char_w * (_off - block_start),
                            "top": bbox["top"],
                            "width": char_w * len(w),
                            "height": bbox["height"],
                        }
                    lw = len(w)
                    e = extra if li == 0 and wi == 0 else None
                    if wi == 0 and lc is not None:
                        # the LINE's exact closed-form confidence on
                        # its first span (repr round-trips the double
                        # bit-exactly for the nested tree)
                        e = dict(e or {})
                        e["line_conf"] = repr(lc)
                    spans_append({
                        "page_no": page_no, "block_no": block_no, "block_type": block_type,
                        "elem_path": stored_path,
                        "para_no": para_no, "line_no": li, "word_no": wi, "text": w,
                        "char_start": _off, "char_end": _off + lw, "bbox": wb,
                        "confidence": base_conf - (_widx % 10) / 100.0, "row_no": None,
                        "column_no": None, "table_no": None, "row_type": None,
                        "cell_path": None,
                        "extra": e,
                    })
                    _widx += 1
                    parts_append(w)
                    _off += lw
                n_words += len(line)
            else:
                # hot path: no per-word Python beyond the emit
                n_words += len(line)
                _widx += len(line)
                s = " ".join(line)
                parts_append(s)
                _off += len(s)
        off, widx = _off, _widx
        return _mean(line_confs)

    def render_block(blk, path, page_no):
        """Render one Block (possibly nested); returns its confidence
        (mean over element confidences, recursively) or None."""
        nonlocal n_blocks
        n_blocks += 1
        extra = {"tag": blk.tag} if blk.tag else None
        if blk.page_span is not None and blk.page_span[1] > page_no:
            # multi-page block (reference Block.page_span): the last
            # spanned page rides the block's first span so the tree
            # and the combine renumbering can consume it
            extra = dict(extra or {})
            extra["page_span_last"] = str(blk.page_span[1])
        bbox = None
        if blk.bbox is not None:
            bbox = {"left": blk.bbox[0], "top": blk.bbox[1], "width": blk.bbox[2], "height": blk.bbox[3]}
        # Word-level bboxes (P5/P9, ≈ tesseract_executor.py word
        # boxes): derived from the block's cursor bbox with a uniform
        # char width = block_width / emitted block chars — so word
        # envelopes union back to the block box exactly
        # (see operators/geometry.py).
        block_start = off
        char_w = None
        if bbox is not None:
            leaf = _dfs_paras(blk)
            total_chars = sum(
                sum(len(w) for w in para) + max(len(para) - 1, 0) for para in leaf
            ) + max(len(leaf) - 1, 0)  # SEP_BLOCK between elements
            char_w = bbox["width"] / total_chars if total_chars else 0.0
        elem_confs: list[float] = []
        for ei, (kind, payload) in enumerate(blk.iter_elements()):
            if ei > 0:
                emit(SEP_BLOCK)
            if kind == "para":
                c = render_para(payload, path + [ei], page_no, blk.block_type, bbox, char_w, block_start, extra)
            elif kind == "block":
                c = render_block(payload, path + [ei], page_no)
            else:  # ("table", (rows, has_header))
                rows, has_header = payload
                c = render_table(rows, has_header, path + [ei], page_no, bbox, extra)
                emit(table_markdown(rows, has_header))
            if c is not None:
                elem_confs.append(c)
        return _mean(elem_confs)

    page_confs: list[float] = []
    for pi, blocks in enumerate(parsed.pages):
        if pi > 0:
            emit(SEP_DOCUMENT)
        block_confs: list[float] = []
        for bi, blk in enumerate(blocks):
            if bi > 0:
                emit(SEP_PAGE)
            bc = render_block(blk, [bi], pi + 1)
            if bc is not None:
                block_confs.append(bc)
        pagec = _mean(block_confs)
        if pagec is not None:
            page_confs.append(pagec)

    pages_meta = None
    if parsed.page_dims is not None:
        pages_meta = [
            {
                "page_no": i + 1,
                "width": d[0] if d else None,
                "height": d[1] if d else None,
            }
            for i, d in enumerate(parsed.page_dims)
        ]
    return {
        "doc_text": "".join(parts),
        "n_pages": len(parsed.pages),
        "n_blocks": n_blocks,
        "n_tables": n_tables,
        "n_words": n_words,
        "confidence": _mean(page_confs),
        "spans": spans if with_spans else None,
        "pages_meta": pages_meta,
        "native_json": json.dumps(parsed.native, sort_keys=True) if parsed.native else None,
        "error": None,
    }


def make_extract_udf(spec: EngineSpec, with_spans: bool = True):
    """Scalar pandas UDF: Series[binary html] -> Series[result struct].

    One Arrow batch in, one out — the reference's 1-doc-in/1-tree-out
    contract (ocr_executor.py:92-120) vectorized over the batch.
    Exceptions become error rows, never task failures (≈ the
    reference's error classification, page_limit_handler.py:11-59).
    """
    parse = spec.parse
    conf = spec.confidence

    @F.pandas_udf(EXTRACT_RESULT_TYPE)
    def extract(html: pd.Series) -> pd.DataFrame:
        rows = []
        for data in html:
            try:
                if data is None:
                    parsed = ParsedDoc(error="null_payload")
                else:
                    parsed = parse(bytes(data))
            except Exception as e:  # quarantine, don't kill the task
                parsed = ParsedDoc(error=f"parse_error:{type(e).__name__}")
            rows.append(doc_to_result(parsed, conf, with_spans))
        return pd.DataFrame(rows)

    return extract


def run_engine(pages: DataFrame, engine_name: str, with_spans: bool = True) -> DataFrame:
    """Run one engine over the rows it handles (mime-routed natively)."""
    spec = create_engine(engine_name)
    if spec.handles == "pdf":
        routed = pages.filter(F.expr(IS_PDF_EXPR))
    elif spec.handles == "html":
        routed = pages.filter(~F.expr(IS_PDF_EXPR))
    else:
        routed = pages
    udf = make_extract_udf(spec, with_spans)
    return routed.select(
        "url",
        "warc_ts",
        "lang",
        F.lit(spec.name).alias("engine"),
        F.lit(spec.version).alias("engine_version"),
        udf(F.col("html")).alias("r"),
    ).select("url", "warc_ts", "lang", "engine", "engine_version", "r.*")


def run_engines(
    pages: DataFrame,
    engines: tuple[str, ...] = ("dom", "density", "pdf"),
    with_spans: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """All engines, long format: one row per (url, engine).

    ``num_partitions`` hash-repartitions on url before the UDFs —
    urls are unique so this spreads work evenly regardless of host
    skew (north_rule: partitioning handled explicitly). The engine
    UDFs then run partition-local with no further shuffle.
    """
    if num_partitions:
        pages = pages.repartition(num_partitions, "url")
    parts = [run_engine(pages, e, with_spans) for e in engines]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def make_fused_udf(engine_names: tuple[str, ...], with_spans: bool = True):
    """One pandas UDF computing ALL engines for a batch — a single
    Arrow crossing per row instead of one filtered branch scan per
    engine (3x fewer source scans + Python round-trips on the hot
    path). Rows are routed to engines by magic bytes inside the
    batch, mirroring the reference's dispatch (ocr.py:35-64)."""
    specs = [create_engine(n) for n in engine_names]
    # dom + density share the HTML segmentation — parse once per doc
    # and hand both engines the same raw blocks (2x on the hot path).
    shared_html = {s.name for s in specs if s.handles == "html"} >= {"dom", "density"}
    fused_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("engine", T.StringType(), False),
                T.StructField("engine_version", T.StringType(), False),
                T.StructField("r", EXTRACT_RESULT_TYPE, True),
            ]
        )
    )

    @F.pandas_udf(fused_type)
    def fused(html: pd.Series) -> pd.Series:
        from ocr_compare_spark.engines.density import density_from_raws
        from ocr_compare_spark.engines.dom_heuristic import dom_from_raws
        from ocr_compare_spark.engines.html_tree import segment_html

        shared_parsers = {"dom": dom_from_raws, "density": density_from_raws}

        out = []
        for data in html:
            is_pdf = data is not None and bytes(data)[:4] == b"%PDF"
            row = []
            raws = None
            if shared_html and not is_pdf and data is not None:
                try:
                    raws = segment_html(bytes(data))
                except Exception:
                    raws = None  # fall back to per-engine parse path
            for spec in specs:
                if spec.handles == "pdf" and not is_pdf:
                    continue
                if spec.handles == "html" and is_pdf:
                    continue
                try:
                    if data is None:
                        parsed = ParsedDoc(error="null_payload")
                    elif raws is not None and spec.name in shared_parsers:
                        parsed = shared_parsers[spec.name](raws)
                    else:
                        parsed = spec.parse(bytes(data))
                except Exception as e:
                    parsed = ParsedDoc(error=f"parse_error:{type(e).__name__}")
                row.append(
                    {
                        "engine": spec.name,
                        "engine_version": spec.version,
                        "r": doc_to_result(parsed, spec.confidence, with_spans),
                    }
                )
            out.append(row)
        return pd.Series(out)

    return fused


def _spread_pages(pages: DataFrame, num_partitions: int | None) -> DataFrame:
    """The extractors' parallelism guard, made shuffle-avoiding (r6):
    ``num_partitions`` exists to spread a few-split source below the
    per-row engine work, but when the input ALREADY has that much
    (balanced) parallelism — pages_from_documents' default input
    spread — the keyed repartition only re-shuffles the built payload
    bytes (~hundreds of MB per run at sf1.0) for a per-row operation
    that is partitioning-indifferent. Skip it when the plan already
    runs wide enough; extraction output is identical either way."""
    if not num_partitions:
        return pages
    try:
        n = pages.rdd.getNumPartitions()
    except Exception:
        n = 0
    if n >= num_partitions:
        return pages
    return pages.repartition(num_partitions, "url")


def run_engines_fused(
    pages: DataFrame,
    engines: tuple[str, ...] = ("dom", "density", "pdf"),
    with_spans: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hot-path variant of run_engines: one source scan, one Arrow
    boundary, engines exploded to long format. Identical output."""
    pages = _spread_pages(pages, num_partitions)
    fused = make_fused_udf(engines, with_spans)
    return (
        pages.select(
            "url", "warc_ts", "lang", F.explode(fused(F.col("html"))).alias("e")
        )
        .select("url", "warc_ts", "lang", "e.engine", "e.engine_version", "e.r")
        .select("url", "warc_ts", "lang", "engine", "engine_version", "r.*")
    )


SPANS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("engine", T.StringType(), False),
        T.StructField("engine_version", T.StringType(), False),
    ]
    # span fields all NULLABLE here: error docs emit one null-field
    # row (the posexplode_outer twin of the nested path)
    + [T.StructField(f.name, f.dataType, True) for f in SPAN_FIELDS]
)


_NULL_SPAN = {f.name: None for f in SPAN_FIELDS}

# The column subset the assembly cascade consumes — passing this as
# ``fields`` skips pandas/Arrow conversion of the heavy unused columns
# (bbox struct, extra map, char offsets, confidence) on the hot path.
ASSEMBLY_SPAN_FIELDS = (
    "page_no", "block_no", "block_type", "elem_path", "para_no",
    "line_no", "word_no", "text", "row_no", "column_no", "row_type",
)

#: span fields that are pure STRUCTURE (ordinals, paths, text) — no
#: per-word offset/bbox/confidence math. A ``fields`` request within
#: this set routes extract_spans_stream through the lean columnar
#: emitter below (r6: the full doc_to_result builds a 17-key dict,
#: a bbox dict and a confidence per word — ~60% of the span-stream
#: worker time at sf1.0 — none of which these columns need).
STRUCTURAL_SPAN_FIELDS = frozenset(
    ASSEMBLY_SPAN_FIELDS + ("table_no", "cell_path")
)


def _emit_spans_structural(parsed: ParsedDoc, out: dict) -> int:
    """Append one entry per word span to each column list in ``out``
    (all STRUCTURAL_SPAN_FIELDS columns) for a successfully parsed
    doc; returns the number of spans appended.

    Emission values replicate doc_to_result's spans projected to the
    structural columns EXACTLY (same traversal: iter_elements order,
    LINE_WORDS line chunking, _cell_runs cell flattening, the empty-
    cell placeholder span, the NULL-elem_path rule for flat TEXT
    spans) — pytest pins the per-doc equality over a corpus slice
    containing table, nested and multi-page docs. No offsets, no
    bboxes, no confidences, no extra bags, no doc_text: the skipped
    math is what makes this ~3x cheaper per word."""
    ap_page = out["page_no"].append
    ap_blk = out["block_no"].append
    ap_bt = out["block_type"].append
    ap_path = out["elem_path"].append
    ap_para = out["para_no"].append
    ap_line = out["line_no"].append
    ap_word = out["word_no"].append
    ap_text = out["text"].append
    ap_row = out["row_no"].append
    ap_col = out["column_no"].append
    ap_tbl = out["table_no"].append
    ap_rt = out["row_type"].append
    ap_cp = out["cell_path"].append
    n0 = len(out["page_no"])
    n_tables = 0

    def render_table(rows, has_header, path, page_no):
        nonlocal n_tables
        n_tables += 1
        tno = n_tables - 1
        bno = path[0]
        for ri, row in enumerate(rows):
            rtype = "HEADER" if (has_header and ri == 0) else "BODY"
            for ci, cell in enumerate(row):
                for cpi, (cpath, ckind, cp) in enumerate(_cell_runs(cell)):
                    words = cp.split() or [""]
                    for wi, w in enumerate(words):
                        ap_page(page_no); ap_blk(bno); ap_bt("TABLE")
                        ap_path(path); ap_para(cpi); ap_line(ri)
                        ap_word(wi); ap_text(w); ap_row(ri); ap_col(ci)
                        ap_tbl(tno); ap_rt(rtype)
                        ap_cp(list(cpath) if cpath is not None else None)

    def render_para(tokens, path, page_no, block_type):
        stored_path = path if len(path) - 1 > 1 else None
        para_no = path[-1]
        block_no = path[0]
        for li in range(0, len(tokens), LINE_WORDS):
            line_no = li // LINE_WORDS
            for wi, w in enumerate(tokens[li : li + LINE_WORDS]):
                ap_page(page_no); ap_blk(block_no); ap_bt(block_type)
                ap_path(stored_path); ap_para(para_no); ap_line(line_no)
                ap_word(wi); ap_text(w); ap_row(None); ap_col(None)
                ap_tbl(None); ap_rt(None); ap_cp(None)

    def render_block(blk, path, page_no):
        for ei, (kind, payload) in enumerate(blk.iter_elements()):
            if kind == "para":
                render_para(payload, path + [ei], page_no, blk.block_type)
            elif kind == "block":
                render_block(payload, path + [ei], page_no)
            else:
                rows, has_header = payload
                render_table(rows, has_header, path + [ei], page_no)

    for pi, blocks in enumerate(parsed.pages):
        for bi, blk in enumerate(blocks):
            render_block(blk, [bi], pi + 1)
    return len(out["page_no"]) - n0


def extract_spans_stream(
    pages: DataFrame,
    engines: tuple[str, ...] = ("dom",),
    num_partitions: int | None = None,
    fields: tuple[str, ...] | None = None,
) -> DataFrame:
    """Span extraction as a FLAT row stream (mapInPandas): one output
    row per word span, identical values to
    ``spans_table(run_engines_fused(..., with_spans=True))``.

    Why it exists: the nested path serializes every span through an
    Arrow array<struct> cell — per-element, per-field object
    traversal. Emitting one flat pandas DataFrame per batch converts
    COLUMN-wise instead, which is the hot-path shape for span-level
    pipelines (assembly, geometry, chunking) at 10^12 docs; the
    nested path remains for consumers that need doc_text and spans
    in one row.

    ``fields``: optional subset of SPAN_FIELDS names to emit (plus
    url/engine/engine_version, always). Consumers that don't need the
    heavy columns — bbox struct, extra map, char offsets — should
    pass their subset (assembly: ASSEMBLY_SPAN_FIELDS): the skipped
    columns never cross the Arrow boundary or the shuffle. Values of
    the emitted columns are identical to the full emission."""
    specs = [create_engine(n) for n in engines]
    if fields is None:
        schema = SPANS_STREAM_SCHEMA
    else:
        by_name = {f.name: f for f in SPAN_FIELDS}
        schema = T.StructType(
            list(SPANS_STREAM_SCHEMA.fields[:3])
            + [T.StructField(n, by_name[n].dataType, True) for n in fields]
        )
    span_cols = [f.name for f in schema.fields[3:]]
    lean = fields is not None and set(fields) <= STRUCTURAL_SPAN_FIELDS

    def gen_lean(batches):
        # columnar fast path: spans land directly in per-column lists
        # (no 17-key dict per word, no offset/bbox/confidence math,
        # no list-of-dicts -> DataFrame transpose) — values identical
        # to the full emitter's for every structural column
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out = {c: [] for c in STRUCTURAL_SPAN_FIELDS}
            urls: list[str] = []
            engs: list[str] = []
            vers: list[str] = []
            for url, data in zip(pdf["url"], pdf["html"]):
                is_pdf = data is not None and bytes(data)[:4] == b"%PDF"
                for spec in specs:
                    if (spec.handles == "pdf") != is_pdf and spec.handles != "any":
                        continue
                    try:
                        parsed = ParsedDoc(error="null_payload") if data is None else spec.parse(bytes(data))
                    except Exception as e:
                        parsed = ParsedDoc(error=f"parse_error:{type(e).__name__}")
                    if parsed.error is not None:
                        # all-null span row per error doc (see gen())
                        for c in out:
                            out[c].append(None)
                        n = 1
                    else:
                        n = _emit_spans_structural(parsed, out)
                    urls.extend([url] * n)
                    engs.extend([spec.name] * n)
                    vers.extend([spec.version] * n)
            res = pd.DataFrame({c: out[c] for c in span_cols})
            res.insert(0, "url", urls)
            res.insert(1, "engine", engs)
            res.insert(2, "engine_version", vers)
            yield res[cols]

    def gen(batches):
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            all_spans: list[dict] = []
            urls: list[str] = []
            engs: list[str] = []
            vers: list[str] = []
            for url, data in zip(pdf["url"], pdf["html"]):
                is_pdf = data is not None and bytes(data)[:4] == b"%PDF"
                for spec in specs:
                    if (spec.handles == "pdf") != is_pdf and spec.handles != "any":
                        continue
                    try:
                        parsed = ParsedDoc(error="null_payload") if data is None else spec.parse(bytes(data))
                    except Exception as e:
                        parsed = ParsedDoc(error=f"parse_error:{type(e).__name__}")
                    if parsed.error is not None:
                        # one all-null span row per error doc — the
                        # nested path's posexplode_outer over the
                        # empty `spans` array emits exactly this, so
                        # downstream assembly sees the same rows on
                        # either path for corpora containing errors
                        all_spans.append(_NULL_SPAN)
                        urls.append(url)
                        engs.append(spec.name)
                        vers.append(spec.version)
                        continue
                    r = doc_to_result(parsed, spec.confidence, with_spans=True)
                    n = len(r["spans"])
                    all_spans.extend(r["spans"])
                    urls.extend([url] * n)
                    engs.extend([spec.name] * n)
                    vers.extend([spec.version] * n)
            out = pd.DataFrame(all_spans, columns=span_cols)
            out.insert(0, "url", urls)
            out.insert(1, "engine", engs)
            out.insert(2, "engine_version", vers)
            yield out[cols]

    if lean:
        gen = gen_lean

    pages = _spread_pages(pages, num_partitions)
    return pages.mapInPandas(gen, schema)


def explode_symbols(spans: DataFrame) -> DataFrame:
    """Symbol-level leaf (reference ocr_schema.py:59-73: words hold
    symbols with per-symbol confidence). One row per character of
    each word span — native posexplode, no Python. Symbol confidence
    derives from the word's (the reference's tesseract symbols carry
    their own conf; ours is deterministic), char offset = the word's
    char_start + position."""
    return (
        spans.select(
            "url", "engine", "page_no", "block_no", "para_no", "line_no", "word_no",
            "char_start", "confidence",
            F.posexplode(F.split(F.col("text"), "")).alias("symbol_no", "symbol"),
        )
        .filter(F.length("symbol") > 0)
        .withColumn("char_offset", F.col("char_start") + F.col("symbol_no"))
    )


def spans_table(results: DataFrame) -> DataFrame:
    """Flattened span table: one row per word-leaf (FIXTURES.md §2)."""
    return results.select(
        "url",
        "engine",
        "engine_version",
        F.posexplode_outer("spans").alias("_pos", "s"),
    ).select("url", "engine", "engine_version", "s.*")


def with_elem_path(spans: DataFrame) -> DataFrame:
    """Materialize every span's elem_path: flat TEXT spans store NULL
    (the path is derivably [block_no, para_no]; a per-word array on
    the overwhelmingly-flat web is pure Arrow/shuffle weight at
    10^12 docs) — nested and TABLE spans carry it explicitly. Every
    elem_path consumer (assembly, tree, geometry) normalizes through
    this first."""
    return spans.withColumn(
        "elem_path",
        F.coalesce(F.col("elem_path"), F.array(F.col("block_no"), F.col("para_no"))),
    )
