"""PDF page rasterization (operators/render.py == reference
scan/scan-script.py:284-298 pdf_to_png re-expressed as a layout
rasterizer): closed-form ink geometry from the corpus contract,
raster round-trip, row expansion, error routing, and composition
with the document scanner."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_compare_spark import synth
from ocr_compare_spark.operators import scanner
from ocr_compare_spark.operators.multimodal import decode_image
from ocr_compare_spark.operators.render import render_pdf_pages

SCALE = 0.125


def _expected_page_ink(paras_on_page: list[str]) -> int:
    """Independent closed form from the synth PDF contract: para k on
    a page paints rect x 72..72+6*len, top (72+40k)..(72+40k)+12,
    scaled by floor/ceil at SCALE (rects on distinct rows, no
    overlap)."""
    total = 0
    for k, para in enumerate(paras_on_page):
        xs = math.floor(72 * SCALE)
        xe = math.ceil((72 + 6 * len(para)) * SCALE)
        top = 72 + 40 * k
        ys = math.floor(top * SCALE)
        ye = math.ceil((top + 12) * SCALE)
        total += (min(xe, int(612 * SCALE)) - xs) * (ye - ys)
    return total


def test_render_closed_form_ink_and_dims(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir)
    out = render_pdf_pages(pages, payload_col="html", scale=SCALE)
    rows = [r for r in out.collect() if r["error"] is None]
    assert rows, "no rendered pages"
    by_key = {(r["url"], r["page_no"]): r for r in rows}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_checked = 0
    for d in docs:
        if not synth.is_pdf_doc(d["doc_id"]):
            continue
        url = synth.url_of(d["doc_id"])
        paras = synth.paragraphs_of(d["text"])
        page_chunks = synth.chunk(paras, synth.PAGE_PARAS) or [[]]
        for i, chunkp in enumerate(page_chunks, start=1):
            r = by_key[(url, i)]
            assert (r["width"], r["height"]) == (int(612 * SCALE), int(792 * SCALE))
            assert r["n_ink_px"] == _expected_page_ink(chunkp), (url, i)
            n_checked += 1
    assert n_checked > 20
    # non-PDF payloads surface as error rows, never silently dropped
    errs = {r["url"]: r["error"] for r in out.collect() if r["error"] is not None}
    for d in docs:
        if not synth.is_pdf_doc(d["doc_id"]):
            assert errs[synth.url_of(d["doc_id"])] == "not_pdf"


def test_render_raster_roundtrip_and_scan_composition(spark, sf_dir):
    """The emitted raster is a real P5 image: decode_image round-trips
    it, the ink count matches, and the document scanner finds the full
    page (white paper on the raster == the document quad at the canvas
    corners)."""
    pages = synth.pages_from_documents(spark, sf_dir)
    rows = render_pdf_pages(pages, payload_col="html", scale=SCALE).limit(200).collect()
    done = 0
    for r in rows:
        if r["error"] is not None:
            continue
        img = decode_image(bytes(r["image"]))
        assert img.shape == (r["height"], r["width"])
        assert int((img == 0).sum()) == r["n_ink_px"]
        pts = scanner.find_document_quad(img.astype(np.float64))
        assert pts is not None
        rect = scanner.order_points(pts)
        got = [(int(x), int(y)) for x, y in rect]
        w, h = r["width"], r["height"]
        assert got == [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)]
        done += 1
        if done >= 10:
            break
    assert done >= 10


def test_render_row_expansion_counts(spark, sf_dir):
    """One output row per page: total page rows == sum of per-doc page
    counts from the contract."""
    pages = synth.pages_from_documents(spark, sf_dir)
    out = render_pdf_pages(pages, payload_col="html", scale=SCALE)
    n_page_rows = out.filter("error IS NULL").count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want = 0
    for d in docs:
        if synth.is_pdf_doc(d["doc_id"]):
            want += max(1, math.ceil(len(synth.paragraphs_of(d["text"])) / synth.PAGE_PARAS))
    assert n_page_rows == want


def test_render_pdf_only_fast_path(spark, sf_dir):
    """pdf_only=True pre-routes on magic bytes JVM-side: same ok rows
    as the default mode, zero error rows."""
    pages = synth.pages_from_documents(spark, sf_dir)
    full = render_pdf_pages(pages, scale=SCALE)
    fast = render_pdf_pages(pages, scale=SCALE, pdf_only=True)
    assert fast.filter("error IS NOT NULL").count() == 0
    key = ["url", "page_no", "width", "height", "n_ink_px"]
    a = sorted(map(tuple, full.filter("error IS NULL").select(*key).collect()))
    b = sorted(map(tuple, fast.select(*key).collect()))
    assert a == b and len(b) > 20


_RAST_TOKEN = st.text(
    alphabet=[chr(c) for c in range(0x21, 0x7F)],  # printable ASCII sans space, incl ()\\
    min_size=1,
    max_size=30,
)


@settings(max_examples=80, deadline=None)
@given(st.lists(_RAST_TOKEN, max_size=80))
def test_render_core_fuzz(tokens):
    """Pure-core property (no Spark): build_pdf -> parse_pdf ->
    rasterize_page on ARBITRARY printable-ASCII tokens (parens and
    backslashes exercise the PDF string escape round-trip) matches the
    independent closed form: para k paints 2 rows x min(ceil(.75*len),
    67) cols; page count = max(1, ceil(n_paras/PAGE_PARAS))."""
    from ocr_compare_spark.engines.pdf_stream import parse_pdf
    from ocr_compare_spark.operators.render import rasterize_page

    text = " ".join(tokens)
    parsed = parse_pdf(synth.build_pdf(0, text))
    assert parsed.error is None
    paras = synth.paragraphs_of(text)
    pages = synth.chunk(paras, synth.PAGE_PARAS) or [[]]
    assert len(parsed.pages) == len(pages)
    for blocks, page_paras, dims in zip(parsed.pages, pages, parsed.page_dims):
        canvas = rasterize_page(blocks, dims, SCALE)
        assert canvas.shape == (99, 76)
        want = sum(
            2 * min(math.ceil(0.75 * len(p)), 67)
            for p in page_paras
            if p.split()  # all-escape-char paras still split to tokens; empty never ink
        )
        assert int((canvas == 0).sum()) == want


def test_render_error_rows(spark):
    df = spark.createDataFrame(
        [
            ("u1", None),
            ("u2", bytearray(b"not a pdf at all")),
            ("u3", bytearray(b"%PDF truncated")),
        ],
        "url string, html binary",
    )
    out = {r["url"]: r for r in render_pdf_pages(df).collect()}
    assert out["u1"]["error"] == "null_payload"
    assert out["u2"]["error"] == "not_pdf"
    assert out["u3"]["error"] == "pdf_truncated"
    assert all(r["image"] is None for r in out.values())
