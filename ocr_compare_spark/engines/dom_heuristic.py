"""DOM-heuristic boilerplate stripper (engine ``dom``).

Analog of the reference's tesseract executor (the "always available"
engine, /root/reference/src/ocrtool/ocr_impls/tesseract/
tesseract_executor.py): raw bytes -> flat candidate rows -> canonical
tree. Heuristic: drop site-chrome subtrees (nav/header/footer/aside/
form), drop script/style/head, keep every remaining text block in
document order. HTML has no physical pages, so the result is a
single-page document; each block holds one paragraph whose lines are
LINE_WORDS-token chunks (line/para separators are both ' ', so the
grouping never changes assembled text — ocr_schema.py:102,119).
"""

from __future__ import annotations

from ocr_compare_spark.engines.base import EngineSpec, ParsedDoc, register_engine
from ocr_compare_spark.engines.html_tree import build_block_tree, segment_html


def dom_from_raws(raws) -> ParsedDoc:
    """Chrome-strip, then rebuild the RECURSIVE block structure from
    container paths (section/blockquote nesting round-trips into
    Block.elements — the layout-preserving engine)."""
    kept_raws = [rb for rb in raws if not rb.in_chrome]
    blocks = build_block_tree(kept_raws)
    native = {
        "engine": "dom",
        "blocks_seen": len(raws),
        "blocks_kept": len(kept_raws),
        "blocks_dropped_chrome": len(raws) - len(kept_raws),
    }
    return ParsedDoc(
        pages=[blocks] if blocks else [],
        page_dims=[None] if blocks else None,
        native=native,
    )


def parse_dom(data: bytes) -> ParsedDoc:
    return dom_from_raws(segment_html(data))


register_engine(
    EngineSpec(name="dom", version="1.0", handles="html", parse=parse_dom, confidence=0.90)
)
