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

from ocr_compare_spark.engines.base import Block, EngineSpec, ParsedDoc, register_engine
from ocr_compare_spark.engines.html_tree import HEADING_TAGS, segment_html


def dom_from_raws(raws) -> ParsedDoc:
    blocks: list[Block] = []
    kept = dropped = 0
    for rb in raws:
        if rb.in_chrome:
            dropped += 1
            continue
        kept += 1
        if rb.is_table:
            blocks.append(Block(block_type="TABLE", rows=rb.rows))
        else:
            btype = "HEADING" if rb.tag in HEADING_TAGS else "TEXT"
            blocks.append(Block(block_type=btype, paras=[rb.tokens]))
    native = {
        "engine": "dom",
        "blocks_seen": len(raws),
        "blocks_kept": kept,
        "blocks_dropped_chrome": dropped,
    }
    return ParsedDoc(pages=[blocks] if blocks else [], native=native)


def parse_dom(data: bytes) -> ParsedDoc:
    return dom_from_raws(segment_html(data))


register_engine(
    EngineSpec(name="dom", version="1.0", handles="html", parse=parse_dom, confidence=0.90)
)
