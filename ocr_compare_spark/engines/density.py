"""Trafilatura-style text/link-density scorer (engine ``density``).

Analog of the reference's gdai-ocr engine (the "higher precision"
second engine, /root/reference/src/ocrtool/ocr_impls/gdai/
gdai_executor.py + gdai_convert.py). On top of the DOM chrome strip
it scores every candidate block and keeps only main content:

- link density  = link_tokens / tokens  — drop if > MAX_LINK_DENSITY
  (boilerplate promos/menus are link-dense)
- tag density   = chars / (chars + TAG_COST * inner_tags) — drop if
  below MIN_TAG_DENSITY (markup-heavy fragments)
- minimum length: drop blocks under MIN_TOKENS tokens unless heading-
  like — short fragments are noise at web scale.

Deterministic, pure-function scoring — no model, no randomness.
"""

from __future__ import annotations

from ocr_compare_spark.engines.base import Block, EngineSpec, ParsedDoc, register_engine
from ocr_compare_spark.engines.html_tree import HEADING_TAGS, RawBlock, segment_html

MAX_LINK_DENSITY = 0.5
TAG_COST = 10.0
MIN_TAG_DENSITY = 0.5
MIN_TOKENS = 3


def keep_block(rb: RawBlock) -> bool:
    if rb.in_chrome or not rb.tokens:
        return False
    if rb.is_table:
        return True
    n = len(rb.tokens)
    # heading-like blocks are exempt from the minimum-length rule
    # (headings are short by nature but are main content)
    if n < MIN_TOKENS and rb.tag not in HEADING_TAGS:
        return False
    if rb.link_tokens / n > MAX_LINK_DENSITY:
        return False
    chars = len(rb.text)
    if chars / (chars + TAG_COST * rb.inner_tags) < MIN_TAG_DENSITY:
        return False
    return True


def density_from_raws(raws) -> ParsedDoc:
    """Score-and-keep, FLATTENED: a main-content extractor emits flat
    text blocks (like trafilatura's flat output), so section/
    blockquote nesting is intentionally discarded here — the dom
    engine is the layout-preserving one, which makes the dom-vs-
    density comparison a real structural diff on nested docs."""
    blocks: list[Block] = []
    dropped = 0
    for rb in raws:
        if not keep_block(rb):
            dropped += 1
            continue
        if rb.is_table:
            blocks.append(Block(block_type="TABLE", rows=rb.rows, has_header=rb.has_header))
        else:
            btype = "HEADING" if rb.tag in HEADING_TAGS else "TEXT"
            blocks.append(Block(block_type=btype, paras=[rb.tokens], tag=rb.tag))
    native = {
        "engine": "density",
        "blocks_seen": len(raws),
        "blocks_kept": len(blocks),
        "blocks_dropped": dropped,
    }
    return ParsedDoc(
        pages=[blocks] if blocks else [],
        page_dims=[None] if blocks else None,
        native=native,
    )


def parse_density(data: bytes) -> ParsedDoc:
    return density_from_raws(segment_html(data))


register_engine(
    EngineSpec(
        name="density", version="1.0", handles="html", parse=parse_density, confidence=0.95
    )
)
