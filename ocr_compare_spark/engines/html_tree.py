"""From-scratch HTML block segmenter on stdlib ``html.parser``.

No lxml/bs4 in the environment (SURVEY.md section 7), so the DOM walk
is built on HTMLParser, which tolerates malformed/unclosed tags. The
output is an ordered list of *candidate blocks* with the features the
two HTML engines score on:

- token list (whitespace-normalized words, in document order)
- link_tokens: how many of those tokens sit inside <a> (link density)
- inner_tags: count of inline tags opened inside the block (tag
  density, trafilatura-style)
- skipped_boilerplate flag per block origin (whether any ancestor is
  a chrome tag: nav/header/footer/aside/...)

Tables become TABLE blocks with rows of cell texts (first row =
header, ≈ reference gdai_layout_executor.py:114-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Subtrees whose text is never content.
SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg"}
# Site chrome: the DOM-heuristic engine drops these subtrees.
CHROME_TAGS = {"nav", "header", "footer", "aside", "form", "button"}
# Tags that start/end a candidate block.
BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "article", "section", "main", "body", "blockquote", "pre", "tr",
    "table", "figure", "figcaption", "dl", "dt", "dd", "hr",
}
VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"}


HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass
class RawBlock:
    tokens: list[str] = field(default_factory=list)
    link_tokens: int = 0
    inner_tags: int = 0
    in_chrome: bool = False
    is_table: bool = False
    rows: list[list[str]] = field(default_factory=list)
    # block tag that opened this block ('p', 'h2', ... or None for
    # untagged text runs) — engines map h1-h6 to block_type HEADING
    tag: str | None = None

    @property
    def text(self) -> str:
        return " ".join(self.tokens)


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[RawBlock] = []
        self._cur: RawBlock | None = None
        self._pending_tag: str | None = None
        self._skip_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0
        # table state
        self._table_depth = 0
        self._table_rows: list[list[str]] = []
        self._cell_tokens: list[str] | None = None
        self._table_chrome = False

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.tokens:
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure(self) -> RawBlock:
        if self._cur is None:
            self._cur = RawBlock(in_chrome=self._chrome_depth > 0, tag=self._pending_tag)
        return self._cur

    # -- handlers ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "table":
            self._flush()
            self._table_depth += 1
            if self._table_depth == 1:
                self._table_rows = []
                self._table_chrome = self._chrome_depth > 0
            return
        if self._table_depth:
            if tag == "tr":
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._cell_tokens = []
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._pending_tag = tag
            return
        # inline tag inside the current block
        if tag == "a":
            self._link_depth += 1
        if self._cur is not None:
            self._cur.inner_tags += 1
        else:
            self._ensure().inner_tags += 1

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "table":
            if self._table_depth:
                self._table_depth -= 1
                if self._table_depth == 0:
                    blk = RawBlock(in_chrome=self._table_chrome, is_table=True)
                    blk.rows = [r for r in self._table_rows if r]
                    blk.tokens = [t for row in blk.rows for t in row]
                    if blk.rows:
                        self.blocks.append(blk)
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell_tokens is not None:
                if self._table_rows:
                    self._table_rows[-1].append(" ".join(self._cell_tokens))
                self._cell_tokens = None
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth = max(0, self._chrome_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._pending_tag = None

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        words = data.split()
        if not words:
            return
        if self._table_depth:
            if self._cell_tokens is not None:
                self._cell_tokens.extend(words)
            return
        blk = self._ensure()
        blk.tokens.extend(words)
        if self._link_depth:
            blk.link_tokens += len(words)

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def segment_html(data: bytes) -> list[RawBlock]:
    """Parse HTML bytes into ordered candidate blocks."""
    text = data.decode("utf-8", errors="replace")
    p = _BlockParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        # malformed beyond HTMLParser's tolerance: keep what we have
        p._flush()
    return p.blocks
