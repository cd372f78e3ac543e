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
    "article", "main", "body", "pre", "tr",
    "table", "figure", "figcaption", "dl", "dt", "dd", "hr",
}
# Tags that open a NESTED block level (reference ocr_schema.py:130-167
# Block.elements may contain Blocks). section/blockquote denote
# semantic sub-blocks; article/main/div stay transparent grouping so
# a page's top-level flow is not artificially nested.
NEST_TAGS = {"section", "blockquote"}
VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"}


HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass
class RawBlock:
    tokens: list[str] = field(default_factory=list)
    link_tokens: int = 0
    inner_tags: int = 0
    in_chrome: bool = False
    is_table: bool = False
    # rows of cell texts; a cell containing block tags (<p> in <td> —
    # reference Cell.blocks, ocr_schema.py:215-238) carries '\n'
    # between its paragraph runs
    rows: list[list[str]] = field(default_factory=list)
    # header row present? True iff the first row contains a <th> cell
    # (reference Table.header is Optional, ocr_schema.py:280-339 — the
    # old hard-coded first-row-is-header rule mis-rendered headerless
    # tables)
    has_header: bool = False
    # block tag that opened this block ('p', 'h2', ... or None for
    # untagged text runs) — engines map h1-h6 to block_type HEADING
    tag: str | None = None
    # ids of enclosing NEST_TAGS containers, outermost first — unique
    # per opened container, increasing in document order. Engines
    # rebuild the recursive block tree from these paths.
    containers: tuple[int, ...] = ()

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
        # nesting state (section/blockquote containers)
        self._containers: list[int] = []
        self._container_seq = 0
        # table state
        self._table_depth = 0
        self._table_rows: list[list[str]] = []
        # current open cell: list of paragraph token runs (block tags
        # inside a cell start a new run — Cell.blocks analog)
        self._cell_paras: list[list[str]] | None = None
        self._table_chrome = False
        self._table_has_header = False
        self._table_containers: tuple[int, ...] = ()

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.tokens:
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure(self) -> RawBlock:
        if self._cur is None:
            self._cur = RawBlock(
                in_chrome=self._chrome_depth > 0,
                tag=self._pending_tag,
                containers=tuple(self._containers),
            )
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
                self._table_has_header = False
                self._table_containers = tuple(self._containers)
            return
        if self._table_depth:
            if tag == "tr":
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._cell_paras = [[]]
                if tag == "th" and len(self._table_rows) == 1:
                    self._table_has_header = True
            elif self._cell_paras is not None and (tag in BLOCK_TAGS or tag in NEST_TAGS):
                # block tag inside an open cell: start a new paragraph
                # run (Cell.blocks, ocr_schema.py:215-238)
                if self._cell_paras[-1]:
                    self._cell_paras.append([])
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
            return
        if tag in NEST_TAGS:
            self._flush()
            self._container_seq += 1
            self._containers.append(self._container_seq)
            self._pending_tag = None
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
                    blk = RawBlock(
                        in_chrome=self._table_chrome,
                        is_table=True,
                        has_header=self._table_has_header,
                        containers=self._table_containers,
                    )
                    blk.rows = [r for r in self._table_rows if r]
                    blk.tokens = [t for row in blk.rows for cell in row for t in cell.split()]
                    if blk.rows:
                        self.blocks.append(blk)
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell_paras is not None:
                if self._table_rows:
                    cell = "\n".join(" ".join(p) for p in self._cell_paras if p)
                    self._table_rows[-1].append(cell)
                self._cell_paras = None
            return
        if tag in CHROME_TAGS:
            self._flush()
            self._chrome_depth = max(0, self._chrome_depth - 1)
            return
        if tag in NEST_TAGS:
            self._flush()
            if self._containers:
                self._containers.pop()
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
            if self._cell_paras is not None:
                self._cell_paras[-1].extend(words)
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


def build_block_tree(kept: list) -> list:
    """Rebuild the recursive block structure from kept RawBlocks and
    their container paths (reference Block.elements: List[Table|
    Paragraph|Block], ocr_schema.py:130-167).

    A RawBlock with an empty container path becomes its own top-level
    Block (one paragraph per block — the flat fast path). A RawBlock
    inside containers becomes an ELEMENT of the innermost container
    Block: a bare paragraph for plain text, a nested HEADING Block
    for h1-h6, a nested TABLE Block for tables. Containers whose
    kept children were all dropped never materialize."""
    from ocr_compare_spark.engines.base import Block

    top: list[Block] = []
    stack: list[tuple[int, Block]] = []  # (container id, its Block)
    for rb in kept:
        ids = rb.containers
        # longest common prefix of the open stack with this block's path
        k = 0
        while k < len(stack) and k < len(ids) and stack[k][0] == ids[k]:
            k += 1
        del stack[k:]
        while len(stack) < len(ids):
            cont = Block(block_type="TEXT", elements=[])
            if stack:
                stack[-1][1].elements.append(("block", cont))
            else:
                top.append(cont)
            stack.append((ids[len(stack)], cont))
        btype = "HEADING" if rb.tag in HEADING_TAGS else "TEXT"
        if stack:
            if rb.is_table:
                stack[-1][1].elements.append(
                    ("block", Block(block_type="TABLE", rows=rb.rows, has_header=rb.has_header))
                )
            elif btype == "HEADING":
                stack[-1][1].elements.append(
                    ("block", Block(block_type="HEADING", paras=[rb.tokens], tag=rb.tag))
                )
            else:
                stack[-1][1].elements.append(("para", rb.tokens))
        else:
            if rb.is_table:
                top.append(Block(block_type="TABLE", rows=rb.rows, has_header=rb.has_header))
            else:
                top.append(Block(block_type=btype, paras=[rb.tokens], tag=rb.tag))
    return top
