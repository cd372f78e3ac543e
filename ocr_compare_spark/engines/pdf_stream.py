"""From-scratch PDF byte-stream text parser (engine ``pdf``).

Analog of the reference's gdai-layout engine (the structured layout
parser, /root/reference/src/ocrtool/ocr_impls/gdai/
gdai_layout_executor.py) plus its PDF utilities
(page_limit/page_count.py:6-34: %PDF magic check and page counting).
No pypdf in the environment (SURVEY.md section 7), so this parses the
uncompressed-PDF subset our corpus generator emits — and degrades to
an error row (never an exception) on anything else, mirroring the
reference's error-classification flow (page_limit_handler.py:11-59)
as a quarantine column instead of a raised exception.

Structure recovered: one page per content stream (in object order),
one TEXT block per ``(string) Tj`` operator, with a synthetic bbox
from the text-matrix cursor (Td/TD moves).
"""

from __future__ import annotations

import re

from ocr_compare_spark.engines.base import Block, EngineSpec, ParsedDoc, register_engine

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s])")
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TD_RE = re.compile(rb"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+T[dD]")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+"
    rb"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s*\]"
)


_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _box_wh(body: bytes) -> tuple[float, float] | None:
    m = _MEDIABOX_RE.search(body)
    if not m:
        return None
    x0, y0, x1, y1 = (float(v) for v in m.groups())
    return (x1 - x0, y1 - y0)


def parse_page_dims(data: bytes, n_pages: int) -> list[tuple[float, float] | None]:
    """Per-page (width, height) from the MediaBox (reference
    Page.width/height, ocr_schema.py:170-187) — parsed, not assumed.

    The full PDF page-tree inheritance walk: the MediaBox is
    inheritable down arbitrary /Kids nesting (root /Pages →
    intermediate /Pages nodes → leaf /Page objects; real PDFs carry
    it anywhere along that path), so the parser DFS-walks the tree in
    /Kids order from the root Pages node (the one no other Pages node
    references), each node's own box overriding the nearest
    ancestor's. Cycle-guarded. Pages outside the parsed tree fall
    back to the previous sibling, then None."""
    objs: dict[int, bytes] = {}
    pages_kids: dict[int, list[int]] = {}
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(2)
        objs[num] = body
        if re.search(rb"/Type\s*/Pages\b", body):
            km = _KIDS_RE.search(body)
            pages_kids[num] = [int(r) for r in _REF_RE.findall(km.group(1))] if km else []
    referenced = {k for kids in pages_kids.values() for k in kids}
    # root = the Pages node no other Pages node references; a cyclic
    # tree has none, so fall back to the first node in document order
    roots = [n for n in pages_kids if n not in referenced] or list(pages_kids)[:1]
    leaf_dims: list[tuple[float, float] | None] = []
    if roots:
        visited: set[int] = set()
        # explicit DFS stack of (obj num, inherited box), kids pushed
        # in reverse so they pop in document order
        stack: list[tuple[int, tuple[float, float] | None]] = [(roots[0], None)]
        while stack and len(leaf_dims) < n_pages + 64:
            num, inherited = stack.pop()
            if num in visited or num not in objs:
                continue
            visited.add(num)
            box = _box_wh(objs[num]) or inherited
            if num in pages_kids:
                for kid in reversed(pages_kids[num]):
                    stack.append((kid, box))
            elif re.search(rb"/Type\s*/Page(?![s])", objs[num]):
                leaf_dims.append(box)
    dims: list[tuple[float, float] | None] = []
    for i in range(n_pages):
        box = leaf_dims[i] if i < len(leaf_dims) else None
        if box is None:
            box = dims[-1] if dims else None
        dims.append(box)
    return dims


def count_pdf_pages(data: bytes) -> int:
    """≈ count_pdf_pages, page_count.py:19-34 — counts /Type /Page objects."""
    return len(_PAGE_RE.findall(data))


def _unescape(raw: bytes) -> str:
    out = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            mapped = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x28: "(", 0x29: ")", 0x5C: "\\"}.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
        out.append(chr(c) if c < 0x80 else bytes([c]).decode("latin-1"))
        i += 1
    return "".join(out)


def parse_pdf(data: bytes) -> ParsedDoc:
    if data[:4] != b"%PDF":
        return ParsedDoc(error="not_pdf")
    streams = _STREAM_RE.findall(data)
    # content streams are the ones containing a BT..ET text object
    content = [s for s in streams if b"BT" in s and b"ET" in s]
    n_pages = count_pdf_pages(data)
    if not content:
        if n_pages == 0:
            return ParsedDoc(error="pdf_truncated")
        return ParsedDoc(
            pages=[[] for _ in range(n_pages)],
            page_dims=parse_page_dims(data, n_pages),
            native={"engine": "pdf", "pages": n_pages, "text_ops": 0},
        )
    pages: list[list[Block]] = []
    text_ops = 0
    for stream in content:
        blocks: list[Block] = []
        # walk operators in order, tracking the Td cursor for bboxes
        x, y = 0.0, 0.0
        pos = 0
        events: list[tuple[int, str, object]] = []
        for m in _TD_RE.finditer(stream):
            events.append((m.start(), "td", (float(m.group(1)), float(m.group(2)))))
        for m in _TJ_RE.finditer(stream):
            events.append((m.start(), "tj", m.group(1)))
        events.sort(key=lambda e: e[0])
        for pos, kind, payload in events:
            if kind == "td":
                dx, dy = payload  # type: ignore[misc]
                x, y = x + dx, y + dy
            else:
                text = _unescape(payload)  # type: ignore[arg-type]
                tokens = text.split()
                if not tokens:
                    continue
                text_ops += 1
                blocks.append(
                    Block(
                        block_type="TEXT",
                        paras=[tokens],
                        bbox=(x, 792.0 - y, 6.0 * len(text), 12.0),
                    )
                )
        pages.append(blocks)
    native = {"engine": "pdf", "pages": len(pages), "declared_pages": n_pages, "text_ops": text_ops}
    return ParsedDoc(pages=pages, page_dims=parse_page_dims(data, len(pages)), native=native)


register_engine(
    EngineSpec(name="pdf", version="1.0", handles="pdf", parse=parse_pdf, confidence=0.85)
)
