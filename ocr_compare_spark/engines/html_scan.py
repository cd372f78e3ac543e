"""Fast HTML event scanner — a drop-in driver for ``_BlockParser``.

Profiling the extraction UDF (BENCH/R4_NOTES.md) showed ~60% of
per-doc CPU inside stdlib ``html.parser``'s tolerant machinery:
attribute tokenization (every handler here ignores attrs), updatepos
line/column bookkeeping, and the interesting-text scan. This module
re-implements the *same* event stream in one pass:

- a conservative fast-path regex recognizes well-formed start/end
  tags (the overwhelming majority of real markup) and dispatches
  straight to the handlers;
- everything else falls back to a literal replication of
  ``html.parser``'s tolerance rules (``goahead``/``parse_starttag``/
  ``parse_endtag``/``check_for_whole_start_tag`` for a single
  ``feed(text); close()`` cycle), using the stdlib's own regexes
  copied verbatim so junk markup resolves identically.

Equivalence with ``html.parser(convert_charrefs=True)`` is pinned by
tests/test_engines.py (full synth corpus + hand-written junk cases +
hypothesis fuzz against the stdlib-driven parse). Two documented,
intentional differences:

- CDATA content (inside <script>/<style>) is never delivered:
  ``_BlockParser`` unconditionally drops it (both tags are
  SKIP_TAGS), so the scanner skips the allocation instead of
  emitting throwaway events. Do not reuse this scanner for a sink
  that wants script bodies.
- Unknown marked sections (``<![foo]>``) raise AssertionError in the
  stdlib; the scanner consumes them like a bogus comment.

The sink contract is the three methods ``_BlockParser`` consumes:
``handle_starttag(tag, attrs)`` (attrs always ``()``),
``handle_endtag(tag)``, ``handle_data(data)``.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

# --- regexes copied from the stdlib html.parser source (tolerant
# grammar; keep byte-for-byte so junk markup resolves identically) --
_LOCATE = re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""", re.VERBOSE)
_TAGFIND = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_ATTRFIND = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_ENDTAG_STRICT = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_COMMENT_CLOSE = re.compile(r'--\s*>')
_MS_CLOSE = re.compile(r']\s*]\s*>')
_MS_MSO_CLOSE = re.compile(r']\s*>')
_MS_NAME = re.compile(r'[a-zA-Z][-_.a-zA-Z0-9]*\s*')
_CDATA_INTEREST = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}
# check_for_whole_start_tag's "end of input in or before attribute
# value" character class (a '/' from '/>' is handled separately)
_LETTERS_EQ = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=")

# Fast path: a conservative well-formed tag shape whose tolerant
# interpretation is self-evident — simple name, blank-separated
# name[=value] attrs (quoted values without <>, bare values without
# quotes/'='), optional XHTML self-close. Anything else (including
# bare values that swallow a trailing '/', which the tolerant
# grammar does NOT treat as self-closing) falls to the slow path.
_EASY_START = re.compile(
    r'<([a-zA-Z][-a-zA-Z0-9]*)'
    r"(?:\s+[a-zA-Z][-.a-zA-Z0-9:_]*"
    r"(?:\s*=\s*(?:'[^'<>]*'|\"[^\"<>]*\"|[^>\s'\"=]+))?)*"
    r'\s*(/?)>'
)
_EASY_END = re.compile(r'</([a-zA-Z][-a-zA-Z0-9]*)\s*>')


def scan(text: str, sink) -> None:
    """Deliver html.parser-equivalent start/end/data events to sink."""
    handle_start = sink.handle_starttag
    handle_end = sink.handle_endtag
    handle_data = sink.handle_data
    i, n = 0, len(text)
    find = text.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            seg = text[i:]
            handle_data(_unescape(seg) if "&" in seg else seg)
            break
        if lt > i:
            seg = text[i:lt]
            handle_data(_unescape(seg) if "&" in seg else seg)
        c = text[lt + 1:lt + 2]
        if c.isalpha():
            m = _EASY_START.match(text, lt)
            if m is not None:
                name = m.group(1).lower()
                i = m.end()
                handle_start(name, ())
                if m.group(2):
                    handle_end(name)
                elif name in ("script", "style"):
                    i = _skip_cdata(text, i, name, handle_end)
                continue
            i = _slow_starttag(text, lt, handle_start, handle_end, handle_data)
        elif c == "/":
            m = _EASY_END.match(text, lt)
            if m is not None:
                handle_end(m.group(1).lower())
                i = m.end()
                continue
            i = _endtag(text, lt, handle_end, handle_data)
        elif text.startswith("<!--", lt):
            i = _comment(text, lt, handle_data)
        elif c == "?":
            gt = find(">", lt + 2)
            i = gt + 1 if gt >= 0 else _unterminated(text, lt, handle_data)
        elif c == "!":
            i = _decl(text, lt, handle_data)
        elif c == "":
            handle_data("<")
            break
        else:
            handle_data("<")
            i = lt + 1


def _unterminated(text, i, handle_data):
    """goahead's end-of-input recovery for a construct with no close:
    data through the next '>', else up to the next '<' (re-scanned as
    markup), else just the '<' itself."""
    k = text.find(">", i + 1)
    if k < 0:
        k = text.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    seg = text[i:k]
    handle_data(_unescape(seg) if "&" in seg else seg)
    return k


def _slow_starttag(text, i, handle_start, handle_end, handle_data):
    # = check_for_whole_start_tag + parse_starttag (attrs discarded)
    m = _LOCATE.match(text, i)
    j = m.end()
    nxt = text[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if text.startswith("/>", j):
            endpos = j + 2
        elif j > i:
            endpos = j  # bogus input: tag text becomes data below
        else:
            endpos = i + 1
    elif nxt == "" or nxt in _LETTERS_EQ:
        return _unterminated(text, i, handle_data)
    elif j > i:
        endpos = j
    else:
        endpos = i + 1
    tm = _TAGFIND.match(text, i + 1)
    tag = tm.group(1).lower()
    k = tm.end()
    while k < endpos:
        am = _ATTRFIND.match(text, k)
        if not am:
            break
        k = am.end()
    end = text[k:endpos].strip()
    if end not in (">", "/>"):
        handle_data(text[i:endpos])  # malformed: raw tag text, NOT unescaped
        return endpos
    if end == "/>":
        handle_start(tag, ())
        handle_end(tag)
        return endpos
    handle_start(tag, ())
    if tag in ("script", "style"):
        return _skip_cdata(text, endpos, tag, handle_end)
    return endpos


def _endtag(text, i, handle_end, handle_data):
    gt = text.find(">", i + 1)
    if gt < 0:
        return _unterminated(text, i, handle_data)
    m = _ENDTAG_STRICT.match(text, i)
    if m:
        handle_end(m.group(1).lower())
        return m.end()
    nm = _TAGFIND.match(text, i + 2)
    if not nm:
        if text.startswith("</>", i):
            return i + 3
        pos = text.find(">", i + 2)  # bogus comment, consumed silently
        if pos < 0:
            return _unterminated(text, i, handle_data)
        return pos + 1
    handle_end(nm.group(1).lower())
    # junk between name and '>' is consumed (html.parser parse_endtag)
    return text.find(">", nm.end()) + 1


def _comment(text, i, handle_data):
    m = _COMMENT_CLOSE.search(text, i + 4)
    if not m:
        return _unterminated(text, i, handle_data)
    return m.end()


def _decl(text, i, handle_data):
    if text.startswith("<![", i):
        nm = _MS_NAME.match(text, i + 3)
        name = nm.group().strip().lower() if nm else ""
        if name in ("temp", "cdata", "ignore", "include", "rcdata"):
            m = _MS_CLOSE.search(text, i + 3)
        elif name in ("if", "else", "endif"):
            m = _MS_MSO_CLOSE.search(text, i + 3)
        else:
            # stdlib raises AssertionError here; consume like a bogus
            # comment instead (documented divergence)
            pos = text.find(">", i + 2)
            return pos + 1 if pos >= 0 else _unterminated(text, i, handle_data)
        if not m:
            return _unterminated(text, i, handle_data)
        return m.end()
    if text[i:i + 9].lower() == "<!doctype":
        gt = text.find(">", i + 9)
        if gt == -1:
            return _unterminated(text, i, handle_data)
        return gt + 1
    pos = text.find(">", i + 2)  # bogus comment
    if pos == -1:
        return _unterminated(text, i, handle_data)
    return pos + 1


def _skip_cdata(text, i, elem, handle_end):
    """Raw content of <script>/<style>: only a strict, same-name end
    tag leaves CDATA mode; content is dropped (see module docstring)."""
    pat = _CDATA_INTEREST[elem]
    pos = i
    while True:
        m = pat.search(text, pos)
        if m is None:
            return len(text)  # unterminated: CDATA to EOF, no end event
        sm = _ENDTAG_STRICT.match(text, m.start())
        if sm and sm.group(1).lower() == elem:
            handle_end(elem)
            return sm.end()
        gt = text.find(">", m.start() + 1)
        if gt < 0:
            pos = m.start() + 1
            continue
        pos = gt + 1
