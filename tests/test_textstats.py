"""Text-analysis operators: repetition quality signals.

The rest of the textstats surface (counts, ratios, quality score,
fingerprint, langid) is pinned by the DuckDB oracle gate
(`textstats` / `quality_topk` / `fingerprint` / `langid` queries);
these tests pin the repetition columns against a hand-computed
reference on planted repetitive docs, including the corner cases the
oracle corpus doesn't plant (empty text, single word).
"""

from __future__ import annotations

import re
from collections import Counter

from ocr_compare_spark.operators.textstats import with_text_stats

CASES = [
    (1, "a b a b a b\nx\nx\ny"),
    (2, "single"),
    (3, ""),
    (4, "one two three four"),
    (5, "dup dup dup dup"),
    (6, "line1\nline1\nline1"),
    (7, "nav home | nav home | nav home content here"),
]


def _ref(text: str) -> tuple[float, float]:
    lines = text.split("\n")
    dup_line_frac = round(1.0 - len(set(lines)) / len(lines), 6)
    toks = re.split(r"\s+", text)
    grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    if not grams:
        top2 = 0.0
    else:
        top2 = round(max(Counter(grams).values()) / len(grams), 6)
    return dup_line_frac, top2


def test_repetition_columns_match_reference(spark):
    df = spark.createDataFrame(CASES, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["top2gram_share"])
        for r in with_text_stats(df, "text")
        .select("doc_id", "dup_line_frac", "top2gram_share")
        .collect()
    }
    for doc_id, text in CASES:
        assert got[doc_id] == _ref(text), (doc_id, got[doc_id], _ref(text))
