"""TF-IDF top-k keywords (operators/keywords.py): pure-python mirror
of the whole pipeline, determinism/tie ordering, hint parity, and
layout invariance."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from ocr_compare_spark.operators import keywords

DOCS = [
    (0, "the cat sat on the mat the cat"),
    (1, "the dog sat on the log"),
    (2, "quantum flux capacitor flux"),
    (3, "the the the"),
    (4, ""),  # no tokens -> no rows
    (5, "Tie tie TIE breaker alpha beta"),  # case folding + ties
]


def _mirror(docs, k):
    n = len(docs)
    words = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in docs}
    dfreq = Counter()
    for ws in words.values():
        dfreq.update(set(ws))
    out = {}
    for i, ws in words.items():
        tf = Counter(ws)
        scored = []
        for term, c in tf.items():
            idf6 = math.floor((math.log((1 + n) / (1 + dfreq[term])) + 1) * 1e6 + 0.5)
            scored.append((-c * idf6, term, c, c * idf6))
        scored.sort()
        out[i] = [
            (i, r + 1, term, c, s6) for r, (_, term, c, s6) in enumerate(scored[:k])
        ]
    return [row for rows in out.values() for row in rows]


def test_matches_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in keywords.tfidf_topk(df, "doc_id", "text", k=3).collect()
    )
    assert got == sorted(_mirror(DOCS, 3))
    # empty doc contributes nothing
    assert not any(r[0] == 4 for r in got)


def test_tie_order_and_rank_contract(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = keywords.tfidf_topk(df, "doc_id", "text", k=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        # (score6 desc, term asc) total order
        keys = [(-r.score6, r.term) for r in doc_rows]
        assert keys == sorted(keys)


def test_hint_and_layout_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    base = sorted(
        tuple(r) for r in keywords.tfidf_topk(df, "doc_id", "text", k=2).collect()
    )
    hinted = sorted(
        tuple(r)
        for r in keywords.tfidf_topk(
            df.repartition(7), "doc_id", "text", k=2, n_docs=len(DOCS)
        ).collect()
    )
    assert base == hinted
