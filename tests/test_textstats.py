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


# The driver corpus is PII-free (the oracle row proves SQL-equivalence
# at zero counts); these cases plant actual PII so the counts and the
# redaction are pinned on non-trivial input, INCLUDING a DuckDB
# cross-check of the exact SQL twins __spark_entry__ emits.
PII_CASES = [
    (1, "contact alice.smith+dev@example.co.uk or bob@x.io today"),
    (2, "server at 10.0.255.3 and 192.168.1.1, port 8080"),
    (3, "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567"),
    (4, "no pii here, just 1234 numbers and a dot. end"),
    (5, ""),
    (6, "edge 999.999.999.999 is still ipv4-shaped; 12.34.56.78.90 trails"),
]


def test_pii_counts_and_scrub_match_duckdb_twins(spark):
    import duckdb
    from pyspark.sql import functions as F

    from ocr_compare_spark.operators.textstats import PII_PATTERNS, pii_columns, scrub_pii

    df = spark.createDataFrame(PII_CASES, "doc_id int, text string")
    cols = pii_columns("text")
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in cols.items()],
            scrub_pii("text").alias("scrubbed"),
        ).collect()
    }

    # hand-pinned expectations on the planted rows
    assert got[1]["n_email"] == 2 and "<EMAIL>" in got[1]["scrubbed"]
    assert "alice" not in got[1]["scrubbed"] and "bob@x.io" not in got[1]["scrubbed"]
    assert got[2]["n_ipv4"] == 2 and got[2]["scrubbed"].count("<IP>") == 2
    assert "8080" in got[2]["scrubbed"]  # ports survive
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 2
    assert got[3]["scrubbed"] == "ssn <SSN> phone <PHONE> alt <PHONE>"
    assert got[4] == {
        "doc_id": 4, "n_email": 0, "n_ipv4": 0, "n_ssn": 0, "n_phone": 0,
        "scrubbed": PII_CASES[3][1],
    }
    assert got[5]["scrubbed"] == ""

    # DuckDB twin equivalence (the same SQL the oracle emits)
    con = duckdb.connect()
    count_sql = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrub_sql = "text"
    for _, pat, placeholder in PII_PATTERNS:
        scrub_sql = f"regexp_replace({scrub_sql}, '{pat}', '{placeholder}', 'g')"
    for doc_id, text in PII_CASES:
        row = con.execute(
            f"SELECT {count_sql}, {scrub_sql} AS scrubbed FROM (SELECT ? AS text)",
            [text],
        ).fetchone()
        names = [f"n_{n}" for n, _, _ in PII_PATTERNS] + ["scrubbed"]
        duck = dict(zip(names, row))
        for k in names:
            assert duck[k] == got[doc_id][k], (doc_id, k, duck[k], got[doc_id][k])
