"""Winning-text selection per url (operator W1).

The reference picks the first registered engine as default
(ocr.py:57-59); our generalization ranks engines by an explicit
preference order, then mean confidence, then engine name (total
order => deterministic under any partitioning).

Implemented as a groupBy + max_by over a sortable rank key rather
than a row_number window: the aggregate gets map-side partial
combine, so the shuffle carries one candidate row per (partition,
url) instead of every engine row with its full doc_text — the
difference between shuffling N_engines x corpus text and ~corpus
text at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Lower = preferred. density is the precision engine; pdf rows only
# exist for PDF payloads so it wins there by being the only engine.
DEFAULT_PREFERENCE = {"density": 0, "dom": 1, "pdf": 2}


def pick_winner(results: DataFrame, preference: dict[str, int] | None = None) -> DataFrame:
    pref = preference or DEFAULT_PREFERENCE
    pref_expr = F.coalesce(
        *[F.when(F.col("engine") == k, F.lit(v)) for k, v in pref.items()],
        F.lit(len(pref)),
    )
    ranked = results.filter(F.col("error").isNull())
    # rank key (max = winner): non-empty first, then preference,
    # then confidence; engine-name tiebreak via struct order is moot
    # because (url, engine) is unique upstream.
    non_empty = (F.coalesce(F.length("doc_text"), F.lit(0)) > 0).cast("int")
    key = F.struct(
        non_empty.alias("k0"),
        (F.lit(1000) - pref_expr).alias("k1"),
        F.coalesce(F.col("confidence"), F.lit(-1.0)).alias("k2"),
    )
    best = ranked.groupBy("url").agg(
        F.max_by(F.struct(F.col("engine"), F.col("doc_text"), F.col("confidence")), key).alias("w")
    )
    return best.select("url", "w.engine", "w.doc_text", "w.confidence")
