"""Winning-text selection per url (operator W1).

The reference picks the first registered engine as default
(ocr.py:57-59); our generalization ranks engines by an explicit
preference order, then mean confidence, then engine name (total
order => deterministic under any partitioning). One window, one
shuffle on url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Lower = preferred. density is the precision engine; pdf rows only
# exist for PDF payloads so it wins there by being the only engine.
DEFAULT_PREFERENCE = {"density": 0, "dom": 1, "pdf": 2}


def pick_winner(results: DataFrame, preference: dict[str, int] | None = None) -> DataFrame:
    pref = preference or DEFAULT_PREFERENCE
    pref_expr = F.coalesce(
        *[F.when(F.col("engine") == k, F.lit(v)) for k, v in pref.items()],
        F.lit(len(pref)),
    )
    ranked = results.filter(F.col("error").isNull()).withColumn("_pref", pref_expr)
    # empty extractions lose to any engine that got text; then the
    # explicit preference; confidence + name only break exact ties.
    empty = (F.coalesce(F.length("doc_text"), F.lit(0)) == 0).cast("int")
    w = Window.partitionBy("url").orderBy(
        empty.asc(), F.col("_pref").asc(), F.col("confidence").desc_nulls_last(), F.col("engine").asc()
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "engine", "doc_text", "confidence")
    )
