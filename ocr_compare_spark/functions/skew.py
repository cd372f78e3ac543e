"""Explicit skew handling (north_rule: "partitioning / shuffle /
skew handled explicitly").

The synthetic corpus puts ~50% of urls on one hot host (synth.py
host_of), mirroring real crawl skew. Per-url work is immune (urls
are unique), but any host-keyed aggregation would send half the
corpus to one reducer. ``salted_agg`` is the standard two-phase fix:

  phase 1: groupBy(key, salt)  -- splits the hot key over N reducers
  phase 2: groupBy(key)        -- merges N tiny partials

Only aggregates with a merge decomposition qualify (count/sum/min/
max; avg as sum+count). AQE skew-join handles the join side; this
handles the aggregation side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def host_of_url(url_col: str = "url") -> Column:
    return F.regexp_extract(F.col(url_col), r"https?://([^/]+)/", 1)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (merge_fn_name, phase1_column), where
    merge_fn_name is 'sum'|'min'|'max' (how partials combine).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        *[col.alias(f"_p_{name}") for name, (_, col) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    phase2 = phase1.groupBy(key).agg(
        *[merge[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
    return phase2
