"""Scale-adaptive input spreading for byte-light compute-heavy
stages (r6).

The trap (CLAUDE.md dsir/decontam/sketches family): a small parquet
source reads as 1-2 splits, so a tokenize/md5/regex stage above it
runs nearly single-threaded no matter how many cores the session
has. Operators whose callers pass ``num_partitions`` already handle
it; operators without the knob (or called without it by generic
pipelines) inherited the serial stage.

``spread_small_input`` is the shared adaptive default: repartition
ONLY when the plan would execute on fewer partitions than the
session's parallelism. On a warehouse-sized input with adequate
splits it is a no-op — the corpus is never shuffled just to
tokenize it — so the behavior is scale-adaptive rather than tuned
to either local mode or the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's defaultParallelism iff its
    physical plan would run on fewer partitions. Values unchanged."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if 0 < n < par:
        return df.repartition(par)
    return df
