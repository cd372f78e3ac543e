"""Thin table-IO seam: parquet now, Iceberg when the runtime jar is
present (SURVEY.md §7).

All pipeline code reads/writes through these helpers, so flipping to
a real lakehouse catalog is a config change, not a refactor:

- sandbox (no iceberg-spark-runtime jar): path-based parquet with
  Hive-style partition dirs; the checkpoint manifest
  (sources/checkpoint.py) supplies the atomic-commit/resume story.
- cluster: set ``spark.sql.catalog.<name>=org.apache.iceberg.spark
  .SparkCatalog`` and pass ``catalog_table``; the same calls become
  Iceberg table scans/commits with partition transforms
  (days(warc_ts), bucket(url)) and snapshot isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """location: a path (parquet) or catalog.db.table (Iceberg)."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.table(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        w = df.writeTo(location)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (north_rule: co-located joins via
    bucketing). Writing both sides of a recurring equi join bucketed
    on the join key (e.g. ``bucket(url)``) makes every later join /
    groupBy on that key EXCHANGE-FREE: each bucket pairs 1:1 with the
    other side's bucket, so the 10^12-row shuffle that dominates the
    join disappears from the plan (Spark plans a SortMergeJoin with
    no Exchange on either side — proven by
    tests/test_pipeline_spark.py::test_bucketed_join_is_exchange_free).

    Bucketing metadata lives in the catalog (saveAsTable — a bare
    parquet path cannot carry it); with the Iceberg catalog present
    the equivalent is a ``bucket(N, url)`` partition transform on the
    same seam. The local-mode analog of 'executors fetch no shuffle
    blocks' is the missing Exchange node."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
