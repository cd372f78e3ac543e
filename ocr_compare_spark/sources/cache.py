"""Content-addressed result cache as a table (≈ CachedOcrExecutor,
/root/reference/src/ocrtool/cached_ocr_executor.py:15-270).

The reference memoizes per-document engine results in a storage
bucket keyed by ``md5(image) + md5(sorted kwargs) + engine name``
(cached_ocr_executor.py:203-231). The Spark-native equivalent is a
cache *table* and three relational ops:

- key       = md5(html) (+ kwargs hash), native F.md5 — no Python
- hits      = left_semi join incoming ⋈ cache on the key
- misses    = left_anti join (the EXCEPT-on-keys of SURVEY §2.6)
- refresh   = recompute misses, append to the cache table, union.

The cache table is small relative to the corpus scan at first run
and hot afterwards; Catalyst broadcast-joins it when it fits, AQE
picks shuffle-hash otherwise.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def kwargs_hash(kwargs: dict | None) -> str:
    """≈ _generate_cache_key kwargs part (cached_ocr_executor.py:
    215-231): drop None values, sort keys, md5 the stringified dict.
    Driver-side (config, not data)."""
    import hashlib

    clean = {k: v for k, v in (kwargs or {}).items() if v is not None and k != "force_cache_refresh"}
    return hashlib.md5(json.dumps(clean, sort_keys=True).encode()).hexdigest()


def with_cache_key(pages: DataFrame, engine: str, kwargs: dict | None = None) -> DataFrame:
    return pages.withColumn("content_hash", F.md5(F.col("html"))).withColumn(
        "engine", F.lit(engine)
    ).withColumn("kwargs_hash", F.lit(kwargs_hash(kwargs)))


CACHE_KEY = ["engine", "content_hash", "kwargs_hash"]


def split_hits_misses(keyed: DataFrame, cache_tbl: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(hits, misses). hits carry the cached payload columns."""
    hits = keyed.join(cache_tbl, CACHE_KEY, "inner")
    misses = keyed.join(cache_tbl, CACHE_KEY, "left_anti")
    return hits, misses


def cache_entries(results_with_key: DataFrame) -> DataFrame:
    """Rows to append to the cache table after computing misses
    (≈ _cache_result upload, cached_ocr_executor.py:254-270)."""
    return results_with_key.select(
        "engine",
        "content_hash",
        "kwargs_hash",
        "native_json",
        "doc_text",
        F.current_timestamp().alias("created_ts"),
    )
