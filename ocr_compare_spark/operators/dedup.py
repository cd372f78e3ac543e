"""Deduplication operators for web-scale corpora.

Four tiers, cheapest first — all shuffle-minimal by construction:

- exact:      md5 groupBy (one shuffle on the hash, map-side combine)
- ngram:      n-gram Jaccard between candidate pairs (native arrays)
- minhash:    MinHash + LSH banding (native xxhash64 — NO Python),
              candidates = band-bucket self-join, verified natively
- simhash:    64-bit SimHash via one Arrow UDF (bit-vote needs numpy)

At 100 TB the only all-pairs step is the LSH bucket join, whose
cardinality is controlled by the band count — never a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-hash grouping (≈ the reference's md5 cache key,
    cached_ocr_executor.py:203-231). Output: one row per distinct
    content with the kept id and the duplicate count."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles, fully native."""
    toks = F.split(F.col(text_col), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def jaccard_arrays(a: F.Column, b: F.Column) -> F.Column:
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, F.size(F.array_intersect(a, b)) / union).otherwise(F.lit(1.0))


def adjacent_ngram_jaccard(df: DataFrame, id_col: str, text_col: str, part_col: str, n: int = 3) -> DataFrame:
    """N-gram Jaccard between each doc and its successor within a
    partition column — a cheap sorted-neighborhood dedup pass.

    Scale note: the lead() window puts one part_col value per task,
    so a low-cardinality partition column (e.g. lang) does NOT scale
    to 100 TB — there, sub-bucket the sort key first (part, id_range)
    and stitch bucket boundaries, or prefer lsh_candidates, which has
    no per-key serialization point. Kept simple here because its role
    is the cheap first-pass screen."""
    w = Window.partitionBy("part").orderBy("id")
    sh = word_shingles(text_col, n)
    with_next = (
        df.select(F.col(part_col).alias("part"), F.col(id_col).alias("id"), sh.alias("sh"))
        .withColumn("next_id", F.lead("id").over(w))
        .withColumn("next_sh", F.lead("sh").over(w))
        .filter(F.col("next_id").isNotNull())
    )
    return with_next.select(
        "part", "id", "next_id", F.round(jaccard_arrays(F.col("sh"), F.col("next_sh")), 6).alias("jaccard")
    )


# ------------------------------------------------------------ MinHash/LSH


def minhash_signature(shingles_col: str, num_hashes: int = 64) -> F.Column:
    """MinHash signature as array<long> — xxhash64(shingle, seed) per
    permutation. Catalyst-native, zero Python.

    Implemented as ONE fold over the shingle array maintaining the
    elementwise min of the num_hashes hash lanes. The naive form —
    num_hashes separate array_min(transform(shingles, ...)) columns —
    re-evaluates the (regex-split + distinct) shingle expression once
    per lane after projection collapse; measured 64 lanes stalled the
    driver. The fold reads each shingle exactly once."""
    seeds = F.array(*[F.lit(s) for s in range(num_hashes)])
    init = F.array_repeat(F.lit(0x7FFFFFFFFFFFFFFF).cast("long"), num_hashes)
    return F.aggregate(
        F.col(shingles_col),
        init,
        lambda acc, x: F.zip_with(
            acc, F.transform(seeds, lambda s: F.xxhash64(x, s)), lambda a, b: F.least(a, b)
        ),
    )


def lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    signature -> split into `bands` bands -> hash each band ->
    explode (band_id, band_hash) -> self-join on the bucket ->
    verify candidates with exact shingle Jaccard. The only shuffle
    keys are (band_id, band_hash); hot buckets (boilerplate dupes)
    are exactly the pairs we want, and the verify step is per-pair.
    """
    rows_per_band = num_hashes // bands
    # Explode shingles once, then num_hashes codegen'd min() aggs with
    # map-side partial aggregation — the whole signature computation
    # stays inside whole-stage codegen (the lambda-fold variant runs
    # interpreted and was ~10x slower at 5k docs / 64 lanes).
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    )
    sig_wide = exploded.groupBy("id").agg(
        *[F.min(F.xxhash64("shingle", F.lit(s))).alias(f"h{s}") for s in range(num_hashes)]
    )
    # bands: hash each contiguous group of rows_per_band lanes
    band_cols = []
    for b in range(bands):
        lanes = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(F.xxhash64(*lanes).alias(f"b{b}"))
    banded = sig_wide.select("id", *band_cols).select(
        "id",
        F.posexplode(F.array(*[F.col(f"b{b}") for b in range(bands)])).alias("band_id", "band_hash"),
    )
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band_id", "band_hash"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(F.col(id_col).alias("id"), word_shingles(text_col, shingle_n).alias("sh"))
    verified = (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", F.round(jaccard_arrays(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )
    return verified


# --------------------------------------------------------------- SimHash

_SIMHASH_TYPE = T.LongType()


@F.pandas_udf(_SIMHASH_TYPE)
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token arrays (bit-vote needs numpy —
    the one dedup op that earns an Arrow UDF)."""
    import hashlib

    def stable64(t: str) -> int:
        # process-salted builtin hash() would break determinism
        # across executors; md5 prefix is stable everywhere.
        return int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")

    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = np.array([np.uint64(stable64(t)) for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    return df.select(F.col(id_col).alias("id"), simhash64_udf(toks).alias("simhash"))
