"""Recrawl scheduling: per-url change-rate estimation from crawl
snapshot history -> refetch probability -> a politeness-capped
refetch batch. (Cho & Garcia-Molina, "Estimating Frequency of
Change", ACM TOIT 3(3), 2003 — public literature; the scheduling
seam the reference's cached executor implies but never builds:
cached_ocr_executor.py:83-86 answers "is this payload new?", this
operator answers "which urls are WORTH refetching?".)

Why a crawler wants this: refetching everything every cycle spends
the fetch budget on static pages. The index tier already carries
change observations for free — sources/cdx.py digests per (urlkey,
ts) across stacked crawls — so change frequency is estimable without
touching a single WARC byte, and the refetch batch composes with the
same politeness caps as the discovery frontier (plans/frontier.py).

Estimator (the paper's bias-corrected ratio estimator): over
``n_int = n_fetches - 1`` equal-ish fetch intervals with ``X``
observed digest changes, the per-interval change rate is

    lam_int = -ln((n_int - X + 0.5) / (n_int + 0.5))

(the +0.5 terms keep it finite when every interval changed), scaled
to per-day by the mean interval. Under the Poisson change model the
probability the page changed since its last fetch is

    p_changed = 1 - exp(-lam_day * age_days)

which IS the refetch priority (optionally blended with PageRank by
the caller — both are columns).

Exactness contract (lm.py / graph.py precedent): every transcendental
is floor-round6'd the moment it is produced (``lam_day6`` before the
exp, ``p_changed6`` after), and each formula is written in ONE
operand order shared verbatim with the DuckDB twin — ln/exp are libm
on both engines and sqrt-free, so round6 parity holds (gated both
sfs via the `snapshot_suite` recrawl arm).

Scale shape: ONE groupBy(url) whose payload is the slim (ts, digest)
struct — never the page bytes; snapshot counts per url are small
(one per crawl), so the collected history array is bounded by the
crawl count. Everything after the aggregate is per-row native
expression; the batch capper reuses the distributed prefix-sum
(sampling.cap_per_key), so no full sort and no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _round6(c: Column) -> Column:
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def change_stats(
    snaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-url fetch-history stats from a (url, ts, digest) snapshot
    stack: ``(url, n_fetches, n_changes, first_ts, last_ts)``.

    A "change" is an adjacent-in-time digest inequality — the
    observation unit of the estimator. One shuffle; the history array
    is materialized as the AGGREGATE output attribute so the three
    lambdas that read it never inline the expression (the CLAUDE.md
    array-inline trap stops at the Aggregate boundary)."""
    hist = snaps.groupBy(F.col(url_col).alias("url")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(digest_col).alias("dg")))
        ).alias("h")
    )
    n = F.size("h")
    changes = F.when(
        n > 1,
        F.aggregate(
            F.sequence(F.lit(2), n),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                F.element_at(F.col("h"), i)["dg"]
                != F.element_at(F.col("h"), i - 1)["dg"],
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
    ).otherwise(F.lit(0))
    return hist.select(
        "url",
        n.cast("int").alias("n_fetches"),
        changes.cast("int").alias("n_changes"),
        F.element_at(F.col("h"), 1)["ts"].alias("first_ts"),
        F.element_at(F.col("h"), -1)["ts"].alias("last_ts"),
    )


def change_rate(
    snaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """change_stats + the bias-corrected Poisson rate ``lam_day6``
    (changes/day, floor-round6'd). NULL when unestimable (fewer than
    two fetches, or zero time span)."""
    st = change_stats(snaps, url_col, ts_col, digest_col)
    n_int = (F.col("n_fetches") - 1).cast("double")
    span_secs = (
        F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
    ).cast("double")
    # operand order is the oracle contract — do not re-associate
    ratio = (n_int - F.col("n_changes") + 0.5) / (n_int + 0.5)
    lam_day = -F.ln(ratio) / (span_secs / n_int / 86400.0)
    return st.withColumn(
        "lam_day6",
        F.when((F.col("n_fetches") > 1) & (span_secs > 0), _round6(lam_day)),
    )


def recrawl_priority(
    snaps: DataFrame,
    now,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    default_p6: float = 0.5,
) -> DataFrame:
    """change_rate + ``age_days`` (since last fetch, at ``now``) and
    ``p_changed6`` = 1 - exp(-lam_day6 * age_days), the probability
    the page changed since we last saw it. Urls with no estimate
    (single fetch) get ``default_p6`` — a cold page is worth a
    second look before its rate exists. ``now`` is any Spark-castable
    timestamp (pass it in — never a wall clock, determinism is the
    whole point of the contract)."""
    cr = change_rate(snaps, url_col, ts_col, digest_col)
    now_c = F.lit(now).cast("timestamp")
    age_days = (
        F.unix_timestamp(now_c) - F.unix_timestamp("last_ts")
    ).cast("double") / 86400.0
    p = _round6(F.lit(1.0) - F.exp(-F.col("lam_day6") * F.col("age_days")))
    return (
        cr.withColumn("age_days", age_days)
        .withColumn(
            "p_changed6",
            F.when(F.col("lam_day6").isNotNull(), p).otherwise(
                F.lit(float(default_p6))
            ),
        )
    )


def recrawl_batch(
    snaps: DataFrame,
    now,
    max_urls: int | None = None,
    per_host_cap: int | None = None,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    default_p6: float = 0.5,
) -> tuple[DataFrame, dict]:
    """The scheduling output: urls ordered by refetch worth with the
    frontier's politeness semantics — at most ``per_host_cap`` per
    host (highest-p first, deterministic prefix) and ``max_urls``
    overall. Returns ``(batch, metrics)``; batch columns are
    (url, host, p_changed6, lam_day6, age_days). Feed the batch to
    plans/incremental.crawl_delta after fetching: unchanged payloads
    (the 1-p cases) still cost zero engine work there."""
    from ocr_compare_spark.functions.url import host_of
    from ocr_compare_spark.operators import sampling

    pr = recrawl_priority(
        snaps, now, url_col, ts_col, digest_col, default_p6
    ).select(
        "url", "p_changed6", "lam_day6", "age_days"
    ).withColumn("host", host_of(F.col("url")))
    pr = pr.localCheckpoint(eager=True)
    metrics = {"n_candidates": pr.count()}

    # cap_per_key keeps LOWEST priority first -> invert p into [0,1)
    ordered = pr.withColumn("_prio", F.lit(1.0) - F.col("p_changed6") / 2.0)
    n_after_host = metrics["n_candidates"]
    if per_host_cap is not None:
        ordered = sampling.cap_per_key(
            ordered, "host", per_host_cap, "url", priority_col="_prio",
            checkpoint=False,
        )
        if max_urls is not None:
            ordered = ordered.localCheckpoint(eager=True)
            n_after_host = ordered.count()
    if max_urls is not None:
        ordered = sampling.cap_per_key(
            ordered.withColumn("_all", F.lit(1)), "_all", max_urls, "url",
            priority_col="_prio", checkpoint=False,
        ).drop("_all")
    batch = ordered.drop("_prio").localCheckpoint(eager=True)
    metrics["n_batch"] = batch.count()
    if per_host_cap is not None and max_urls is None:
        n_after_host = metrics["n_batch"]
    metrics["n_dropped_politeness"] = metrics["n_candidates"] - n_after_host
    metrics["n_dropped_batch_cap"] = n_after_host - metrics["n_batch"]
    return batch, metrics


def py_change_rate(history, now_secs: float | None = None):
    """Pure-python mirror of change_rate/recrawl_priority for ONE
    url's [(ts_secs, digest), ...] history — the pytest pin. Returns
    (n_fetches, n_changes, lam_day6, p_changed6|None)."""
    import math

    h = sorted(history)
    n = len(h)
    x = sum(1 for a, b in zip(h, h[1:]) if a[1] != b[1])
    span = h[-1][0] - h[0][0] if n > 1 else 0.0
    if n <= 1 or span <= 0:
        return n, x, None, None
    n_int = float(n - 1)
    ratio = (n_int - x + 0.5) / (n_int + 0.5)
    lam = -math.log(ratio) / (span / n_int / 86400.0)
    lam6 = math.floor(lam * 1e6 + 0.5) / 1e6
    if now_secs is None:
        return n, x, lam6, None
    age_days = (now_secs - h[-1][0]) / 86400.0
    p = 1.0 - math.exp(-lam6 * age_days)
    p6 = math.floor(p * 1e6 + 0.5) / 1e6
    return n, x, lam6, p6
