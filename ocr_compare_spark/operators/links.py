"""Link-graph and anchor-text extraction over crawl pages.

Two datasets every web-scale pipeline derives besides the text
corpus:

- the **link graph** (src url -> dst url edges) driving crawl
  frontier ranking, host-level quality priors and dedup hints;
- the **anchor-text corpus** (what OTHER pages call a url), a
  standard retrieval/pretraining signal.

Both come out of the SAME per-row projection here — native
regexp_extract_all over the html bytes, zero Python, zero shuffle
until the caller aggregates. The href and the anchor text are pulled
with the same overall pattern (different capture groups), so the two
arrays are index-aligned by construction and arrays_zip pairs them
without a join.

Scope (documented, deliberate): this is a regex scanner for the
common `<a ... href="...">text</a>` shape — single-level anchors,
double-quoted hrefs, tag-stripped inner text. It is a DATASET
extractor, not a DOM parser; the engines' html_scan remains the
fidelity path for text. Relative URLs resolve root-relative and
protocol-relative forms against the source url (full RFC 3986
merge-path resolution is out of scope and flagged by dropping the
edge). Edges to mailto:/javascript:/fragment-only targets are
dropped. Destinations are canonicalized with functions/url.py so the
graph keys line up with every other url-keyed stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_compare_spark.functions.url import canonical_url, host_of

# One pattern, two groups: group 1 = href value, group 2 = inner
# text. Extracting both groups from the SAME pattern keeps the two
# arrays index-aligned (same matches in the same order).
ANCHOR_PATTERN = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'

# Tags inside the anchor body (e.g. <b>, <span>) are stripped; the
# remaining entity-free text is whitespace-normalized.
_TAG = r"<[^>]*>"


def _norm_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(c, _TAG, " "), r"\s+", " "))


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per resolvable anchor: ``(src, dst, anchor_text)``.

    dst is canonical (functions/url.canonical_url). Resolution rules:
    absolute http(s) hrefs pass through; ``//host/...`` takes the
    source scheme; ``/path`` takes the source scheme+host; anything
    else (relative paths, mailto:, javascript:, pure fragments,
    empty) is dropped — a lossy-but-stated contract that keeps the
    operator a pure projection.
    """
    src = F.col(url_col)
    html_str = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 1)
    texts = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 2)
    pairs = F.arrays_zip(hrefs.alias("href"), texts.alias("txt"))

    exploded = pages.select(
        canonical_url(src).alias("src"),
        F.lower(F.regexp_extract(src, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)).alias("_scheme"),
        host_of(src).alias("_host"),
        F.explode(pairs).alias("a"),
    ).select(
        "src",
        "_scheme",
        "_host",
        F.col("a.href").alias("href"),
        _norm_text(F.col("a.txt")).alias("anchor_text"),
    )

    href = F.col("href")
    dst_raw = (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), href),
        )
        .otherwise(F.lit(None))
    )
    return (
        exploded.withColumn("dst", canonical_url(dst_raw))
        .filter(F.col("dst").isNotNull())
        .select("src", "dst", "anchor_text")
    )


def inbound_anchors(links: DataFrame, max_texts: int = 100) -> DataFrame:
    """Anchor-text corpus: per dst url, inbound-edge counts and the
    distinct anchor texts other pages use for it (capped at
    ``max_texts`` AFTER sorting, so the kept set is deterministic —
    a silent arbitrary cap would poison the corpus). One hash
    aggregation on dst with map-side combine; empty anchor texts
    count as edges but contribute no text."""
    texts = F.slice(
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.when(F.col("anchor_text") != "", F.col("anchor_text")))
            )
        ),
        1,
        max_texts,
    )
    return links.groupBy("dst").agg(
        F.count("*").alias("n_inbound"),
        F.countDistinct("src").alias("n_src"),
        texts.alias("anchor_texts"),
    )
