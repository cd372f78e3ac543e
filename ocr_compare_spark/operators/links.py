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
fidelity path for text. Relative hrefs resolve per RFC 3986 §5.2:
protocol-relative (`//h/p`), root-relative (`/p`), bare-relative
(`p`, `./p`, `../p` — merge with the base path) and query-only
(`?q`) forms all resolve against the source url, with native
dot-segment removal (an aggregate fold over the split path — zero
Python). Edges to mailto:/javascript:/other-scheme and
fragment-only targets are dropped. Destinations are canonicalized
with functions/url.py so the graph keys line up with every other
url-keyed stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_compare_spark.functions.url import (
    TRACKING_PARAM_PATTERN,
    canonical_url,
    host_of,
)

# One pattern, two groups: group 1 = href value, group 2 = inner
# text. Extracting both groups from the SAME pattern keeps the two
# arrays index-aligned (same matches in the same order).
ANCHOR_PATTERN = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'

# Tags inside the anchor body (e.g. <b>, <span>) are stripped; the
# remaining entity-free text is whitespace-normalized.
_TAG = r"<[^>]*>"


def _norm_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(c, _TAG, " "), r"\s+", " "))


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 dot-segment removal for an ABSOLUTE path
    (starts with '/'), as a native aggregate fold over the split
    segments: '.' is skipped, '..' pops the previous segment (never
    past the root), anything else appends. A trailing '.'/'..'
    segment keeps the trailing slash, per the RFC's output buffer."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(1))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    joined = F.array_join(folded, "/")
    joined = F.when(joined == "", F.lit("/")).otherwise(joined)
    trailing_dot = path.rlike(r"(^|/)\.\.?$")
    return F.when(
        trailing_dot & ~joined.endswith("/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    with_anchor_text: bool = True,
) -> DataFrame:
    """One row per resolvable anchor: ``(src, dst, anchor_text)``.

    dst is canonical (functions/url.canonical_url). Resolution per
    RFC 3986 §5.2: absolute http(s) hrefs pass through; ``//h/p``
    takes the source scheme; ``/p`` takes scheme+host; bare-relative
    ``p`` / ``./p`` / ``../p`` merge with the base path (dot segments
    removed natively); ``?q`` replaces the query on the base path.
    Dropped (by contract): other-scheme hrefs (mailto:, javascript:,
    ftp:, ...), fragment-only, and empty hrefs.

    ``with_anchor_text=False`` returns ``(src, dst)`` only and runs
    the anchor regex ONCE instead of once per capture group — the
    fast path for graph-only callers (PageRank, frontier ranking),
    where the second full-document scan is pure waste.
    """
    src = F.col(url_col)
    html_str = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 1)
    if with_anchor_text:
        texts = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 2)
        pairs = F.arrays_zip(hrefs.alias("href"), texts.alias("txt"))
    else:
        pairs = F.transform(hrefs, lambda h: F.struct(h.alias("href"), F.lit("").alias("txt")))

    src_path_raw = F.regexp_extract(src, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    src_path = F.when(src_path_raw == "", F.lit("/")).otherwise(src_path_raw)
    exploded = pages.select(
        canonical_url(src).alias("src"),
        F.lower(F.regexp_extract(src, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)).alias("_scheme"),
        host_of(src).alias("_host"),
        src_path.alias("_path"),
        F.explode(pairs).alias("a"),
    ).select(
        "src",
        "_scheme",
        "_host",
        "_path",
        F.col("a.href").alias("href"),
        _norm_text(F.col("a.txt")).alias("anchor_text"),
    )

    # r6 perf: the constructed-dst branches below are CANONICAL BY
    # CONSTRUCTION except for the query part and one userinfo corner,
    # so they skip the ~9-regex canonical_url re-parse that used to
    # run per edge (A/B at 800k edges: resolution pass ~2x faster,
    # byte-identical output — pinned by the equivalence pytest):
    # - scheme is already lowercase (F.lower above);
    # - host comes from host_of (lowercase, no port; the one re-parse
    #   effect canonical_url would still have — stripping a leading
    #   'userinfo@' layer when a pathological source url smuggled an
    #   '@' into the host token — is replicated with the identical
    #   anchored one-strip regex);
    # - paths are '?'/'#'-free and start with '/' by construction, so
    #   canonical_url's authority/path/fragment handling is identity;
    # - the query part gets the same drop-tracking/sort/'?'-drop
    #   treatment canonical_url applies (same expressions).
    # Absolute and protocol-relative hrefs still take full
    # canonical_url (arbitrary authority: case, ports, userinfo).
    clean_host = F.regexp_replace(F.col("_host"), r"^[^/@?#]*@", "")
    origin = F.concat(F.col("_scheme"), F.lit("://"), clean_host)
    # fragment never reaches the server; strip it before classifying
    # so '#top' is fragment-only (dropped) and 'a#top' is relative
    href = F.regexp_replace(F.col("href"), r"#.*$", "")
    href_path = F.regexp_extract(href, r"^([^?]*)", 1)
    query = F.regexp_extract(href, r"^[^?]*\?(.*)$", 1)  # after the '?'
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    query_part = F.when(
        (query == "") | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    # scheme-less (junk) source urls never passed canonical_url's
    # scheme gate, so their constructed dsts kept the raw query
    # verbatim — preserve that passthrough byte-for-byte
    raw_query = F.regexp_extract(href, r"^[^?]*(\?.*)$", 1)  # keeps the '?'
    query_part = F.when(F.col("_scheme") == "", raw_query).otherwise(query_part)
    base_dir = F.regexp_replace(F.col("_path"), r"[^/]*$", "")  # up to last '/'
    merged = remove_dot_segments(F.concat(base_dir, href_path))

    dst = (
        F.when(href == "", F.lit(None))
        .when(href.rlike(r"(?i)^https?://"), canonical_url(href))
        # any OTHER scheme (mailto:, javascript:, ftp:, data:...) drops
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), F.lit(None))
        .when(
            href.startswith("//"),
            canonical_url(F.concat(F.col("_scheme"), F.lit(":"), href)),
        )
        .when(
            href.startswith("/"),
            F.concat(origin, remove_dot_segments(href_path), query_part),
        )
        # query-only href: same path, new query (RFC 3986 §5.3)
        .when(href_path == "", F.concat(origin, F.col("_path"), query_part))
        # bare-relative: merge with the base directory
        .otherwise(F.concat(origin, merged, query_part))
    )
    out = exploded.withColumn("dst", dst).filter(F.col("dst").isNotNull())
    if not with_anchor_text:
        return out.select("src", "dst")
    return out.select("src", "dst", "anchor_text")


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


def anchor_documents(links: DataFrame, max_texts: int = 100) -> DataFrame:
    """Anchor-text pseudo-documents: ``(url, n_inbound, anchor_doc)``
    where anchor_doc is the sorted distinct inbound anchor texts
    joined with spaces — the classic web-search signal that a page is
    well described by what OTHER pages call it (Brin & Page 1998
    §2.2; Craswell et al. 2001 showed anchor-text retrieval beats
    content retrieval for site finding). The document is a pure
    function of the inbound edge set (sorted before joining), so
    retrieval over it is layout-invariant; it feeds
    operators/index.bm25_topk unchanged — index the crawl by anchor
    text without touching page bytes."""
    agg = inbound_anchors(links, max_texts)
    return agg.select(
        F.col("dst").alias("url"),
        "n_inbound",
        F.array_join("anchor_texts", " ").alias("anchor_doc"),
    )


def domain_graph(
    links: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Page-level edges collapsed to the REGISTERED-DOMAIN graph —
    the Common Crawl domain-graph release shape: ``(src_domain,
    dst_domain, n_links)`` with page-level multiplicity preserved in
    the count. Intra-domain edges drop (site navigation, not
    endorsement — the standard host/domain-graph convention), as do
    edges whose host yields no domain (bare IPs keep the IP literal
    via registered_domain's passthrough; nulls drop).

    Domain authority = ``graph.pagerank(domain_graph(edges))`` —
    pagerank's outdeg counts edge ROWS, so feed the collapsed
    (distinct-pair) rows for the unweighted rank or re-expand by
    n_links for the link-weighted variant. Scale shape: one map-side-
    combined groupBy over two row-local native expressions; the
    domain graph is orders of magnitude smaller than the page graph,
    so everything downstream (rank rounds, joins back to hosts) runs
    on the collapsed table."""
    from ocr_compare_spark.functions.url import host_of, registered_domain

    sd = registered_domain(host_of(F.col(src)))
    dd = registered_domain(host_of(F.col(dst)))
    return (
        links.select(sd.alias("src_domain"), dd.alias("dst_domain"))
        .filter(
            F.col("src_domain").isNotNull()
            & F.col("dst_domain").isNotNull()
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )
