"""URL canonicalization for crawl tables — native Catalyst only.

A multi-crawl pages table keys everything on the url (snapshot dedup,
cache lineage, per-host stats), and raw crawl urls are dirty: mixed
scheme/host case, default ports, fragments, tracking params, unstable
query order. Canonicalizing BEFORE keying turns "the same page fetched
through three tracking links" into one key — upstream of
latest_snapshot / crawl_delta this is a row-local projection (zero
shuffle), so it costs nothing at 10^12 rows while shrinking every
downstream shuffle.

All pure string expressions (regexp_replace / split / array ops) —
whole-stage codegen, no Python, deterministic. The registered-domain
helper is an explicit heuristic with a fixed multi-part-suffix list,
NOT a full public-suffix-list implementation (documented trade; the
list is a constant the caller can extend).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Query parameters that identify the CLICK, not the page.
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref|ref_src)="

# Common multi-part public suffixes for the eTLD+1 heuristic.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def host_of(url: str | Column) -> Column:
    """Lowercased host (authority minus userinfo/port) of a url."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )


def canonical_url(url: str | Column) -> Column:
    """Canonical form of a crawl url:

    - scheme and host lowercased (RFC 3986: both case-insensitive)
    - userinfo dropped, default ports stripped (:80 http / :443 https)
    - fragment dropped (never sent to the server)
    - tracking params dropped (TRACKING_PARAM_PATTERN), remaining
      query params sorted bytewise for a stable key; an emptied query
      loses its '?'
    - path defaults to '/' when absent

    Idempotent: canonical_url(canonical_url(u)) == canonical_url(u).
    Urls without a '<scheme>://' prefix pass through unchanged (no
    guessing — a non-url key must stay a stable key).
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = _scheme(c)
    host = host_of(c)
    port = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:(\d+)", 1)
    default_port = (
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    # everything after the authority, fragment stripped
    rest = F.regexp_replace(
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1),
        r"#.*$",
        "",
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    query_part = F.when(
        (query == "") | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    rebuilt = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return F.when(c.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), rebuilt).otherwise(c)


def registered_domain(host: str | Column) -> Column:
    """eTLD+1 heuristic: the last two host labels, or three when the
    last two form a known multi-part suffix (MULTIPART_SUFFIXES).
    Bare hosts (no dot) and IPv4 literals pass through unchanged."""
    c = F.col(host) if isinstance(host, str) else host
    labels = F.split(c, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    multi = F.array(*[F.lit(s) for s in MULTIPART_SUFFIXES])
    is_ipv4 = c.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return (
        F.when((n <= 2) | is_ipv4, c)
        .when(F.array_contains(multi, last2), last3)
        .otherwise(last2)
    )
