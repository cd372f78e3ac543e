"""Link-graph / anchor-text extraction (operators/links.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_compare_spark.operators.links import extract_links, inbound_anchors


PAGES = [
    (
        "http://A.example.com/page1?utm_source=x",
        b'<html><body>'
        b'<a href="http://Other.com/target?b=2&a=1#f">first <b>link</b></a>'
        b'<a class="nav" href="/local/path">Local</a>'
        b'<a href="//cdn.example.org/x">proto-relative</a>'
        b'<a href="mailto:x@y.z">mail</a>'
        b'<a href="#top">frag</a>'
        b'<a href="relative/path">rel</a>'
        b'<a href="http://other.com:80/target?a=1&b=2">first  link</a>'
        b"</body></html>",
    ),
    (
        "https://b.example.com/p2",
        b'<a\nhref="http://other.com/target?a=1&b=2">spanning\nlines</a>'
        b'<a href="http://third.com/only"></a>',
    ),
    ("http://c.example.com/empty", b"<html><p>no anchors here</p></html>"),
]


def _links(spark):
    df = spark.createDataFrame(PAGES, ["url", "html"])
    return extract_links(df)


def test_extract_links_resolution_and_canonicalization(spark):
    rows = _links(spark).collect()
    got = {(r.src, r.dst, r.anchor_text) for r in rows}
    src1 = "http://a.example.com/page1"  # canonicalized, tracking param gone
    assert (src1, "http://other.com/target?a=1&b=2", "first link") in got
    assert (src1, "http://a.example.com/local/path", "Local") in got
    assert (src1, "http://cdn.example.org/x", "proto-relative") in got
    # mailto / fragment-only edges dropped
    assert all("mailto" not in d for _, d, _ in got)
    assert all(not d.endswith("#top") for _, d, _ in got)
    # bare-relative hrefs now resolve against the base path (RFC 3986)
    assert (src1, "http://a.example.com/relative/path", "rel") in got
    # multi-line anchor + tag-stripped, whitespace-normalized text
    assert ("https://b.example.com/p2", "http://other.com/target?a=1&b=2", "spanning lines") in got
    # page without anchors contributes nothing
    assert all(s != "http://c.example.com/empty" for s, _, _ in got)


def test_inbound_anchor_corpus(spark):
    agg = {r.dst: r for r in inbound_anchors(_links(spark)).collect()}
    tgt = agg["http://other.com/target?a=1&b=2"]
    # three edges: two from page1 (':80' variant canonicalizes to the
    # same dst; 'first  link' normalizes to the same text), one from p2
    assert tgt.n_inbound == 3
    assert tgt.n_src == 2
    assert tgt.anchor_texts == ["first link", "spanning lines"]
    # empty anchor text counts as an edge, contributes no text
    only = agg["http://third.com/only"]
    assert only.n_inbound == 1 and only.anchor_texts == []


def test_extract_links_rfc3986_resolution_matrix(spark):
    """RFC 3986 §5.4 reference-resolution examples (adapted to the
    extractor's drop contract): dot-segment removal, merge-path,
    query-only, root clamp — no edge silently dropped except
    other-scheme and fragment-only."""
    base = "http://h.example.com/b/c/d;p?q=1"
    cases = {
        "g": "http://h.example.com/b/c/g",
        "./g": "http://h.example.com/b/c/g",
        "g/": "http://h.example.com/b/c/g/",
        "/g": "http://h.example.com/g",
        "//cdn.net/g": "http://cdn.net/g",
        "?y=2": "http://h.example.com/b/c/d;p?y=2",
        "g?y=2": "http://h.example.com/b/c/g?y=2",
        "g#s": "http://h.example.com/b/c/g",
        "..": "http://h.example.com/b/",
        "../": "http://h.example.com/b/",
        "../g": "http://h.example.com/b/g",
        "../..": "http://h.example.com/",
        "../../g": "http://h.example.com/g",
        # past-root .. clamps at / (RFC: ignore excess dot-dots)
        "../../../../g": "http://h.example.com/g",
        "g/../h": "http://h.example.com/b/c/h",
        "g/./h": "http://h.example.com/b/c/g/h",
        ".": "http://h.example.com/b/c/",
        "./": "http://h.example.com/b/c/",
    }
    html = "".join(f'<a href="{h}">t{i}</a>' for i, (h, _) in enumerate(cases.items()))
    df = spark.createDataFrame([(base, html.encode())], ["url", "html"])
    got = {r.anchor_text: r.dst for r in extract_links(df).collect()}
    for i, (href, want) in enumerate(cases.items()):
        assert got[f"t{i}"] == want, f"{href!r}: got {got.get(f't{i}')!r}, want {want!r}"
    # dropped forms: other scheme, fragment-only, empty
    drop_html = b'<a href="mailto:a@b.c">m</a><a href="#x">f</a><a href="">e</a>'
    df2 = spark.createDataFrame([(base, drop_html)], ["url", "html"])
    assert extract_links(df2).count() == 0


def test_extract_links_graph_only_fast_path(spark):
    df = spark.createDataFrame(PAGES, ["url", "html"])
    full = {(r.src, r.dst) for r in extract_links(df).collect()}
    fast = extract_links(df, with_anchor_text=False)
    assert fast.columns == ["src", "dst"]
    # same EDGE MULTISET as the text-carrying path (multi-edges kept)
    full_rows = sorted((r.src, r.dst) for r in extract_links(df).collect())
    fast_rows = sorted((r.src, r.dst) for r in fast.collect())
    assert fast_rows == full_rows and set(fast_rows) == full


def test_domain_graph_collapse(spark):
    from ocr_compare_spark.operators.links import domain_graph
    from ocr_compare_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [
            # subdomains collapse to the registered domain
            ("https://blog.alpha.com/a", "https://www.beta.org/x"),
            ("https://shop.alpha.com/b", "https://beta.org/y"),
            ("https://alpha.com/c", "https://beta.org/y"),
            # intra-domain (navigation) drops, even across subdomains
            ("https://alpha.com/c", "https://docs.alpha.com/d"),
            # PSL multi-label suffix: user.github.io IS the domain
            ("https://user.github.io/p", "https://alpha.com/c"),
            ("https://sub.user.github.io/q", "https://sub.user.github.io/r"),
        ],
        ["src", "dst"],
    )
    got = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in domain_graph(edges).collect()
    }
    assert got == {
        ("alpha.com", "beta.org"): 3,
        ("user.github.io", "alpha.com"): 1,
    }
    # composes with pagerank on the collapsed rows
    ranks = {
        r.node: r.rank6
        for r in pagerank(
            domain_graph(edges).select(
                F.col("src_domain").alias("src"), F.col("dst_domain").alias("dst")
            )
        ).collect()
    }
    assert set(ranks) == {"alpha.com", "beta.org", "user.github.io"}
    assert ranks["beta.org"] > ranks["alpha.com"] > ranks["user.github.io"]


def test_anchor_documents_bm25_site_finding(spark):
    # the Craswell/Brin-Page composition: index pages by what OTHERS
    # call them. Content never enters the index; the query matches a
    # page purely through its inbound anchor texts, and the document
    # is layout-invariant (sorted distinct texts).
    from ocr_compare_spark.operators import index, links

    rows = [
        ("https://a.com/1", "https://shop.com/w", "blue widgets"),
        ("https://a.com/2", "https://shop.com/w", "cheap blue widgets"),
        ("https://a.com/3", "https://shop.com/w", "widgets"),
        ("https://b.com/1", "https://news.com/x", "daily news"),
        ("https://b.com/2", "https://news.com/x", "breaking story"),
    ]
    ldf = spark.createDataFrame(rows, ["src", "dst", "anchor_text"])
    docs = links.anchor_documents(ldf)
    got = {r.url: (r.n_inbound, r.anchor_doc) for r in docs.collect()}
    assert got["https://shop.com/w"] == (3, "blue widgets cheap blue widgets widgets")
    q = spark.createDataFrame([(1, "blue widgets")], ["query_id", "query_text"])
    top = index.bm25_topk(
        docs, q, id_col="url", text_col="anchor_doc", k=2
    ).collect()
    assert top[0].id == "https://shop.com/w" and top[0].rank == 1
    # layout invariance: shuffled edge order yields the same documents
    got2 = {
        r.url: r.anchor_doc
        for r in links.anchor_documents(ldf.repartition(7)).collect()
    }
    assert got2 == {u: d for u, (_, d) in got.items()}


def test_extract_links_fastpath_equals_full_canonicalization(spark):
    """r6: the constructed-dst branches skip canonical_url (canonical
    by construction). This pins the optimized resolution against the
    pre-r6 reference — canonical_url over the raw constructed dst —
    on an adversarial source/href matrix: userinfo (single and
    double '@'), uppercase scheme/host, ports, bracketed IPv6,
    scheme-less junk urls, tracking params and degenerate queries in
    every relative form."""
    from ocr_compare_spark.functions.url import canonical_url, host_of
    from ocr_compare_spark.operators.links import (
        ANCHOR_PATTERN,
        remove_dot_segments,
    )

    hrefs = [
        "/x?utm_source=t&b=2&a=1",
        "/x?",
        "/x?&&",
        "?y=2&utm_campaign=z",
        "?utm_medium=m",
        "rel/path?b=2&a=1#frag",
        "../up/./here?gclid=1&k=v",
        "//CDN.Example.org:443/y?b=1&a=2",
        "https://Other.COM:80/t?utm_term=q&z=1",
        "HTTPS://X.Y/p",
        "mailto:a@b.c",
        "#onlyfrag",
        "",
        "/plain",
        "sub",
    ]
    html = "".join(f'<a href="{h}">t</a>' for h in hrefs).encode()
    srcs = [
        "http://Host.Example.com/a/b/c?q=1",
        "https://user:pw@h2.example.com:8443/d/e",
        "http://a@b@weird.example.com/f",
        "https://[2001:DB8::1]/v6/path",
        "http://plain.example.com",
        "not a url at all",
        "ftp://files.example.com/dir/",
    ]
    df = spark.createDataFrame([(s, html) for s in srcs], ["url", "html"])

    # reference = the pre-r6 shape: construct raw dst, then full
    # canonical_url over it (copied verbatim from the old code)
    src = F.col("url")
    html_str = F.col("html").cast("string")
    raw_hrefs = F.regexp_extract_all(html_str, F.lit(ANCHOR_PATTERN), 1)
    src_path_raw = F.regexp_extract(
        src, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    src_path = F.when(src_path_raw == "", F.lit("/")).otherwise(src_path_raw)
    exploded = df.select(
        canonical_url(src).alias("src"),
        F.lower(
            F.regexp_extract(src, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
        ).alias("_scheme"),
        host_of(src).alias("_host"),
        src_path.alias("_path"),
        F.explode(raw_hrefs).alias("href"),
    )
    origin = F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"))
    href = F.regexp_replace(F.col("href"), r"#.*$", "")
    href_path = F.regexp_extract(href, r"^([^?]*)", 1)
    href_query = F.regexp_extract(href, r"^[^?]*(\?.*)$", 1)
    base_dir = F.regexp_replace(F.col("_path"), r"[^/]*$", "")
    merged = remove_dot_segments(F.concat(base_dir, href_path))
    dst_raw = (
        F.when(href == "", F.lit(None))
        .when(href.rlike(r"(?i)^https?://"), href)
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), F.lit(None))
        .when(
            href.startswith("//"),
            F.concat(F.col("_scheme"), F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(origin, remove_dot_segments(href_path), href_query),
        )
        .when(href_path == "", F.concat(origin, F.col("_path"), href_query))
        .otherwise(F.concat(origin, merged, href_query))
    )
    ref = (
        exploded.withColumn("dst", canonical_url(dst_raw))
        .filter(F.col("dst").isNotNull())
        .select("src", "dst")
    )

    got = sorted((r.src, r.dst) for r in extract_links(df, with_anchor_text=False).collect())
    want = sorted((r.src, r.dst) for r in ref.collect())
    assert got == want
