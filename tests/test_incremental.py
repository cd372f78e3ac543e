"""Incremental crawl-delta plan (plans/incremental.py): a second
crawl that re-fetches unchanged pages must not re-run the engines,
while changed/new payloads extract exactly once and the served text
is byte-identical to the first crawl's for unchanged urls."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_compare_spark import synth
from ocr_compare_spark.plans.incremental import crawl_delta


def _doc_id():
    return F.regexp_extract("url", r"(\d+)$", 1).cast("long")


def test_crawl_delta_warm_cache_serves_everything(spark, sf_dir, tmp_path):
    cache_dir = str(tmp_path / "cache")
    pages = synth.pages_from_documents(spark, sf_dir)

    r1, m1 = crawl_delta(spark, pages, cache_dir)
    assert m1["fresh_docs"] == m1["urls"] == m1["rows_in"]
    assert m1["result_rows"] > 0

    # crawl 2: identical payloads, one day later — zero fresh work
    crawl2 = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    r2, m2 = crawl_delta(spark, crawl2, cache_dir)
    assert m2["fresh_docs"] == 0
    assert m2["result_rows"] == m1["result_rows"]

    t1 = {(r.url, r.engine): r.doc_text for r in r1.collect()}
    t2 = {(r.url, r.engine): r.doc_text for r in r2.collect()}
    assert t1 == t2  # byte-identical served text per (url, engine)


def test_crawl_delta_extracts_only_the_changed_payloads(spark, sf_dir, tmp_path):
    cache_dir = str(tmp_path / "cache")
    pages = synth.pages_from_documents(spark, sf_dir)
    r1, m1 = crawl_delta(spark, pages, cache_dir)

    # crawl 2: every url refetched; HTML docs with doc_id%50==1 got a
    # new paragraph prepended (changed bytes -> changed content hash);
    # everything else byte-unchanged
    changed = (_doc_id() % 50 == 1) & (_doc_id() % 10 != synth.PDF_MOD)
    crawl2 = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    ).withColumn(
        "html",
        F.when(
            changed,
            F.concat(F.encode(F.lit("<p>breaking update of this page</p>"), "UTF-8"), F.col("html")),
        ).otherwise(F.col("html")),
    )
    n_changed = crawl2.filter(changed).count()
    assert n_changed > 0

    r2, m2 = crawl_delta(spark, crawl2, cache_dir)
    assert m2["fresh_docs"] == n_changed
    assert m2["result_rows"] == m1["result_rows"]

    # changed urls were genuinely RE-extracted (dom text differs from
    # crawl 1); unchanged urls were served byte-identical
    changed_urls = {r.url for r in crawl2.filter(changed).select("url").collect()}
    t1 = {r.url: r.doc_text for r in r1.filter(F.col("engine") == "dom").collect()}
    t2 = {r.url: r.doc_text for r in r2.filter(F.col("engine") == "dom").collect()}
    assert set(t1) == set(t2)
    for url, text in t2.items():
        if url in changed_urls:
            assert text != t1[url]
        else:
            assert text == t1[url]


def test_crawl_delta_batch_with_stacked_snapshots(spark, sf_dir, tmp_path):
    """A batch carrying several snapshots of the same url keeps only
    the newest before the cache probe (latest_snapshot composition)."""
    cache_dir = str(tmp_path / "cache")
    pages = synth.pages_from_documents(spark, sf_dir).filter(_doc_id() < 40)
    stale = pages.withColumn(
        "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 30 DAY")
    ).withColumn("html", F.encode(F.lit("<p>stale snapshot text</p>"), "UTF-8"))
    batch = pages.unionByName(stale)

    r, m = crawl_delta(spark, batch, cache_dir)
    assert m["rows_in"] == 80 and m["urls"] == 40
    assert m["fresh_docs"] == 40  # only the newest snapshot extracts
    assert r.filter(F.col("doc_text").contains("stale snapshot")).count() == 0


def test_crawl_delta_within_batch_duplicate_payloads_extract_once(spark, tmp_path):
    """Two urls serving IDENTICAL bytes in the SAME batch: the engines
    run once per distinct payload (fresh_docs counts payloads, not
    urls) and both urls are served byte-identical text."""
    cache_dir = str(tmp_path / "cache")
    html = b"<html><body><p>mirrored syndicated body of text</p></body></html>"
    other = b"<html><body><p>unique body</p></body></html>"
    rows = [
        ("https://a.example.com/x", "2024-01-01 00:00:00", html, "en"),
        ("https://b.example.com/mirror-of-x", "2024-01-01 00:00:00", html, "en"),
        ("https://c.example.com/y", "2024-01-01 00:00:00", other, "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, html binary, lang string") \
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    res, m = crawl_delta(spark, pages, cache_dir, engines=("dom",))
    assert m["urls"] == 3
    assert m["fresh_docs"] == 2  # 2 distinct payloads, not 3 urls
    texts = {r.url: r.doc_text for r in res.collect()}
    assert len(texts) == 3
    assert texts["https://a.example.com/x"] == texts["https://b.example.com/mirror-of-x"]
    assert texts["https://c.example.com/y"] != texts["https://a.example.com/x"]


def test_revisit_archive_feeds_cache_with_zero_engine_work(spark, tmp_path):
    """The claimed WARC-revisit composition: crawl 2's archive (written
    with dedup=True against crawl 1's payloads via known digests at
    the write seam — here the payloads are literally identical) is
    read back, revisits rehydrated, and crawl_delta does ZERO engine
    work because every payload is already cached."""
    from datetime import datetime, timedelta

    from ocr_compare_spark.plans.incremental import crawl_delta
    from ocr_compare_spark.sources.warc import (
        resolve_revisits, warc_pages, warc_revisits, write_warc,
    )

    t0 = datetime(2025, 1, 1)
    body = b"<html><body><p>stable page body</p></body></html>"
    crawl1 = spark.createDataFrame(
        [(f"https://h{i}.example/p", t0, body, "en") for i in range(6)],
        ["url", "warc_ts", "html", "lang"],
    )
    cache = str(tmp_path / "cache")
    _, m1 = crawl_delta(spark, crawl1, cache)
    assert m1["fresh_docs"] == 1  # six urls, ONE distinct payload

    # crawl 2: same pages re-crawled a day later -> dedup'd archive
    crawl2 = crawl1.select(
        "url", (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"), "html"
    )  # WARC carries no lang column — reattach after rehydration
    arch = str(tmp_path / "warcs")
    write_warc(crawl2, arch, num_files=2, dedup=True)
    pages = warc_pages(spark, f"{arch}/part-*")
    revs = warc_revisits(spark, f"{arch}/part-*")
    assert pages.count() == 1 and revs.count() == 5  # storage dedup held
    full = resolve_revisits(pages, revs).withColumn("lang", F.lit("en"))
    assert full.count() == 6

    # the rehydrated crawl is a full cache hit: zero engine work
    _, m2 = crawl_delta(spark, full, cache)
    assert m2["fresh_docs"] == 0 and m2["urls"] == 6


def test_cdx_digests_feed_recrawl_scheduler(spark, tmp_path):
    """CDX tier -> recrawl composition: stacked crawl indexes carry
    (urlkey, ts, digest) for free; change_rate estimates straight off
    them with no WARC byte touched."""
    from datetime import datetime, timedelta

    from ocr_compare_spark.operators.recrawl import recrawl_priority
    from ocr_compare_spark.sources.cdx import ENTRIES_SCHEMA, cdx_entries, write_cdx_index

    t0 = datetime(2025, 1, 1)
    rows = []
    for c in range(3):  # three crawls, one day apart
        for i in range(4):
            # url i changes on crawl c iff i > c
            v = min(c, i)
            rows.append((
                f"com,h{i})/p", t0 + timedelta(days=c),
                f"https://h{i}.com/p", "text/html", 200,
                f"d{i}-{v}", 100, 0, f"crawl{c}.warc.gz", None,
            ))
    idx_dir = str(tmp_path / "cdx")
    write_cdx_index(spark.createDataFrame(rows, ENTRIES_SCHEMA), idx_dir, num_shards=2)

    ent = cdx_entries(spark, f"{idx_dir}/part-*")
    pr = recrawl_priority(
        ent, t0 + timedelta(days=10), url_col="url", ts_col="ts", digest_col="digest"
    )
    got = {r.url: r for r in pr.collect()}
    assert all(r.n_fetches == 3 for r in got.values())
    # i=0 never changes; i=1 changes once; i>=2 change twice
    assert got["https://h0.com/p"].n_changes == 0
    assert got["https://h1.com/p"].n_changes == 1
    assert got["https://h2.com/p"].n_changes == 2
    assert (
        got["https://h3.com/p"].p_changed6
        > got["https://h1.com/p"].p_changed6
        > got["https://h0.com/p"].p_changed6 == 0.0
    )


def test_crawl_delta_feeds_incremental_index(spark, sf_dir, tmp_path):
    """Composition proof (the index leg of the incremental story):
    recrawl batch -> crawl_delta (content-hash cached extraction;
    unchanged payloads never re-run the engines) -> merge_index
    (compaction upsert; only the batch re-tokenizes) == an index
    built from scratch on the post-crawl corpus, row for row, and
    BM25 over the merged index == BM25 over that corpus."""
    from ocr_compare_spark.operators import index as index_ops

    cache_dir = str(tmp_path / "cache")
    pages = synth.pages_from_documents(spark, sf_dir)
    r1, _ = crawl_delta(spark, pages, cache_dir)
    dom1 = r1.filter(F.col("engine") == "dom").select(
        F.col("url").alias("doc_id"), F.col("doc_text").alias("text")
    ).localCheckpoint()
    post1 = index_ops.postings(dom1, "doc_id", "text")
    dl1 = index_ops.doc_lengths(dom1, "doc_id", "text")

    # crawl 2 refetches the doc_id%7==3 subset; within it, %14==3
    # pages changed bytes, the rest are byte-identical (cache hits)
    refetch = _doc_id() % 7 == 3
    changed = refetch & (_doc_id() % 14 == 3)
    crawl2 = (
        pages.filter(refetch)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn(
            "html",
            F.when(
                changed,
                F.concat(
                    F.encode(F.lit("<p>fresh scoop paragraph</p>"), "UTF-8"),
                    F.col("html"),
                ),
            ).otherwise(F.col("html")),
        )
    )
    n_changed = crawl2.filter(changed).count()
    assert n_changed > 0
    r2, m2 = crawl_delta(spark, crawl2, cache_dir)
    assert m2["fresh_docs"] == n_changed  # unchanged refetches: no engine work
    dom2 = r2.filter(F.col("engine") == "dom").select(
        F.col("url").alias("doc_id"), F.col("doc_text").alias("text")
    ).localCheckpoint()

    mpost, mdl = index_ops.merge_index(post1, dl1, dom2)

    # from-scratch reference: batch urls serve crawl-2 text, the rest
    # keep crawl-1 text
    final = dom1.join(dom2.select("doc_id"), "doc_id", "left_anti").unionByName(dom2)
    spost = index_ops.postings(final, "doc_id", "text")
    sdl = index_ops.doc_lengths(final, "doc_id", "text")
    key_p = lambda r: (r["term"], r["id"], r["tf"])
    assert sorted(map(key_p, mpost.collect())) == sorted(map(key_p, spost.collect()))
    key_d = lambda r: (r["id"], r["dl"])
    assert sorted(map(key_d, mdl.collect())) == sorted(map(key_d, sdl.collect()))

    queries = spark.createDataFrame(
        [(0, "fresh scoop paragraph"), (1, "the first page")],
        ["query_id", "query_text"],
    )
    got = index_ops.bm25_topk_indexed(mpost, mdl, queries, k=5)
    want = index_ops.bm25_topk(final, queries, id_col="doc_id", text_col="text", k=5)
    key_r = lambda r: (r["query_id"], r["rank"], r["id"], r["score6"])
    got_rows = sorted(map(key_r, got.collect()))
    assert got_rows == sorted(map(key_r, want.collect()))
    # the planted paragraph is findable and only in changed docs
    hits = {r[2] for r in got_rows if r[0] == 0 and r[3] > 0}
    changed_urls = {r.url for r in crawl2.filter(changed).select("url").collect()}
    assert hits and hits <= changed_urls
