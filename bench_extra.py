"""Per-query isolation harness for optimization round 6 (guide §1.4).

NOT the driver contract — bench.py is frozen; this file exists to
time single queries with the noop sink, capture .explain("formatted")
plans into plans/r06/, and A/B code changes without paying a full
32-query suite run.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        semdedup bm25 [--reps 2] [--plans plans/r06 --tag before]

Prints one JSON line {"queries": {name: best_sec}, "sf": ...}.
Query bodies mirror bench.py exactly (same inputs, same actions) so
numbers are comparable query-by-query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 2
    plans_dir = None
    tag = "before"
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    from ocr_compare_spark.session import get_spark
    from ocr_compare_spark import synth
    from ocr_compare_spark.operators import dedup, similarity
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ocr_compare_bench_extra")
    cores = spark.sparkContext.defaultParallelism

    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "4"))
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    n_docs_raw = docs.count()
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- frames the queries share (mirrors bench.py) ----
    def q_semdedup():
        return dedup.semdedup(
            emb, similarity.seeded_centroids(64), threshold=0.3, method="data"
        )

    from ocr_compare_spark.operators import index as index_ops

    bm25_n = n_docs_raw
    _sumdl_cache = {}

    def _bm25_sumdl():
        if "v" not in _sumdl_cache:
            _sumdl_cache["v"] = int(
                index_ops.doc_lengths(docs.select("doc_id", "text"), "doc_id", "text")
                .agg(F.sum("dl")).collect()[0][0]
            )
        return _sumdl_cache["v"]

    def _bm25_query_set(d):
        import __spark_entry__ as entry

        return d.filter(
            F.col("doc_id") % entry.BM25_QUERY_MOD == entry.BM25_QUERY_REM
        ).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(index_ops._words("text"), 1, entry.BM25_QUERY_TERMS), " "
            ).alias("query_text"),
        )

    def q_bm25():
        d = docs.select("doc_id", "text")
        return index_ops.bm25_topk(
            d, _bm25_query_set(d), k=10, n_docs=bm25_n, sum_dl=_bm25_sumdl(),
            num_partitions=cores,
        )

    def q_rrf_hybrid():
        import __spark_entry__ as entry
        from ocr_compare_spark.operators import embedding as emb_ops

        d = docs.select("doc_id", "text")
        bm = index_ops.bm25_topk(
            d, _bm25_query_set(d), k=10, n_docs=bm25_n, sum_dl=_bm25_sumdl(),
            num_partitions=cores,
        )
        vecs = emb_ops.hashed_tf(
            d, "doc_id", "text", dim=64, num_partitions=cores
        ).localCheckpoint()
        ht = emb_ops.hashed_topk(
            vecs,
            vecs.filter(F.col("doc_id") % entry.BM25_QUERY_MOD == entry.BM25_QUERY_REM),
            k=10,
        ).select("query_id", "rank", F.col("neighbor_id").alias("id"))
        return index_ops.rrf_fuse([bm.select("query_id", "rank", "id"), ht], k=10)

    def q_logreg_train():
        from ocr_compare_spark.operators import classifier

        d = docs.select("doc_id", "text")
        classifier.train_logreg(
            d.filter(F.col("doc_id") % 10 == 2),
            d.filter(F.col("doc_id") % 10 == 5),
            dim=64, iters=5, num_partitions=cores,
        )
        return None

    def q_dsir():
        from ocr_compare_spark.operators import dsir as dsir_ops

        target = docs.filter(F.col("doc_id") % 25 == 3).select("text")
        cand = docs.filter(F.col("doc_id") % 25 != 3).select("doc_id", "text")
        w = dsir_ops.dsir_log_weights(
            cand, target, "doc_id", "text", num_partitions=cores
        )
        return dsir_ops.dsir_resample(w, "doc_id", 1000)

    def q_dedup_minhash():
        return dedup.lsh_candidates(
            docs, "doc_id", "text", verify_threshold=0.5, num_partitions=cores
        )

    def q_hashed_embed():
        from ocr_compare_spark.operators import embedding as emb_ops

        vecs = emb_ops.hashed_tf(
            docs, "doc_id", "text", dim=64, num_partitions=cores
        ).localCheckpoint()
        return emb_ops.hashed_topk(vecs, vecs.filter(F.col("doc_id") < 8), k=10)

    def q_pagerank():
        from ocr_compare_spark.operators import graph, links

        pr_pages = synth.pages_from_documents(
            spark, sf_dir, replicate=replicate, num_partitions=cores
        )
        return graph.pagerank(
            links.extract_links(pr_pages, with_anchor_text=False), iters=3
        )

    def q_spans_assemble():
        from ocr_compare_spark.operators.assemble import assemble_doc_text
        from ocr_compare_spark.operators.extract import (
            ASSEMBLY_SPAN_FIELDS,
            extract_spans_stream,
        )

        pages = synth.pages_from_documents(spark, sf_dir, replicate=replicate)
        sp = extract_spans_stream(
            pages, engines=("dom",), num_partitions=cores, fields=ASSEMBLY_SPAN_FIELDS
        )
        return assemble_doc_text(sp)

    def q_sketches():
        from ocr_compare_spark.operators import sketches

        d = docs.repartition(cores)
        sh = d.select("lang", F.explode(dedup.word_shingles("text", 3)).alias("s"))
        noop(sketches.hll_count_distinct(sh, "s", ("lang",), p=12))
        toks = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        return sketches.cms_heavy_hitters(
            toks, "tok", depth=4, width=2048, threshold=1000
        )

    def q_pmi_phrases():
        from ocr_compare_spark.operators import phrases

        return phrases.pmi_phrases(docs.select("text"), "text", min_count=5, k=100)

    def q_decontam():
        bench_set = docs.filter(F.col("doc_id") % 25 == 7).select("text")
        return dedup.ngram_decontaminate(
            docs.select(F.col("doc_id").alias("id"), "text"), bench_set, "id", "text",
            n=8, num_partitions=cores,
        )

    def q_bpe():
        from ocr_compare_spark.operators import bpe

        merges = bpe.train_bpe(docs, "text", n_merges=32, merges_per_round=8)
        return bpe.bpe_token_counts(docs.select("doc_id", "text"), merges).select(
            "doc_id", "bpe_token_count"
        )

    def q_simhash_pairs():
        return dedup.simhash_near_dups(
            docs, "doc_id", "text", max_distance=3, num_partitions=cores
        )

    def q_tpch_q1():
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
                F.count("*").alias("n"),
            )
        )

    def q_substring_dedup():
        return dedup.substring_dedup(
            docs.select("doc_id", "text"), "doc_id", "text",
            window=24, num_partitions=cores,
        )

    def q_lm_ppl():
        from ocr_compare_spark.operators import lm

        model = lm.train_unigram_lm(docs, "text")
        return lm.perplexity_scores(docs, model, method="data")

    def q_tfidf():
        from ocr_compare_spark.operators import keywords

        return keywords.tfidf_topk(
            docs.select("doc_id", "text"), "doc_id", "text", k=5, n_docs=n_docs_raw
        )

    def q_temporal():
        from ocr_compare_spark.operators import temporal

        ev = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click")
        errors = ev.filter(F.col("event_type") == "error")
        noop(temporal.asof_join(
            clicks, errors, on="user_id", payload=["event_id", "value"],
            tolerance_us=3_600_000_000, tiebreak="event_id",
        ))
        ivs = errors.select(
            "event_id", "user_id", "ts",
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp")) + 600_000_000
            ).alias("end_ts"),
        )
        noop(temporal.point_in_interval_join(
            clicks, ivs, on="user_id", point_ts="ts", start_col="ts",
            end_col="end_ts", bucket_us=600_000_000,
        ))
        return temporal.rollup_timeseries(
            ev.withColumn("cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")),
            "ts", ["event_type"], ["cents"],
        )

    queries = {
        "semdedup": q_semdedup,
        "bm25": q_bm25,
        "rrf_hybrid": q_rrf_hybrid,
        "logreg_train": q_logreg_train,
        "dsir": q_dsir,
        "dedup_minhash": q_dedup_minhash,
        "hashed_embed": q_hashed_embed,
        "pagerank": q_pagerank,
        "spans_assemble": q_spans_assemble,
        "sketches": q_sketches,
        "pmi_phrases": q_pmi_phrases,
        "decontam": q_decontam,
        "bpe_train_encode": q_bpe,
        "simhash_pairs": q_simhash_pairs,
        "substring_dedup": q_substring_dedup,
        "lm_ppl": q_lm_ppl,
        "tfidf": q_tfidf,
        "temporal": q_temporal,
        "tpch_q1": q_tpch_q1,
    }
    if not names:
        names = list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # plan capture (once, before timing)
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for n in names:
            df = queries[n]()
            if df is None:
                continue
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as f:
                f.write(p)

    timings = {n: float("inf") for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {n}")
            t0 = time.time()
            df = queries[n]()
            if df is not None:
                noop(df)
            timings[n] = min(timings[n], time.time() - t0)
            spark.sparkContext.setJobDescription(None)

    out = {
        "queries": {n: round(v, 3) for n, v in timings.items()},
        "sf": sf_dir,
        "cores": cores,
        "reps": reps,
        "tag": tag,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
